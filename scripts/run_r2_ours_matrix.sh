#!/bin/bash
# Round-2 ours-side parity matrix, run SERIALLY on the TPU chip (the two CPU
# cores are busy with the reference matrix; every cell here is minutes on the
# chip, and meta_lstm cells are TPU-only in practice — >40 min XLA compile on
# CPU vs ~1 min on the chip). Resumable via the /tmp/parity_campaign cache.
#
# Usage: bash scripts/run_r2_ours_matrix.sh
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_campaign
mkdir -p "$OUT"

run() { # det mode snr seed channel timeout_s
  local det=$1 mode=$2 snr=$3 seed=$4 ch=$5 to=$6
  local tag=""
  [ "$ch" != time_decay ] && tag="_$ch"
  local out="$OUT/ours_${det}_${mode}${tag}_${snr}_${seed}.json"
  [ -f "$out" ] && { echo "cached $out"; return; }
  PARITY_PLATFORM=axon PYTHONPATH=/root/repo:/root/.axon_site \
    timeout "$to" python scripts/parity_campaign.py --side ours \
    --detector "$det" --mode "$mode" --snr "$snr" --seed "$seed" \
    --channel "$ch" --out "$out" >> "$out.log" 2>&1
  echo "rc=$? $out"
}

# -- priority 1: the OnlineRNN (meta_lstm) 11 dB COST2100 outlier, 3 seeds --
for s in 0 1 2; do run meta_lstm meta 11.0 $s cost2100 3600; done
# -- priority 2: re-run the 10 dB meta cells post-unique(j_hat) fix ----------
for s in 0 1; do
  run meta_vnet meta 10.0 $s time_decay 3600
  run meta_lstm meta 10.0 $s time_decay 3600
done
# -- priority 3: the 8-14 dB band -------------------------------------------
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  run vnet joint  $snr $s time_decay 3600
  run vnet online $snr $s time_decay 3600
  run meta_vnet meta $snr $s time_decay 3600
done; done
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  run lstm joint  $snr $s time_decay 3600
  run lstm online $snr $s time_decay 3600
done; done
run meta_lstm meta 12.0 0 time_decay 3600
# -- priority 4: COST2100 anchors --------------------------------------------
for snr in 8.0 11.0; do for s in 0 1; do
  run va   joint  $snr $s cost2100 3600
  run vnet online $snr $s cost2100 3600
  run meta_vnet meta $snr $s cost2100 3600
done; done
# -- priority 5 (stretch) -----------------------------------------------------
run meta_lstm meta 12.0 1 time_decay 3600
run meta_lstm meta 11.0 3 cost2100 3600

echo "ours matrix complete"
