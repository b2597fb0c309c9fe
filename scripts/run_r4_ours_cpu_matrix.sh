#!/bin/bash
# Round-4 ours-side parity cells that are CPU-safe (everything except
# meta_lstm, whose nested-MAML scan takes >40 min to COMPILE on CPU XLA —
# those four cells run on the chip via run_r4_ours_tpu_matrix.sh).
# Single worker so the two ref workers keep a core each. Resumable.
#
# Usage: bash scripts/run_r4_ours_cpu_matrix.sh
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
  OMP_NUM_THREADS=1 timeout "$to" python scripts/parity_campaign.py \
    --side ours --detector "$det" --mode "$mode" --snr "$snr" --seed "$seed" \
    --channel "$ch" --out "$out" >> "$out.log" 2>&1
  echo "rc=$? $out"
}

# item 1 pairs: the three COST2100-unpaired flagship curves
for snr in 8.0 11.0; do for s in 0 1; do
  run vnet joint  $snr $s cost2100 7200
  run lstm joint  $snr $s cost2100 7200
done; done
for snr in 11.0 8.0; do for s in 0 1; do
  run lstm online $snr $s cost2100 10800
done; done
# item 7 pairs: 7 dB band edge
for s in 0 1; do
  run va   joint  7.0 $s time_decay 3600
  run vnet online 7.0 $s time_decay 3600
  run meta_vnet meta 7.0 $s time_decay 7200
done

echo "r4 ours cpu matrix complete"
