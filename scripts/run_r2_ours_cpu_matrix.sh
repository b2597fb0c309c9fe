#!/bin/bash
# Round-2 ours-side NON-META cells on CPU (semantics-identical to the chip;
# vnet/lstm/va cells take seconds-to-minutes under XLA CPU, and the TPU
# tunnel is single-client — keep it free for the meta cells, which are the
# only ones that are impractical off-chip). Same /tmp/parity_campaign cell
# cache as the TPU runner, so the two runners compose and never redo work.
#
# Usage: bash scripts/run_r2_ours_cpu_matrix.sh
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

# the 8-14 dB band: vnet / lstm, joint + online
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  run vnet joint  $snr $s time_decay 1800
  run vnet online $snr $s time_decay 1800
done; done
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  run lstm joint  $snr $s time_decay 1800
  run lstm online $snr $s time_decay 1800
done; done
# COST2100 anchors: VA bound + online vnet
for snr in 8.0 11.0; do for s in 0 1; do
  run va   joint  $snr $s cost2100 1800
  run vnet online $snr $s cost2100 1800
done; done
# meta_vnet is CPU-feasible too (plain MAML MLP, no LSTM-scan second-order
# pathology) — pick these up if the TPU queue hasn't already
for s in 0 1; do
  run meta_vnet meta 10.0 $s time_decay 3600   # post-unique(j_hat) refresh
done
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  run meta_vnet meta $snr $s time_decay 3600
done; done
for snr in 8.0 11.0; do for s in 0 1; do
  run meta_vnet meta $snr $s cost2100 3600
done; done

echo "ours cpu matrix complete"
