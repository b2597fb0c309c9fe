#!/bin/bash
# Round-4 ours-side item-1/item-7 cells on the chip (the CPU cores are
# occupied by the reference matrix; these cells are CPU-safe but run far
# faster on the chip). Serial — single-client tunnel. Resumable; touch
# /tmp/parity_campaign/STOP_TPU to yield after the in-flight cell.
#
# Usage: bash scripts/run_r4_ours_all_tpu.sh
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_campaign
mkdir -p "$OUT"

run() { # det mode snr seed channel timeout_s
  local det=$1 mode=$2 snr=$3 seed=$4 ch=$5 to=$6
  [ -f "$OUT/STOP_TPU" ] && { echo "STOP_TPU present — yielding chip"; exit 0; }
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

# item 1: the three COST2100-unpaired flagship curves
for snr in 8.0 11.0; do for s in 0 1; do
  run vnet joint  $snr $s cost2100 3600
  run lstm joint  $snr $s cost2100 3600
  run lstm online $snr $s cost2100 3600
done; done
# item 7: 7 dB band edge
for s in 0 1; do
  run va   joint  7.0 $s time_decay 1800
  run vnet online 7.0 $s time_decay 3600
  run meta_vnet meta 7.0 $s time_decay 3600
done

echo "r4 ours all-tpu matrix complete"
