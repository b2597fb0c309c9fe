#!/bin/bash
# Round-3 ours-side parity cells, run SERIALLY on the TPU chip (the axon
# tunnel is single-client — this script must be the only chip user while it
# runs). Composes with the round-2 /tmp/parity_campaign cell cache: any cell
# whose .json exists is skipped, so re-running after an interruption is free.
#
# Yield mechanism: `touch /tmp/parity_campaign/STOP_TPU` makes the loop exit
# after the in-flight cell, freeing the chip for bench/diagnostic work;
# remove the file and re-run to resume where it left off.
#
# Priority order: (1) meta_lstm cells that pair with the in-flight reference
# stretch runs (VERDICT r2 items 1-2), (2) COST2100 cells whose ref side has
# already landed, (3) meta_vnet band, (4) the lstm cells that timed out on
# CPU. Usage: bash scripts/run_r3_ours_tpu_matrix.sh
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_campaign
mkdir -p "$OUT"
rm -f "$OUT/STOP_TPU"

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
  local rc=$?
  echo "rc=$rc $out"
  # a failed cell leaves no .json; don't let one flake stall the queue
}

# -- 1: meta_lstm pairs for the in-flight ref stretch cells ------------------
run meta_lstm meta 10.0 1 time_decay 3600       # post-unique(j_hat) 2nd seed
run meta_lstm meta 11.0 0 cost2100 3600         # outlier cell, 3rd seed
run meta_lstm meta 12.0 0 time_decay 3600
run meta_lstm meta 12.0 1 time_decay 3600
# -- 2: COST2100 cells — ref side landed 2026-08-19 12:30-13:30 --------------
for snr in 8.0 11.0; do for s in 0 1; do
  run va   joint  $snr $s cost2100 3600
  run vnet online $snr $s cost2100 3600
  run meta_vnet meta $snr $s cost2100 3600
done; done
# -- 3: meta_vnet band (ref landed 13:05-13:20) -------------------------------
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  run meta_vnet meta $snr $s time_decay 3600
done; done
# -- 4: lstm cells that exceeded the CPU runner's budget ---------------------
for s in 0 1; do
  run lstm joint  14.0 $s time_decay 3600
  run lstm online 12.0 $s time_decay 3600
  run lstm online 14.0 $s time_decay 3600
done

echo "r3 ours tpu matrix complete"
