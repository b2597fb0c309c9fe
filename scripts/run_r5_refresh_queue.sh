#!/bin/bash
# Round-5 ours-side matrix refresh at HEAD, on the chip (serial — the axon
# tunnel is single-client; `touch /tmp/parity_r5/STOP_TPU` yields after the
# in-flight cell).
#
# Why refresh: two code changes since the r3/r4 ours cells were recorded —
# (1) train-on-miss now keeps the configured fading type (the reference's
# EFFECTIVE law; commit 81ddcb2), which changes the training data of every
# trainable by-word cell; (2) the LSTM recurrence ships the split-scan
# structure (models/lstm.py SPLIT_SCAN), bit-exact in forward detection but
# bf16-rounding-different in training gradients on the chip. The refreshed
# cells pair against the committed reference values (protocols unchanged)
# to form r5_parity_matrix.
#
# Cell choice: all LSTM-family by-word cells previously compared (both
# changes apply), 2 seeds each (4 at the formerly-DIVERGENT headline cell,
# run by run_r5_tpu_queue.sh); vnet-family spot checks at one cell per
# (mode, channel) to evidence the law fix generalizes (the remaining vnet
# cells keep their r3/r4 records, law caveat documented in the matrix
# description).
#
# Usage: bash scripts/run_r5_refresh_queue.sh
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_r5
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

# -- 1: LSTM family, COST2100 (headline curve neighbors) ---------------------
for s in 0 1; do
  run lstm joint  8.0  $s cost2100 3600
  run lstm online 8.0  $s cost2100 3600
  run lstm online 11.0 $s cost2100 3600
done
# -- 2: LSTM family, time_decay band -----------------------------------------
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  run lstm joint  $snr $s time_decay 3600
  run lstm online $snr $s time_decay 3600
done; done
# -- 3: meta_lstm (engine cells; band edges keep the r4 census as spread
#       evidence — these 2-seed runs put current-code values in the matrix)
for s in 0 1; do
  run meta_lstm meta 11.0 $s cost2100 3600
  run meta_lstm meta 10.0 $s time_decay 3600
  run meta_lstm meta 12.0 $s time_decay 3600
  run meta_lstm meta 8.0  $s time_decay 3600
  run meta_lstm meta 14.0 $s time_decay 3600
done
# -- 4: vnet-family law-fix spot checks --------------------------------------
for s in 0 1; do
  run vnet joint  11.0 $s cost2100 3600
  run vnet online 12.0 $s time_decay 3600
  run meta_vnet meta 12.0 $s time_decay 3600
done

echo "r5 refresh queue complete"
