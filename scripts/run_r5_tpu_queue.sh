#!/bin/bash
# Round-5 ours-side chip queue. Serial — the axon tunnel is single-client.
# `touch /tmp/parity_r5/STOP_TPU` yields after the in-flight cell.
#
# Stage 1 (VERDICT r4 item 1): lstm_joint COST2100 11 dB under the corrected
# train-data law (train-on-miss keeps the configured fading_taps_type=2, the
# reference's effective behavior — Trainer.load_weights docstring). Old-law
# weights dirs were moved to *.r4law so each cell retrains.
#
# Usage: bash scripts/run_r5_tpu_queue.sh
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_r5
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
  echo "rc=$? $out"
}

for s in 0 1 2 3; do
  run lstm joint 11.0 $s cost2100 3600
done

echo "r5 stage-1 queue complete"
