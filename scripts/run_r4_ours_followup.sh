#!/bin/bash
# Round-4 ours follow-up (chip): extra seeds at the two contested spots —
# lstm_joint COST2100 11 dB (provisional divergence) and the meta_lstm
# band-edge poles (across-seed two-mode protocol wants more draws).
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_campaign

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
  echo "rc=$? $(date +%H:%M) $out"
}

run lstm joint 11.0 2 cost2100 3600
run lstm joint 11.0 3 cost2100 3600
run meta_lstm meta 8.0  2 time_decay 3600
run meta_lstm meta 14.0 2 time_decay 3600
run meta_lstm meta 8.0  3 time_decay 3600
run meta_lstm meta 14.0 3 time_decay 3600
echo "r4 ours followup complete"
