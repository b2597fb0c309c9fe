#!/bin/bash
# Round-4 reference follow-up queue: extra lstm_joint COST2100 11 dB seeds
# to adjudicate the provisional z=3.16 divergence (across-seed spread needs
# more draws on both sides), then the remaining priority-queue tail.
# Single worker; resumable; touch /tmp/parity_campaign/STOP_REF2 to yield.
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_campaign
rm -f "$OUT/STOP_REF2"

run() { # det mode snr seed channel timeout_s
  local det=$1 mode=$2 snr=$3 seed=$4 ch=$5 to=$6
  [ -f "$OUT/STOP_REF2" ] && { echo "STOP_REF2 present — yielding"; exit 0; }
  local tag=""
  [ "$ch" != time_decay ] && tag="_$ch"
  local out="$OUT/ref_${det}_${mode}${tag}_${snr}_${seed}.json"
  [ -f "$out" ] && { echo "cached $out"; return; }
  OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 timeout "$to" \
    python scripts/parity_campaign.py --side ref --detector "$det" \
    --mode "$mode" --snr "$snr" --seed "$seed" --channel "$ch" \
    --out "$out" >> "$out.log" 2>&1
  echo "rc=$? $(date +%H:%M) $out"
}

run lstm joint 11.0 2 cost2100 10800
run lstm joint 11.0 3 cost2100 10800
run lstm online 11.0 1 cost2100 14400
run lstm online 8.0  1 cost2100 14400
run vnet online 7.0 0 time_decay 7200
run vnet online 7.0 1 time_decay 7200
run meta_vnet meta 7.0 0 time_decay 10800
run meta_vnet meta 7.0 1 time_decay 10800
run meta_lstm meta 8.0 0 time_decay 18000
run meta_lstm meta 8.0 1 time_decay 18000
run meta_lstm meta 14.0 1 time_decay 21600
echo "r4 ref followup complete"
