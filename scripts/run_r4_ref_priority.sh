#!/bin/bash
# Round-4 reference cells, REPRIORITIZED single-worker queue (runs in the
# CPU slot next to the long meta_lstm 14 dB pole). Coverage-first: one seed
# of every item-1 COST2100 curve/SNR before second seeds; the cheap va 7 dB
# cells lead; meta_lstm 8 dB re-queued at the tail (its first attempt was
# preempted for the higher-leverage item-1 cells). Resumable via the cell
# cache; touch /tmp/parity_campaign/STOP_REF to yield after the in-flight
# cell.
#
# Usage: bash scripts/run_r4_ref_priority.sh
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_campaign
mkdir -p "$OUT"
rm -f "$OUT/STOP_REF"

run() { # det mode snr seed channel timeout_s
  local det=$1 mode=$2 snr=$3 seed=$4 ch=$5 to=$6
  [ -f "$OUT/STOP_REF" ] && { echo "STOP_REF present — yielding"; exit 0; }
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

# cheap item-7 anchor first (va has no training)
run va joint 7.0 0 time_decay 3600
run va joint 7.0 1 time_decay 3600
# item 1, seed-0 coverage across all three curves x both SNRs
run vnet joint  11.0 0 cost2100 7200
run vnet joint  8.0  0 cost2100 7200
run lstm joint  11.0 0 cost2100 10800
run lstm joint  8.0  0 cost2100 10800
run lstm online 11.0 0 cost2100 14400
run lstm online 8.0  0 cost2100 14400
# item 1, seed-1 second sides
run vnet joint  11.0 1 cost2100 7200
run vnet joint  8.0  1 cost2100 7200
run lstm joint  11.0 1 cost2100 10800
run lstm joint  8.0  1 cost2100 10800
run lstm online 11.0 1 cost2100 14400
run lstm online 8.0  1 cost2100 14400
# item 7 remainder
run vnet online 7.0 0 time_decay 7200
run vnet online 7.0 1 time_decay 7200
run meta_vnet meta 7.0 0 time_decay 10800
run meta_vnet meta 7.0 1 time_decay 10800
# item 3 tail: meta_lstm 8 dB (re-queued) + second 14 dB seed
run meta_lstm meta 8.0 0 time_decay 18000
run meta_lstm meta 8.0 1 time_decay 18000
run meta_lstm meta 14.0 1 time_decay 21600

echo "r4 ref priority queue complete"
