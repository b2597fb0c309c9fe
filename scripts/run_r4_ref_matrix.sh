#!/bin/bash
# Round-4 reference-side parity cells (VERDICT r3 items 1, 3, 7).
#
# New cells this round:
#   - COST2100 8/11 dB for the three curves with zero COST2100 ref runs:
#     vnet_joint (Joint ViterbiNet), lstm_joint (JointRNN), lstm_online (LSTM)
#     — plotter_main.py:24-69 curve builders (item 1).
#   - meta_lstm time_decay band edges 8/14 dB (item 3; the 14 dB pole is deep
#     in the documented instability zone, judged on across-seed spread).
#   - 7 dB time_decay pairs for va / vnet_online / meta_vnet (item 7).
#
# Scheduling: 2 workers (= the box's 2 CPUs). One multi-hour meta_lstm pole
# (~3.5h at 14 dB, cf. 190 min at 12 dB in round 3) is dispatched first so it
# streams in one slot while the other slot drains every small cell; the second
# 14 dB seed runs last as the stretch tail. meta_lstm at 8 dB is expected much
# cheaper (the ser<=0.02 confidence gate rarely passes at 8 dB, so the
# 200-SGD-step adaptations mostly skip). Resumable via the /tmp cell cache.
#
# Usage: bash scripts/run_r4_ref_matrix.sh
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/parity_campaign
mkdir -p "$OUT"

LIST=$(mktemp)
emit() { # det mode snr seed channel timeout_s
  local det=$1 mode=$2 snr=$3 seed=$4 ch=$5 to=$6
  local tag=""
  [ "$ch" != time_decay ] && tag="_$ch"
  local out="$OUT/ref_${det}_${mode}${tag}_${snr}_${seed}.json"
  [ -f "$out" ] && return
  echo "OMP_NUM_THREADS=1 MKL_NUM_THREADS=1 timeout $to python scripts/parity_campaign.py --side ref --detector $det --mode $mode --snr $snr --seed $seed --channel $ch --out $out >> $out.log 2>&1; echo \$? $out" >> "$LIST"
}

# -- slot filler: first 14 dB meta_lstm pole (longest job first) --------------
emit meta_lstm meta 14.0 0 time_decay 21600
# -- meta_lstm 8 dB (likely fast: gate rarely passes at 8 dB) -----------------
emit meta_lstm meta 8.0 0 time_decay 18000
emit meta_lstm meta 8.0 1 time_decay 18000
# -- item 1: the three COST2100-unpaired flagship curves ----------------------
for snr in 11.0 8.0; do for s in 0 1; do
  emit lstm online $snr $s cost2100 10800
done; done
for snr in 8.0 11.0; do for s in 0 1; do
  emit lstm joint $snr $s cost2100 7200
  emit vnet joint $snr $s cost2100 7200
done; done
# -- item 7: 7 dB band-edge pairs ---------------------------------------------
for s in 0 1; do
  emit va   joint  7.0 $s time_decay 3600
  emit vnet online 7.0 $s time_decay 3600
  emit meta_vnet meta 7.0 $s time_decay 7200
done
# -- stretch tail: second 14 dB meta_lstm pole --------------------------------
emit meta_lstm meta 14.0 1 time_decay 21600

echo "$(wc -l < "$LIST") cells queued"
xargs -P 2 -I CMD -a "$LIST" bash -c CMD
rm -f "$LIST"
echo "r4 ref matrix complete"
