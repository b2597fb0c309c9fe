#!/bin/bash
# Round-2 reference-side parity matrix (VERDICT items 1 & 2).
#
# Runs the PyTorch reference cells for the 8-14 dB time_decay band and the
# COST2100 channel, priority-ordered so the fast cells (va/vnet/lstm, then
# meta_vnet) land first within a ~2h session; the multi-hour meta_lstm poles
# (~3.5-4.5h each on this CPU, see round-1 notes) run last as stretch.
# Resumable: each cell caches to /tmp/parity_campaign and is skipped when
# present. Two workers (= the box's 2 CPUs), single-threaded BLAS each.
#
# Usage: bash scripts/run_r2_ref_matrix.sh
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

# -- priority 1: vnet / lstm joint+online across the band (fast cells) -------
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  emit vnet joint  $snr $s time_decay 7200
  emit vnet online $snr $s time_decay 7200
done; done
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  emit lstm joint  $snr $s time_decay 7200
  emit lstm online $snr $s time_decay 7200
done; done
# -- priority 2: COST2100 anchors (VA bound + online vnet) -------------------
for snr in 8.0 11.0; do for s in 0 1; do
  emit va   joint  $snr $s cost2100 7200
  emit vnet online $snr $s cost2100 7200
done; done
# -- priority 3: meta_vnet across the band + COST2100 ------------------------
for snr in 8.0 12.0 14.0; do for s in 0 1; do
  emit meta_vnet meta $snr $s time_decay 14400
done; done
for snr in 8.0 11.0; do for s in 0 1; do
  emit meta_vnet meta $snr $s cost2100 14400
done; done
# -- priority 4 (stretch): multi-hour meta_lstm poles (~3.5h each) ------------
emit meta_lstm meta 12.0 0 time_decay 28800
emit meta_lstm meta 11.0 0 cost2100 28800   # the OnlineRNN 11 dB outlier point
emit meta_lstm meta 12.0 1 time_decay 28800
emit meta_lstm meta 11.0 1 cost2100 28800

echo "$(wc -l < "$LIST") cells queued"
xargs -P 2 -I CMD -a "$LIST" bash -c CMD
rm -f "$LIST"
echo "ref matrix complete"
