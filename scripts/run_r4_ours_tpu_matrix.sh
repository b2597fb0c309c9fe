#!/bin/bash
# Round-4 ours-side cells that need the chip: meta_lstm time_decay band
# edges 8/14 dB (VERDICT r3 item 3). Serial — the axon tunnel is
# single-client. `touch /tmp/parity_campaign/STOP_TPU` yields after the
# in-flight cell. Resumable via the cell cache.
#
# Usage: bash scripts/run_r4_ours_tpu_matrix.sh
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
  echo "rc=$? $out"
}

for s in 0 1; do
  run meta_lstm meta 8.0  $s time_decay 3600
  run meta_lstm meta 14.0 $s time_decay 3600
done

echo "r4 ours tpu matrix complete"
