#!/bin/bash
# Round-4 serial TPU queue: keeps the single-client chip busy end-to-end.
#   1. ours meta_lstm band-edge parity cells (VERDICT item 3)
#   2. ours COST2100 + 7 dB parity cells (items 1/7)
#   3. online-engine serving benches for the remaining families (item 6)
# Each stage is resumable / skippable via its own cache.
set -u
cd "$(dirname "$0")/.."
LOG=/tmp/parity_campaign

bash scripts/run_r4_ours_tpu_matrix.sh
bash scripts/run_r4_ours_all_tpu.sh

for args in "--mode online --detector vnet" \
            "--mode online --detector lstm" \
            "--mode meta --detector meta_vnet"; do
  tag=$(echo "$args" | tr ' -' '__')
  out="$LOG/online_bench${tag}.json"
  [ -f "$out" ] && { echo "cached $out"; continue; }
  PYTHONPATH=/root/repo:/root/.axon_site timeout 3600 \
    python scripts/online_bench.py $args > "$out.tmp" 2> "$out.log" \
    && mv "$out.tmp" "$out"
  echo "rc=$? $out"
done
echo "r4 tpu queue complete"
