#!/bin/bash
# Full learned-detector parity matrix vs the reference (see parity_campaign.py).
# Runs cells with a 2-way concurrency cap; all cell results are cached in
# /tmp/parity_campaign so the campaign is resumable.
cd "$(dirname "$0")/.."
set -x
python scripts/parity_campaign.py --detectors va vnet --modes joint --seeds 2 --jobs 2
python scripts/parity_campaign.py --detectors vnet --modes online --seeds 2 --jobs 2
python scripts/parity_campaign.py --detectors lstm --modes joint online --seeds 2 --jobs 2
python scripts/parity_campaign.py --detectors meta_vnet --modes meta --seeds 2 --jobs 2
python scripts/parity_campaign.py --detectors meta_lstm --modes meta --seeds 2 --jobs 2
echo "PARITY_MATRIX_DONE"
