#!/bin/bash
# Round-4 campaign driver: same idempotent runs as campaign_r3.sh but in
# VERDICT-r3 priority order — the full family table (batches 2/3/4) before
# the 3-seed variance sweep (batch1's tail), then the phase-C queue
# (op3 10k, canonical-frames A/B, real-scan refresh).  Robot-level resume
# via the shared campaign_logs/*.done flags.
set -u
cd /root/repo

bash scripts/campaign_r3.sh batch2
bash scripts/campaign_r3.sh batch3
bash scripts/ab_canonical.sh        # cheap urdf+eval A/B, north-star item
bash scripts/campaign_r3.sh batch4
bash scripts/campaign_r3.sh batch1   # first 4 skip (.done); seeds run here
bash scripts/queue_r3c.sh
echo "campaign_r4 done $(date -u +%H:%M:%S)"
