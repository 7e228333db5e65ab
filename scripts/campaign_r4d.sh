#!/bin/bash
# Round-4 follow-on driver v2 (supersedes campaign_r4c.sh): waits for the
# prior driver's PID, then runs the remaining round-4 TPU queue in value
# order:
#   1. multi-anchor chain-fit A/B on the flagships (the <1.0 deg push)
#   2. freeze-delta calibration rebuilds (drift-veto thresholds)
#   3. share-normalized ladder A/B (pxs/franka seed failures + guards)
#   4. retries of the 20k-budget runs that died on a TPU worker fault
#   5. seed-sweep extension (solo8 + Sapien objects at 2025/2026)
# Robot-level resume via the shared campaign_logs/*.done flags.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

PRIOR_PID=${1:-}
if [ -n "$PRIOR_PID" ]; then
  while kill -0 "$PRIOR_PID" 2>/dev/null; do
    sleep 60
  done
fi
echo "r4d start $(date -u +%H:%M:%S)"

bash scripts/ab_anchors.sh
bash scripts/fd_probe.sh
bash scripts/ladder_ab.sh
bash scripts/campaign_r3.sh batch4
bash scripts/seeds_ext.sh
echo "campaign_r4d done $(date -u +%H:%M:%S)"
