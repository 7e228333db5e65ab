#!/bin/bash
# Round-4 follow-on driver: waits for campaign_r4b (or any prior driver)
# to release the TPU, then runs the remaining round-4 queue in value
# order:
#   1. multi-anchor chain-fit A/B on the flagships (the <1.0 deg push)
#   2. retries of the 20k-budget runs that died on a TPU worker fault
#      (solo12/allegro/allegro_16 — campaign_r3.sh batch4 resumes via
#      .done flags)
#   3. seed-sweep extension (solo8 + Sapien objects at 2025/2026)
# Robot-level resume via the shared campaign_logs/*.done flags.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

# wait for the prior driver to exit — one TPU chip, concurrent use over
# the tunnel faults the device.  PID passed as $1 (no pattern matching).
PRIOR_PID=${1:-}
if [ -n "$PRIOR_PID" ]; then
  while kill -0 "$PRIOR_PID" 2>/dev/null; do
    sleep 60
  done
fi
echo "r4c start $(date -u +%H:%M:%S)"

bash scripts/ab_anchors.sh
bash scripts/fd_probe.sh
bash scripts/campaign_r3.sh batch4
bash scripts/seeds_ext.sh
echo "campaign_r4c done $(date -u +%H:%M:%S)"
