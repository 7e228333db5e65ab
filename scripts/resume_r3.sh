#!/bin/bash
# Session-restart resume driver: finish the interrupted pxs run (its
# registration artifacts survived; only urdf+evaluate remain), then run
# the remaining campaign batches and the phase-C queue.  Everything is
# .done-flag idempotent, so re-running this script is safe.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

if [ ! -f "$LOG/pxs.done" ]; then
  echo "== pxs (resume urdf+evaluate): $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot pxs --unknown-dof --end-video 5 &&
    time python -m autourdf_tpu.cli evaluate --robot pxs
  } >> "$LOG/pxs.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/pxs.done"
    grep -E '^\{' "$LOG/pxs.log" | tail -1
  else
    echo "!! FAIL pxs resume (see $LOG/pxs.log)"
  fi
fi

bash scripts/campaign_r3.sh all
bash scripts/queue_r3c.sh
echo "resume_r3 done $(date -u +%H:%M:%S)"
