#!/bin/bash
# Canonical-frames A/B (VERDICT r3 task 4): urdf+evaluate with
# --canonical-frames 5 on the SAME registration artifacts, isolated data
# root so the headline rows aren't clobbered.  Extracted from queue_r3c.sh
# so the round-4 driver can run it early (flagship <1.0 deg is a
# north-star item); queue_r3c's copies then skip via the shared .done flags.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

mkdir -p data_ab
[ -e data_ab/raw ] || ln -s ../data/raw data_ab/raw
[ -e data_ab/part ] || ln -s ../data/part data_ab/part
for r in ur5 wx200_5; do
  name="${r}_cf5"
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; continue; fi
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot "$r" --unknown-dof \
        --end-video 5 --canonical-frames 5 --data-root data_ab &&
    time python -m autourdf_tpu.cli evaluate --robot "$r" --data-root data_ab
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name"
  fi
done
echo "ab_canonical done $(date -u +%H:%M:%S)"
