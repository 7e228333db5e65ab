#!/bin/bash
# Long-fit A/B (flagship <1.0 deg push): the wrist residual is a slow
# convergence, not a drift (7.87 deg @400 steps -> 3.77 @1200 with cosine
# decay; the drift-prone proximal joints are held by the decay+EMA).
# Measure 2400 refine steps on the SAME wx200_5/ur5 registration
# artifacts, isolated data root (data_ab3).
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

mkdir -p data_ab3
[ -e data_ab3/raw ] || ln -s ../data/raw data_ab3/raw
[ -e data_ab3/part ] || ln -s ../data/part data_ab3/part
for r in wx200_5 ur5; do
  name="${r}_rs2400"
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; continue; fi
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot "$r" --unknown-dof \
        --end-video 5 --refine-steps 2400 --data-root data_ab3 &&
    time python -m autourdf_tpu.cli evaluate --robot "$r" --data-root data_ab3
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name"
  fi
done
echo "ab_refine2400 done $(date -u +%H:%M:%S)"
