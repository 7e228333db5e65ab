#!/bin/bash
# Multi-anchor chain-fit A/B (round 4, flagship <1.0 deg push): urdf +
# evaluate with --chain-anchors 3 on the SAME registration artifacts as
# the headline rows, isolated data root (data_ab5).  The multi-frame
# canonical UNION was measured negative (cloud smear, RESULTS.md); this
# instead averages the fitted axes across fits anchored at different
# steps — each anchor has a different occlusion pattern, so the directed
# per-anchor bias should cancel without touching the model clouds.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

mkdir -p data_ab5
[ -e data_ab5/raw ] || ln -s ../data/raw data_ab5/raw
[ -e data_ab5/part ] || ln -s ../data/part data_ab5/part
for r in wx200_5 ur5; do
  name="${r}_ma3"
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; continue; fi
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot "$r" --unknown-dof \
        --end-video 5 --chain-anchors 3 --data-root data_ab5 &&
    time python -m autourdf_tpu.cli evaluate --robot "$r" --data-root data_ab5
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name"
  fi
done
echo "ab_anchors done $(date -u +%H:%M:%S)"
