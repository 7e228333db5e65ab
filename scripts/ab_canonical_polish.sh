#!/bin/bash
# Canonical-frames A/B, round 2: ICP-POLISHED multi-frame union.
# The raw-union A/B measured negative on both flagships (ur5 1.89->1.94,
# wx200_5 1.77->3.40 deg): each extra step's cloud carries that step's
# registration error into the canonical model, and the smear outweighs
# the occlusion fill everywhere except the two drift-dominated ur5
# joints (3.84->2.45, 3.30->3.00).  _polish_canonical_union (chain.py)
# now ICP-aligns every later-step cloud onto the step-0 cloud before the
# union; this A/B re-measures cf5 with the polish on the SAME
# registration artifacts, in an isolated data root (data_ab2).
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

mkdir -p data_ab2
[ -e data_ab2/raw ] || ln -s ../data/raw data_ab2/raw
[ -e data_ab2/part ] || ln -s ../data/part data_ab2/part
for r in wx200_5 ur5; do
  name="${r}_cf5p"
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; continue; fi
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot "$r" --unknown-dof \
        --end-video 5 --canonical-frames 5 --data-root data_ab2 &&
    time python -m autourdf_tpu.cli evaluate --robot "$r" --data-root data_ab2
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name"
  fi
done
echo "ab_canonical_polish done $(date -u +%H:%M:%S)"
