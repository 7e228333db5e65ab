#!/bin/bash
# Round-3 phase-C queue (after queue_r3b):
#   1. op3 at a 10k-point budget (off-by-one link count: the k=13 drop sat
#      at 1.45x local drift at 5k points; more surface may lift it)
#   2. canonical-frames A/B on ur5 + wx200_5 in an isolated data root
#      (symlinked raw/part so the final rows aren't clobbered)
#   3. real-scan path refresh with final code
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

run() {
  local name=$1; shift
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S) :: $*"
  if (time python -m autourdf_tpu.cli "$@") > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

run op3_10k all --robot op3 --num-points 10000

# canonical-frames A/B: urdf+evaluate on the SAME registration artifacts,
# isolated output root
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

# real-scan contract with final code
if [ ! -f "$LOG/realscan_r3.done" ]; then
  echo "== realscan_r3: $(date -u +%H:%M:%S)"
  if (time python scripts/realscan_run.py) > "$LOG/realscan_r3.log" 2>&1; then
    touch "$LOG/realscan_r3.done"
    grep -E '^\{|deg|chamfer' "$LOG/realscan_r3.log" | tail -3
  else
    echo "!! FAIL realscan_r3"
  fi
fi

echo "queue_r3c done $(date -u +%H:%M:%S)"
