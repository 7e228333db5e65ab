#!/bin/bash
# Round-5c: A/B batch on existing lane-A registrations (urdf+evaluate only,
# isolated data root data_ab5 sharing raw/part via symlink so the main-table
# artifacts stay untouched).
#   1. ur5 multi-anchor A/B (completes the --chain-anchors adjudication:
#      wx200_5 measured 3.89 vs 1.77 baseline with the init fix; VERDICT
#      r4 task 3 wants both flagships recorded)
#   2. chain-trunc A/B on the flagships (VERDICT task 5: occlusion-bias
#      attack — clip the gradient pull of occlusion-unexplained surface)
# Run AFTER campaign_r5b lane A so the baseline registrations exist.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"
mkdir -p data_ab5
[ -e data_ab5/raw ] || ln -s ../data/raw data_ab5/raw
[ -e data_ab5/part ] || ln -s ../data/part data_ab5/part

ab() {  # ab NAME ROBOT [urdf-extra-args...] — rebuild urdf+evaluate
  local name=$1 robot=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S) :: $*"
  {
    time python -m autourdf_tpu.cli urdf --robot "$robot" --unknown-dof \
        --end-video 5 --data-root data_ab5 "$@" &&
    time python -m autourdf_tpu.cli evaluate --robot "$robot" \
        --data-root data_ab5
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

ab ur5_ma3_r5 ur5 --chain-anchors 3
ab wx200_5_ma3_r5 wx200_5 --chain-anchors 3   # re-back the wiped 3.89-deg log
ab wx200_5_tr2 wx200_5 --chain-trunc 2.0
ab ur5_tr2 ur5 --chain-trunc 2.0
ab wx200_5_tr3 wx200_5 --chain-trunc 3.0
echo "campaign_r5c done $(date -u +%H:%M:%S)"
