#!/bin/bash
# Share-normalized ladder A/B (round 4): rebuild urdf+evaluate with
# --ladder-share-norm on the registrations where the raw ladder failed
# (pxs s2025 under-split 16/19, franka s2025 over-split 8/7) plus
# regression guards on the canonical roots (wx200_5, laptop, trashcan,
# storage — their current picks must not move, or must move TOWARD gt).
# Isolated data roots so the headline artifacts stay untouched.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

mkdir -p data_ls data_ls25 data_ls26
[ -e data_ls/raw ] || ln -s ../data/raw data_ls/raw
[ -e data_ls/part ] || ln -s ../data/part data_ls/part
[ -e data_ls25/raw ] || ln -s ../data_seeds/s2025/raw data_ls25/raw
[ -e data_ls25/part ] || ln -s ../data_seeds/s2025/part data_ls25/part
[ -e data_ls26/raw ] || ln -s ../data_seeds/s2026/raw data_ls26/raw
[ -e data_ls26/part ] || ln -s ../data_seeds/s2026/part data_ls26/part

ls_run() {
  local name=$1; local robot=$2; local root=$3; shift 3
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot "$robot" --unknown-dof \
        --end-video 5 --ladder-share-norm --data-root "$root" "$@" &&
    time python -m autourdf_tpu.cli evaluate --robot "$robot" \
        --data-root "$root" "$@"
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E 'selected k|overrode|links=' "$LOG/$name.log" | tail -3
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

# the measured ladder failures
ls_run pxs_s2025_ls pxs data_ls25 --seed 2025
ls_run franka_s2025_ls franka data_ls25 --seed 2025
ls_run pxs_s2026_ls pxs data_ls26 --seed 2026
ls_run franka_s2026_ls franka data_ls26 --seed 2026
# regression guards at the canonical seed
ls_run wx200_5_ls wx200_5 data_ls
ls_run laptop_ls laptop data_ls
ls_run trashcan_ls trashcan data_ls
ls_run storage_ls storage data_ls --dist-mode hybrid
echo "ladder_ab done $(date -u +%H:%M:%S)"
