#!/bin/bash
# Round-5 TPU campaign, in value order (VERDICT r4 tasks):
#   1. smoke: the three Sapien targets with the now-default freeze veto
#      (faucet 2/1, trashcan 2/1, storage 3/2 expected — task 1)
#   2. fixed multi-anchor chain-fit A/B on the flagships (task 3/5)
#   3. family rebuild with the new defaults (regression guard for the
#      veto + walk changes; refreshes every main-table row)
#   4. share-norm ladder A/B on the failing seeds (task 2)
#   5. 20k/10k data-limited rows from their completed registrations
#      (task 4)
#   6. seed-sweep extension: solo8 + faucet + trashcan full loops at
#      s2025/s2026 (task 6)
# Robot-level resume via campaign_logs/*.done flags (r5-prefixed).
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

# rebuild = urdf+evaluate only on existing registration artifacts.
# args after '--' go to the urdf stage only (e.g. --dist-mode).
rebuild() {
  local name=$1; local robot=$2; shift 2
  local common=() urdfonly=() seen=0
  for a in "$@"; do
    if [ "$a" = "--" ]; then seen=1; continue; fi
    if [ $seen = 0 ]; then common+=("$a"); else urdfonly+=("$a"); fi
  done
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name (rebuild): $(date -u +%H:%M:%S) :: $*"
  {
    time python -m autourdf_tpu.cli urdf --robot "$robot" --unknown-dof --end-video 5 ${common[@]+"${common[@]}"} ${urdfonly[@]+"${urdfonly[@]}"} &&
    time python -m autourdf_tpu.cli evaluate --robot "$robot" ${common[@]+"${common[@]}"}
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E 'freeze veto|pruned static|links=' "$LOG/$name.log" | tail -4
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

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

batch_sapien() {  # task 1: exact Sapien discovery with ZERO opt-in flags
  rebuild trashcan_r5 trashcan
  rebuild faucet_r5 faucet
  rebuild storage_r5 storage -- --dist-mode hybrid
}

batch_anchors() {  # task 3/5: the FIXED multi-anchor A/B, isolated root
  mkdir -p data_ma
  [ -e data_ma/raw ] || ln -s ../data/raw data_ma/raw
  [ -e data_ma/part ] || ln -s ../data/part data_ma/part
  for r in wx200_5 ur5; do
    local name="${r}_ma3_r5"
    if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; continue; fi
    echo "== $name: $(date -u +%H:%M:%S)"
    {
      time python -m autourdf_tpu.cli urdf --robot "$r" --unknown-dof \
          --end-video 5 --chain-anchors 3 --data-root data_ma &&
      time python -m autourdf_tpu.cli evaluate --robot "$r" --data-root data_ma
    } > "$LOG/$name.log" 2>&1
    if [ $? = 0 ]; then
      touch "$LOG/$name.done"
      grep -E 'axis spread|dir_mean' "$LOG/$name.log" | tail -2
    else
      echo "!! FAIL $name (see $LOG/$name.log)"
    fi
  done
}

batch_family() {  # task: refresh every main-table row under the new defaults
  # Wait (bounded) for the ladder_ab share-norm regression guards first:
  # if they pass, --ladder-share-norm becomes the default BEFORE the
  # family refresh, so the refresh is the family-wide regression test.
  local waited=0
  while [ ! -f "$LOG/storage_ls.done" ] && [ $waited -lt 150 ]; do
    sleep 60; waited=$((waited + 1))
  done
  for r in wx200_5 ur5 franka laptop toilet dishwasher bolt solo8 wx200_4 pxs; do
    rebuild "${r}_r5" "$r"
  done
  rebuild op3_r5 op3
}

batch_ladder() {  # task 2: share-norm ladder on the failing seeds
  # (pxs s2025/s2026 + canonical-root guards covered by the round-4
  # ladder_ab.sh queue, which ran to completion — see campaign_logs/
  # {pxs_s2025_ls,pxs_s2026_ls,franka_s2025_ls,franka_s2026_ls,
  #  wx200_5_ls,laptop_ls,trashcan_ls,storage_ls}.log.)
  mkdir -p data_ls25 data_ls26
  [ -e data_ls25/raw ] || ln -s ../data_seeds/s2025/raw data_ls25/raw
  [ -e data_ls25/part ] || ln -s ../data_seeds/s2025/part data_ls25/part
  [ -e data_ls26/raw ] || ln -s ../data_seeds/s2026/raw data_ls26/raw
  [ -e data_ls26/part ] || ln -s ../data_seeds/s2026/part data_ls26/part
  # freeze-veto-default franka rebuilds on the over-splitting seeds
  rebuild franka_s2025_r5 franka --seed 2025 --data-root data_ls25
  rebuild franka_s2026_r5 franka --seed 2026 --data-root data_ls26
}

batch_20k() {  # task 4: data-limited rows (registrations already on disk)
  rebuild solo12_20k_r5 solo12 --num-points 20000 --num-seg 45
  rebuild allegro_16_20k_r5 allegro_16 --num-points 20000
  rebuild allegro_20k_r5 allegro --num-points 20000
  run op3_10k_r5 all --robot op3 --num-points 10000
}

batch_trunc() {  # task 5: truncated robust chain loss A/B on the flagship
  mkdir -p data_tr
  [ -e data_tr/raw ] || ln -s ../data/raw data_tr/raw
  [ -e data_tr/part ] || ln -s ../data/part data_tr/part
  for m in 3 5; do
    local name="wx200_5_tr${m}_r5"
    if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; continue; fi
    echo "== $name: $(date -u +%H:%M:%S)"
    {
      time python -m autourdf_tpu.cli urdf --robot wx200_5 --unknown-dof \
          --end-video 5 --chain-trunc "$m" --data-root data_tr &&
      time python -m autourdf_tpu.cli evaluate --robot wx200_5 --data-root data_tr
    } > "$LOG/$name.log" 2>&1
    if [ $? = 0 ]; then
      touch "$LOG/$name.done"
      grep -E 'dir err|dir_mean' "$LOG/$name.log" | tail -1
    else
      echo "!! FAIL $name (see $LOG/$name.log)"
    fi
  done
}

batch_seeds() {  # task 6: finish the 3-seed table
  for s in 2025 2026; do
    for r in solo8 faucet trashcan; do
      run "${r}_s${s}_r5" all --robot "$r" --seed "$s" \
          --data-root "data_seeds/s${s}"
    done
  done
  # seed rows for the rebuilt arms under the new defaults (cheap rebuilds)
  for s in 2025 2026; do
    for r in wx200_5 ur5; do
      rebuild "${r}_s${s}_r5" "$r" --seed "$s" --data-root "data_seeds/s${s}"
    done
  done
}

case "${1:-all}" in
  sapien) batch_sapien;;
  anchors) batch_anchors;;
  family) batch_family;;
  ladder) batch_ladder;;
  k20) batch_20k;;
  trunc) batch_trunc;;
  seeds) batch_seeds;;
  all) batch_sapien; batch_anchors; batch_family; batch_ladder; batch_20k; batch_trunc; batch_seeds;;
esac
echo "campaign_r5 done $(date -u +%H:%M:%S)"
