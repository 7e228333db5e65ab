#!/bin/bash
# Round-5b TPU campaign — FULL closed loops (the round-5 container restart
# wiped every untracked artifact root: data/, data_seeds/, campaign_logs/;
# only data_ab5 and tracked data_real survived).  Everything below is
# dataset -> register -> urdf -> evaluate from scratch under the round-5
# DEFAULTS (freeze veto 0.25 ON, share-norm ladder ON), so this doubles as
# the family-wide regression guard for both default flips.
#
# Value order (VERDICT r4 tasks):
#   lane A: flagship + seed-fragile + Sapien exactness rows
#   lane B: small/fast objects, then data-limited 20k/10k rows, then seeds
# Robot-level resume via campaign_logs/*_r5b.done flags.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

run() {  # run NAME [cli-args...] — full loop with resume flag
  local name=$1; shift
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S) :: $*"
  if (time python -m autourdf_tpu.cli all "$@") > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    grep -E 'links=|dir err|dir_mean|freeze veto' "$LOG/$name.log" | tail -3
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

lane_a() {
  run wx200_5_r5b --robot wx200_5 --end-video 5
  run ur5_r5b --robot ur5 --end-video 5
  run franka_r5b --robot franka --end-video 5
  run pxs_r5b --robot pxs --end-video 5
  run faucet_r5b --robot faucet --end-video 5
  run trashcan_r5b --robot trashcan --end-video 5
  run storage_r5b --robot storage --end-video 5 --dist-mode hybrid
  run wx200_4_r5b --robot wx200_4 --end-video 5
  run solo8_r5b --robot solo8 --end-video 5
  run bolt_r5b --robot bolt --end-video 5
  # seed rows for the seed-fragile robots (task 2 + task 6)
  for s in 2025 2026; do
    run pxs_s${s}_r5b --robot pxs --seed "$s" --data-root "data_seeds/s${s}"
    run franka_s${s}_r5b --robot franka --seed "$s" --data-root "data_seeds/s${s}"
  done
}

lane_b() {
  run laptop_r5b --robot laptop --end-video 5
  run toilet_r5b --robot toilet --end-video 5
  run dishwasher_r5b --robot dishwasher --end-video 5
  # task 4: data-limited rows at TPU-headroom budgets
  run op3_10k_r5b --robot op3 --num-points 10000
  run solo12_20k_r5b --robot solo12 --num-points 20000 --num-seg 45 --seed-mode fps
  run allegro_20k_r5b --robot allegro --num-points 20000 --seed-mode fps
  run allegro_16_20k_r5b --robot allegro_16 --num-points 20000 --seed-mode fps
  # task 6: finish the 3-seed table
  for s in 2025 2026; do
    run solo8_s${s}_r5b --robot solo8 --seed "$s" --data-root "data_seeds/s${s}"
    run faucet_s${s}_r5b --robot faucet --seed "$s" --data-root "data_seeds/s${s}"
    run trashcan_s${s}_r5b --robot trashcan --seed "$s" --data-root "data_seeds/s${s}"
  done
  for s in 2025 2026; do
    run wx200_5_s${s}_r5b --robot wx200_5 --seed "$s" --data-root "data_seeds/s${s}"
    run ur5_s${s}_r5b --robot ur5 --seed "$s" --data-root "data_seeds/s${s}"
  done
}

case "${1:-a}" in
  a) lane_a;;
  b) lane_b;;
esac
echo "campaign_r5b lane ${1:-a} done $(date -u +%H:%M:%S)"
