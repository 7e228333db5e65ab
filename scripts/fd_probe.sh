#!/bin/bash
# Freeze-delta calibration runs (round 4): rebuild urdf+evaluate on the
# EXISTING registrations with the freeze-delta probe in prune-diag, for
# the veto-calibration set: the two objects the drift veto misses
# (trashcan, storage), the object it fixes (faucet), and the false-
# positive guards (wx200_5 flagship, pxs = 18 weakly-excited leg joints).
# Isolated data root so the headline artifacts stay untouched.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

mkdir -p data_fd
[ -e data_fd/raw ] || ln -s ../data/raw data_fd/raw
[ -e data_fd/part ] || ln -s ../data/part data_fd/part

fd() {
  local name=$1; local robot=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot "$robot" --unknown-dof \
        --end-video 5 --data-root data_fd "$@" &&
    time python -m autourdf_tpu.cli evaluate --robot "$robot" --data-root data_fd
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E 'prune-diag|drift veto' "$LOG/$name.log" | tail -20
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

fd trashcan_fd trashcan
fd storage_fd storage --dist-mode hybrid
fd faucet_fd faucet
fd wx200_5_fd wx200_5
fd pxs_fd pxs

# franka seed-2025 found 8 links / 7 dof (one spurious vs the canonical
# 7/6) — rebuild in place with the diagnostics so the freeze-delta of
# the spurious joint is on record (behavior-identical code: the probe is
# diagnostics-only)
name=franka_s2025_fd
if [ ! -f "$LOG/$name.done" ]; then
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot franka --unknown-dof \
        --end-video 5 --seed 2025 --data-root data_seeds/s2025 &&
    time python -m autourdf_tpu.cli evaluate --robot franka --seed 2025 \
        --data-root data_seeds/s2025
  } > "$LOG/$name.log" 2>&1 && touch "$LOG/$name.done" \
    || echo "!! FAIL $name (see $LOG/$name.log)"
  grep -E 'prune-diag|drift veto' "$LOG/$name.log" | tail -10
fi
echo "fd_probe done $(date -u +%H:%M:%S)"
