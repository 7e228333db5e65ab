#!/bin/bash
# Round-4 campaign driver v2 — flagship-first ordering (the v1 driver ran
# ab_canonical before the wx200_5/ur5 registrations it consumes existed).
# Order: north-star four -> canonical-frames A/B -> family regen -> Sapien
# -> data-limited budgets -> drift-prune A/B (isolated root, consumes the
# Sapien registrations) -> 3-seed sweep -> phase-C queue.
# Robot-level resume via the shared campaign_logs/*.done flags.
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

# 1. flagship four (default seed, canonical data/ root)
for r in wx200_5 ur5 franka pxs; do
  run "$r" all --robot "$r"
done

# 2. canonical-frames A/B (urdf+evaluate only, isolated root)
bash scripts/ab_canonical.sh

# 3-4. family regeneration + Sapien/op3
bash scripts/campaign_r3.sh batch2
bash scripts/campaign_r3.sh batch3

# 5. data-limited budgets (storage hybrid, solo12/allegro at 20k+fps)
bash scripts/campaign_r3.sh batch4

# 6. drift-prune A/B on the three spurious-joint Sapien objects:
# urdf+evaluate with --drift-prune on the SAME registrations, isolated
# data root so the default rows stay comparable.
mkdir -p data_dp
[ -e data_dp/raw ] || ln -s ../data/raw data_dp/raw
[ -e data_dp/part ] || ln -s ../data/part data_dp/part
dp() {
  local name=$1; local robot=$2; shift 2
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S)"
  {
    time python -m autourdf_tpu.cli urdf --robot "$robot" --unknown-dof \
        --end-video 5 --drift-prune --data-root data_dp "$@" &&
    time python -m autourdf_tpu.cli evaluate --robot "$robot" --data-root data_dp
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}
dp faucet_dp faucet
dp trashcan_dp trashcan
dp storage_dp storage --dist-mode hybrid

# 7. seeds (first four skip via .done flags)
bash scripts/campaign_r3.sh batch1

# 8. phase-C queue (op3_10k, cf5 entries skip, real-scan refresh)
bash scripts/queue_r3c.sh
echo "campaign_r4b done $(date -u +%H:%M:%S)"
