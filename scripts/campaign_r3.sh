#!/bin/bash
# Round-3 eval campaign: regenerate the full-family closed-loop artifacts
# (data/ is gitignored and was wiped by the round reset) plus the 3-seed
# variance sweep (VERDICT task 1), the never-run rows (task 3), and the
# data-limited robots with TPU-headroom budgets (task 2).
#
# Runs are serialized (one TPU chip). Robot-level resume via .done flags.
# Usage: bash scripts/campaign_r3.sh [batch1|batch2|batch3|batch4|all]
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
    tail -1 "$LOG/$name.log" >/dev/null
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

# staged run for robots that need non-default urdf-stage flags
run_staged() {
  local name=$1; local robot=$2; shift 2
  # remaining args split at '--': common flags -- urdf-only flags
  local common=() urdfonly=()
  local seen=0
  for a in "$@"; do
    if [ "$a" = "--" ]; then seen=1; continue; fi
    if [ $seen = 0 ]; then common+=("$a"); else urdfonly+=("$a"); fi
  done
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name (staged): $(date -u +%H:%M:%S) :: common=${common[*]:-} urdf=${urdfonly[*]:-}"
  {
    time python -m autourdf_tpu.cli dataset --robot "$robot" "${common[@]}" &&
    time python -m autourdf_tpu.cli register --robot "$robot" "${common[@]}" &&
    time python -m autourdf_tpu.cli urdf --robot "$robot" --unknown-dof --end-video 5 "${common[@]}" "${urdfonly[@]}" &&
    time python -m autourdf_tpu.cli evaluate --robot "$robot" "${common[@]}"
  } > "$LOG/$name.log" 2>&1
  if [ $? = 0 ]; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

batch1() {  # flagship + variance sweep (canonical seed 2024 lives in data/)
  for r in wx200_5 ur5 franka pxs; do
    run "${r}" all --robot "$r"
  done
  # flagship seeds before the rest: the north-star metric is judged on
  # wx200_5, so its variance bound is the most valuable row
  for r in wx200_5 ur5 franka pxs; do
    for s in 2025 2026; do
      run "${r}_s${s}" all --robot "$r" --seed "$s" --data-root "data_seeds/s${s}"
    done
  done
}

batch2() {  # family regeneration at defaults
  for r in wx200_4 solo8 bolt laptop dishwasher; do
    run "${r}" all --robot "$r"
  done
}

batch3() {  # never-run rows
  for r in faucet toilet trashcan op3; do
    run "${r}" all --robot "$r"
  done
}

batch4() {  # data-limited robots with TPU-headroom budgets
  run_staged storage_hybrid storage -- --dist-mode hybrid
  # solo12: 4/13 gt links get ZERO clusters at K=30/5k points (r2) — the
  # same starvation fps+20k fixed for allegro_16 (13/16 vs 1/16)
  run solo12_20k all --robot solo12 --num-points 20000 --num-seg 45 --seed-mode fps
  run allegro_16_20k all --robot allegro_16 --num-points 20000 --seed-mode fps
  run allegro_20k all --robot allegro --num-points 20000 --seed-mode fps
}

rebuild() {
  # re-run urdf+evaluate only (registration artifacts kept) — used by the
  # refresh batch after pipeline changes (probe ladder, prune, 1200-step
  # refine) so the whole results table reflects the final code.
  # args after '--' go to the urdf stage only (e.g. --dist-mode).
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
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

batch5() {  # final-code refresh of every completed registration
  # batch2/3 robots included: their first runs predate the final selection
  # rules (drift-normalized ladder, min-over-trees, prune renumbering,
  # 1200-step refine, tree-consistent matcher)
  for r in wx200_5 ur5 franka pxs wx200_4 solo8 bolt laptop dishwasher \
           faucet toilet trashcan op3; do
    rebuild "${r}_rb" "$r"
  done
  for r in wx200_5 ur5 franka pxs; do
    for s in 2025 2026; do
      rebuild "${r}_s${s}_rb" "$r" --seed "$s" --data-root "data_seeds/s${s}"
    done
  done
  # batch4's special-flag runs (flags repeated for path resolution)
  rebuild storage_hybrid_rb storage -- --dist-mode hybrid
  rebuild solo12_20k_rb solo12 --num-points 20000 --num-seg 45
  rebuild allegro_16_20k_rb allegro_16 --num-points 20000
  rebuild allegro_20k_rb allegro --num-points 20000
}

case "${1:-all}" in
  batch1) batch1;;
  batch2) batch2;;
  batch3) batch3;;
  batch4) batch4;;
  batch5) batch5;;
  all) batch1; batch2; batch3; batch4;;
esac
echo "campaign done $(date -u +%H:%M:%S)"
