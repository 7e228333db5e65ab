#!/bin/bash
# Seed-sweep extension (VERDICT r3 task 2 full scope): solo8 + the three
# spurious-joint Sapien objects at seeds 2025/2026, after the main
# campaign.  Same .done-flag resume as campaign_r3.sh.
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

for s in 2025 2026; do
  run "solo8_s${s}" all --robot solo8 --seed "$s" --data-root "data_seeds/s${s}"
  run "faucet_s${s}" all --robot faucet --seed "$s" --data-root "data_seeds/s${s}"
  run "trashcan_s${s}" all --robot trashcan --seed "$s" --data-root "data_seeds/s${s}"
done
echo "seeds_ext done $(date -u +%H:%M:%S)"
