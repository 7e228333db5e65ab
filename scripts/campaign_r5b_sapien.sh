#!/bin/bash
# Round-5b lane C — the VERDICT task-1 rows (Sapien exactness under pure
# defaults) pulled ahead of lane A's arm/hexapod queue so they land early.
# Same resume flags as campaign_r5b.sh; lane A skips whatever finishes here.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

run() {
  local name=$1; shift
  if [ -f "$LOG/$name.done" ]; then echo "== skip $name (done)"; return 0; fi
  echo "== $name: $(date -u +%H:%M:%S) :: $*"
  if (time python -m autourdf_tpu.cli all "$@") > "$LOG/$name.log" 2>&1; then
    touch "$LOG/$name.done"
    grep -E '^\{' "$LOG/$name.log" | tail -1
  else
    echo "!! FAIL $name (see $LOG/$name.log)"
  fi
}

run faucet_r5b --robot faucet --end-video 5
run trashcan_r5b --robot trashcan --end-video 5
run storage_r5b --robot storage --end-video 5 --dist-mode hybrid
echo "campaign_r5b lane C done $(date -u +%H:%M:%S)"
