#!/bin/bash
# Round-3 phase-B queue: runs after the chain-decay validation.
#   1. 20k-point kernel smoke (the VMEM fix 03f46cb never ran on-chip)
#   2. toilet full row (URDF writer sparse-id fix)
#   3. resim bisect for bolt + dishwasher (VERDICT task 4 diagnosis)
#   4. batch5: final-code refresh of every completed registration
#   5. 20k reruns for the data-limited robots (VERDICT task 2)
# Serialized on the one chip; robot-level resume via campaign .done flags.
set -u
cd /root/repo
LOG=campaign_logs
mkdir -p "$LOG"

echo "== 20k kernel smoke: $(date -u +%H:%M:%S)"
if [ ! -f "$LOG/smoke20k.done" ]; then
  if timeout 570 python - > "$LOG/smoke20k.log" 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from autourdf_tpu.ops.chamfer import chamfer_distance
rng = np.random.default_rng(0)
for n in (20000, 32768):
    x = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    y = jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32))
    v = float(np.asarray(chamfer_distance(x, y, norm=1)))
    g = jax.grad(lambda a: chamfer_distance(a, y, norm=1))(x)
    gn = float(np.asarray(jnp.linalg.norm(g)))
    print(f"n={n} chamfer {v:.5f} gradnorm {gn:.4f}", flush=True)
print("smoke ok")
EOF
  then touch "$LOG/smoke20k.done"; else echo "!! smoke20k FAIL"; fi
fi
tail -2 "$LOG/smoke20k.log"

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

bisect() {
  local r=$1
  if [ -f "$LOG/bisect_$r.done" ]; then echo "== skip bisect_$r"; return 0; fi
  echo "== bisect_$r: $(date -u +%H:%M:%S)"
  if (time python scripts/resim_bisect.py --robot "$r" \
        --json-out "$LOG/bisect_$r.json") > "$LOG/bisect_$r.log" 2>&1; then
    touch "$LOG/bisect_$r.done"
    tail -3 "$LOG/bisect_$r.log"
  else
    echo "!! FAIL bisect_$r"
  fi
}

# toilet: registration artifacts exist; urdf crashed pre-fix -> full row
run toilet all --robot toilet

bisect bolt
bisect dishwasher

# batch5 final-code refresh (campaign_r3.sh rebuild keeps registration)
bash scripts/campaign_r3.sh batch5

# 20k reruns (crashed before the VMEM kernel fix landed)
run solo12_20k all --robot solo12 --num-points 20000 --num-seg 45 --seed-mode fps
run allegro_16_20k all --robot allegro_16 --num-points 20000 --seed-mode fps
run allegro_20k all --robot allegro --num-points 20000 --seed-mode fps

echo "queue_r3b done $(date -u +%H:%M:%S)"
