"""Block until the TPU tunnel answers a trivial program, then exit 0.

Each probe runs in a FRESH python process (a wedged tunnel hangs the
process forever; a fresh process is the documented recovery), killed by
pid on timeout.  Exits 1 after --max-minutes.
"""
import argparse, subprocess, sys, time

PROBE = ("import jax, jax.numpy as jnp;"
         "x = jnp.ones((128, 128));"
         "print('ok', float((x @ x).sum()))")

ap = argparse.ArgumentParser()
ap.add_argument("--max-minutes", type=float, default=240)
ap.add_argument("--probe-timeout", type=float, default=150)
ap.add_argument("--interval", type=float, default=60)
a = ap.parse_args()

t0 = time.time()
attempt = 0
while time.time() - t0 < a.max_minutes * 60:
    attempt += 1
    try:
        r = subprocess.run([sys.executable, "-c", PROBE],
                           capture_output=True, timeout=a.probe_timeout,
                           text=True)
        if r.returncode == 0 and "ok" in r.stdout:
            print(f"tpu healthy after {time.time() - t0:.0f}s "
                  f"({attempt} probes)", flush=True)
            sys.exit(0)
        msg = (r.stderr or r.stdout).strip().splitlines()
        print(f"probe {attempt}: rc={r.returncode} "
              f"{msg[-1][:120] if msg else ''}", flush=True)
    except subprocess.TimeoutExpired:
        print(f"probe {attempt}: timeout {a.probe_timeout:.0f}s", flush=True)
    time.sleep(a.interval)
print("gave up", flush=True)
sys.exit(1)
