"""Empirically pin the bidirectional NN kernel's true VMEM footprint.

Compiles (AOT, no execution) the fixed-tiles kernel at suspect
(N, M, tx) shapes and reports OK / scoped-vmem OOM, so the analytic
model in ops/knn.py matches Mosaic's real allocation instead of
guesswork.  Run on the TPU terminal (compiles are chipless/remote).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    from autourdf_tpu.ops.knn import _nn_bidir_pallas, _nn_bidir_pallas_acc

    shapes = [
        (5120, 5120, 512),     # headline: known-good in production
        (5120, 5120, 256),
        (512, 20480, 128),     # r3 chain-probe crash: stack 18.93M, FAILS
        (512, 20480, 64),      # the config the fixed model now selects: OK
        (2048, 20480, 64),     # chain-fit at 20k points: observed OOM
        (2048, 20480, 32),
        (2048, 10240, 128),
        (512, 10240, 256),     # same 10.5M acc block as tx=128 x 20480: OK
        (10240, 10240, 128),
        (10240, 10240, 64),
        (2048, 16384, 64),
    ]
    for n, m, tx in shapes:
        x = jnp.zeros((n, 3), jnp.float32)
        y = jnp.zeros((m, 3), jnp.float32)
        try:
            jax.jit(lambda a, b: _nn_bidir_pallas(a, b, 1, tx, False)) \
                .lower(x, y).compile()
            print(f"fixed n={n} m={m} tx={tx}: OK", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"fixed n={n} m={m} tx={tx}: FAIL {msg}", flush=True)
    for m, tx in [(20480, 64), (20480, 128), (10240, 128)]:
        x = jnp.zeros((2048, 3), jnp.float32)
        y = jnp.zeros((m, 3), jnp.float32)
        try:
            jax.jit(lambda a, b: _nn_bidir_pallas_acc(a, b, 1, tx, False)) \
                .lower(x, y).compile()
            print(f"acc   m={m} tx={tx}: OK", flush=True)
        except Exception as e:
            msg = str(e).split("\n")[0][:140]
            print(f"acc   m={m} tx={tx}: FAIL {msg}", flush=True)


if __name__ == "__main__":
    main()
