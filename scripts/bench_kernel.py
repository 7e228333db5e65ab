"""Microbenchmark the chamfer/NN kernel variants on the attached chip.

Marginal timing: the attached device sits behind a remote tunnel whose
per-program round trip is ~30 ms, so every variant runs as K evals inside
one jitted lax.scan (inputs perturbed per step so nothing folds) and the
cost is the slope between K=10 and K=1000 program runs.  Single-dispatch
timings on this deployment overstate kernel cost by 3-60x — see the
round-2 notes in ROADMAP.md.

Variants at the production size (5000 x 5000):
  - min-only distance pass (the VPU roofline: identical distance math and
    traffic, no argmin bookkeeping, no gradient)
  - min+argmin unidirectional (argmin lowering cost)
  - fused bidirectional kernel (the production search)
  - chamfer forward (loss read off the kernel min-distances, no gather)
  - chamfer forward+grad (adds the backward gather + scatter epilogue)

Usage: python scripts/bench_kernel.py [N] [M]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from autourdf_tpu.ops import chamfer, knn


def marginal_time(body, x, y, s1=10, s2=1000, reps=3):
    """Per-eval cost as the (s2 - s1)-run slope inside one jitted scan."""

    def total(steps):
        @jax.jit
        def run(x, y):
            def step(carry, i):
                xi = x + (i.astype(jnp.float32) * 1e-7)
                return carry + body(xi, y), None

            t, _ = jax.lax.scan(step, 0.0, jnp.arange(steps))
            return t

        float(run(x, y))  # compile + first run
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x, y))
            best = min(best, time.perf_counter() - t0)
        return best

    return (total(s2) - total(s1)) / (s2 - s1)


def _min_only_kernel(x_ref, yt_ref, dist_ref, *, norm: int):
    x0, x1, x2 = x_ref[:, 0:1], x_ref[:, 1:2], x_ref[:, 2:3]
    y0, y1, y2 = yt_ref[0:1, :], yt_ref[1:2, :], yt_ref[2:3, :]
    if norm == 1:
        acc = jnp.abs(x0 - y0) + jnp.abs(x1 - y1) + jnp.abs(x2 - y2)
    else:
        d0, d1, d2 = x0 - y0, x1 - y1, x2 - y2
        acc = d0 * d0 + d1 * d1 + d2 * d2
    dist_ref[:] = jnp.min(acc, axis=1, keepdims=True)


def min_only(x, y, norm=1, tx=512):
    yp = knn.pad_points(y, 512)
    mp = yp.shape[0]
    xp = knn.pad_points(x, tx)
    np_ = xp.shape[0]
    out = pl.pallas_call(
        functools.partial(_min_only_kernel, norm=norm),
        grid=(np_ // tx,),
        in_specs=[
            pl.BlockSpec((tx, 3), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, mp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tx, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((np_, 1), jnp.float32),
    )(xp, yp.T)
    return jnp.sum(out)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("n", nargs="?", type=int, default=5000)
    ap.add_argument("m", nargs="?", type=int, default=5000)
    args = ap.parse_args()

    key = jax.random.PRNGKey(0)
    kx, ky = jax.random.split(key)
    x = jax.random.normal(kx, (args.n, 3), jnp.float32)
    y = jax.random.normal(ky, (args.m, 3), jnp.float32)

    print(f"backend={jax.default_backend()} N={args.n} M={args.m} (marginal over scan)")

    for tx in (128, 512):
        t = marginal_time(lambda a, b, tx=tx: min_only(a, b, tx=tx), x, y)
        print(f"min-only roofline tx={tx:3d}:            {t*1e6:8.1f} us")

    t = marginal_time(
        lambda a, b: jnp.sum(knn._nn_pallas(a, b, norm=1, tx=512, ty=512,
                                            interpret=False)[0]),
        x, y,
    )
    print(f"uni min+argmin tx=512:                {t*1e6:8.1f} us")

    def bidir(a, b):
        dx, ix, dy, iy = knn._nn_bidir_pallas(a, b, norm=1, tx=512, interpret=False)
        return jnp.sum(dx) + jnp.sum(dy)

    t = marginal_time(bidir, x, y)
    print(f"fused bidir tx=512:                   {t*1e6:8.1f} us")

    t = marginal_time(lambda a, b: chamfer.chamfer_distance(a, b, norm=1), x, y)
    print(f"chamfer forward (no-gather cvjp):     {t*1e6:8.1f} us")

    def fg(a, b):
        v, (ga, gb) = jax.value_and_grad(
            lambda p, q: chamfer.chamfer_distance(p, q, norm=1), argnums=(0, 1)
        )(a, b)
        return v + jnp.sum(ga) + jnp.sum(gb)

    t = marginal_time(fg, x, y)
    print(f"chamfer value_and_grad:               {t*1e6:8.1f} us")


if __name__ == "__main__":
    main()
