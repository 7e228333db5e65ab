"""On-device k-means (Lloyd's + k-means++ seeding) for cluster (re)sampling.

Replaces the host-side sklearn calls in the reference:
- initial frame-0 clustering with ``init="k-means++"``
  (/root/reference/PointCloud/cluster_icp.py:63-67)
- the per-frame warm-started resampling ``k_means(pc, init=centers,
  n_init=1)`` (/root/reference/PointCloud/mlp_reg.py:202-217) — which in
  the reference forces a GPU->CPU->GPU round trip every frame.  Here the
  whole resample stays on device inside the registration scan.

Shapes are static: points ``(N, D)``, centers ``(K, D)``; optional point
mask for padded inputs.  Assignment distances use the MXU-friendly
``|x|^2 - 2 x.c + |c|^2`` expansion; the update step is a one-hot matmul.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

_einsum = functools.partial(jnp.einsum, precision="highest")


class KMeansResult(NamedTuple):
    centers: jax.Array  # (K, D)
    labels: jax.Array   # (N,) int32
    inertia: jax.Array  # () sum of squared distances


def _sq_dists(points: jax.Array, centers: jax.Array) -> jax.Array:
    """(N, D), (K, D) -> (N, K) squared euclidean distances."""
    xn = jnp.sum(points * points, axis=1, keepdims=True)
    cn = jnp.sum(centers * centers, axis=1)
    cross = _einsum("nd,kd->nk", points, centers)
    return jnp.maximum(xn - 2.0 * cross + cn[None, :], 0.0)


def assign(points: jax.Array, centers: jax.Array) -> jax.Array:
    return jnp.argmin(_sq_dists(points, centers), axis=1).astype(jnp.int32)


def lloyd(
    points: jax.Array,
    init_centers: jax.Array,
    iters: int = 64,
    mask: jax.Array | None = None,
    tol: float = 1e-4,
) -> KMeansResult:
    """Lloyd's algorithm with fixed iteration count and convergence freeze.

    Matches sklearn's warm-start behavior (n_init=1): iterate assignment /
    mean-update until the squared center shift divided by the data variance
    drops below ``tol`` (sklearn's relative tol), then hold.  Empty
    clusters keep their previous center.
    """
    k = init_centers.shape[0]
    # Masked-out points need no far-away parking: their one-hot assignment
    # row is zeroed below, so they never pull a center.
    m = None if mask is None else mask.astype(points.dtype)

    var = jnp.mean(jnp.var(points, axis=0)) if m is None else (
        jnp.sum(m[:, None] * (points - jnp.sum(m[:, None] * points, 0)
                              / jnp.maximum(jnp.sum(m), 1.0)) ** 2)
        / jnp.maximum(jnp.sum(m) * points.shape[1], 1.0)
    )
    shift_tol = tol * var

    def step(carry, _):
        centers, done = carry
        d = _sq_dists(points, centers)
        labels = jnp.argmin(d, axis=1)
        onehot = jax.nn.one_hot(labels, k, dtype=points.dtype)
        if m is not None:
            onehot = onehot * m[:, None]
        counts = jnp.sum(onehot, axis=0)
        sums = _einsum("nk,nd->kd", onehot, points)
        new_centers = jnp.where(
            counts[:, None] > 0, sums / jnp.maximum(counts[:, None], 1.0), centers
        )
        shift = jnp.sum((new_centers - centers) ** 2)
        new_done = jnp.logical_or(done, shift <= shift_tol)
        centers = jnp.where(done, centers, new_centers)
        return (centers, new_done), None

    (centers, _), _ = jax.lax.scan(step, (init_centers, jnp.array(False)), None, length=iters)
    d = _sq_dists(points, centers)
    labels = jnp.argmin(d, axis=1).astype(jnp.int32)
    best = jnp.min(d, axis=1)
    if m is not None:
        best = best * m
    return KMeansResult(centers, labels, jnp.sum(best))


def kmeans_plusplus_init(
    key: jax.Array,
    points: jax.Array,
    k: int,
    mask: jax.Array | None = None,
) -> jax.Array:
    """D^2-weighted k-means++ seeding, fully on device."""
    n = points.shape[0]
    logm = jnp.zeros((n,)) if mask is None else jnp.where(mask, 0.0, -jnp.inf)

    key, sub = jax.random.split(key)
    first = jax.random.categorical(sub, logm)
    centers0 = jnp.zeros((k, points.shape[1]), points.dtype).at[0].set(points[first])
    mind0 = jnp.sum((points - points[first]) ** 2, axis=1)

    def body(i, state):
        centers, mind, key = state
        key, sub = jax.random.split(key)
        logits = jnp.where(jnp.isneginf(logm), -jnp.inf, jnp.log(jnp.maximum(mind, 1e-30)))
        idx = jax.random.categorical(sub, logits)
        c = points[idx]
        centers = centers.at[i].set(c)
        mind = jnp.minimum(mind, jnp.sum((points - c) ** 2, axis=1))
        return centers, mind, key

    centers, _, _ = jax.lax.fori_loop(1, k, body, (centers0, mind0, key))
    return centers


def kmeans(
    key: jax.Array,
    points: jax.Array,
    k: int,
    iters: int = 64,
    mask: jax.Array | None = None,
    n_init: int = 4,
    seed_mode: str = "kmeans++",
) -> KMeansResult:
    """k-means with ``n_init`` restarts, best inertia wins.

    ``seed_mode``:

    - ``"kmeans++"`` — D^2-weighted sampling (reference parity,
      cluster_icp.py:63-67 via sklearn).  Seeds land proportionally to
      point density, so small-but-articulated links (solo12 shoulders,
      allegro fingertips) can receive ZERO clusters at the default
      budget.
    - ``"fps"`` — farthest-point seeding: seeds spread uniformly over
      the *surface*, independent of sampling density, so every
      geometrically distinct part gets a seed before any dense part
      gets its second.  Deterministic; Lloyd refinement still shapes
      the final partition.
    """
    if seed_mode == "fps":
        from .fps import farthest_point_sample

        idx = farthest_point_sample(points[:, :3], k, mask)
        init = points[idx]
        return lloyd(points, init, iters, mask)

    keys = jax.random.split(key, n_init)

    def one(key):
        init = kmeans_plusplus_init(key, points, k, mask)
        return lloyd(points, init, iters, mask)

    results = jax.vmap(one)(keys)
    best = jnp.argmin(results.inertia)
    return KMeansResult(
        results.centers[best], results.labels[best], results.inertia[best]
    )
