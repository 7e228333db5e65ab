"""Point-to-point ICP on device (Open3D registration_icp replacement).

The reference leans on Open3D's C++ ICP in three places: masked per-cluster
refinement (/root/reference/PointCloud/cluster_icp.py:118-191), per-link
canonical-frame refinement (/root/reference/PointCloud/link.py:85-127),
and evaluation alignment (/root/reference/Sim/evaluation.py:358-363).
Here one fused program per ICP: nearest-neighbor correspondences (the
Pallas/XLA kernel), correspondence-distance gating, weighted Kabsch via
3x3 SVD, iterated under ``lax.scan`` with a convergence freeze matching
Open3D's relative fitness/RMSE criteria — and it batches across clusters
with ``vmap`` where the reference runs N sequential C++ calls.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .knn import PAD_COORD, nn_search

_einsum = functools.partial(jnp.einsum, precision="highest")


class ICPResult(NamedTuple):
    transform: jax.Array  # (4, 4) source -> target (includes init)
    fitness: jax.Array    # fraction of source points with a gated match
    rmse: jax.Array       # inlier RMSE


def _orthonormalize(R: jax.Array, steps: int = 4) -> jax.Array:
    """Project a near-rotation onto SO(3) via Newton-Schulz polar iteration.

    XLA's jitted f32 SVD is an iterative algorithm whose U/V factors are
    orthogonal only to ~2e-3 for near-isotropic 3x3 covariances (LAPACK
    at the same f32 gives 1e-7) — the Kabsch "rotation" built from them
    SHRINKS (diag ~0.97-0.99), and composed over 50 ICP iterations on
    identical clouds the accumulated transform deviated 0.08 from
    identity, inflating the eval alignment floor by ~0.05 chamfer on
    large objects.  X <- 1.5 X - 0.5 X X^T X converges quadratically to
    the orthogonal polar factor and preserves the determinant sign, so
    the svd's reflection handling survives."""
    for _ in range(steps):
        R = 1.5 * R - 0.5 * _einsum("ij,kj,kl->il", R, R, R)
    return R


def _kabsch(src: jax.Array, dst: jax.Array, w: jax.Array) -> jax.Array:
    """Weighted least-squares rigid transform src -> dst, (N,3)x(N,3)x(N,)."""
    wsum = jnp.maximum(jnp.sum(w), 1e-12)
    ws = w[:, None]
    src_mean = jnp.sum(src * ws, axis=0) / wsum
    dst_mean = jnp.sum(dst * ws, axis=0) / wsum
    sc = src - src_mean
    dc = dst - dst_mean
    H = _einsum("ni,nj->ij", sc * ws, dc)
    U, _, Vt = jnp.linalg.svd(H)
    det = jnp.linalg.det(Vt.T @ U.T)
    D = jnp.diag(jnp.asarray([1.0, 1.0, 1.0])).at[2, 2].set(det)
    rot = _orthonormalize(Vt.T @ D @ U.T)
    t = dst_mean - rot @ src_mean
    T = jnp.eye(4).at[:3, :3].set(rot).at[:3, 3].set(t)
    return T


def icp_point_to_point(
    source: jax.Array,           # (N, 3)
    target: jax.Array,           # (M, 3)
    init: jax.Array | None = None,
    max_iterations: int = 50,
    threshold: float = 1.0,      # max correspondence distance (o3d arg)
    source_mask: jax.Array | None = None,
    target_mask: jax.Array | None = None,
    relative_rmse: float = 1e-6,
    relative_fitness: float = 1e-6,
    backend: str = "auto",
) -> ICPResult:
    """Open3D-semantics p2p ICP; jittable and vmappable.

    ``max_iterations`` is a static bound; converged iterations freeze (the
    reference passes 1e4-1e5 iterations but Open3D stops on the relative
    criteria long before — 50 fused iterations cover that envelope).
    """
    init = jnp.eye(4) if init is None else init
    tgt = target if target_mask is None else jnp.where(
        target_mask[:, None], target, PAD_COORD
    )
    src_w = (
        jnp.ones(source.shape[0])
        if source_mask is None
        else source_mask.astype(jnp.float32)
    )

    class Carry(NamedTuple):
        T: jax.Array
        fitness: jax.Array
        rmse: jax.Array
        done: jax.Array

    def step(c: Carry, _):
        moved = source @ c.T[:3, :3].T + c.T[:3, 3]
        d2, idx = nn_search(moved, tgt, norm=2, backend=backend)
        dist = jnp.sqrt(jnp.maximum(d2, 0.0))
        w = src_w * (dist < threshold)
        matched = tgt[idx]
        T_new = _kabsch(moved, matched, w) @ c.T
        n_inlier = jnp.maximum(jnp.sum(w), 1e-12)
        fitness = jnp.sum(w) / jnp.maximum(jnp.sum(src_w), 1e-12)
        rmse = jnp.sqrt(jnp.sum(w * d2) / n_inlier)
        conv = (jnp.abs(fitness - c.fitness) < relative_fitness * jnp.maximum(fitness, 1e-12)) & (
            jnp.abs(rmse - c.rmse) < relative_rmse * jnp.maximum(rmse, 1e-12)
        )
        new = Carry(
            T=jnp.where(c.done, c.T, T_new),
            fitness=jnp.where(c.done, c.fitness, fitness),
            rmse=jnp.where(c.done, c.rmse, rmse),
            done=jnp.logical_or(c.done, conv),
        )
        return new, None

    init_carry = Carry(init, jnp.asarray(-1.0), jnp.asarray(-1.0), jnp.asarray(False))
    final, _ = jax.lax.scan(step, init_carry, None, length=max_iterations)
    return ICPResult(final.T, final.fitness, final.rmse)


def masked_icp_clusters(
    cluster_points: jax.Array,   # (N, 3) local-frame points, flat
    labels: jax.Array,           # (N,) int32 cluster ids
    matrices: jax.Array,         # (K, 4, 4) current cluster poses
    target: jax.Array,           # (M, 3) next frame's cloud
    num_clusters: int,
    scale: float = 1.2,
    threshold: float = 1.0,
    max_iterations: int = 30,
    backend: str = "auto",
) -> jax.Array:
    """Per-cluster AABB-masked ICP refinement, batched over clusters.

    Rebuilds masked_icp (cluster_icp.py:118-191): for each cluster, the
    predicted world-frame AABB scaled by ``scale`` gates the target points,
    then p2p ICP refines the cluster's 4x4 from its current estimate.
    Returns updated (K, 4, 4).
    """
    onehot = jax.nn.one_hot(labels, num_clusters, dtype=jnp.float32)  # (N, K)

    def one_cluster(k):
        sel = onehot[:, k]  # (N,) soft mask over flat points
        world = cluster_points @ matrices[k, :3, :3].T + matrices[k, :3, 3]
        big = 1e9
        lo = jnp.min(jnp.where(sel[:, None] > 0, world, big), axis=0)
        hi = jnp.max(jnp.where(sel[:, None] > 0, world, -big), axis=0)
        center = 0.5 * (lo + hi)
        half = 0.5 * scale * (hi - lo)
        in_box = jnp.all(
            (target > center - half) & (target < center + half), axis=1
        )
        res = icp_point_to_point(
            cluster_points,
            target,
            init=matrices[k],
            max_iterations=max_iterations,
            threshold=threshold,
            source_mask=sel > 0,
            target_mask=in_box,
            backend=backend,
        )
        return res.transform

    return jax.vmap(one_cluster)(jnp.arange(num_clusters))
