"""RANSAC plane segmentation + PCA normal estimation, on device.

Replaces Open3D's ``segment_plane`` (ground removal in the capture path,
/root/reference/Sim/sim_data.py:314-319) and
``estimate_normals`` (normal-augmented clustering,
/root/reference/PointCloud/cluster_icp.py:50 and mlp_reg.py:191-202).
RANSAC hypotheses are evaluated in one batched pass (all candidate planes
scored simultaneously on the VPU) instead of a sequential loop.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .knn import nn_search


@functools.partial(jax.jit, static_argnames=("num_iterations",))
def segment_plane(
    points: jax.Array,
    key: jax.Array,
    distance_threshold: float = 0.001,
    num_iterations: int = 1000,
) -> tuple[jax.Array, jax.Array]:
    """Dominant plane by RANSAC: returns (plane (4,), inlier_mask (N,)).

    All ``num_iterations`` 3-point hypotheses are scored in one batched
    computation — no data-dependent loop.
    """
    n = points.shape[0]
    idx = jax.random.randint(key, (num_iterations, 3), 0, n)
    p0 = points[idx[:, 0]]
    p1 = points[idx[:, 1]]
    p2 = points[idx[:, 2]]
    normal = jnp.cross(p1 - p0, p2 - p0)  # (I, 3)
    norm = jnp.linalg.norm(normal, axis=1, keepdims=True)
    normal = normal / jnp.maximum(norm, 1e-12)
    d = -jnp.sum(normal * p0, axis=1)  # (I,)

    # distances of all points to all candidate planes: (I, N)
    dist = jnp.abs(points @ normal.T + d[None, :]).T
    counts = jnp.sum(dist < distance_threshold, axis=1)
    # degenerate (collinear) samples never win
    counts = jnp.where(norm[:, 0] > 1e-9, counts, -1)
    best = jnp.argmax(counts)
    best_normal = normal[best]
    best_d = d[best]
    inliers = jnp.abs(points @ best_normal + best_d) < distance_threshold
    return jnp.concatenate([best_normal, best_d[None]]), inliers


@functools.partial(jax.jit, static_argnames=("k", "backend"))
def estimate_normals(
    points: jax.Array, k: int = 30, backend: str = "auto"
) -> jax.Array:
    """Per-point unit normals from PCA over the k nearest neighbors.

    Neighbor sets come from k sequential nearest-excluding passes is too
    slow; instead we take the k smallest of a tiled distance computation
    via repeated nn_search with masking-free top-k over chunks — here
    simply a full top-k on moderate N (<= ~20k points, the reference's
    normal-estimation use sites).
    """
    n = points.shape[0]
    # pairwise distances in chunks to bound memory
    def chunk_topk(xb):
        d = jnp.sum((xb[:, None, :] - points[None, :, :]) ** 2, axis=-1)
        _, idx = jax.lax.top_k(-d, k)
        return idx

    chunk = 1024
    pad = (-n) % chunk
    xp = jnp.pad(points, ((0, pad), (0, 0)))
    idx = jax.lax.map(chunk_topk, xp.reshape(-1, chunk, 3)).reshape(-1, k)[:n]

    neigh = points[idx]  # (N, k, 3)
    mean = jnp.mean(neigh, axis=1, keepdims=True)
    centered = neigh - mean
    cov = jnp.einsum("nki,nkj->nij", centered, centered, precision="highest")
    # smallest-eigenvalue eigenvector of each 3x3 covariance
    _, vecs = jnp.linalg.eigh(cov)
    normals = vecs[..., 0]
    # orient consistently outward-ish: toward +z hemisphere by default
    flip = normals[:, 2:3] < 0
    return jnp.where(flip, -normals, normals)
