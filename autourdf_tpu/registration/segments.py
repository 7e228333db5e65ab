"""Initial cluster segmentation of frame 0.

Rebuilds Segments.k_means_cluster (/root/reference/PointCloud/cluster_icp.py:47-107):
k-means++ over the first frame's points into ``num_seg`` clusters, each
cluster given an identity-rotation coordinate frame at its centroid, and
points expressed in that local frame.  Device-resident, flat layout
(points + labels) instead of ragged per-cluster lists.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.kmeans import kmeans
from .optimizer import transform_by_labels


class SegmentInit(NamedTuple):
    matrices: jax.Array  # (K, 4, 4) identity-rotation frames at centroids
    points: jax.Array    # (N, 3) frame-0 points in their cluster's local frame
    labels: jax.Array    # (N,) int32 cluster assignment
    # validity mask for ``points`` (ragged frames).  This is THE mask that
    # must accompany these points everywhere: when the init is shared
    # across sequences, another sequence's frame-0 mask marks a different
    # set of rows valid and would let sentinel-padded rows into the loss.
    mask: jax.Array | None = None


def local_points_from_labels(
    matrices: jax.Array, world_points: jax.Array, labels: jax.Array
) -> jax.Array:
    """Map world points into their assigned cluster's local frame."""
    from ..core import se3
    from .optimizer import apply_pose_rows

    inv = se3.inverse(matrices)
    return apply_pose_rows(inv[:, :3, :], world_points, labels)


def initial_segments(
    key: jax.Array,
    frame0: jax.Array,
    num_seg: int,
    mask: jax.Array | None = None,
    kmeans_iters: int = 64,
    n_init: int = 4,
    use_normals: bool = False,
    seed_mode: str = "kmeans++",
) -> SegmentInit:
    """``use_normals`` augments the k-means features with 0.5-scaled PCA
    normals (the reference's --normal mode, cluster_icp.py:47-63).
    ``seed_mode="fps"`` seeds density-independently (ops.kmeans docs) so
    small links are guaranteed cluster coverage."""
    if use_normals:
        from ..ops.plane import estimate_normals

        normals = estimate_normals(frame0, k=30)
        feats = jnp.concatenate([frame0, 0.5 * normals], axis=-1)
        res = kmeans(key, feats, num_seg, iters=kmeans_iters, mask=mask,
                     n_init=n_init, seed_mode=seed_mode)
        res = res._replace(centers=res.centers[:, :3])
    else:
        res = kmeans(key, frame0, num_seg, iters=kmeans_iters, mask=mask,
                     n_init=n_init, seed_mode=seed_mode)
    # cluster frames: identity rotation at the *mean of member points*
    # (reference recomputes the mean rather than using the k-means center —
    # identical at convergence, but keep the same definition)
    centers = res.centers
    eye = jnp.tile(jnp.eye(4, dtype=frame0.dtype), (num_seg, 1, 1))
    matrices = eye.at[:, :3, 3].set(centers)
    local = frame0 - centers[res.labels]
    return SegmentInit(matrices, local, res.labels, mask)


def world_points(seg_matrices: jax.Array, points: jax.Array, labels: jax.Array) -> jax.Array:
    return transform_by_labels(seg_matrices, points, labels)
