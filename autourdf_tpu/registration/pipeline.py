"""Whole-sequence cluster registration as one compiled program.

Rebuilds the reference driver ``match()``
(/root/reference/PointCloud/mlp_reg.py:240-435) with TPU-first structure:

    reference: python frame loop, 2x 300-epoch GPU loops with per-epoch
               host syncs, then GPU->CPU transfer + sklearn k-means +
               CPU->GPU reupload, per frame.
    here:      lax.scan over frame pairs; each step runs the step-phase
               train scan, the anchor-phase train scan, and the warm-started
               k-means resample entirely on device.  One jit compiles the
               whole sequence; vmap batches independent sequences (the
               reference's 5 videos) into one program.

Both MLPs persist across frames (their weights carry through the scan),
matching the reference where ``model`` / ``model_rf`` are created once per
sequence.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..models.regmlp import PoseRegressor
from ..ops.kmeans import lloyd
from .optimizer import train_pose_mlp, transform_by_labels
from .segments import SegmentInit, local_points_from_labels


class RegistrationConfig(NamedTuple):
    num_seg: int = 20
    mode: str = "q"
    hidden_dim: int = 512
    epochs: int = 300
    lr_step: float = 2e-4
    lr_anchor: float = 1e-4
    stop_patience: int = 200
    scheduler_patience: int = 5
    scheduler_factor: float = 0.7
    kmeans_iters: int = 32
    chamfer_backend: str = "auto"
    mlp_icp: bool = False          # step train -> masked per-cluster ICP
    icp_iterations: int = 30
    icp_box_scale: float = 1.2


class SequenceResult(NamedTuple):
    matrices: jax.Array      # (T, K, 4, 4) per-frame cluster poses
    local_points: jax.Array  # (T, N, 3) per-frame points in cluster frames
    labels: jax.Array        # (T, N) int32 cluster assignments
    losses: jax.Array        # (T-1,) best anchor-phase Chamfer per frame pair
    step_losses: jax.Array   # (T-1,) best step-phase Chamfer per frame pair


def _frame_step(model: PoseRegressor, cfg: RegistrationConfig, anchor_points, anchor_labels):
    """Build the per-frame-pair body for lax.scan."""

    def body(carry, target):
        step_params, anchor_params, matrices, points, labels = carry

        # --- step phase: current clusters -> next frame
        step_res = train_pose_mlp(
            model, step_params, matrices, target, points, labels,
            epochs=cfg.epochs, learning_rate=cfg.lr_step,
            stop_patience=cfg.stop_patience,
            scheduler_patience=cfg.scheduler_patience,
            scheduler_factor=cfg.scheduler_factor,
            chamfer_backend=cfg.chamfer_backend,
        )

        if cfg.mlp_icp:
            # --- MLP+ICP variant (mlp_reg.py:298-332): refine each cluster
            # pose with AABB-masked p2p ICP instead of the anchor MLP
            from ..ops.icp import masked_icp_clusters

            new_m = masked_icp_clusters(
                points, labels, step_res.best_matrices, target,
                num_clusters=cfg.num_seg, scale=cfg.icp_box_scale,
                max_iterations=cfg.icp_iterations,
                backend=cfg.chamfer_backend,
            )
            anchor_loss = step_res.best_loss
            new_anchor_params = anchor_params
        else:
            # --- anchor phase: frame-0 clusters -> next frame (drift
            # correction)
            anchor_res = train_pose_mlp(
                model, anchor_params, step_res.best_matrices, target,
                anchor_points, anchor_labels,
                epochs=cfg.epochs, learning_rate=cfg.lr_anchor,
                stop_patience=cfg.stop_patience,
                scheduler_patience=cfg.scheduler_patience,
                scheduler_factor=cfg.scheduler_factor,
                chamfer_backend=cfg.chamfer_backend,
            )
            new_m = anchor_res.best_matrices
            anchor_loss = anchor_res.best_loss
            new_anchor_params = anchor_res.params

        # --- resample: warm-started k-means of the target frame around the
        # updated centers, then re-express points in their cluster frames
        km = lloyd(target, new_m[:, :3, 3], iters=cfg.kmeans_iters)
        new_labels = km.labels
        new_points = local_points_from_labels(new_m, target, new_labels)

        new_carry = (step_res.params, new_anchor_params, new_m, new_points, new_labels)
        out = (new_m, new_points, new_labels, anchor_loss, step_res.best_loss)
        return new_carry, out

    return body


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def register_sequence(
    model: PoseRegressor,
    cfg: RegistrationConfig,
    step_params,
    anchor_params,
    init: SegmentInit,
    frames: jax.Array,
) -> SequenceResult:
    """Register one sequence of frames ``(T, N, 3)`` against shared init.

    ``init`` holds the (shared) frame-0 segmentation; frames[0] must be the
    frame the segmentation came from.  Returns per-frame artifacts with the
    frame-0 state prepended, matching the reference's artifact layout.
    """
    body = _frame_step(model, cfg, init.points, init.labels)
    carry0 = (step_params, anchor_params, init.matrices, init.points, init.labels)
    _, (ms, pts, labs, losses, step_losses) = jax.lax.scan(body, carry0, frames[1:])

    matrices = jnp.concatenate([init.matrices[None], ms], axis=0)
    local_points = jnp.concatenate([init.points[None], pts], axis=0)
    labels = jnp.concatenate([init.labels[None], labs], axis=0)
    return SequenceResult(matrices, local_points, labels, losses, step_losses)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def register_sequences_batched(
    model: PoseRegressor,
    cfg: RegistrationConfig,
    step_params_batch,
    anchor_params_batch,
    init: SegmentInit,
    frames: jax.Array,  # (S, T, N, 3)
) -> SequenceResult:
    """All sequences at once: vmap over the sequence axis, shared init.

    Each sequence gets its own MLP weights (leading axis on the param
    batches); the frame-0 segmentation is shared, as in the reference where
    later sequences load the first sequence's frame-0 artifacts.
    """
    fn = lambda sp, ap, fr: register_sequence(model, cfg, sp, ap, init, fr)
    return jax.vmap(fn)(step_params_batch, anchor_params_batch, frames)


def predicted_world_points(result: SequenceResult, t: int) -> jax.Array:
    """Reconstruct the registered world-frame cloud at frame t."""
    return transform_by_labels(
        result.matrices[t], result.local_points[t], result.labels[t]
    )
