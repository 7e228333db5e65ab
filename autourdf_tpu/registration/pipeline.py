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
    dispatch_epochs: int = 100     # max epochs per device dispatch (batched driver)
    use_normals: bool = False      # 6-D k-means features (xyz + 0.5*normals)
    corr_every: int = 1            # NN-search refresh period (1 = every epoch,
                                   # reference-exact; >1 = amortized ICP-style)


class SequenceResult(NamedTuple):
    matrices: jax.Array      # (T, K, 4, 4) per-frame cluster poses
    local_points: jax.Array  # (T, N, 3) per-frame points in cluster frames
    labels: jax.Array        # (T, N) int32 cluster assignments
    losses: jax.Array        # (T-1,) best anchor-phase Chamfer per frame pair
    step_losses: jax.Array   # (T-1,) best step-phase Chamfer per frame pair


def _frame_step(model: PoseRegressor, cfg: RegistrationConfig, anchor_points,
                anchor_labels, anchor_mask=None):
    """Build the per-frame-pair body for lax.scan.

    With ``anchor_mask`` given, the scan xs are (target, target_mask) pairs
    and the carry holds the current frame's validity mask — the ragged
    real-scan path (reference mlp_reg.py:424-426 loads variable-length
    frames; here they are sentinel-padded to a fixed capacity)."""

    def body(carry, xs):
        if anchor_mask is None:
            target, target_mask = xs, None
            step_params, anchor_params, matrices, points, labels = carry
            points_mask = None
        else:
            target, target_mask = xs
            (step_params, anchor_params, matrices, points, labels,
             points_mask) = carry

        # --- step phase: current clusters -> next frame
        step_res = train_pose_mlp(
            model, step_params, matrices, target, points, labels,
            target_mask=target_mask, points_mask=points_mask,
            epochs=cfg.epochs, learning_rate=cfg.lr_step,
            stop_patience=cfg.stop_patience,
            scheduler_patience=cfg.scheduler_patience,
            scheduler_factor=cfg.scheduler_factor,
            chamfer_backend=cfg.chamfer_backend,
            corr_every=cfg.corr_every,
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
                target_mask=target_mask, points_mask=anchor_mask,
                epochs=cfg.epochs, learning_rate=cfg.lr_anchor,
                stop_patience=cfg.stop_patience,
                scheduler_patience=cfg.scheduler_patience,
                scheduler_factor=cfg.scheduler_factor,
                chamfer_backend=cfg.chamfer_backend,
                corr_every=cfg.corr_every,
            )
            new_m = anchor_res.best_matrices
            anchor_loss = anchor_res.best_loss
            new_anchor_params = anchor_res.params

        # --- resample: warm-started k-means of the target frame around the
        # updated centers, then re-express points in their cluster frames
        if cfg.use_normals:
            from ..ops.plane import estimate_normals

            feats = jnp.concatenate([target, 0.5 * estimate_normals(target, k=30)], -1)
            init_c = jnp.concatenate(
                [new_m[:, :3, 3], jnp.zeros((new_m.shape[0], 3), target.dtype)], -1
            )
            km = lloyd(feats, init_c, iters=cfg.kmeans_iters, mask=target_mask)
        else:
            km = lloyd(target, new_m[:, :3, 3], iters=cfg.kmeans_iters,
                       mask=target_mask)
        new_labels = km.labels
        new_points = local_points_from_labels(new_m, target, new_labels)

        if anchor_mask is None:
            new_carry = (step_res.params, new_anchor_params, new_m, new_points,
                         new_labels)
        else:
            new_carry = (step_res.params, new_anchor_params, new_m, new_points,
                         new_labels, target_mask)
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
    masks: jax.Array | None = None,
) -> SequenceResult:
    """Register one sequence of frames ``(T, N, 3)`` against shared init.

    ``init`` holds the (shared) frame-0 segmentation; frames[0] must be the
    frame the segmentation came from.  Returns per-frame artifacts with the
    frame-0 state prepended, matching the reference's artifact layout.

    ``masks (T, N)`` marks valid points for ragged (sentinel-padded)
    frames — the real-scan path, where per-frame point counts vary.
    """
    if masks is None:
        body = _frame_step(model, cfg, init.points, init.labels)
        carry0 = (step_params, anchor_params, init.matrices, init.points,
                  init.labels)
        xs = frames[1:]
    else:
        # the mask for init.points is the init's OWN mask (the frame the
        # segmentation came from) — with a shared init, this sequence's
        # masks[0] marks a different row set and would admit sentinels
        init_mask = init.mask if init.mask is not None else masks[0]
        body = _frame_step(model, cfg, init.points, init.labels,
                           anchor_mask=init_mask)
        carry0 = (step_params, anchor_params, init.matrices, init.points,
                  init.labels, init_mask)
        xs = (frames[1:], masks[1:])
    _, (ms, pts, labs, losses, step_losses) = jax.lax.scan(body, carry0, xs)

    matrices = jnp.concatenate([init.matrices[None], ms], axis=0)
    local_points = jnp.concatenate([init.points[None], pts], axis=0)
    labels = jnp.concatenate([init.labels[None], labs], axis=0)
    return SequenceResult(matrices, local_points, labels, losses, step_losses)


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def register_sequences_fused(
    model: PoseRegressor,
    cfg: RegistrationConfig,
    step_params_batch,
    anchor_params_batch,
    init: SegmentInit,
    frames: jax.Array,  # (S, T, N, 3)
    masks: jax.Array | None = None,  # (S, T, N) for ragged frames
) -> SequenceResult:
    """All sequences and all frames as ONE compiled program.

    Maximum fusion — the right shape for directly-attached TPUs.  Behind a
    tunneled/remote device runtime, a single multi-second execution can
    trip dispatch deadlines; use :func:`register_sequences_batched` there
    (identical math, per-phase dispatch).
    """
    if masks is None:
        fn = lambda sp, ap, fr: register_sequence(model, cfg, sp, ap, init, fr)
        return jax.vmap(fn)(step_params_batch, anchor_params_batch, frames)
    fn = lambda sp, ap, fr, mk: register_sequence(model, cfg, sp, ap, init, fr, mk)
    return jax.vmap(fn)(step_params_batch, anchor_params_batch, frames, masks)


@functools.lru_cache(maxsize=16)
def _batched_phases(model: PoseRegressor, cfg: RegistrationConfig):
    """Compiled per-phase programs, cached per (model, cfg).

    The training phase is chunked at ``cfg.dispatch_epochs`` per compiled
    dispatch (resumable TrainCarry stays on device), bounding the duration
    of any single XLA execution for remote/tunneled device runtimes.
    """
    from .optimizer import train_epochs, train_init

    @functools.partial(jax.jit, static_argnames=("lr",))
    def start_phase(params, matrices, lr):
        return jax.vmap(lambda p, m: train_init(p, m, lr))(params, matrices)

    @functools.partial(jax.jit, static_argnames=("num_epochs",))
    def chunk_phase(carry, matrices, target, points, labels, num_epochs):
        def one(c, m, t, pts, lab):
            c2, losses = train_epochs(
                model, c, m, t, pts, lab, num_epochs,
                stop_patience=cfg.stop_patience,
                scheduler_patience=cfg.scheduler_patience,
                scheduler_factor=cfg.scheduler_factor,
                chamfer_backend=cfg.chamfer_backend,
                corr_every=cfg.corr_every,
            )
            return c2
        return jax.vmap(one)(carry, matrices, target, points, labels)

    @functools.partial(jax.jit, static_argnames=("num_epochs",))
    def chunk_phase_masked(carry, matrices, target, points, labels,
                           target_mask, points_mask, num_epochs):
        def one(c, m, t, pts, lab, tm, pm):
            c2, losses = train_epochs(
                model, c, m, t, pts, lab, num_epochs,
                target_mask=tm, points_mask=pm,
                stop_patience=cfg.stop_patience,
                scheduler_patience=cfg.scheduler_patience,
                scheduler_factor=cfg.scheduler_factor,
                chamfer_backend=cfg.chamfer_backend,
                corr_every=cfg.corr_every,
            )
            return c2
        return jax.vmap(one)(carry, matrices, target, points, labels,
                             target_mask, points_mask)

    def train_phase(params, matrices, target, points, labels, lr,
                    target_mask=None, points_mask=None):
        carry = start_phase(params, matrices, lr)
        # chunks must stay multiples of the correspondence-refresh period
        ce = max(1, cfg.corr_every)
        chunk = max(ce, (cfg.dispatch_epochs // ce) * ce)
        remaining = cfg.epochs
        while remaining > 0:
            n = min(chunk, remaining)
            if target_mask is None and points_mask is None:
                carry = chunk_phase(carry, matrices, target, points, labels, n)
            else:
                carry = chunk_phase_masked(carry, matrices, target, points,
                                           labels, target_mask, points_mask, n)
            remaining -= n
        from .optimizer import TrainResult

        return TrainResult(carry.params, carry.best_m, carry.best_loss, None)

    @jax.jit
    def icp_phase(points, labels, matrices, target):
        from ..ops.icp import masked_icp_clusters

        def one(pts, lab, m, t):
            return masked_icp_clusters(
                pts, lab, m, t, num_clusters=cfg.num_seg,
                scale=cfg.icp_box_scale, max_iterations=cfg.icp_iterations,
                backend=cfg.chamfer_backend,
            )
        return jax.vmap(one)(points, labels, matrices, target)

    @jax.jit
    def resample_phase(matrices, target, target_mask=None):
        def one(m, t, tm):
            if cfg.use_normals:
                from ..ops.plane import estimate_normals

                feats = jnp.concatenate([t, 0.5 * estimate_normals(t, k=30)], -1)
                init_c = jnp.concatenate(
                    [m[:, :3, 3], jnp.zeros((m.shape[0], 3), t.dtype)], -1
                )
                km = lloyd(feats, init_c, iters=cfg.kmeans_iters, mask=tm)
            else:
                km = lloyd(t, m[:, :3, 3], iters=cfg.kmeans_iters, mask=tm)
            pts = local_points_from_labels(m, t, km.labels)
            return pts, km.labels
        if target_mask is None:
            return jax.vmap(lambda m, t: one(m, t, None))(matrices, target)
        return jax.vmap(one)(matrices, target, target_mask)

    return train_phase, icp_phase, resample_phase


def register_sequences_batched(
    model: PoseRegressor,
    cfg: RegistrationConfig,
    step_params_batch,
    anchor_params_batch,
    init: SegmentInit,
    frames: jax.Array,  # (S, T, N, 3)
    masks: jax.Array | None = None,  # (S, T, N) for ragged frames
) -> SequenceResult:
    """All sequences batched, dispatched one optimization phase at a time.

    The math is identical to the fused program; the host only sequences
    dispatches (three compiled programs per frame pair: step train, anchor
    train, resample).  All carries are device-resident jax Arrays — no
    host transfers inside the loop — so per-dispatch overhead is
    microseconds while each program stays ~1s, comfortably inside remote
    dispatch deadlines.
    """
    S, T = frames.shape[0], frames.shape[1]
    train_phase, icp_phase, resample_phase = _batched_phases(model, cfg)

    # broadcast shared init across sequences
    tile = lambda x: jnp.broadcast_to(x[None], (S,) + x.shape)
    matrices = tile(init.matrices)
    points = tile(init.points)
    labels = tile(init.labels)
    anchor_points = tile(init.points)
    anchor_labels = tile(init.labels)
    step_params = step_params_batch
    anchor_params = anchor_params_batch

    # init.points came from ONE frame (usually sequence 0's frame 0): its
    # own mask must ride along; per-sequence masks[:, 0] would mark rows
    # valid that are sentinel padding in init.points (the ragged real-scan
    # failure: any sequence whose frame-0 count exceeds the init frame's
    # count trains against 1e6-coordinate sentinels)
    if masks is not None:
        im = init.mask if init.mask is not None else masks[0, 0]
        points_mask = jnp.broadcast_to(im[None], (S,) + im.shape)
    else:
        points_mask = None
    anchor_mask = points_mask

    out_m, out_p, out_l = [matrices], [points], [labels]
    out_loss, out_step_loss = [], []
    for i in range(T - 1):
        target = frames[:, i + 1]
        target_mask = masks[:, i + 1] if masks is not None else None
        step_res = train_phase(step_params, matrices, target, points, labels,
                               lr=cfg.lr_step,
                               target_mask=target_mask, points_mask=points_mask)
        step_params = step_res.params
        if cfg.mlp_icp:
            new_m = icp_phase(points, labels, step_res.best_matrices, target)
            loss = step_res.best_loss
        else:
            anchor_res = train_phase(
                anchor_params, step_res.best_matrices, target,
                anchor_points, anchor_labels, lr=cfg.lr_anchor,
                target_mask=target_mask, points_mask=anchor_mask,
            )
            anchor_params = anchor_res.params
            new_m = anchor_res.best_matrices
            loss = anchor_res.best_loss
        points, labels = resample_phase(new_m, target, target_mask)
        points_mask = target_mask
        matrices = new_m
        out_m.append(matrices)
        out_p.append(points)
        out_l.append(labels)
        out_loss.append(loss)
        out_step_loss.append(step_res.best_loss)

    return SequenceResult(
        matrices=jnp.stack(out_m, axis=1),
        local_points=jnp.stack(out_p, axis=1),
        labels=jnp.stack(out_l, axis=1),
        losses=jnp.stack(out_loss, axis=1),
        step_losses=jnp.stack(out_step_loss, axis=1),
    )


def predicted_world_points(result: SequenceResult, t: int) -> jax.Array:
    """Reconstruct the registered world-frame cloud at frame t."""
    return transform_by_labels(
        result.matrices[t], result.local_points[t], result.labels[t]
    )
