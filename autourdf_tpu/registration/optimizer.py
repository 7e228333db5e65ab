"""Per-frame pose optimization as fused ``lax.scan`` chunks on device.

This is the reference's hot loop (train() at
/root/reference/PointCloud/mlp_reg.py:17-152) redesigned for TPU: Adam
epochs — MLP forward, label-gathered cluster transform, Chamfer-L1,
backward, Adam, ReduceLROnPlateau, best-pose tracking and early-stop
freeze — run inside compiled scans with zero host round trips.  The
reference syncs to host every epoch (``loss.item()``); here the only
transfer is the final result.

The epoch loop is *resumable*: ``train_init`` builds a device-resident
carry, ``train_epochs`` advances it by a fixed chunk, ``train_finalize``
extracts the result.  ``train_pose_mlp`` composes them into one program;
drivers that must bound single-dispatch duration (remote/tunneled device
runtimes) call ``train_epochs`` several times instead — identical math,
same compiled chunk reused.

Semantics matched to the reference:
- loss is evaluated *before* the parameter update each epoch, and the best
  (loss, poses) pair over all epochs is returned;
- Adam(lr) with torch defaults; ReduceLROnPlateau(mode=min, factor=0.7,
  patience=5, rel threshold 1e-4);
- early stop after ``stop_patience`` epochs without a new best: later
  epochs freeze (carry passes through) so trajectories match the
  reference's break.

Cluster layout: the frame's points stay flat ``(N, 3)`` with an int32
label per point; transforming "each cluster by its pose" is one gather +
batched rotate — no ragged per-cluster tensors, no padding waste.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ops.chamfer import (
    chamfer_correspondences,
    chamfer_distance,
    chamfer_from_indices,
)

_einsum = functools.partial(jnp.einsum, precision="highest")


def apply_pose_rows(rows: jax.Array, points: jax.Array, labels: jax.Array) -> jax.Array:
    """Per-point affine apply of per-cluster (K, 3, 4) pose rows.

    The per-point pose selection is a one-hot matmul, NOT a gather: the
    gather's backward is a serialized scatter-add that XLA lowers ~500x
    slower on TPU (70 ms vs 130 us per gradient step at N=5000, K=20,
    measured on v5e) — slow enough that the reference-scale training
    program exceeded remote-dispatch deadlines.  One-hot keeps both the
    forward and the backward on the MXU.
    """
    k = rows.shape[0]
    oh = jax.nn.one_hot(labels, k, dtype=points.dtype)          # (N, K)
    flat = rows.reshape(k, 12)
    sel = _einsum("nk,kj->nj", oh, flat).reshape(-1, 3, 4)      # (N, 3, 4)
    return jnp.sum(sel[:, :, :3] * points[:, None, :], axis=-1) + sel[:, :, 3]


def transform_by_labels(matrices: jax.Array, points: jax.Array, labels: jax.Array) -> jax.Array:
    """World points: ``R[label] @ p + t[label]`` for flat (N, 3) + (N,) labels.

    Equivalent to the reference's per-cluster loop ``calculate_pc``
    (mlp_reg.py:155-170) followed by concatenation.
    """
    return apply_pose_rows(matrices[:, :3, :], points, labels)


class AdamState(NamedTuple):
    mu: jax.Array
    nu: jax.Array
    step: jax.Array


def adam_init(params) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(zeros, jax.tree.map(jnp.zeros_like, params), jnp.zeros((), jnp.int32))


def adam_update(grads, state: AdamState, params, lr, b1=0.9, b2=0.999, eps=1e-8):
    step = state.step + 1
    mu = jax.tree.map(lambda m, g: b1 * m + (1 - b1) * g, state.mu, grads)
    nu = jax.tree.map(lambda v, g: b2 * v + (1 - b2) * g * g, state.nu, grads)
    t = step.astype(jnp.float32)
    bc1 = 1 - b1**t
    bc2 = 1 - b2**t
    new_params = jax.tree.map(
        lambda p, m, v: p - lr * (m / bc1) / (jnp.sqrt(v / bc2) + eps), params, mu, nu
    )
    return new_params, AdamState(mu, nu, step)


class PlateauState(NamedTuple):
    best: jax.Array      # scheduler-tracked best loss
    num_bad: jax.Array   # epochs since scheduler best
    lr: jax.Array


def plateau_init(lr: float) -> PlateauState:
    return PlateauState(
        jnp.asarray(jnp.inf, jnp.float32), jnp.zeros((), jnp.int32), jnp.asarray(lr, jnp.float32)
    )


def plateau_update(state: PlateauState, loss, factor=0.7, patience=5, threshold=1e-4):
    """torch ReduceLROnPlateau (mode=min, rel threshold) semantics."""
    improved = loss < state.best * (1.0 - threshold)
    best = jnp.where(improved, loss, state.best)
    num_bad = jnp.where(improved, 0, state.num_bad + 1)
    reduce = num_bad > patience
    lr = jnp.where(reduce, state.lr * factor, state.lr)
    num_bad = jnp.where(reduce, 0, num_bad)
    return PlateauState(best, num_bad, lr)


class TrainCarry(NamedTuple):
    params: object
    opt: AdamState
    sched: PlateauState
    best_loss: jax.Array
    best_m: jax.Array
    bad_count: jax.Array
    stopped: jax.Array


class TrainResult(NamedTuple):
    params: object            # final MLP params (carried to the next frame)
    best_matrices: jax.Array  # (K, 4, 4) best poses found
    best_loss: jax.Array      # scalar
    loss_history: jax.Array   # (epochs,) per-epoch losses (inf past early stop)


def train_init(params, matrices: jax.Array, learning_rate: float) -> TrainCarry:
    return TrainCarry(
        params=params,
        opt=adam_init(params),
        sched=plateau_init(learning_rate),
        best_loss=jnp.asarray(jnp.inf, jnp.float32),
        best_m=matrices,
        bad_count=jnp.zeros((), jnp.int32),
        stopped=jnp.asarray(False),
    )


def train_epochs(
    model,
    carry: TrainCarry,
    matrices: jax.Array,
    target: jax.Array,
    points: jax.Array,
    labels: jax.Array,
    num_epochs: int,
    target_mask: jax.Array | None = None,
    points_mask: jax.Array | None = None,
    stop_patience: int = 200,
    scheduler_patience: int = 5,
    scheduler_factor: float = 0.7,
    chamfer_backend: str = "auto",
    corr_every: int = 1,
    chamfer_fn=None,
) -> tuple[TrainCarry, jax.Array]:
    """Advance the optimization by ``num_epochs``; returns (carry, losses).

    ``chamfer_fn(pred, target, points_mask, target_mask) -> loss``
    overrides the loss (corr_every == 1 only) — the hook the dp x sp
    sharded trainer uses to substitute the collective Chamfer
    (parallel.sharding.chamfer_collective) inside a shard_map.

    ``corr_every > 1`` amortizes the nearest-neighbor search ICP-style:
    correspondences refresh once per round of ``corr_every`` epochs and the
    intermediate epochs optimize the gathered (projected) Chamfer — an
    exact upper bound that touches the true loss at each refresh.  The
    structure is a nested scan, not ``lax.cond``, so it stays efficient
    under the sequence-axis ``vmap`` (cond lowers to select there and
    would run the search every epoch anyway).
    """

    def make_epoch_step(grad_fn):
        def epoch_step(c: TrainCarry, _):
            (loss, m2), grads = grad_fn(c.params)

            improved = loss < c.best_loss
            best_loss = jnp.where(improved, loss, c.best_loss)
            best_m = jnp.where(improved, m2, c.best_m)
            bad_count = jnp.where(improved, 0, c.bad_count + 1)
            stop_now = bad_count > stop_patience

            # torch ordering: optimizer.step() runs with the current lr, then
            # scheduler.step(loss) — a plateau reduction takes effect NEXT epoch
            new_params, opt = adam_update(grads, c.opt, c.params, c.sched.lr)
            sched = plateau_update(c.sched, loss, scheduler_factor, scheduler_patience)

            # Early-stop freeze: past the stop point, carry passes through
            # unchanged (matches the reference's loop break).
            frozen = c.stopped

            def keep_old(new, old):
                return jax.tree.map(lambda n, o: jnp.where(frozen, o, n), new, old)

            out = TrainCarry(
                params=keep_old(new_params, c.params),
                opt=keep_old(opt, c.opt),
                sched=keep_old(sched, c.sched),
                best_loss=jnp.where(frozen, c.best_loss, best_loss),
                best_m=jnp.where(frozen, c.best_m, best_m),
                bad_count=jnp.where(frozen, c.bad_count, bad_count),
                stopped=jnp.logical_or(frozen, stop_now),
            )
            return out, jnp.where(frozen, jnp.inf, loss)

        return epoch_step

    def predict(p):
        m2 = model.apply(p, matrices)
        return m2, transform_by_labels(m2, points, labels)

    if corr_every <= 1:
        if chamfer_fn is None:
            def chamfer_fn(pred, tgt, pm, tm):
                return chamfer_distance(pred, tgt, pm, tm, norm=1,
                                        backend=chamfer_backend)

        def loss_fn(p):
            m2, pred = predict(p)
            loss = chamfer_fn(pred, target, points_mask, target_mask)
            return loss, m2

        epoch_step = make_epoch_step(jax.value_and_grad(loss_fn, has_aux=True))
        return jax.lax.scan(epoch_step, carry, None, length=num_epochs)

    if chamfer_fn is not None:
        raise ValueError("chamfer_fn override requires corr_every == 1")

    if num_epochs % corr_every != 0:
        raise ValueError(
            f"num_epochs={num_epochs} must be a multiple of corr_every={corr_every}"
        )

    def round_step(c: TrainCarry, _):
        _, pred0 = predict(c.params)
        ix, iy = chamfer_correspondences(
            pred0, target, points_mask, target_mask, norm=1,
            backend=chamfer_backend,
        )

        def loss_fn(p):
            m2, pred = predict(p)
            loss = chamfer_from_indices(
                pred, target, ix, iy, points_mask, target_mask, norm=1
            )
            return loss, m2

        epoch_step = make_epoch_step(jax.value_and_grad(loss_fn, has_aux=True))
        return jax.lax.scan(epoch_step, c, None, length=corr_every)

    carry, losses = jax.lax.scan(
        round_step, carry, None, length=num_epochs // corr_every
    )
    return carry, losses.reshape(-1)


def train_finalize(carry: TrainCarry, losses: jax.Array) -> TrainResult:
    return TrainResult(carry.params, carry.best_m, carry.best_loss, losses)


def train_pose_mlp(
    model,
    params,
    matrices: jax.Array,
    target: jax.Array,
    points: jax.Array,
    labels: jax.Array,
    target_mask: jax.Array | None = None,
    points_mask: jax.Array | None = None,
    epochs: int = 300,
    learning_rate: float = 2e-4,
    stop_patience: int = 200,
    scheduler_patience: int = 5,
    scheduler_factor: float = 0.7,
    chamfer_backend: str = "auto",
    corr_every: int = 1,
) -> TrainResult:
    """Optimize the pose MLP against one target frame; fully jittable.

    Args mirror the reference train(): ``matrices`` are the incoming
    (K, 4, 4) poses (the MLP input every epoch — the reference re-clones
    ``m`` each epoch, it never feeds back its own output), ``points`` +
    ``labels`` are the flat local-frame cluster points, ``target`` is the
    next frame's cloud.
    """
    carry = train_init(params, matrices, learning_rate)
    carry, losses = train_epochs(
        model, carry, matrices, target, points, labels, epochs,
        target_mask, points_mask, stop_patience,
        scheduler_patience, scheduler_factor, chamfer_backend, corr_every,
    )
    return train_finalize(carry, losses)
