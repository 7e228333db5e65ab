"""Multi-chip scaling via jax.sharding meshes.

The reference is single-process single-GPU; its only parallel structure is
the embarrassingly-parallel sequence loop (mlp_reg.py:434-435).  Here that
structure becomes first-class device parallelism:

- **dp** (sequence axis): independent video sequences shard across chips;
  each chip runs the full fused registration scan for its sequences.  No
  collectives on the hot path — pure data parallelism over the mesh.
- **sp** (point axis): the Chamfer nearest-neighbor search shards the
  reference cloud across chips with ``shard_map``; per-chip partial minima
  combine with an ``lax.pmin`` over ICI, and the directional means with
  ``psum``.  This is how frames larger than one chip's comfortable VMEM
  footprint (dense scans, >100k points) register without host chunking.

Both paths compile against any mesh shape, so a v5e-8 slice runs
(dp=8) or (dp=4, sp=2) by changing one tuple.
"""

from __future__ import annotations

import functools
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
try:  # jax >= 0.7 moved shard_map out of experimental
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(axis_sizes: Sequence[int], axis_names: Sequence[str]) -> Mesh:
    """Mesh over the first prod(axis_sizes) visible devices."""
    n = int(np.prod(axis_sizes))
    devices = np.asarray(jax.devices()[:n]).reshape(tuple(axis_sizes))
    return Mesh(devices, tuple(axis_names))


# ---------------------------------------------------------------------------
# Ambient-mesh registry (explicit opt-in; no jax internals).
#
# ops.chamfer auto-dispatches large clouds to the sharded path when a
# multi-chip mesh with an "sp" axis is active.  "Active" is resolved, in
# order, from (1) this package's own explicit ``mesh_scope`` stack and
# (2) jax's public ambient mesh (``jax.sharding.set_mesh`` /
# ``jax.sharding.get_mesh``).  Earlier rounds probed
# ``jax._src.mesh.thread_resources`` to also catch the legacy
# ``with mesh:`` resource env; that private probe was removed — a jax
# upgrade could silently disable auto-sharding.  ``with mesh_scope(m):``
# also enters ``with m:``, so callers migrating from the legacy idiom
# keep identical pjit semantics.

_MESH_STACK: list[Mesh] = []


class mesh_scope:
    """``with mesh_scope(mesh):`` — activate a mesh for auto-sharding.

    Registers the mesh for :func:`active_mesh` AND enters the mesh's own
    context manager (the legacy pjit resource env), so it is a drop-in
    replacement for ``with mesh:``.
    """

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    def __enter__(self) -> Mesh:
        _MESH_STACK.append(self.mesh)
        self.mesh.__enter__()
        return self.mesh

    def __exit__(self, *exc):
        self.mesh.__exit__(*exc)
        popped = _MESH_STACK.pop()
        assert popped is self.mesh
        return False


def active_mesh() -> Mesh | None:
    """The innermost explicitly-activated mesh, else jax's public ambient
    mesh (``jax.sharding.set_mesh``), else None."""
    if _MESH_STACK:
        return _MESH_STACK[-1]
    get = getattr(jax.sharding, "get_mesh", None)
    if get is not None:
        try:
            m = get()
        except ValueError:
            # raised inside jit tracing ("use get_abstract_mesh") — a
            # concrete device mesh is unknowable there; only the explicit
            # mesh_scope stack (checked above, a trace-time contextvar)
            # can drive auto-sharding from within a traced computation
            return None
        if isinstance(m, Mesh) and not m.empty:
            return m
    return None


def shard_sequences(mesh: Mesh, tree, axis_name: str = "dp"):
    """Place a pytree of (S, ...) arrays with the sequence axis sharded."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def register_sequences_sharded(
    mesh: Mesh,
    model,
    cfg,
    step_params_batch,
    anchor_params_batch,
    init,
    frames: jax.Array,
    axis_name: str = "dp",
):
    """Data-parallel batched registration: sequences sharded over the mesh.

    The per-sequence program is identical to the single-chip path; XLA
    partitions the vmapped computation along the sequence axis with zero
    cross-chip traffic.
    """
    from ..registration.pipeline import register_sequences_batched

    step_params_batch = shard_sequences(mesh, step_params_batch, axis_name)
    anchor_params_batch = shard_sequences(mesh, anchor_params_batch, axis_name)
    frames = shard_sequences(mesh, frames, axis_name)
    init = replicate(mesh, init)
    return register_sequences_batched(
        model, cfg, step_params_batch, anchor_params_batch, init, frames
    )


def sharded_chamfer(
    mesh: Mesh,
    x: jax.Array,  # (N, 3) prediction, replicated
    y: jax.Array,  # (M, 3) target, sharded along points
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    axis_name: str = "sp",
    norm: int = 1,
    backend: str = "auto",
) -> jax.Array:
    """Differentiable Chamfer with the target cloud sharded across chips.

    Each chip runs the same fused bidirectional Pallas NN kernel as the
    single-chip path (ops/knn.py) over its y shard.  x -> y: per-chip
    minima combine with ``pmin``; the differentiable term is rebuilt from
    the winning chip's gathered neighbor (ties broken by lowest chip
    index so each query contributes exactly once).  y -> x: per-shard
    sums combine with ``psum``.  Gradients flow to both x and y, matching
    ``ops.chamfer.chamfer_distance`` exactly.
    """
    from ..ops.chamfer import _apply_mask, _pointwise
    from ..ops.knn import PAD_COORD, nn_search_bidirectional

    n_shards = int(mesh.shape[axis_name])
    n, m = x.shape[0], y.shape[0]

    xs = _apply_mask(x, x_mask)
    ys = _apply_mask(y, y_mask)
    xw = (x_mask.astype(jnp.float32) if x_mask is not None
          else jnp.ones((n,), jnp.float32))

    # pad y to a shard multiple with the far sentinel; padded rows carry
    # zero weight in the y -> x mean
    m_pad = ((m + n_shards - 1) // n_shards) * n_shards
    if m_pad != m:
        ys = jnp.pad(ys, ((0, m_pad - m), (0, 0)), constant_values=PAD_COORD)
    yw = jnp.arange(m_pad) < m
    if y_mask is not None:
        # accept bool OR float masks, like the single-chip path
        ym_b = jnp.pad(y_mask.astype(bool), (0, m_pad - m),
                       constant_values=False)
        yw = yw & ym_b
    yw = yw.astype(jnp.float32)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P(axis_name)),
        out_specs=P(),
    )
    def _cham(x_full, y_shard, x_weight, y_weight):
        return chamfer_collective(
            x_full, y_shard, x_weight, y_weight, axis_name, n_shards,
            norm=norm, backend=backend,
        )

    return _cham(xs, ys, xw, yw)


def _pvary_missing(a, axes):
    """pvary ``a`` over whichever of ``axes`` it does not already vary on
    (pvary itself rejects already-varying axes)."""
    try:
        vma = jax.typeof(a).vma
    except Exception:  # non-traced / older jax: assume invariant
        vma = ()
    missing = tuple(ax for ax in axes if ax not in vma)
    return jax.lax.pvary(a, missing) if missing else a


def train_step_dp_sp(
    mesh: Mesh,
    model,
    params_batch,            # (S, ...) pose-MLP params, S sequences
    matrices_batch: jax.Array,  # (S, K, 4, 4)
    targets: jax.Array,      # (S, M, 3) per-sequence target clouds
    points_batch: jax.Array,  # (S, N, 3) local cluster points
    labels_batch: jax.Array,  # (S, N)
    num_epochs: int = 10,
    lr: float = 2e-4,
):
    """One full training phase on a combined (dp, sp) mesh.

    Sequences shard over "dp" (zero cross-chip traffic between them);
    each sequence's Chamfer target shards over "sp", with the loss and
    its gradient assembled by pmin/psum collectives over the sp rows —
    the layout for frames too large for one chip's comfortable VMEM
    footprint.  The optimizer math is the production train_epochs scan
    (Adam + plateau scheduler + best-tracking), not a simplified twin.

    Requires S % dp == 0 and M % sp == 0 (pad targets with the far
    sentinel to a multiple if needed).  Returns (best_matrices (S,K,4,4),
    best_losses (S,)).
    """
    from ..registration.optimizer import train_epochs, train_init

    dp = int(mesh.shape["dp"])
    sp = int(mesh.shape["sp"])
    S, M = targets.shape[0], targets.shape[1]
    if S % dp or M % sp:
        raise ValueError(
            f"need S % dp == 0 and M % sp == 0, got S={S} dp={dp} M={M} sp={sp}"
        )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("dp"), P("dp"), P("dp", "sp"), P("dp"), P("dp")),
        out_specs=(P("dp"), P("dp")),
    )
    def step(params_b, matrices_b, target_b, points_b, labels_b):
        def one(params, matrices, y_shard, pts, lab):
            xw = jnp.ones((pts.shape[0],), jnp.float32)
            yw = jnp.ones((y_shard.shape[0],), jnp.float32)

            def cham(pred, tgt, pm, tm):
                return chamfer_collective(pred, tgt, xw, yw, "sp", sp)

            carry = train_init(params, matrices, lr)
            # freshly-created carry leaves (inf/0/False scalars, scheduler
            # and Adam state) are device-invariant; the scan body makes
            # them dp-varying, so pre-mark every not-yet-varying leaf for
            # shard_map's vma typing
            carry = jax.tree.map(lambda a: _pvary_missing(a, ("dp",)), carry)
            carry, _ = train_epochs(
                model, carry, matrices, y_shard, pts, lab, num_epochs,
                chamfer_fn=cham,
            )
            return carry.best_m, carry.best_loss

        return jax.vmap(one)(params_b, matrices_b, target_b, points_b, labels_b)

    return step(params_batch, matrices_batch, targets, points_batch, labels_batch)


def chamfer_collective(
    x_full: jax.Array,       # (N, 3) replicated across axis_name
    y_shard: jax.Array,      # (M/shards, 3) this device's target slice
    x_weight: jax.Array,     # (N,) replicated
    y_weight: jax.Array,     # (M/shards,) per-shard
    axis_name: str,
    n_shards: int,
    norm: int = 1,
    backend: str = "auto",
) -> jax.Array:
    """Per-device Chamfer body with ``axis_name`` collectives.

    Callable inside ANY shard_map whose mesh has ``axis_name`` — used by
    :func:`sharded_chamfer` (pure sp) and :func:`train_step_dp_sp`
    (combined dp x sp), so the two paths share one set of collective
    semantics.  Differentiable in both inputs (winner-chip selection on
    stop-gradient minima; see sharded_chamfer docstring).
    """
    from ..ops.chamfer import _pointwise
    from ..ops.knn import nn_search_bidirectional

    dx_l, ix_l, _, iy_l = nn_search_bidirectional(
        jax.lax.stop_gradient(x_full),
        jax.lax.stop_gradient(y_shard),
        norm,
        backend,
    )
    # x -> y: winner-chip selection on the stop-gradient minima, then a
    # differentiable rebuild from the winner's gathered neighbor
    d_local = jax.lax.stop_gradient(dx_l)
    d_global = jax.lax.pmin(d_local, axis_name)
    chip = jax.lax.axis_index(axis_name).astype(jnp.float32)
    cand = jnp.where(d_local <= d_global, chip, jnp.float32(n_shards))
    winner = jax.lax.pmin(cand, axis_name)
    mine = (cand == winner).astype(jnp.float32)
    d_xy = _pointwise(x_full - y_shard[ix_l], norm)
    sum_xy = jax.lax.psum(jnp.sum(d_xy * mine * x_weight), axis_name)
    term_xy = sum_xy / jnp.maximum(jnp.sum(x_weight), 1.0)

    # y -> x: each shard against the replicated x
    d_yx = _pointwise(y_shard - x_full[iy_l], norm)
    sum_yx = jax.lax.psum(jnp.sum(d_yx * y_weight), axis_name)
    cnt_yx = jax.lax.psum(jnp.sum(y_weight), axis_name)
    return term_xy + sum_yx / jnp.maximum(cnt_yx, 1.0)
