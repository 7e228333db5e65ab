"""Differentiable Chamfer distance on TPU.

Behavioral parity with pytorch3d ``chamfer_distance(x, y, norm=1)`` as used
by the reference registration loop (/root/reference/PointCloud/mlp_reg.py:96)
and evaluation (/root/reference/Sim/evaluation.py:69-82):

    loss = mean_i min_j d(x_i, y_j) + mean_j min_i d(y_j, x_i)

with d the L1 distance for norm=1 and the *squared* L2 distance for norm=2.

Differentiability: the argmin indices come from the non-differentiable
nn_search kernel; the loss is then rebuilt as a gather + norm, which is
exactly the subgradient of the true Chamfer objective (the argmin is
piecewise constant).  Gradients flow to both inputs.

Masks make padded points contribute zero and weight the means by true
counts, so fixed-capacity padded batches keep reference loss semantics.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

from .knn import PAD_COORD as _PAD
from .knn import Norm, nn_min_bidirectional, nn_search, nn_search_bidirectional


def _pointwise(diff: jax.Array, norm: int) -> jax.Array:
    if norm == 1:
        return jnp.sum(jnp.abs(diff), axis=-1)
    return jnp.sum(diff * diff, axis=-1)


def _masked_mean(vals: jax.Array, mask: jax.Array | None) -> jax.Array:
    if mask is None:
        return jnp.mean(vals)
    m = mask.astype(vals.dtype)
    return jnp.sum(vals * m) / jnp.maximum(jnp.sum(m), 1.0)


def _apply_mask(pts: jax.Array, mask: jax.Array | None) -> jax.Array:
    """Move masked-out points to the far sentinel so they are never matched."""
    if mask is None:
        return pts
    from .knn import PAD_COORD

    return jnp.where(mask[:, None], pts, PAD_COORD)


# Auto-shard threshold: with an active multi-chip mesh that has an "sp"
# axis, target clouds at least this large dispatch to the sharded path
# (parallel.sharding.sharded_chamfer) instead of one chip's kernel.
#
# Empirical grounding (r3): an 8-way VIRTUAL CPU mesh sweep
# (M 4k..131k, 4096-point x, warm, 5-rep medians) has the sharded path
# at 0.05x..0.63x of single-device — monotonically approaching but never
# reaching the crossover, because the 8 "chips" share one socket and
# shard_map overhead there is ~3 s.  The virtual mesh validates the
# MECHANISM (bit-equal losses/grads, tests below); the 32768 default is
# set by TPU geometry instead: per-chip kernel time at 32k^2 is
# ~16 x 113 us ~ 1.8 ms (measured 5000^2 scaling) against ~100 us of
# pmin/psum latency on ICI, so sharding pays above roughly this size.
# Override via env for other topologies.
AUTO_SHARD_MIN_M = int(os.environ.get("AUTOURDF_AUTO_SHARD_MIN_M", 32768))


def _active_sp_mesh():
    """The active mesh, if it has a >1 "sp" axis.

    Resolution is explicit and public-API only (parallel.sharding
    ``mesh_scope`` stack, then ``jax.sharding.get_mesh``) — no jax
    internals, so auto-sharding cannot silently break on a jax upgrade.
    Activate with ``with autourdf_tpu.parallel.mesh_scope(mesh):``.
    """
    from ..parallel.sharding import active_mesh

    mesh = active_mesh()
    if mesh is not None and "sp" in mesh.axis_names and int(mesh.shape["sp"]) > 1:
        return mesh
    return None


def chamfer_distance(
    x: jax.Array,
    y: jax.Array,
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    norm: Norm = 1,
    backend: str = "auto",
) -> jax.Array:
    """Symmetric Chamfer loss between ``x (N, 3)`` and ``y (M, 3)``.

    Batched use: ``jax.vmap(chamfer_distance)`` (masks included).

    Inside a ``parallel.mesh_scope(mesh)`` whose mesh has an "sp" axis, large
    target clouds (M >= AUTO_SHARD_MIN_M) automatically shard across the
    mesh; the per-chip compute still runs the fused Pallas kernel.

    Forward-only evaluations read the loss straight off the kernel's
    min-distance outputs (no neighbor gather: measured 118 us vs 198 us
    at 5000^2 on v5e); the gather + rebuild runs only inside the custom
    VJP's backward, where its value feeds the subgradient.  The custom
    VJP supports reverse-mode AD only (jax.grad / value_and_grad — all
    in-tree consumers); for forward-mode (jvp/jacfwd) compose
    nn_search_bidirectional + chamfer_from_indices manually.
    """
    if y.shape[0] >= AUTO_SHARD_MIN_M:
        mesh = _active_sp_mesh()
        if mesh is not None:
            from ..parallel.sharding import sharded_chamfer

            return sharded_chamfer(
                mesh, x, y, x_mask, y_mask, norm=norm, backend=backend
            )

    n, m = x.shape[0], y.shape[0]
    xm = jnp.ones((n,), jnp.float32) if x_mask is None else x_mask.astype(jnp.float32)
    ym = jnp.ones((m,), jnp.float32) if y_mask is None else y_mask.astype(jnp.float32)
    return _chamfer_cvjp(x, y, jax.lax.stop_gradient(xm),
                         jax.lax.stop_gradient(ym), norm, backend)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _chamfer_cvjp(x, y, xm, ym, norm, backend):
    # Primal (forward-only) path: min-only kernel — no argmin bookkeeping.
    # Differentiated calls route through _chamfer_cvjp_fwd instead, which
    # keeps the indexed kernel (the VJP needs the matched neighbors).
    xs = jnp.where(xm[:, None] > 0, x, _PAD)
    ys = jnp.where(ym[:, None] > 0, y, _PAD)
    dx, dy = nn_min_bidirectional(xs, ys, norm, backend)
    return _weighted_mean(dx, xm) + _weighted_mean(dy, ym)


def _weighted_mean(vals, w):
    return jnp.sum(vals * w) / jnp.maximum(jnp.sum(w), 1.0)


def _chamfer_cvjp_fwd(x, y, xm, ym, norm, backend):
    xs = jnp.where(xm[:, None] > 0, x, _PAD)
    ys = jnp.where(ym[:, None] > 0, y, _PAD)
    dx, ix, dy, iy = nn_search_bidirectional(xs, ys, norm, backend)
    loss = _weighted_mean(dx, xm) + _weighted_mean(dy, ym)
    return loss, (x, y, ix, iy, xm, ym)


def _chamfer_cvjp_bwd(norm, backend, res, g):
    x, y, ix, iy, xm, ym = res
    nv = jnp.maximum(jnp.sum(xm), 1.0)
    mv = jnp.maximum(jnp.sum(ym), 1.0)
    diff_x = x - y[ix]                     # (N, 3) matched in the x->y pass
    diff_y = y - x[iy]                     # (M, 3) matched in the y->x pass
    phi_x = jnp.sign(diff_x) if norm == 1 else 2.0 * diff_x
    phi_y = jnp.sign(diff_y) if norm == 1 else 2.0 * diff_y
    wx = (g / nv) * xm[:, None]
    wy = (g / mv) * ym[:, None]
    grad_x = wx * phi_x + jnp.zeros_like(x).at[iy].add(-wy * phi_y)
    grad_y = wy * phi_y + jnp.zeros_like(y).at[ix].add(-wx * phi_x)
    return grad_x, grad_y, jnp.zeros_like(xm), jnp.zeros_like(ym)


_chamfer_cvjp.defvjp(_chamfer_cvjp_fwd, _chamfer_cvjp_bwd)


def chamfer_correspondences(
    x: jax.Array,
    y: jax.Array,
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    norm: Norm = 1,
    backend: str = "auto",
) -> tuple[jax.Array, jax.Array]:
    """Nearest-neighbor index pair ``(ix, iy)`` for the symmetric Chamfer.

    One fused kernel pass; non-differentiable by construction.  Feed the
    result to :func:`chamfer_from_indices` — refreshing correspondences
    every k optimizer epochs instead of every epoch amortizes the search
    (ICP-style), while the gathered loss stays an exact upper bound of the
    true Chamfer that touches it at the refresh epochs.
    """
    xs = jax.lax.stop_gradient(_apply_mask(x, x_mask))
    ys = jax.lax.stop_gradient(_apply_mask(y, y_mask))
    _, ix, _, iy = nn_search_bidirectional(xs, ys, norm, backend)
    return ix, iy


def chamfer_from_indices(
    x: jax.Array,
    y: jax.Array,
    ix: jax.Array,
    iy: jax.Array,
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    norm: Norm = 1,
) -> jax.Array:
    """Differentiable Chamfer value for fixed correspondences.

    With fresh ``(ix, iy)`` this equals :func:`chamfer_distance` exactly;
    with stale indices it upper-bounds it (projected/ICP-style objective).
    """
    d_xy = _pointwise(x - y[ix], norm)
    d_yx = _pointwise(y - x[iy], norm)
    return _masked_mean(d_xy, x_mask) + _masked_mean(d_yx, y_mask)


def _masked_quantile(vals: jax.Array, mask: jax.Array | None,
                     q: float) -> jax.Array:
    """q-quantile of ``vals`` restricted to ``mask`` (nearest-rank)."""
    if mask is None:
        n = vals.shape[0]
        s = jnp.sort(vals)
        return s[int(q * (n - 1))]
    s = jnp.sort(jnp.where(mask > 0, vals, jnp.inf))
    n = jnp.sum(mask > 0)
    idx = jnp.clip((q * (n - 1)).astype(jnp.int32), 0, vals.shape[0] - 1)
    return s[idx]


def chamfer_distance_trunc(
    x: jax.Array,
    y: jax.Array,
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    norm: Norm = 1,
    mult: float = 5.0,
    q: float = 0.5,
    backend: str = "auto",
) -> jax.Array:
    """Truncated (robust) symmetric Chamfer: per-point min distances are
    clipped at ``tau = mult * quantile_q`` of that direction's matched
    distances before the mean.

    Rationale (the occlusion-bias attack, RESULTS.md round-3 findings):
    canonical link clouds are occlusion-incomplete, so raw-frame surface
    with nothing in the model to explain it matches far-away model points
    and pulls weakly-constrained joint axes persistently (directed,
    dir-ratio ~1).  Those wrong matches live in the far tail of the
    matched-distance distribution (cm-scale vs the ~mm converged
    residuals), so clipping at a few times the median removes their
    gradient while leaving true-surface gradients untouched.  ``tau`` is
    stop-gradiented: ``jnp.minimum(d, tau)`` then yields the exact
    subgradient of the truncated objective — zero beyond tau, the plain
    Chamfer subgradient inside.

    Reduces to :func:`chamfer_distance` as ``mult -> inf``.  Costs one
    indexed kernel pass plus the gather rebuild (the tail needs the
    differentiable per-point distances, so the min-only fast path does
    not apply).
    """
    xs = jax.lax.stop_gradient(_apply_mask(x, x_mask))
    ys = jax.lax.stop_gradient(_apply_mask(y, y_mask))
    _, ix, _, iy = nn_search_bidirectional(xs, ys, norm, backend)
    d_xy = _pointwise(x - y[ix], norm)
    d_yx = _pointwise(y - x[iy], norm)
    tau_x = jax.lax.stop_gradient(mult * _masked_quantile(d_xy, x_mask, q))
    tau_y = jax.lax.stop_gradient(mult * _masked_quantile(d_yx, y_mask, q))
    return (_masked_mean(jnp.minimum(d_xy, tau_x), x_mask)
            + _masked_mean(jnp.minimum(d_yx, tau_y), y_mask))


def chamfer_directional(
    x: jax.Array,
    y: jax.Array,
    x_mask: jax.Array | None = None,
    y_mask: jax.Array | None = None,
    norm: Norm = 1,
    backend: str = "auto",
) -> jax.Array:
    """One-directional term ``mean_i min_j d(x_i, y_j)`` (x -> y only)."""
    xs = _apply_mask(x, x_mask)
    ys = _apply_mask(y, y_mask)
    _, ix = nn_search(jax.lax.stop_gradient(xs), jax.lax.stop_gradient(ys), norm, backend)
    return _masked_mean(_pointwise(x - y[ix], norm), x_mask)
