"""Dual-quaternion SE(3) parameterization in pure JAX.

TPU-native rebuild of /root/reference/PointCloud/dq_func.py (behavioral
parity, new math stack).  A dual quaternion is stored as ``(..., 8)`` =
``[real(wxyz), dual(wxyz)]``.  Rigid transform with rotation quaternion q
and translation t maps to ``real = q``, ``dual = 0.5 * (0, t) * q``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import rotations as R
from . import se3


def from_quat_trans(q: jax.Array, t: jax.Array) -> jax.Array:
    """(..., 4) quat + (..., 3) translation -> (..., 8) dual quaternion."""
    t_quat = jnp.concatenate([jnp.zeros_like(t[..., :1]), t], axis=-1)
    dual = 0.5 * R.quat_multiply(t_quat, q)
    return jnp.concatenate([q, dual], axis=-1)


def from_rot_trans(rot: jax.Array, t: jax.Array) -> jax.Array:
    return from_quat_trans(R.matrix_to_quat(rot), t)


def from_transform(T: jax.Array) -> jax.Array:
    return from_rot_trans(se3.rot_of(T), se3.trans_of(T))


def to_quat_trans(dq: jax.Array) -> tuple[jax.Array, jax.Array]:
    real, dual = dq[..., :4], dq[..., 4:]
    t = 2.0 * R.quat_multiply(dual, R.quat_invert(real))
    return real, t[..., 1:]


def to_rot_trans(dq: jax.Array) -> tuple[jax.Array, jax.Array]:
    q, t = to_quat_trans(dq)
    return R.quat_to_matrix(q), t


def to_transform(dq: jax.Array) -> jax.Array:
    rot, t = to_rot_trans(dq)
    return se3.make_transform(rot, t)


def multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    ar, ad = a[..., :4], a[..., 4:]
    br, bd = b[..., :4], b[..., 4:]
    real = R.quat_multiply(ar, br)
    dual = R.quat_multiply(ar, bd) + R.quat_multiply(ad, br)
    return jnp.concatenate([real, dual], axis=-1)


def conjugate(dq: jax.Array) -> jax.Array:
    return jnp.concatenate(
        [R.quat_conjugate(dq[..., :4]), R.quat_conjugate(dq[..., 4:])], axis=-1
    )


def invert(dq: jax.Array) -> jax.Array:
    """Inverse of a (not necessarily unit) dual quaternion.

    Matches dq_func.dualquat_invert: real* / |real|^2 for the real part and
    the corresponding first-order dual correction.
    """
    eps = jnp.finfo(dq.dtype).eps
    real, dual = dq[..., :4], dq[..., 4:]
    n2 = jnp.maximum(jnp.sum(real * real, axis=-1, keepdims=True), eps)
    real_conj = R.quat_conjugate(real)
    inv_real = real_conj / n2
    inv_dual = -R.quat_multiply(R.quat_multiply(inv_real, dual), inv_real)
    return jnp.concatenate([inv_real, inv_dual], axis=-1)


def normalize(dq: jax.Array, eps: float = 1e-12) -> jax.Array:
    """Project onto unit dual quaternions: |real|=1 and real . dual = 0."""
    real, dual = dq[..., :4], dq[..., 4:]
    n = jnp.maximum(jnp.linalg.norm(real, axis=-1, keepdims=True), eps)
    real = real / n
    dual = dual / n
    dual = dual - jnp.sum(real * dual, axis=-1, keepdims=True) * real
    return jnp.concatenate([real, dual], axis=-1)


def from_point(p: jax.Array) -> jax.Array:
    """Point -> dual quaternion (identity rotation + translation p)."""
    unit = jnp.zeros(p.shape[:-1] + (4,), dtype=p.dtype).at[..., 0].set(1.0)
    zeros = jnp.zeros_like(p[..., :1])
    return jnp.concatenate([unit, zeros, p], axis=-1)


def transform_points(dq: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply dual quaternion(s) (..., 8) to points (..., N, 3)."""
    rot, t = to_rot_trans(dq)
    return jnp.einsum("...ij,...nj->...ni", rot, pts) + t[..., None, :]
