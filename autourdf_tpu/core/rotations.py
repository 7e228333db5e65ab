"""Rotation representation conversions in pure JAX.

TPU-native replacement for the pytorch3d.transforms subset used by the
reference (see /root/reference/PointCloud/mlp_reg.py:13 and
/root/reference/PointCloud/dq_func.py:2).  All quaternions follow the
``(w, x, y, z)`` real-first convention, matching the behavior the
reference inherits from pytorch3d.

Every function is shape-polymorphic over leading batch dimensions and is
safe to ``jit`` / ``vmap`` / differentiate.  Matrix -> quaternion uses a
branch-free formulation (all four candidate solutions computed, the
best-conditioned one selected with ``where``) so it maps onto the VPU
without data-dependent control flow.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# Small 3x3/4x4 products must be exact f32 even on TPU, where the default
# matmul precision is bf16; the MXU-bound kernels pick their own precision.
_mm = functools.partial(jnp.matmul, precision="highest")


def quat_multiply(a: jax.Array, b: jax.Array) -> jax.Array:
    """Hamilton product of quaternions ``a * b``, both ``(..., 4)`` wxyz."""
    aw, ax, ay, az = jnp.moveaxis(a, -1, 0)
    bw, bx, by, bz = jnp.moveaxis(b, -1, 0)
    return jnp.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def quat_conjugate(q: jax.Array) -> jax.Array:
    """Conjugate ``(w, -x, -y, -z)`` of a ``(..., 4)`` quaternion."""
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def quat_invert(q: jax.Array) -> jax.Array:
    """Inverse of a (not necessarily unit) quaternion."""
    norm_sq = jnp.sum(q * q, axis=-1, keepdims=True)
    return quat_conjugate(q) / jnp.maximum(norm_sq, jnp.finfo(q.dtype).tiny)


def quat_normalize(q: jax.Array, eps: float = 1e-12) -> jax.Array:
    n = jnp.linalg.norm(q, axis=-1, keepdims=True)
    return q / jnp.maximum(n, eps)


def quat_standardize(q: jax.Array) -> jax.Array:
    """Flip sign so the real part is non-negative (q and -q are the same rotation)."""
    return jnp.where(q[..., :1] < 0, -q, q)


def quat_to_matrix(q: jax.Array) -> jax.Array:
    """Unit-norm-insensitive quaternion -> rotation matrix, ``(..., 4) -> (..., 3, 3)``."""
    q = quat_normalize(q)
    w, x, y, z = jnp.moveaxis(q, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1 - 2 * (yy + zz), 2 * (xy - wz), 2 * (xz + wy),
            2 * (xy + wz), 1 - 2 * (xx + zz), 2 * (yz - wx),
            2 * (xz - wy), 2 * (yz + wx), 1 - 2 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(q.shape[:-1] + (3, 3))


def matrix_to_quat(m: jax.Array) -> jax.Array:
    """Rotation matrix -> unit quaternion (w >= 0), branch-free.

    Computes all four Shepperd candidates and selects the one keyed on the
    largest diagonal combination; numerically stable for every rotation.
    """
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    tr = m00 + m11 + m22
    # Four squared-magnitude candidates (4*w^2, 4*x^2, 4*y^2, 4*z^2 offsets).
    q_abs_sq = jnp.stack(
        [1.0 + tr, 1.0 + m00 - m11 - m22, 1.0 - m00 + m11 - m22, 1.0 - m00 - m11 + m22],
        axis=-1,
    )
    q_abs = jnp.sqrt(jnp.maximum(q_abs_sq, 0.0))

    # Candidate quaternions, each scaled by its own 2*q_abs component.
    cand_w = jnp.stack([q_abs_sq[..., 0], m21 - m12, m02 - m20, m10 - m01], axis=-1)
    cand_x = jnp.stack([m21 - m12, q_abs_sq[..., 1], m01 + m10, m02 + m20], axis=-1)
    cand_y = jnp.stack([m02 - m20, m01 + m10, q_abs_sq[..., 2], m12 + m21], axis=-1)
    cand_z = jnp.stack([m10 - m01, m20 + m02, m21 + m12, q_abs_sq[..., 3]], axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)  # (..., 4cand, 4)

    denom = 2.0 * jnp.maximum(q_abs, 0.1)[..., None]  # floor avoids div-by-~0 off-branch
    cands = cands / denom

    best = jnp.argmax(q_abs_sq, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None].repeat(4, -1), axis=-2)[..., 0, :]
    return quat_standardize(quat_normalize(q))


def quat_rotate(q: jax.Array, v: jax.Array) -> jax.Array:
    """Rotate vectors ``v (..., 3)`` by quaternions ``q (..., 4)``."""
    qv = jnp.concatenate([jnp.zeros_like(v[..., :1]), v], axis=-1)
    return quat_multiply(quat_multiply(q, qv), quat_conjugate(q))[..., 1:]


# ---------------------------------------------------------------------------
# Euler angles (XYZ intrinsic, matching pytorch3d's "XYZ" convention used at
# /root/reference/PointCloud/mlp_reg.py:72-75)
# ---------------------------------------------------------------------------

def _axis_rot(angle: jax.Array, axis: int) -> jax.Array:
    c, s = jnp.cos(angle), jnp.sin(angle)
    one, zero = jnp.ones_like(c), jnp.zeros_like(c)
    if axis == 0:
        rows = [one, zero, zero, zero, c, -s, zero, s, c]
    elif axis == 1:
        rows = [c, zero, s, zero, one, zero, -s, zero, c]
    else:
        rows = [c, -s, zero, s, c, zero, zero, zero, one]
    return jnp.stack(rows, axis=-1).reshape(angle.shape + (3, 3))


def euler_to_matrix(euler: jax.Array) -> jax.Array:
    """Intrinsic XYZ euler angles ``(..., 3)`` -> rotation matrix ``(..., 3, 3)``."""
    rx = _axis_rot(euler[..., 0], 0)
    ry = _axis_rot(euler[..., 1], 1)
    rz = _axis_rot(euler[..., 2], 2)
    return _mm(_mm(rx, ry), rz)


def matrix_to_euler(m: jax.Array) -> jax.Array:
    """Rotation matrix -> intrinsic XYZ euler angles ``(..., 3)``."""
    # R = Rx(a) Ry(b) Rz(c):
    #   R[0,2] = sin(b); R[1,2] = -cos(b) sin(a); R[2,2] = cos(a) cos(b)
    #   R[0,1] = -cos(b) sin(c); R[0,0] = cos(b) cos(c)
    b = jnp.arcsin(jnp.clip(m[..., 0, 2], -1.0, 1.0))
    a = jnp.arctan2(-m[..., 1, 2], m[..., 2, 2])
    c = jnp.arctan2(-m[..., 0, 1], m[..., 0, 0])
    return jnp.stack([a, b, c], axis=-1)


# ---------------------------------------------------------------------------
# 6D rotation representation (Zhou et al., used by the reference via
# pytorch3d matrix_to_rotation_6d / rotation_6d_to_matrix)
# ---------------------------------------------------------------------------

def matrix_to_rot6d(m: jax.Array) -> jax.Array:
    """First two rows of the rotation matrix, flattened to ``(..., 6)``."""
    return m[..., :2, :].reshape(m.shape[:-2] + (6,))


def rot6d_to_matrix(r6: jax.Array) -> jax.Array:
    """Gram-Schmidt the two 3-vectors back into a rotation matrix."""
    a1 = r6[..., 0:3]
    a2 = r6[..., 3:6]
    b1 = a1 / jnp.maximum(jnp.linalg.norm(a1, axis=-1, keepdims=True), 1e-12)
    a2_proj = a2 - jnp.sum(b1 * a2, axis=-1, keepdims=True) * b1
    b2 = a2_proj / jnp.maximum(jnp.linalg.norm(a2_proj, axis=-1, keepdims=True), 1e-12)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-2)


# ---------------------------------------------------------------------------
# Axis-angle / rotation vectors (replaces roma.rotmat_to_rotvec and the
# rotvec geodesic distance at /root/reference/PointCloud/coord_map.py:261-267)
# ---------------------------------------------------------------------------

def matrix_to_rotvec(m: jax.Array) -> jax.Array:
    """Rotation matrix -> rotation vector (axis * angle), via quaternion log."""
    q = matrix_to_quat(m)
    return quat_to_rotvec(q)


def quat_to_rotvec(q: jax.Array) -> jax.Array:
    q = quat_standardize(quat_normalize(q))
    w = jnp.clip(q[..., 0], -1.0, 1.0)
    v = q[..., 1:]
    sin_half = _safe_norm(v)
    angle = 2.0 * jnp.arctan2(sin_half[..., 0], w)[..., None]
    # sinc-safe scale: angle / sin(angle/2); for tiny angles -> 2.
    scale = jnp.where(sin_half > 1e-7, angle / sin_half, 2.0)
    return v * scale


def _safe_norm(x: jax.Array, axis=-1, keepdims=True, tiny: float = 1e-24) -> jax.Array:
    """sqrt(max(sum x^2, tiny)) — finite value AND gradient at x == 0.

    A plain ``linalg.norm`` has a NaN gradient at zero, and even inside the
    untaken branch of a ``where`` that NaN leaks into the cotangent
    (0 * NaN == NaN); this form keeps every branch NaN-free.
    """
    sq = jnp.sum(x * x, axis=axis, keepdims=keepdims)
    return jnp.sqrt(jnp.maximum(sq, tiny))


def rotvec_to_quat(rv: jax.Array) -> jax.Array:
    angle = _safe_norm(rv)
    half = 0.5 * angle
    # sin(x/2)/x; both branches finite and NaN-free everywhere
    k = jnp.where(angle > 1e-7, jnp.sin(half) / angle, 0.5)
    return jnp.concatenate([jnp.cos(half), rv * k], axis=-1)


def rotvec_to_matrix(rv: jax.Array) -> jax.Array:
    return quat_to_matrix(rotvec_to_quat(rv))


def rotmat_geodesic_distance(r1: jax.Array, r2: jax.Array) -> jax.Array:
    """Angle of r1^T r2 in radians (roma.rotmat_geodesic_distance equivalent)."""
    rel = _mm(jnp.swapaxes(r1, -1, -2), r2)
    tr = rel[..., 0, 0] + rel[..., 1, 1] + rel[..., 2, 2]
    return jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0))


def rotvec_geodesic_distance(rv1: jax.Array, rv2: jax.Array) -> jax.Array:
    """Geodesic angle between two rotations given as rotation vectors."""
    q1, q2 = rotvec_to_quat(rv1), rotvec_to_quat(rv2)
    rel = quat_multiply(quat_conjugate(q1), q2)
    w = jnp.clip(jnp.abs(rel[..., 0]), 0.0, 1.0)
    return 2.0 * jnp.arccos(w)
