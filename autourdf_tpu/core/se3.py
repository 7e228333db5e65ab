"""SE(3) rigid-transform utilities in pure JAX.

Replaces the reference's scattered 4x4 helpers
(/root/reference/PointCloud/helper_functions.py:26-45,
 /root/reference/PointCloud/cluster_icp.py:7-12) and the
transforms3d screw extraction used at
/root/reference/PointCloud/compute_joints.py:107 with batched,
jit-friendly equivalents.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from . import rotations as R

_mm = functools.partial(jnp.matmul, precision="highest")
_einsum = functools.partial(jnp.einsum, precision="highest")


def make_transform(rot: jax.Array, trans: jax.Array) -> jax.Array:
    """(..., 3, 3) + (..., 3) -> (..., 4, 4) homogeneous transform."""
    batch = jnp.broadcast_shapes(rot.shape[:-2], trans.shape[:-1])
    rot = jnp.broadcast_to(rot, batch + (3, 3))
    trans = jnp.broadcast_to(trans, batch + (3,))
    top = jnp.concatenate([rot, trans[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=rot.dtype), batch + (1, 4)
    )
    return jnp.concatenate([top, bottom], axis=-2)


def rot_of(T: jax.Array) -> jax.Array:
    return T[..., :3, :3]


def trans_of(T: jax.Array) -> jax.Array:
    return T[..., :3, 3]


def inverse(T: jax.Array) -> jax.Array:
    """Closed-form inverse of a rigid transform (R^T, -R^T t)."""
    rt = jnp.swapaxes(rot_of(T), -1, -2)
    t = -_einsum("...ij,...j->...i", rt, trans_of(T))
    return make_transform(rt, t)


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply (..., 4, 4) to points (..., N, 3)."""
    return _einsum("...ij,...nj->...ni", rot_of(T), pts) + trans_of(T)[..., None, :]


def compose(a: jax.Array, b: jax.Array) -> jax.Array:
    return _mm(a, b)


def xyzquat_to_matrix(xq: jax.Array) -> jax.Array:
    """(..., 7) [x y z qw qx qy qz] -> (..., 4, 4).

    Mirrors helper_functions.xyzquant2matrix_torch (which, despite its
    docstring, uses the real-first quaternion from pytorch3d).
    """
    return make_transform(R.quat_to_matrix(xq[..., 3:]), xq[..., :3])


def matrix_to_xyzquat(T: jax.Array) -> jax.Array:
    """(..., 4, 4) -> (..., 7) [x y z qw qx qy qz]."""
    return jnp.concatenate([trans_of(T), R.matrix_to_quat(rot_of(T))], axis=-1)


def xyzrpy_to_matrix(xyz: jax.Array, rpy: jax.Array) -> jax.Array:
    """Extrinsic xyz euler (scipy 'xyz' convention) -> transform.

    Matches cluster_icp.xyzrpy_to_matrix_scipy: scipy's R.from_euler('xyz')
    is extrinsic x-y-z, i.e. Rz @ Ry @ Rx.
    """
    rx = R._axis_rot(rpy[..., 0], 0)
    ry = R._axis_rot(rpy[..., 1], 1)
    rz = R._axis_rot(rpy[..., 2], 2)
    return make_transform(_mm(_mm(rz, ry), rx), xyz)


def se3_log(T: jax.Array) -> tuple[jax.Array, jax.Array]:
    """SE(3) log: returns (rotvec (...,3), v (...,3)) with T = exp([w, v])."""
    w = R.matrix_to_rotvec(rot_of(T))
    theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
    t = trans_of(T)
    # V^{-1} t with V the left Jacobian of SO(3)
    half = 0.5 * theta
    # coefficient for the (w x (w x t)) term of V^{-1}
    small = theta < 1e-5
    cot_term = jnp.where(
        small,
        1.0 / 12.0,
        (1.0 - half * jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-30))
        / jnp.maximum(theta * theta, 1e-30),
    )
    wxt = jnp.cross(w, t)
    wxwxt = jnp.cross(w, wxt)
    v = t - 0.5 * wxt + cot_term * wxwxt
    return w, v


def screw_from_transform(T: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Screw decomposition of a rigid transform.

    Returns ``(axis, angle, point)``: unit rotation axis, rotation angle, and
    the minimum-norm point on the screw axis.  Replaces
    ``transforms3d.axangles.aff2axangle`` (compute_joints.py:107); the point
    here is the least-squares fixed point with no component along the axis —
    downstream the reference immediately re-slides the point along the axis
    (init_position / refine_position), so only the axis line matters.
    """
    w = R.matrix_to_rotvec(rot_of(T))
    angle = jnp.linalg.norm(w, axis=-1)
    axis = w / jnp.maximum(angle[..., None], 1e-12)
    t = trans_of(T)
    # Remove the pitch (translation along axis); solve (I - R) p = t_perp
    # in closed form.  For p perpendicular to the axis,
    #   p = 1/2 * t_perp + 1/2 * cot(theta/2) * (axis x t_perp)
    # (exact inverse of the 2x2 in-plane rotation operator — numerically
    # stable where an f32 least-squares solve of the rank-deficient 3x3 is
    # not).  As theta -> 0 the point recedes to infinity, which is the
    # correct screw geometry; callers filter near-identity samples.
    t_par = jnp.sum(t * axis, axis=-1, keepdims=True) * axis
    t_perp = t - t_par
    half = 0.5 * angle[..., None]
    cot = jnp.cos(half) / jnp.maximum(jnp.sin(half), 1e-12)
    p = 0.5 * t_perp + 0.5 * cot * jnp.cross(axis, t_perp)
    return axis, angle, p


def average_quaternions(quats: jax.Array) -> jax.Array:
    """Eigen-average of quaternions (Markley et al.), batch over leading dims.

    Mirrors compute_joints.average_quaternions: the principal eigenvector of
    the outer-product accumulation, sign-unconstrained (the caller's
    downstream math is sign-invariant).
    """
    A = _einsum("...ni,...nj->...ij", quats, quats) / quats.shape[-2]
    _, vecs = jnp.linalg.eigh(A)
    return vecs[..., :, -1]
