"""Differentiable revolute-joint refinement (beyond the reference).

The screw-aggregation estimate (screw.py) inherits the noise of the
per-cluster rotation estimates — weakly-constrained links (small or
near-symmetric point sets, e.g. a wrist) can end up with axes tens of
degrees off even when the registered *points* are accurate.  This module
re-fits each joint directly against those points: an explicit revolute
model

    world_t  =  T_parent(t) . Rot(axis, origin, theta_t) . X_child

with the axis direction, origin, and per-frame joint angles as free
parameters, optimized by Adam against the masked symmetric Chamfer
distance to the observed child-link clouds.  This uses exactly the same
fused TPU machinery as the registration loop and typically cuts wrist
axis errors several-fold.  The screw estimate provides the
initialization, so refinement can only help.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rotations as R
from ..core import se3
from ..ops.chamfer import chamfer_distance
from .screw import JointEstimate

_einsum = functools.partial(jnp.einsum, precision="highest")


class RefineResult(NamedTuple):
    axis: jax.Array      # (3,) unit axis in the parent frame at step 0
    origin: jax.Array    # (3,) point on the axis in the parent frame
    thetas: jax.Array    # (T,) fitted joint angles (theta[0] == 0)
    loss: jax.Array      # final chamfer


def _rot_about_axis(u: jax.Array, o: jax.Array, theta: jax.Array) -> jax.Array:
    """(4, 4) rotation by theta about the line through o with direction u."""
    rot = R.rotvec_to_matrix(u * theta)
    t = o - rot @ o
    return se3.make_transform(rot, t)


@functools.partial(jax.jit, static_argnames=("steps",))
def fit_revolute_joint(
    parent_T: jax.Array,   # (T, 4, 4) parent link world poses
    child_obs: jax.Array,  # (T, P, 3) observed child-link world clouds (padded)
    child_mask: jax.Array, # (T, P) validity
    u0: jax.Array,         # (3,) initial axis, parent frame
    o0: jax.Array,         # (3,) initial origin, parent frame
    theta0: jax.Array,     # (T,) initial angles
    steps: int = 200,
    lr: float = 2e-2,
    origin_reg: float = 1e-3,
) -> RefineResult:
    T_steps = parent_T.shape[0]
    inv_p0 = se3.inverse(parent_T[0])
    x_c = se3.transform_points(inv_p0, child_obs[0])  # child pts, parent frame
    x_mask = child_mask[0]

    def unpack(p):
        u = p["u"] / jnp.maximum(jnp.linalg.norm(p["u"]), 1e-9)
        return u, p["o"], p["theta"].at[0].set(0.0)

    def loss_fn(p):
        u, o, theta = unpack(p)

        def per_step(t_pose, th, obs, obs_mask):
            J = _rot_about_axis(u, o, th)
            world = se3.transform_points(t_pose @ J, x_c)
            return chamfer_distance(world, obs, x_mask, obs_mask, norm=1)

        losses = jax.vmap(per_step)(parent_T, theta, child_obs, child_mask)
        reg = origin_reg * jnp.sum((o - o0) ** 2)
        return jnp.mean(losses) + reg

    params = {"u": u0, "o": o0, "theta": theta0}
    opt_init = jax.tree.map(jnp.zeros_like, params)

    def step_fn(carry, _):
        p, mu, nu, i = carry
        loss, g = jax.value_and_grad(loss_fn)(p)
        i = i + 1
        mu = jax.tree.map(lambda m, gr: 0.9 * m + 0.1 * gr, mu, g)
        nu = jax.tree.map(lambda v, gr: 0.999 * v + 0.001 * gr * gr, nu, g)
        t = i.astype(jnp.float32)
        p = jax.tree.map(
            lambda pp, m, v: pp - lr * (m / (1 - 0.9**t)) / (jnp.sqrt(v / (1 - 0.999**t)) + 1e-8),
            p, mu, nu,
        )
        return (p, mu, nu, i), loss

    (params, _, _, _), losses = jax.lax.scan(
        step_fn, (params, opt_init, opt_init, jnp.zeros((), jnp.int32)), None,
        length=steps,
    )
    u, o, theta = unpack(params)
    return RefineResult(u, o, theta, losses[-1])


def child_world_clouds(cm, members: list[int], cap: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-step world clouds of a link's member clusters, padded to cap."""
    T_steps = cm.coords.shape[0]
    obs = np.zeros((T_steps, cap, 3), np.float32)
    mask = np.zeros((T_steps, cap), bool)
    for t in range(T_steps):
        pts = np.asarray(cm.cluster_points[t])
        labels = np.asarray(cm.cluster_labels[t])
        parts = []
        for m in members:
            sel = labels == m
            M = cm.matrices[t, m]
            parts.append(pts[sel] @ M[:3, :3].T + M[:3, 3])
        cloud = np.concatenate(parts, axis=0) if parts else np.zeros((0, 3))
        n = min(len(cloud), cap)
        obs[t, :n] = cloud[:n]
        mask[t, :n] = True
    return obs, mask


def parent_link_poses(cm, members: list[int]) -> np.ndarray:
    """(T, 4, 4) link frames (mean pos + eigen-avg quat, as links.py)."""
    from ..structure.links import link_frame

    T_steps = cm.coords.shape[0]
    return np.stack([link_frame(cm, members, t) for t in range(T_steps)])


def refine_joints(
    joints: list[JointEstimate],
    links,
    cm,
    steps: int = 200,
    point_cap: int = 2048,
    verbose: bool = False,
) -> list[JointEstimate]:
    """Refine every estimated joint against the first sequence's clouds.

    Returns new JointEstimates with updated global_pos / global_axis (the
    fields the URDF writer consumes); the screw estimates initialize the
    fit, and a fit that fails to improve keeps the initialization (Adam
    from the init can only reduce the chamfer objective it starts from).
    """
    by_id = {l.id: l for l in links}
    out = []
    for j in joints:
        parent = by_id[j.parent_link]
        child = by_id[j.child_link]
        parent_T = jnp.asarray(parent_link_poses(cm, sorted(parent.cluster_idx)), jnp.float32)
        obs, mask = child_world_clouds(cm, sorted(child.cluster_idx), point_cap)

        inv_p0 = np.linalg.inv(np.asarray(parent_T[0], np.float64))
        u0 = inv_p0[:3, :3] @ (j.global_axis / max(np.linalg.norm(j.global_axis), 1e-12))
        o0 = inv_p0[:3, :3] @ j.global_pos[:3] + inv_p0[:3, 3]

        # initial per-step angles: child relative rotation projected on u0
        T_steps = obs.shape[0]
        theta0 = np.zeros(T_steps, np.float32)
        child_T = parent_link_poses(cm, sorted(child.cluster_idx))
        rel0 = inv_p0 @ child_T[0]
        for t in range(1, T_steps):
            rel_t = np.linalg.inv(np.asarray(parent_T[t], np.float64)) @ child_T[t]
            d_rel = rel_t @ np.linalg.inv(rel0)
            from scipy.spatial.transform import Rotation as ScipyRot

            rv = ScipyRot.from_matrix(d_rel[:3, :3]).as_rotvec()
            theta0[t] = float(rv @ u0)

        res = fit_revolute_joint(
            parent_T, jnp.asarray(obs), jnp.asarray(mask),
            jnp.asarray(u0, jnp.float32), jnp.asarray(o0, jnp.float32),
            jnp.asarray(theta0), steps=steps,
        )
        u = np.asarray(res.axis, np.float64)
        o = np.asarray(res.origin, np.float64)
        p0 = np.asarray(parent_T[0], np.float64)
        global_axis = p0[:3, :3] @ u
        global_pos = p0[:3, :3] @ o + p0[:3, 3]
        if verbose:
            print(f"[refine] joint {j.parent_link}->{j.child_link}: "
                  f"chamfer {float(res.loss):.5f}")
        out.append(
            JointEstimate(
                parent_link=j.parent_link,
                child_link=j.child_link,
                local_axis=u,
                local_pos=np.concatenate([o, [1.0]]),
                global_pos=global_pos,
                global_axis=global_axis,
            )
        )
    return out
