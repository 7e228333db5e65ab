"""Multi-camera point-cloud capture on device.

TPU-native replacement for the reference's render path (PyBullet OpenGL
RGB-D render -> Open3D back-projection -> merge -> FPS,
/root/reference/Sim/sim_data.py:246-367): instead of rasterizing
triangles, we splat densely-sampled surface points into per-camera
z-buffers (scatter-min) and keep the points that win visibility in at
least one camera — the same occlusion semantics a depth camera gives,
with everything expressed as fixed-shape scatter/gather that jits into a
single TPU program per frame.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.fps import farthest_point_sample


class CameraRig(NamedTuple):
    eyes: jax.Array     # (C, 3) camera positions
    targets: jax.Array  # (C, 3) look-at points
    ups: jax.Array      # (C, 3)
    fov_deg: float
    near: float
    far: float


def sphere_camera_rig(
    radius: float,
    num_cameras: int,
    rng: np.random.Generator,
    cam_angle_deg: float = 20.0,
    fov_deg: float = 60.0,
    near: float = 0.1,
    far: float = 4.0,
) -> CameraRig:
    """Cameras on a sphere looking at the origin.

    Mirrors SimEnv._setup_cameras (sim_data.py:85-117): < 20 cameras ->
    evenly spaced azimuth at fixed elevation; >= 20 -> random azimuth and
    elevation in [0, pi/2).
    """
    if num_cameras < 20:
        theta = np.linspace(0, 2 * np.pi, num_cameras, endpoint=False)
        phi = np.full(num_cameras, np.pi * cam_angle_deg / 180.0)
    else:
        theta = rng.random(num_cameras) * 2 * np.pi
        phi = rng.random(num_cameras) * np.pi / 2
    xs = radius * np.cos(theta) * np.cos(phi)
    ys = radius * np.sin(theta) * np.cos(phi)
    zs = radius * np.sin(phi)
    eyes = np.stack([xs, ys, zs], axis=1).astype(np.float32)
    return CameraRig(
        eyes=jnp.asarray(eyes),
        targets=jnp.zeros((num_cameras, 3), jnp.float32),
        ups=jnp.tile(jnp.asarray([0.0, 0.0, 1.0], jnp.float32), (num_cameras, 1)),
        fov_deg=fov_deg,
        near=near,
        far=far,
    )


def _look_at(eye, target, up):
    fwd = target - eye
    fwd = fwd / jnp.maximum(jnp.linalg.norm(fwd), 1e-12)
    right = jnp.cross(fwd, up)
    right = right / jnp.maximum(jnp.linalg.norm(right), 1e-12)
    true_up = jnp.cross(right, fwd)
    rot = jnp.stack([right, true_up, -fwd])  # world->camera rotation
    t = -rot @ eye
    return rot, t


def _visible_mask_one_camera(
    points: jax.Array, eye, target, up, f: float, near: float, far: float,
    width: int, height: int, depth_eps: float, dilation: int,
) -> jax.Array:
    rot, t = _look_at(eye, target, up)
    cam = points @ rot.T + t  # (P, 3), camera looks down -z
    depth = -cam[:, 2]
    in_range = (depth > near) & (depth < far)
    inv_d = 1.0 / jnp.maximum(depth, 1e-6)
    x_ndc = f * cam[:, 0] * inv_d
    y_ndc = f * cam[:, 1] * inv_d
    u = ((x_ndc + 1.0) * 0.5 * width).astype(jnp.int32)
    v = ((1.0 - (y_ndc + 1.0) * 0.5) * height).astype(jnp.int32)
    on_screen = (u >= 0) & (u < width) & (v >= 0) & (v < height) & in_range
    d_or_inf = jnp.where(on_screen, depth, jnp.inf)
    zbuf = jnp.full((width * height + 1,), jnp.inf, jnp.float32)
    # Dilated splat: each point claims its (2*dilation+1)^2 neighborhood so
    # the buffer is a hole-free lower envelope even when the surface
    # sampling is sparser than the pixel grid.
    for du in range(-dilation, dilation + 1):
        for dv in range(-dilation, dilation + 1):
            uu = jnp.clip(u + du, 0, width - 1)
            vv = jnp.clip(v + dv, 0, height - 1)
            p = jnp.where(on_screen, vv * width + uu, width * height)
            zbuf = zbuf.at[p].min(d_or_inf)
    pix = jnp.where(on_screen, v * width + u, width * height)
    # Visibility tolerance must cover the depth gradient across the dilated
    # splat footprint: a tilted surface changes depth by up to
    # ~pixel_world_size * slope per pixel.  pixel_world = depth * 2*tan(fov/2)/W.
    pix_world = depth * (2.0 / (f * width))
    tol = depth * depth_eps + (dilation + 0.5) * 3.0 * pix_world
    return on_screen & (depth <= zbuf[pix] + tol)


@functools.partial(
    jax.jit,
    static_argnames=("width", "height", "num_points", "depth_eps",
                     "pose_noise", "point_noise", "dilation"),
)
def capture_cloud(
    points_world: jax.Array,  # (P, 3) posed dense surface samples
    rig: CameraRig,
    key: jax.Array,
    width: int = 800,
    height: int = 800,
    num_points: int = 5000,
    pose_noise: float = 0.0,
    point_noise: float = 0.0,
    depth_eps: float = 1e-3,
    dilation: int = 1,
) -> tuple[jax.Array, jax.Array]:
    """Fused multi-camera capture -> (num_points, 3) cloud + visible mask.

    Visibility union over cameras, optional global pose noise (sigma
    ``pose_noise``, the reference's scanning drift, sim_data.py:337) and
    per-point noise, then farthest-point downsampling of the visible set.
    """
    f = 1.0 / jnp.tan(jnp.deg2rad(rig.fov_deg) / 2.0)

    def one_cam(eye, target, up):
        return _visible_mask_one_camera(
            points_world, eye, target, up, f, rig.near, rig.far,
            width, height, depth_eps, dilation,
        )

    masks = jax.vmap(one_cam)(rig.eyes, rig.targets, rig.ups)  # (C, P)
    visible = jnp.any(masks, axis=0)

    k1, k2 = jax.random.split(key)
    noisy = points_world
    if pose_noise > 0:
        noisy = noisy + jax.random.normal(k1, (3,)) * pose_noise
    if point_noise > 0:
        noisy = noisy + jax.random.normal(k2, points_world.shape) * point_noise

    idx = farthest_point_sample(noisy, num_points, mask=visible)
    return noisy[idx], visible
