"""Property tests for the core SE(3)/rotation/dual-quaternion math.

Mirrors the invariants the reference relies on implicitly
(dq <-> matrix round trips, quaternion conventions, screw decomposition);
scipy.spatial.transform is the independent oracle.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from autourdf_tpu.core import dualquat as dq
from autourdf_tpu.core import rotations as R
from autourdf_tpu.core import se3


def random_rotations(rng, n):
    return ScipyRot.random(n, random_state=np.random.RandomState(12))


def random_transforms(rng, n):
    rots = random_rotations(rng, n).as_matrix()
    ts = rng.normal(size=(n, 3))
    T = np.tile(np.eye(4), (n, 1, 1))
    T[:, :3, :3] = rots
    T[:, :3, 3] = ts
    return jnp.asarray(T, dtype=jnp.float32)


class TestQuaternions:
    def test_matrix_quat_roundtrip(self, rng):
        rots = random_rotations(rng, 64)
        m = jnp.asarray(rots.as_matrix(), dtype=jnp.float32)
        q = R.matrix_to_quat(m)
        m2 = R.quat_to_matrix(q)
        np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_matches_scipy(self, rng):
        rots = random_rotations(rng, 64)
        m = jnp.asarray(rots.as_matrix(), dtype=jnp.float32)
        q = np.asarray(R.matrix_to_quat(m))
        # scipy is xyzw; ours is wxyz with w >= 0
        q_ref = rots.as_quat()  # (n, 4) xyzw
        q_ref = np.concatenate([q_ref[:, 3:], q_ref[:, :3]], axis=1)
        q_ref[q_ref[:, 0] < 0] *= -1
        np.testing.assert_allclose(q, q_ref, atol=1e-5)

    def test_degenerate_rotations(self):
        # 180-degree rotations hit the w~0 branch of matrix_to_quat
        for axis in np.eye(3):
            m = ScipyRot.from_rotvec(np.pi * axis).as_matrix()
            q = R.matrix_to_quat(jnp.asarray(m, dtype=jnp.float32))
            m2 = R.quat_to_matrix(q)
            np.testing.assert_allclose(m, m2, atol=1e-5)

    def test_identity(self):
        q = R.matrix_to_quat(jnp.eye(3))
        np.testing.assert_allclose(q, [1, 0, 0, 0], atol=1e-7)

    def test_multiply_matches_matrix_product(self, rng):
        r1 = random_rotations(rng, 16)
        r2 = ScipyRot.random(16, random_state=np.random.RandomState(13))
        m1 = jnp.asarray(r1.as_matrix(), dtype=jnp.float32)
        m2 = jnp.asarray(r2.as_matrix(), dtype=jnp.float32)
        q = R.quat_multiply(R.matrix_to_quat(m1), R.matrix_to_quat(m2))
        np.testing.assert_allclose(R.quat_to_matrix(q), m1 @ m2, atol=1e-5)

    def test_quat_rotate(self, rng):
        rots = random_rotations(rng, 8)
        m = jnp.asarray(rots.as_matrix(), dtype=jnp.float32)
        q = R.matrix_to_quat(m)
        v = jnp.asarray(rng.normal(size=(8, 3)), dtype=jnp.float32)
        np.testing.assert_allclose(
            R.quat_rotate(q, v), jnp.einsum("nij,nj->ni", m, v), atol=1e-5
        )


class TestEulerAnd6D:
    def test_euler_roundtrip(self, rng):
        # stay away from the gimbal-lock boundary |pitch| = pi/2
        e = jnp.asarray(rng.uniform(-1.3, 1.3, size=(32, 3)), dtype=jnp.float32)
        m = R.euler_to_matrix(e)
        e2 = R.matrix_to_euler(m)
        np.testing.assert_allclose(e, e2, atol=1e-4)

    def test_euler_matches_scipy_intrinsic_xyz(self, rng):
        e = rng.uniform(-1.3, 1.3, size=(16, 3))
        m = R.euler_to_matrix(jnp.asarray(e, dtype=jnp.float32))
        m_ref = ScipyRot.from_euler("XYZ", e).as_matrix()
        np.testing.assert_allclose(m, m_ref, atol=1e-5)

    def test_rot6d_roundtrip(self, rng):
        rots = random_rotations(rng, 32)
        m = jnp.asarray(rots.as_matrix(), dtype=jnp.float32)
        np.testing.assert_allclose(R.rot6d_to_matrix(R.matrix_to_rot6d(m)), m, atol=1e-5)


class TestRotvec:
    def test_matches_scipy(self, rng):
        rots = random_rotations(rng, 32)
        m = jnp.asarray(rots.as_matrix(), dtype=jnp.float32)
        rv = np.asarray(R.matrix_to_rotvec(m))
        np.testing.assert_allclose(rv, rots.as_rotvec(), atol=1e-4)

    def test_roundtrip(self, rng):
        rv = jnp.asarray(rng.normal(size=(32, 3)), dtype=jnp.float32)
        rv2 = R.matrix_to_rotvec(R.rotvec_to_matrix(rv))
        # round trip is modulo 2*pi wrap; keep magnitudes < pi
        rv_small = rv / (jnp.linalg.norm(rv, axis=-1, keepdims=True) + 1) * 2.0
        rv2 = R.matrix_to_rotvec(R.rotvec_to_matrix(rv_small))
        np.testing.assert_allclose(rv_small, rv2, atol=1e-4)

    def test_geodesic_distance(self, rng):
        r1 = random_rotations(rng, 16)
        r2 = ScipyRot.random(16, random_state=np.random.RandomState(14))
        m1 = jnp.asarray(r1.as_matrix(), dtype=jnp.float32)
        m2 = jnp.asarray(r2.as_matrix(), dtype=jnp.float32)
        d = R.rotmat_geodesic_distance(m1, m2)
        d_ref = (r1.inv() * r2).magnitude()
        np.testing.assert_allclose(d, d_ref, atol=1e-4)
        d2 = R.rotvec_geodesic_distance(
            R.matrix_to_rotvec(m1), R.matrix_to_rotvec(m2)
        )
        np.testing.assert_allclose(d2, d_ref, atol=1e-3)


class TestSE3:
    def test_inverse(self, rng):
        T = random_transforms(rng, 16)
        np.testing.assert_allclose(
            se3.inverse(T) @ T, np.tile(np.eye(4), (16, 1, 1)), atol=1e-5
        )

    def test_xyzquat_roundtrip(self, rng):
        T = random_transforms(rng, 16)
        np.testing.assert_allclose(
            se3.xyzquat_to_matrix(se3.matrix_to_xyzquat(T)), T, atol=1e-5
        )

    def test_transform_points(self, rng):
        T = random_transforms(rng, 4)
        pts = jnp.asarray(rng.normal(size=(4, 100, 3)), dtype=jnp.float32)
        out = se3.transform_points(T, pts)
        ref = np.einsum("bij,bnj->bni", np.asarray(T[:, :3, :3]), pts) + np.asarray(
            T[:, :3, 3]
        )[:, None]
        np.testing.assert_allclose(out, ref, atol=1e-5)

    def test_xyzrpy_matches_scipy(self, rng):
        xyz = rng.normal(size=(8, 3))
        rpy = rng.uniform(-2, 2, size=(8, 3))
        T = se3.xyzrpy_to_matrix(
            jnp.asarray(xyz, dtype=jnp.float32), jnp.asarray(rpy, dtype=jnp.float32)
        )
        m_ref = ScipyRot.from_euler("xyz", rpy).as_matrix()
        np.testing.assert_allclose(T[:, :3, :3], m_ref, atol=1e-5)
        np.testing.assert_allclose(T[:, :3, 3], xyz, atol=1e-6)

    def test_screw_decomposition(self, rng):
        # Build a pure rotation about a known axis through a known point.
        axis = np.array([0.0, 0.0, 1.0])
        point = np.array([1.0, 2.0, 0.5])
        angle = 0.7
        rot = ScipyRot.from_rotvec(angle * axis).as_matrix()
        t = point - rot @ point
        T = np.eye(4)
        T[:3, :3] = rot
        T[:3, 3] = t
        ax, ang, p = se3.screw_from_transform(jnp.asarray(T, dtype=jnp.float32))
        np.testing.assert_allclose(np.abs(np.asarray(ax) @ axis), 1.0, atol=1e-5)
        np.testing.assert_allclose(ang, angle, atol=1e-5)
        # recovered point must lie on the true axis (perp distance ~ 0)
        diff = np.asarray(p) - point
        perp = diff - (diff @ axis) * axis
        np.testing.assert_allclose(np.linalg.norm(perp), 0.0, atol=1e-4)

    def test_average_quaternions(self, rng):
        base = ScipyRot.from_rotvec([0.1, 0.2, 0.3])
        quats = []
        for _ in range(20):
            perturbed = base * ScipyRot.from_rotvec(rng.normal(scale=0.01, size=3))
            q = perturbed.as_quat()  # xyzw
            q = np.concatenate([q[3:], q[:3]])
            quats.append(q * rng.choice([-1, 1]))  # random sign flips
        avg = np.asarray(se3.average_quaternions(jnp.asarray(np.stack(quats), dtype=jnp.float32)))
        base_q = base.as_quat()
        base_q = np.concatenate([base_q[3:], base_q[:3]])
        dot = abs(avg @ base_q)
        assert dot > 0.9999


class TestDualQuat:
    def test_transform_roundtrip(self, rng):
        T = random_transforms(rng, 32)
        d = dq.from_transform(T)
        np.testing.assert_allclose(dq.to_transform(d), T, atol=1e-5)

    def test_multiply_matches_compose(self, rng):
        T1 = random_transforms(rng, 8)
        T2 = random_transforms(rng, 8)
        d = dq.multiply(dq.from_transform(T1), dq.from_transform(T2))
        np.testing.assert_allclose(dq.to_transform(d), T1 @ T2, atol=1e-4)

    def test_invert(self, rng):
        T = random_transforms(rng, 8)
        d = dq.from_transform(T)
        ident = dq.multiply(d, dq.invert(d))
        expect = np.zeros((8, 8))
        expect[:, 0] = 1.0
        np.testing.assert_allclose(ident, expect, atol=1e-5)

    def test_invert_non_unit(self, rng):
        T = random_transforms(rng, 4)
        d = dq.from_transform(T) * 1.7  # scale breaks unit norm
        ident = dq.multiply(d, dq.invert(d))
        expect = np.zeros((4, 8))
        expect[:, 0] = 1.0
        np.testing.assert_allclose(ident, expect, atol=1e-5)

    def test_transform_points(self, rng):
        T = random_transforms(rng, 4)
        pts = jnp.asarray(rng.normal(size=(4, 50, 3)), dtype=jnp.float32)
        np.testing.assert_allclose(
            dq.transform_points(dq.from_transform(T), pts),
            se3.transform_points(T, pts),
            atol=1e-4,
        )

    def test_normalize(self, rng):
        d = jnp.asarray(rng.normal(size=(16, 8)), dtype=jnp.float32)
        dn = dq.normalize(d)
        np.testing.assert_allclose(jnp.linalg.norm(dn[:, :4], axis=-1), 1.0, atol=1e-6)
        np.testing.assert_allclose(
            jnp.sum(dn[:, :4] * dn[:, 4:], axis=-1), 0.0, atol=1e-6
        )

    def test_jit_and_grad(self, rng):
        T = random_transforms(rng, 4)

        @jax.jit
        def loss(T):
            d = dq.from_transform(T)
            return jnp.sum(dq.to_transform(d) ** 2)

        g = jax.grad(loss)(T)
        assert np.all(np.isfinite(np.asarray(g)))
