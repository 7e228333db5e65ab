"""Tests for mesh/ply I/O, URDF parsing + FK, and the capture pipeline."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autourdf_tpu.io import (
    TriMesh,
    load_stl,
    read_ply,
    sample_surface,
    save_stl,
    write_ply,
)
from autourdf_tpu.sim import angle_trajectory, capture_cloud, sphere_camera_rig
from autourdf_tpu.urdf import forward_kinematics, joint_world_frames, load_urdf

TEST_URDF = """<?xml version="1.0"?>
<robot name="two_link">
  <link name="base">
    <visual><origin xyz="0 0 0.1"/><geometry><box size="0.2 0.2 0.2"/></geometry></visual>
  </link>
  <link name="arm">
    <visual><origin xyz="0.25 0 0"/><geometry><box size="0.5 0.08 0.08"/></geometry></visual>
  </link>
  <link name="tip">
    <visual><geometry><sphere radius="0.05"/></geometry></visual>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0.2" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-1.5" upper="1.5" effort="10" velocity="1"/>
  </joint>
  <joint name="mount" type="fixed">
    <parent link="arm"/><child link="tip"/>
    <origin xyz="0.5 0 0"/>
  </joint>
</robot>
"""


@pytest.fixture
def two_link(tmp_path):
    p = tmp_path / "two_link.urdf"
    p.write_text(TEST_URDF)
    return str(p)


class TestMeshIO:
    def test_stl_roundtrip(self, tmp_path, rng):
        verts = rng.normal(size=(10, 3))
        faces = np.asarray([[0, 1, 2], [3, 4, 5], [6, 7, 8]], np.int32)
        mesh = TriMesh(verts, faces)
        path = str(tmp_path / "m.stl")
        save_stl(path, mesh)
        back = load_stl(path)
        assert len(back.faces) == 3
        np.testing.assert_allclose(back.area, mesh.area, rtol=1e-5)

    def test_sample_surface_on_unit_square(self, rng):
        mesh = TriMesh(
            np.asarray([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], float),
            np.asarray([[0, 1, 2], [0, 2, 3]], np.int32),
        )
        pts = sample_surface(mesh, 1000, rng)
        assert pts.shape == (1000, 3)
        assert np.all(pts[:, 2] == 0)
        assert 0 <= pts[:, 0].min() and pts[:, 0].max() <= 1
        # roughly uniform: mean near centroid
        np.testing.assert_allclose(pts.mean(0)[:2], [0.5, 0.5], atol=0.05)

    def test_ply_roundtrip(self, tmp_path, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        path = str(tmp_path / "c.ply")
        write_ply(path, pts)
        back = read_ply(path)
        np.testing.assert_array_equal(back, pts)

    def test_ply_with_colors(self, tmp_path, rng):
        pts = rng.normal(size=(10, 3)).astype(np.float32)
        write_ply(str(tmp_path / "c.ply"), pts, colors=np.ones((10, 3)) * 0.5)
        back = read_ply(str(tmp_path / "c.ply"))
        np.testing.assert_array_equal(back, pts)

    def test_reads_reference_stl(self):
        path = "/root/reference/Robot/bolt/stl_files/bolt_body.stl"
        if not os.path.exists(path):
            pytest.skip("reference assets unavailable")
        mesh = load_stl(path)
        assert len(mesh.faces) > 100
        assert mesh.area > 0


class TestURDF:
    def test_parse(self, two_link):
        m = load_urdf(two_link)
        assert m.root == "base"
        assert [j.name for j in m.revolute_joints] == ["hinge"]
        assert m.links["base"].visuals[0].mesh is not None

    def test_fk_zero(self, two_link):
        m = load_urdf(two_link)
        world = forward_kinematics(m)
        np.testing.assert_allclose(world["arm"][:3, 3], [0, 0, 0.2], atol=1e-12)
        np.testing.assert_allclose(world["tip"][:3, 3], [0.5, 0, 0.2], atol=1e-12)

    def test_fk_rotated(self, two_link):
        m = load_urdf(two_link)
        world = forward_kinematics(m, {"hinge": np.pi / 2})
        np.testing.assert_allclose(world["tip"][:3, 3], [0, 0.5, 0.2], atol=1e-12)

    def test_joint_world_frames(self, two_link):
        m = load_urdf(two_link)
        frames = joint_world_frames(m, {"hinge": 0.7})
        assert frames[0].name == "hinge"
        np.testing.assert_allclose(frames[0].position, [0, 0, 0.2], atol=1e-12)
        np.testing.assert_allclose(frames[0].axis, [0, 0, 1], atol=1e-12)

    def test_base_transform(self, two_link):
        m = load_urdf(two_link)
        base = np.eye(4)
        base[:3, 3] = [1, 2, 3]
        world = forward_kinematics(m, base=base)
        np.testing.assert_allclose(world["arm"][:3, 3], [1, 2, 3.2], atol=1e-12)

    def test_reference_wx200(self):
        path = "/root/reference/Robot/interbotix_descriptions/urdf/wx200_real.urdf"
        if not os.path.exists(path):
            pytest.skip("reference assets unavailable")
        m = load_urdf(path, asset_root="/root/reference")
        assert len(m.revolute_joints) == 6
        frames = joint_world_frames(m, dof=5)
        np.testing.assert_allclose(frames[0].position, [0, 0, 0.072], atol=1e-9)


class TestTrajectory:
    def test_shape_and_limits(self):
        limits = np.asarray([[-3.14, 3.14], [-1.8, 1.9], [-1.8, 1.6]])
        a = angle_trajectory(10, 4, 3, limits, scale=0.9, seed=0)
        assert a.shape == (10, 3)
        assert np.all(a >= limits[:, 0] * 0.95) and np.all(a <= limits[:, 1] * 0.95)

    def test_step_bound(self):
        limits = np.asarray([[-3.14, 3.14]] * 2)
        a = angle_trajectory(20, 4, 2, limits, scale=0.9, seed=1)
        steps = np.abs(np.diff(np.degrees(a), axis=0))
        assert steps.max() <= 8.0 + 1e-6  # step in [4, 8) degrees

    def test_deterministic(self):
        limits = np.asarray([[-1, 1]] * 2)
        a1 = angle_trajectory(10, 4, 2, limits, seed=7)
        a2 = angle_trajectory(10, 4, 2, limits, seed=7)
        np.testing.assert_array_equal(a1, a2)

    def test_start_is_seed_independent(self):
        limits = np.asarray([[-1, 1]] * 2)
        a1 = angle_trajectory(10, 4, 2, limits, seed=1)
        a2 = angle_trajectory(10, 4, 2, limits, seed=2)
        np.testing.assert_allclose(a1[0], a2[0])


class TestCapture:
    def test_occlusion(self):
        # two parallel vertical plates; cameras all around -> both plates'
        # outer faces visible, but the inner region of a solid box is not.
        rng = np.random.default_rng(0)
        # a dense solid cube surface + an interior point grid
        n = 4000
        face = rng.random((n, 2)) - 0.5
        cube = []
        for axis in range(3):
            for s in (-0.5, 0.5):
                pts = np.zeros((n, 3))
                other = [a for a in range(3) if a != axis]
                pts[:, other[0]] = face[:, 0]
                pts[:, other[1]] = face[:, 1]
                pts[:, axis] = s
                cube.append(pts)
        surface = np.concatenate(cube).astype(np.float32) * 0.4
        interior = (rng.random((2000, 3)) - 0.5).astype(np.float32) * 0.2
        allpts = jnp.asarray(np.concatenate([surface, interior]))

        rig = sphere_camera_rig(1.5, 8, np.random.default_rng(1))
        cloud, visible = capture_cloud(
            allpts, rig, jax.random.PRNGKey(0), width=200, height=200,
            num_points=500,
        )
        vis = np.asarray(visible)
        # interior points (strictly inside the cube) must be invisible
        assert vis[len(surface):].sum() == 0
        # a healthy fraction of the surface is visible
        assert vis[: len(surface)].mean() > 0.3
        assert cloud.shape == (500, 3)

    def test_noise_applied(self):
        pts = jnp.asarray(np.random.default_rng(0).random((5000, 3)).astype(np.float32))
        rig = sphere_camera_rig(3.0, 4, np.random.default_rng(1))
        c1, _ = capture_cloud(pts, rig, jax.random.PRNGKey(0), width=100, height=100,
                              num_points=200)
        c2, _ = capture_cloud(pts, rig, jax.random.PRNGKey(0), width=100, height=100,
                              num_points=200, pose_noise=0.01, point_noise=0.0005)
        assert float(jnp.abs(c1 - c2).max()) > 1e-4


class TestColladaNodeTransforms:
    def test_scene_node_scale_and_rotation_applied(self, tmp_path):
        # Blender-style export: geometry in mm with the real scale/orientation
        # in a visual-scene node matrix (regression: the ur5e meshes declare
        # wrong asset units; ignoring nodes gave 1000x-too-large geometry)
        dae = """<?xml version="1.0"?>
<COLLADA xmlns="http://www.collada.org/2005/11/COLLADASchema" version="1.4.1">
  <asset><unit name="meter" meter="1"/><up_axis>Z_UP</up_axis></asset>
  <library_geometries>
    <geometry id="g-mesh"><mesh>
      <source id="g-pos"><float_array id="g-arr" count="9">
        0 0 0 1000 0 0 0 1000 0</float_array></source>
      <vertices id="g-verts"><input semantic="POSITION" source="#g-pos"/></vertices>
      <triangles count="1"><input semantic="VERTEX" source="#g-verts" offset="0"/>
        <p>0 1 2</p></triangles>
    </mesh></geometry>
  </library_geometries>
  <library_visual_scenes><visual_scene id="s">
    <node id="n">
      <matrix>0.001 0 0 0  0 0 0.001 0  0 0.001 0 0  0 0 0 1</matrix>
      <instance_geometry url="#g-mesh"/>
    </node>
  </visual_scene></library_visual_scenes>
</COLLADA>
"""
        p = tmp_path / "m.dae"
        p.write_text(dae)
        from autourdf_tpu.io.mesh_io import load_dae

        mesh = load_dae(str(p))
        # mm -> m scale and the y/z swap from the node matrix
        expect = np.asarray([[0, 0, 0], [1, 0, 0], [0, 0, 1]], float)
        np.testing.assert_allclose(mesh.vertices, expect, atol=1e-12)

    def test_reference_ur5e_dae_matches_collision(self):
        dae = "/root/reference/Robot/ur_e_description/meshes/ur5e/visual/base.dae"
        stl = "/root/reference/Robot/ur_e_description/meshes/ur5e/collision/base.stl"
        if not os.path.exists(dae):
            pytest.skip("reference assets unavailable")
        from autourdf_tpu.io.mesh_io import load_dae, load_stl

        md, ms = load_dae(dae), load_stl(stl)
        np.testing.assert_allclose(
            md.vertices.min(0), ms.vertices.min(0), atol=2e-3
        )
        np.testing.assert_allclose(
            md.vertices.max(0), ms.vertices.max(0), atol=2e-3
        )


class TestInteractiveViewer:
    def test_export_html(self, two_link, tmp_path):
        import json
        import re

        from autourdf_tpu.viz_interactive import export_interactive_html

        out = export_interactive_html(two_link, str(tmp_path / "v.html"))
        html = open(out).read()
        m = re.search(r"const SCENE = (\{.*?\});\n", html, re.S)
        assert m, "embedded scene JSON not found"
        scene = json.loads(m.group(1))
        assert scene["root"] == "base"
        assert set(scene["links"]) == {"base", "arm", "tip"}
        # every link got triangles; faces index into verts
        for name, l in scene["links"].items():
            assert len(l["faces"]) % 3 == 0 and len(l["verts"]) % 3 == 0
            if l["faces"]:
                assert max(l["faces"]) < len(l["verts"]) // 3
        joints = {j["name"]: j for j in scene["joints"]}
        assert joints["hinge"]["type"] == "revolute"
        assert joints["hinge"]["lower"] == -1.5
        assert len(joints["hinge"]["origin"]) == 16
        # no external resources: a browser needs nothing but this file
        assert "http://" not in html and "https://" not in html

    def test_decimation_reduces_dense_mesh(self, rng):
        from autourdf_tpu.viz_interactive import _decimate

        # dense unit-sphere triangulation (~20k faces)
        n = 100
        us, vs = np.meshgrid(np.linspace(0.1, np.pi - 0.1, n),
                             np.linspace(0, 2 * np.pi, n), indexing="ij")
        verts = np.stack([np.sin(us) * np.cos(vs), np.sin(us) * np.sin(vs),
                          np.cos(us)], -1).reshape(-1, 3)
        idx = np.arange(n * n).reshape(n, n)
        quads = np.stack([idx[:-1, :-1], idx[1:, :-1], idx[1:, 1:], idx[:-1, 1:]], -1)
        faces = np.concatenate([quads[..., [0, 1, 2]].reshape(-1, 3),
                                quads[..., [0, 2, 3]].reshape(-1, 3)])
        dv, df = _decimate(verts, faces.astype(np.int64), target_faces=1500)
        assert 0 < len(df) <= 1800
        assert np.all(df < len(dv))
        # decimated surface stays on the unit sphere (centroid snap error small)
        r = np.linalg.norm(dv[np.unique(df)], axis=1)
        assert 0.9 < r.min() and r.max() < 1.1
