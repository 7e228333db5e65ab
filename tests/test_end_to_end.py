"""Closed-loop integration test: dataset -> register -> urdf -> evaluate.

Runs the whole pipeline on a tiny synthetic 2-link robot URDF (the
simulation-oracle pattern the reference validates with, SURVEY §4) at
reduced sizes so it completes on CPU in about a minute.
"""

import os

import numpy as np
import pytest

TWO_LINK_URDF = """<?xml version="1.0"?>
<robot name="toy_hinge">
  <link name="base">
    <visual><origin xyz="-0.25 0 0.1"/>
      <geometry><box size="0.5 0.16 0.2"/></geometry></visual>
  </link>
  <link name="arm">
    <visual><origin xyz="0.3 0 0"/>
      <geometry><box size="0.6 0.09 0.09"/></geometry></visual>
  </link>
  <joint name="hinge" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0.05 0 0.1" rpy="0 0 0"/>
    <axis xyz="0 0 1"/>
    <limit lower="-1.2" upper="1.2" effort="10" velocity="1"/>
  </joint>
</robot>
"""


@pytest.fixture(scope="module")
def pipeline_run(tmp_path_factory):
    import jax

    from autourdf_tpu.config import ROBOTS, PipelineConfig, RobotConfig
    from autourdf_tpu import workflow

    root = tmp_path_factory.mktemp("e2e")
    urdf_path = root / "toy.urdf"
    urdf_path.write_text(TWO_LINK_URDF)

    ROBOTS["toy_hinge"] = RobotConfig(
        name="toy_hinge", num_seg=6, dof=1, gt_urdf=str(urdf_path),
        voxel_size=0.02, cam_dist=2.0,
    )
    cfg = PipelineConfig(
        robot="toy_hinge",
        data_root=str(root / "data"),
        num_step=5,
        num_videos=2,
        num_points=1200,
        pix=240,
        epochs=60,
        end_steps=5,
        step_size_deg=8,
    )

    old_cwd = os.getcwd()
    os.chdir(root)
    try:
        seq_dirs = workflow.run_dataset(cfg, epochs=2)
        reg_stats = workflow.run_registration(cfg, chamfer_backend="xla", verbose=False)
        urdf_out = workflow.run_build_urdf(cfg, unknown_dof=True, end_video=2,
                                           dof_probe_steps=20,
                                           dof_probe_points=128,
                                           refine_steps=300,  # toy converges
                                           verbose=False)
        eval_out = workflow.run_evaluation(cfg, verbose=False, num_configs=1)
    finally:
        os.chdir(old_cwd)
    return cfg, seq_dirs, reg_stats, urdf_out, eval_out, root


class TestEndToEnd:
    def test_dataset_artifacts(self, pipeline_run):
        cfg, seq_dirs, *_ , root = pipeline_run
        assert len(seq_dirs) == 2
        for d in seq_dirs:
            full = root / d
            assert (full / "0000" / "robot.ply").exists()
            assert (full / "0000" / "joint_cfg.txt").exists()

    def test_registration_quality(self, pipeline_run):
        _, _, reg_stats, *_ = pipeline_run
        # chamfer-L1 on a ~1m robot should register to a few mm
        assert reg_stats["mean_loss"] < 0.05

    def test_urdf_structure(self, pipeline_run):
        *_, urdf_out, _, root = pipeline_run
        assert urdf_out["num_links"] >= 2
        assert os.path.exists(root / urdf_out["urdf_path"])
        for m in urdf_out["mesh_paths"]:
            assert os.path.exists(root / m)

    def test_joint_recovery(self, pipeline_run):
        *_, eval_out, root = pipeline_run
        # axis within 15 degrees and origin within 10 cm on the toy
        assert eval_out["dir_mean"] < 15.0, eval_out
        assert eval_out["pos_mean"] < 0.10, eval_out

    def test_resim_chamfer(self, pipeline_run):
        *_, eval_out, root = pipeline_run
        assert eval_out["chamfer_mean"] < 0.25, eval_out

    def test_urdf_assembles_at_zero_config(self, pipeline_run):
        # the recovered URDF posed at q=0 must reproduce frame 0's geometry
        # (regression: mesh files were once written in tree order while the
        # URDF references them by link id — a silent scramble)
        import jax.numpy as jnp

        from autourdf_tpu.io import read_ply
        from autourdf_tpu.ops import chamfer_distance
        from autourdf_tpu.urdf import load_urdf, link_points_world, sample_link_surfaces

        cfg, seq_dirs, _, urdf_out, _, root = pipeline_run
        model = load_urdf(str(root / urdf_out["urdf_path"]))
        samples = sample_link_surfaces(model, total_points=4000)
        pts = link_points_world(model, samples, {})
        raw0 = read_ply(str(root / seq_dirs[0] / "0000" / "robot.ply"))
        d = float(chamfer_distance(
            jnp.asarray(pts, jnp.float32), jnp.asarray(raw0), backend="xla"
        ))
        # voxel meshing at 0.02 m dominates; a scramble would be >0.3
        assert d < 0.15, f"assembled chamfer {d}"

    def test_artifacts_roundtrip(self, pipeline_run):
        cfg, *_, root = pipeline_run
        from autourdf_tpu.io.artifacts import list_sequence_dirs, load_registration

        part = list_sequence_dirs(str(root / cfg.part_dir()))
        art = load_registration(part[0])
        assert art.matrices.shape[0] == cfg.num_step
        assert art.num_clusters == 6
        # rigid-transform sanity on every stored matrix
        rots = art.matrices[..., :3, :3]
        rtr = np.einsum("tkij,tkil->tkjl", rots, rots)
        np.testing.assert_allclose(
            rtr, np.broadcast_to(np.eye(3), rtr.shape), atol=1e-4
        )
