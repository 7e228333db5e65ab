"""Registration stack tests: model, optimizer scan, full-sequence pipeline.

Uses a synthetic 2-link hinge robot (two point-sampled boxes, one rotating
about the z-axis) — small enough for CPU, articulated enough to exercise
the step/anchor/resample loop end to end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autourdf_tpu.models import PoseRegressor, init_params
from autourdf_tpu.registration import (
    RegistrationConfig,
    initial_segments,
    predicted_world_points,
    register_sequence,
    train_pose_mlp,
    transform_by_labels,
)
from autourdf_tpu.registration.optimizer import (
    PlateauState,
    plateau_init,
    plateau_update,
)


def hinge_frames(num_frames=4, n_per_link=200, angle_step=0.15, seed=0):
    """Synthetic 2-link robot: base box + arm box rotating about z at origin."""
    rng = np.random.default_rng(seed)
    base = rng.uniform([-0.6, -0.15, -0.1], [-0.1, 0.15, 0.1], size=(n_per_link, 3))
    arm0 = rng.uniform([0.1, -0.1, -0.08], [0.7, 0.1, 0.08], size=(n_per_link, 3))
    frames = []
    for t in range(num_frames):
        a = t * angle_step
        rot = np.array(
            [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]]
        )
        frames.append(np.concatenate([base, arm0 @ rot.T]).astype(np.float32))
    return jnp.asarray(np.stack(frames))


class TestModel:
    @pytest.mark.parametrize("mode", ["q", "dq", "rpy", "6d"])
    def test_output_near_input_at_init(self, mode):
        # residual design: a freshly initialized MLP should perturb poses
        # only mildly (small random residuals), not destroy them
        model, params = init_params(jax.random.PRNGKey(0), mode, 6, hidden_dim=64)
        m = jnp.tile(jnp.eye(4), (6, 1, 1)).at[:, :3, 3].add(
            jnp.asarray(np.random.default_rng(1).normal(size=(6, 3)) * 0.3, jnp.float32)
        )
        out = model.apply(params, m)
        assert out.shape == (6, 4, 4)
        # rotation part stays orthonormal
        rtr = jnp.einsum("kij,kil->kjl", out[:, :3, :3], out[:, :3, :3])
        np.testing.assert_allclose(rtr, np.tile(np.eye(3), (6, 1, 1)), atol=1e-5)
        # translations move by bounded residual
        assert float(jnp.abs(out[:, :3, 3] - m[:, :3, 3]).max()) < 1.0

    def test_grad_flows(self):
        model, params = init_params(jax.random.PRNGKey(0), "q", 4, hidden_dim=32)
        m = jnp.tile(jnp.eye(4), (4, 1, 1))

        def loss(p):
            return jnp.sum(model.apply(p, m)[:, :3, 3] ** 2)

        g = jax.grad(loss)(params)
        total = sum(float(jnp.abs(x).sum()) for x in jax.tree.leaves(g))
        assert np.isfinite(total) and total > 0


class TestPlateauScheduler:
    def test_matches_pytorch_semantics(self):
        # loss sequence with a long plateau: lr must drop after patience+1
        # consecutive non-improving epochs
        s = plateau_init(1.0)
        losses = [1.0, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9, 0.9]
        lrs = []
        for l in losses:
            s = plateau_update(s, jnp.asarray(l), factor=0.5, patience=2)
            lrs.append(float(s.lr))
        # epochs: 1.0 improves (inf->1), 0.9 improves, then 5 bad epochs:
        # bad=1,2,3>2 -> reduce at 3rd bad epoch, counter resets, again at 6th
        assert lrs == [1.0, 1.0, 1.0, 1.0, 0.5, 0.5, 0.5, 0.25]


class TestTrainPoseMLP:
    def test_recovers_rigid_translation(self):
        # one cluster of points shifted by a known offset; the MLP pose
        # refinement should recover it via the chamfer objective
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(200, 3)) * 0.2, jnp.float32)
        offset = jnp.asarray([0.15, -0.1, 0.05], jnp.float32)
        target = pts + offset
        labels = jnp.zeros((200,), jnp.int32)
        m0 = jnp.eye(4)[None]

        model, params = init_params(jax.random.PRNGKey(1), "q", 1, hidden_dim=64)
        res = train_pose_mlp(
            model, params, m0, target, pts, labels,
            epochs=150, learning_rate=2e-3, chamfer_backend="xla",
        )
        assert float(res.best_loss) < 0.04
        np.testing.assert_allclose(
            np.asarray(res.best_matrices[0, :3, 3]), np.asarray(offset), atol=0.05
        )

    def test_best_loss_is_min_of_history(self):
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(100, 3)) * 0.2, jnp.float32)
        target = pts + jnp.asarray([0.1, 0, 0])
        model, params = init_params(jax.random.PRNGKey(1), "q", 1, hidden_dim=32)
        res = train_pose_mlp(
            model, params, jnp.eye(4)[None], target, pts,
            jnp.zeros((100,), jnp.int32), epochs=50, learning_rate=1e-3,
            chamfer_backend="xla",
        )
        finite = np.asarray(res.loss_history)
        finite = finite[np.isfinite(finite)]
        np.testing.assert_allclose(float(res.best_loss), finite.min(), rtol=1e-6)

    def test_early_stop_freezes(self):
        # with stop_patience=0, the run freezes after the first non-improving
        # epoch; history should be inf past that point
        rng = np.random.default_rng(0)
        pts = jnp.asarray(rng.normal(size=(50, 3)), jnp.float32)
        model, params = init_params(jax.random.PRNGKey(1), "q", 1, hidden_dim=32)
        res = train_pose_mlp(
            model, params, jnp.eye(4)[None], pts, pts,
            jnp.zeros((50,), jnp.int32), epochs=40, learning_rate=1e-3,
            stop_patience=0, chamfer_backend="xla",
        )
        hist = np.asarray(res.loss_history)
        assert np.isinf(hist[-1])  # froze before the end


class TestSequencePipeline:
    def test_two_link_sequence(self):
        frames = hinge_frames(num_frames=4, angle_step=0.12)
        key = jax.random.PRNGKey(0)
        init = initial_segments(key, frames[0], num_seg=4, n_init=2)
        cfg = RegistrationConfig(
            num_seg=4, epochs=80, chamfer_backend="xla", kmeans_iters=16,
            lr_step=1e-3, lr_anchor=5e-4,
        )
        model = PoseRegressor(mode="q", hidden_dim=64)
        _, sp = init_params(jax.random.PRNGKey(1), "q", 4, 64)
        _, ap = init_params(jax.random.PRNGKey(2), "q", 4, 64)
        res = register_sequence(model, cfg, sp, ap, init, frames)

        assert res.matrices.shape == (4, 4, 4, 4)
        assert res.local_points.shape == frames.shape
        assert res.losses.shape == (3,)
        # registered world points at each frame should be close to the frame
        from autourdf_tpu.ops import chamfer_distance

        for t in range(1, 4):
            pred = predicted_world_points(res, t)
            d = float(chamfer_distance(pred, frames[t], backend="xla"))
            assert d < 0.05, f"frame {t}: chamfer {d}"

    def test_fused_matches_batched(self):
        """register_sequences_fused (one compiled program, the directly-
        attached-TPU path) must produce the same artifacts as the batched
        per-phase-dispatch driver — identical math, different dispatch."""
        from autourdf_tpu.registration import (
            register_sequences_batched,
            register_sequences_fused,
        )

        S, K, H = 2, 4, 32
        frames = jnp.stack([
            hinge_frames(num_frames=3, angle_step=0.10, seed=0),
            hinge_frames(num_frames=3, angle_step=0.16, seed=0),
        ])  # (S, T, N, 3); same frame 0 -> shared init is exact
        init = initial_segments(jax.random.PRNGKey(0), frames[0, 0],
                                num_seg=K, n_init=2)
        cfg = RegistrationConfig(num_seg=K, hidden_dim=H, epochs=6,
                                 kmeans_iters=4, chamfer_backend="xla")
        model = PoseRegressor(mode="q", hidden_dim=H)

        def mk(key):
            _, p = init_params(key, "q", K, H)
            return p

        keys = jax.random.split(jax.random.PRNGKey(1), 2 * S)
        sp = jax.vmap(mk)(keys[:S])
        ap = jax.vmap(mk)(keys[S:])

        res_f = register_sequences_fused(model, cfg, sp, ap, init, frames)
        res_b = register_sequences_batched(model, cfg, sp, ap, init, frames)
        assert res_f.matrices.shape == res_b.matrices.shape == (S, 3, K, 4, 4)
        np.testing.assert_allclose(np.asarray(res_f.losses),
                                   np.asarray(res_b.losses), atol=1e-5)
        np.testing.assert_allclose(np.asarray(res_f.matrices),
                                   np.asarray(res_b.matrices), atol=1e-4)
        np.testing.assert_array_equal(np.asarray(res_f.labels),
                                      np.asarray(res_b.labels))

    def test_ragged_frames_masked_registration(self, tmp_path):
        """The real-scan path: ragged per-frame point counts, sentinel-padded
        with masks through the full registration driver, artifacts saved
        with only the valid rows (reference mlp_reg.py:424-426)."""
        import os

        from autourdf_tpu.config import ROBOTS, PipelineConfig, RobotConfig
        from autourdf_tpu.io.artifacts import load_registration
        from autourdf_tpu.io.ply import write_ply
        from autourdf_tpu.workflow import (
            load_raw_sequences_padded,
            run_registration,
        )

        frames = np.asarray(hinge_frames(num_frames=4, angle_step=0.15))
        counts = [400, 370, 355, 390]  # ragged, like real captures
        rng = np.random.default_rng(0)
        raw = str(tmp_path / "data" / "raw" / "ragged_toy" / "4_deg_20_cams")
        for t, n in enumerate(counts):
            d = os.path.join(raw, "V0000", f"{t:04}")
            os.makedirs(d, exist_ok=True)
            sel = rng.choice(len(frames[t]), n, replace=False)
            write_ply(os.path.join(d, "robot.ply"), frames[t][sel])
            np.savetxt(os.path.join(d, "joint_cfg.txt"), [t * 0.15])

        names, fr, masks = load_raw_sequences_padded(raw, 1)
        assert masks is not None and fr.shape == (1, 4, 400, 3)
        assert [int(m.sum()) for m in masks[0]] == counts

        ROBOTS["ragged_toy"] = RobotConfig(
            name="ragged_toy", num_seg=4, dof=1, gt_urdf="unused.urdf")
        cfg = PipelineConfig(robot="ragged_toy",
                             data_root=str(tmp_path / "data"),
                             num_videos=1, epochs=60)
        stats = run_registration(cfg, chamfer_backend="xla", verbose=False)
        assert np.isfinite(stats["mean_loss"])
        assert stats["mean_loss"] < 0.1

        # artifacts carry only the valid rows per frame
        part = os.path.join(str(tmp_path / "data"), "part",
                            "ragged_toy_4_seg", "4_deg_20_cams", "V0000")
        art = load_registration(part)
        assert [len(p) for p in art.cluster_points] == counts
        # and the registered world clouds match the (valid) targets
        from autourdf_tpu.ops import chamfer_distance
        from autourdf_tpu.registration import transform_by_labels

        for t in range(1, 4):
            pred = transform_by_labels(
                jnp.asarray(art.matrices[t], jnp.float32),
                jnp.asarray(art.cluster_points[t], jnp.float32),
                jnp.asarray(art.cluster_labels[t]),
            )
            tgt = jnp.asarray(fr[0, t][masks[0, t]], jnp.float32)
            d = float(chamfer_distance(pred, tgt, backend="xla"))
            assert d < 0.08, f"frame {t}: chamfer {d}"

    def test_shared_init_mask_with_larger_other_sequence(self, tmp_path):
        """Regression (real-scan, round 2): the init segmentation comes
        from sequence 0's frame 0; a sequence whose own frame 0 has MORE
        valid points must not apply its mask to the init points — that
        marks sentinel-padded rows valid and 1e6-coordinate points enter
        the loss (observed: losses 0.3-4.1 for every such sequence)."""
        import os

        from autourdf_tpu.config import ROBOTS, PipelineConfig, RobotConfig
        from autourdf_tpu.io.ply import write_ply
        from autourdf_tpu.workflow import run_registration

        frames = np.asarray(hinge_frames(num_frames=3, angle_step=0.15))
        rng = np.random.default_rng(0)
        raw = str(tmp_path / "data" / "raw" / "ragged2" / "4_deg_20_cams")
        # seq 0 frame 0 SMALLER than seq 1 frame 0 -> triggers the bug
        counts = [[300, 380, 340], [400, 360, 390]]
        for s in range(2):
            for t in range(3):
                d = os.path.join(raw, f"V{s:04}", f"{t:04}")
                os.makedirs(d, exist_ok=True)
                sel = rng.choice(len(frames[t]), counts[s][t], replace=False)
                write_ply(os.path.join(d, "robot.ply"), frames[t][sel])

        ROBOTS["ragged2"] = RobotConfig(
            name="ragged2", num_seg=4, dof=1, gt_urdf="unused.urdf")
        cfg = PipelineConfig(robot="ragged2",
                             data_root=str(tmp_path / "data"),
                             num_videos=2, epochs=60)
        stats = run_registration(cfg, chamfer_backend="xla", verbose=False)
        for loss in stats["final_losses"]:
            assert loss < 0.1, stats["final_losses"]

        # saved frame-0 artifacts are the SHARED init -> their row count is
        # sequence 0's frame-0 count for every sequence (not the sequence's
        # own), and no sentinel coordinates leak into the saved clouds
        from autourdf_tpu.io.artifacts import load_registration

        for s in range(2):
            art = load_registration(
                os.path.join(str(tmp_path / "data"), "part",
                             "ragged2_4_seg", "4_deg_20_cams", f"V{s:04}"))
            assert len(art.cluster_points[0]) == counts[0][0]
            for t in range(1, 3):
                assert len(art.cluster_points[t]) == counts[s][t]
                assert np.abs(art.cluster_points[t]).max() < 1e5

    def test_moving_cluster_follows_arm(self):
        # clusters assigned to the rotating arm must actually move
        frames = hinge_frames(num_frames=3, angle_step=0.25)
        init = initial_segments(jax.random.PRNGKey(0), frames[0], num_seg=4, n_init=2)
        cfg = RegistrationConfig(num_seg=4, epochs=80, chamfer_backend="xla",
                                 lr_step=1e-3, lr_anchor=5e-4, kmeans_iters=16)
        model = PoseRegressor(mode="q", hidden_dim=64)
        _, sp = init_params(jax.random.PRNGKey(1), "q", 4, 64)
        _, ap = init_params(jax.random.PRNGKey(2), "q", 4, 64)
        res = register_sequence(model, cfg, sp, ap, init, frames)

        centers0 = np.asarray(res.matrices[0, :, :3, 3])
        centers2 = np.asarray(res.matrices[2, :, :3, 3])
        moved = np.linalg.norm(centers2 - centers0, axis=1)
        arm_clusters = centers0[:, 0] > 0  # arm lives at x > 0
        assert moved[arm_clusters].max() > 0.05
        assert moved[~arm_clusters].min() < moved[arm_clusters].max()
