"""Tests: device-mesh sharding (virtual 8-CPU mesh), native lib, viz."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest


class TestSharding:
    def test_sharded_chamfer_matches_single(self, rng):
        from autourdf_tpu.ops import chamfer_distance
        from autourdf_tpu.parallel import make_mesh, sharded_chamfer

        x = jnp.asarray(rng.normal(size=(128, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        mesh = make_mesh((8,), ("sp",))
        loss_sharded = float(sharded_chamfer(mesh, x, y))
        loss_single = float(chamfer_distance(x, y, backend="xla"))
        np.testing.assert_allclose(loss_sharded, loss_single, rtol=1e-5)

    def test_sharded_chamfer_nondivisible_and_masked(self, rng):
        from autourdf_tpu.ops import chamfer_distance
        from autourdf_tpu.parallel import make_mesh, sharded_chamfer

        mesh = make_mesh((8,), ("sp",))
        # M not a multiple of the mesh size exercises sentinel padding
        x = jnp.asarray(rng.normal(size=(101, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(203, 3)), jnp.float32)
        np.testing.assert_allclose(
            float(sharded_chamfer(mesh, x, y)),
            float(chamfer_distance(x, y, backend="xla")),
            rtol=1e-5,
        )
        # with masks on both sides
        xm = jnp.asarray(rng.random(101) < 0.8)
        ym = jnp.asarray(rng.random(203) < 0.7)
        np.testing.assert_allclose(
            float(sharded_chamfer(mesh, x, y, xm, ym)),
            float(chamfer_distance(x, y, xm, ym, backend="xla")),
            rtol=1e-5,
        )

    def test_sharded_chamfer_grad_matches_single(self, rng):
        from autourdf_tpu.ops import chamfer_distance
        from autourdf_tpu.parallel import make_mesh, sharded_chamfer

        mesh = make_mesh((8,), ("sp",))
        x = jnp.asarray(rng.normal(size=(64, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(160, 3)), jnp.float32)
        gx_s, gy_s = jax.grad(
            lambda x, y: sharded_chamfer(mesh, x, y), argnums=(0, 1)
        )(x, y)
        gx_1, gy_1 = jax.grad(
            lambda x, y: chamfer_distance(x, y, backend="xla"), argnums=(0, 1)
        )(x, y)
        np.testing.assert_allclose(np.asarray(gx_s), np.asarray(gx_1), atol=1e-6)
        np.testing.assert_allclose(np.asarray(gy_s), np.asarray(gy_1), atol=1e-6)

    def test_mesh_scope_resolution(self):
        """active_mesh() must resolve both activation paths — this test
        failing means chamfer auto-sharding silently broke (the loud
        version-skew guard VERDICT r2 asked for)."""
        from autourdf_tpu.parallel import active_mesh, make_mesh, mesh_scope

        assert active_mesh() is None
        mesh = make_mesh((8,), ("sp",))
        with mesh_scope(mesh) as m:
            assert m is mesh
            assert active_mesh() is mesh
        assert active_mesh() is None
        # jax's public ambient-mesh API is the second resolution path
        set_mesh = getattr(jax.sharding, "set_mesh", None)
        if set_mesh is not None:
            with set_mesh(mesh):
                assert active_mesh() is not None
                assert active_mesh().axis_names == ("sp",)
            assert active_mesh() is None
        # nested scopes: innermost wins
        dp = make_mesh((8,), ("dp",))
        with mesh_scope(mesh):
            with mesh_scope(dp):
                assert active_mesh() is dp
            assert active_mesh() is mesh

    def test_chamfer_auto_shards_in_mesh_scope(self, rng, monkeypatch):
        import autourdf_tpu.ops.chamfer as cham_mod
        from autourdf_tpu.parallel import make_mesh, mesh_scope

        # drop the threshold so a small cloud triggers the sharded path
        monkeypatch.setattr(cham_mod, "AUTO_SHARD_MIN_M", 128)
        calls = []
        import autourdf_tpu.parallel.sharding as sh_mod

        orig = sh_mod.sharded_chamfer

        def spy(*a, **k):
            calls.append(1)
            return orig(*a, **k)

        monkeypatch.setattr(sh_mod, "sharded_chamfer", spy)
        x = jnp.asarray(rng.normal(size=(96, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        baseline = float(cham_mod.chamfer_distance(x, y, backend="xla"))
        mesh = make_mesh((8,), ("sp",))
        with mesh_scope(mesh):
            auto = float(cham_mod.chamfer_distance(x, y, backend="xla"))
        assert calls, "mesh-scoped large chamfer did not dispatch to the sharded path"
        np.testing.assert_allclose(auto, baseline, rtol=1e-5)
        # outside the scope: single-device path, no extra calls
        n_calls = len(calls)
        _ = float(cham_mod.chamfer_distance(x, y, backend="xla"))
        assert len(calls) == n_calls

    def test_chamfer_large_m_inside_jit_no_ambient_mesh(self, rng, monkeypatch):
        """Above the auto-shard threshold, the ambient-mesh probe must not
        blow up inside jit tracing (jax.sharding.get_mesh raises there) —
        a 32768-point chamfer under jax.grad crashed on-chip before the
        ValueError fallback in parallel.sharding.active_mesh."""
        import jax

        import autourdf_tpu.ops.chamfer as cham_mod

        monkeypatch.setattr(cham_mod, "AUTO_SHARD_MIN_M", 128)
        x = jnp.asarray(rng.normal(size=(96, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)

        @jax.jit
        def loss(a):
            return cham_mod.chamfer_distance(a, y, backend="xla")

        v = float(loss(x))
        g = jax.jit(jax.grad(loss))(x)
        ref = float(cham_mod.chamfer_distance(x, y, backend="xla"))
        np.testing.assert_allclose(v, ref, rtol=1e-5)
        assert np.isfinite(np.asarray(g)).all()

    def test_dp_sp_train_step_matches_unsharded(self, rng):
        """Combined (dp, sp) mesh: the collective-chamfer training step
        must match the plain single-device train_epochs run."""
        from autourdf_tpu.models import PoseRegressor, init_params
        from autourdf_tpu.parallel import make_mesh, train_step_dp_sp
        from autourdf_tpu.registration.optimizer import (
            train_epochs,
            train_init,
        )

        S, N, M, K, H = 4, 96, 128, 3, 32
        model = PoseRegressor(mode="q", hidden_dim=H)

        def mk(key):
            _, p = init_params(key, "q", K, H)
            return p

        params = jax.vmap(mk)(jax.random.split(jax.random.PRNGKey(3), S))
        mats = np.tile(np.eye(4, dtype=np.float32), (S, K, 1, 1))
        mats[:, :, :3, 3] = rng.normal(scale=0.2, size=(S, K, 3))
        mats = jnp.asarray(mats)
        targets = jnp.asarray(rng.normal(scale=0.3, size=(S, M, 3)), jnp.float32)
        points = jnp.asarray(rng.normal(scale=0.1, size=(S, N, 3)), jnp.float32)
        labels = jnp.asarray(rng.integers(0, K, size=(S, N)), jnp.int32)

        mesh = make_mesh((2, 2), ("dp", "sp"))
        best_m, best_l = train_step_dp_sp(
            mesh, model, params, mats, targets, points, labels, num_epochs=4)

        def plain(p, m, t, pts, lab):
            c = train_init(p, m, 2e-4)
            c, _ = train_epochs(model, c, m, t, pts, lab, 4,
                                chamfer_backend="xla")
            return c.best_m, c.best_loss

        ref_m, ref_l = jax.vmap(plain)(params, mats, targets, points, labels)
        np.testing.assert_allclose(np.asarray(best_l), np.asarray(ref_l),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(best_m), np.asarray(ref_m),
                                   atol=1e-5)

    def test_dp_registration_matches_unsharded(self, rng):
        from autourdf_tpu.models import PoseRegressor, init_params
        from autourdf_tpu.parallel import (
            make_mesh,
            mesh_scope,
            register_sequences_sharded,
        )
        from autourdf_tpu.registration import (
            RegistrationConfig,
            SegmentInit,
            register_sequences_batched,
        )

        S, T, N, K = 4, 3, 128, 4
        frames = jnp.asarray(rng.normal(size=(S, T, N, 3)) * 0.3, jnp.float32)
        centers = rng.normal(size=(K, 3)).astype(np.float32) * 0.3
        m0 = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        m0[:, :3, 3] = centers
        labels = rng.integers(0, K, N).astype(np.int32)
        init = SegmentInit(
            jnp.asarray(m0),
            frames[0, 0] - jnp.asarray(centers)[labels],
            jnp.asarray(labels),
        )
        model = PoseRegressor(mode="q", hidden_dim=32)

        def mk(key):
            _, p = init_params(key, "q", K, 32)
            return p

        keys = jax.random.split(jax.random.PRNGKey(0), 2 * S)
        sp = jax.vmap(mk)(keys[:S])
        ap = jax.vmap(mk)(keys[S:])
        cfg = RegistrationConfig(num_seg=K, hidden_dim=32, epochs=5,
                                 kmeans_iters=4, chamfer_backend="xla")

        res_plain = register_sequences_batched(model, cfg, sp, ap, init, frames)
        mesh = make_mesh((4,), ("dp",))
        with mesh_scope(mesh):
            res_shard = register_sequences_sharded(mesh, model, cfg, sp, ap, init, frames)
        np.testing.assert_allclose(
            np.asarray(res_plain.losses), np.asarray(res_shard.losses), atol=1e-5
        )


class TestNative:
    def test_available_or_skipped(self):
        from autourdf_tpu.io import native

        if not native.available():
            pytest.skip("native lib not built in this environment")

    def test_marching_matches_python(self, rng):
        from autourdf_tpu.io import native

        if not native.available():
            pytest.skip("native lib not built")
        from autourdf_tpu.mesh.marching import marching_tetrahedra

        vol = rng.random((10, 10, 10)) > 0.6
        # native path (module-level dispatch uses native when available)
        m_nat = marching_tetrahedra(vol, 0.01)
        # forced python path
        old_lib, old_tried = native._LIB, native._TRIED
        native._LIB, native._TRIED = None, True
        try:
            m_py = marching_tetrahedra(vol, 0.01)
        finally:
            native._LIB, native._TRIED = old_lib, old_tried
        assert len(m_nat.faces) == len(m_py.faces)
        vn = set(map(tuple, np.round(m_nat.vertices * 1e6).astype(np.int64)))
        vp = set(map(tuple, np.round(m_py.vertices * 1e6).astype(np.int64)))
        assert vn == vp

    def test_native_ply_roundtrip(self, tmp_path, rng):
        from autourdf_tpu.io import native

        if not native.available():
            pytest.skip("native lib not built")
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        p = str(tmp_path / "c.ply")
        assert native.write_ply_native(p, pts)
        back = native.read_ply_native(p)
        np.testing.assert_array_equal(back, pts)
        # and the generic reader must agree
        from autourdf_tpu.io import read_ply

        np.testing.assert_array_equal(read_ply(p), pts)


class TestViz:
    def test_all_renderers_produce_files(self, tmp_path, rng):
        from autourdf_tpu import viz

        pts = rng.normal(size=(200, 3))
        labels = rng.integers(0, 4, 200)
        d = str(tmp_path)
        outs = [
            viz.render_cloud(pts, f"{d}/cloud.png"),
            viz.render_clusters(pts, labels, f"{d}/clusters.png"),
            viz.plot_silhouette_scores([2, 3, 4], [0.5, 0.8, 0.3], f"{d}/sil.png"),
            viz.plot_distance_map(rng.random((6, 6)), f"{d}/dmap.png"),
            viz.plot_loss_history(rng.random(50), f"{d}/loss.png"),
            viz.animate_clouds([pts, pts + 0.1], f"{d}/anim.gif"),
        ]
        for o in outs:
            assert os.path.getsize(o) > 1000

    def test_mesh_render(self, tmp_path, rng):
        from autourdf_tpu import viz
        from autourdf_tpu.mesh import marching_tetrahedra

        vol = np.zeros((6, 6, 6), bool)
        vol[2:4, 2:4, 2:4] = True
        mesh = marching_tetrahedra(vol)
        out = viz.render_mesh(mesh, str(tmp_path / "mesh.png"))
        assert os.path.getsize(out) > 1000
