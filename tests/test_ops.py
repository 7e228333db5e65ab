"""Tests for the NN/Chamfer/k-means/FPS kernels against numpy oracles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from autourdf_tpu.ops import (
    chamfer_distance,
    farthest_point_sample,
    kmeans,
    lloyd,
    nn_search,
)
from autourdf_tpu.ops.knn import (
    PAD_COORD,
    _bidir_vmem_ok,
    nn_min_bidirectional,
    nn_search_bidirectional,
)


def brute_nn(x, y, norm):
    diff = x[:, None, :] - y[None, :, :]
    d = np.abs(diff).sum(-1) if norm == 1 else (diff**2).sum(-1)
    return d.min(1), d.argmin(1)


def brute_chamfer(x, y, norm):
    dx, _ = brute_nn(x, y, norm)
    dy, _ = brute_nn(y, x, norm)
    return dx.mean() + dy.mean()


class TestNN:
    @pytest.mark.parametrize("norm", [1, 2])
    @pytest.mark.parametrize("backend", ["xla", "pallas_interpret"])
    def test_matches_bruteforce(self, rng, norm, backend):
        x = rng.normal(size=(300, 3)).astype(np.float32)
        y = rng.normal(size=(420, 3)).astype(np.float32)
        d, i = nn_search(jnp.asarray(x), jnp.asarray(y), norm=norm, backend=backend)
        d_ref, i_ref = brute_nn(x, y, norm)
        np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), i_ref)

    def test_nonmultiple_sizes(self, rng):
        # sizes that are not multiples of the tile sizes exercise padding
        x = rng.normal(size=(37, 3)).astype(np.float32)
        y = rng.normal(size=(53, 3)).astype(np.float32)
        d, i = nn_search(jnp.asarray(x), jnp.asarray(y), norm=1, backend="pallas_interpret")
        d_ref, i_ref = brute_nn(x, y, 1)
        np.testing.assert_allclose(np.asarray(d), d_ref, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(i), i_ref)


class TestBidirectionalNN:
    """Parity coverage for the fused production kernel
    (ops/knn.py::_nn_bidir_pallas) including the per-tile column-minima
    fold — the path the TPU chamfer actually dispatches."""

    @pytest.mark.parametrize("norm", [1, 2])
    def test_matches_two_unidirectional(self, rng, norm):
        x = rng.normal(size=(300, 3)).astype(np.float32)
        y = rng.normal(size=(420, 3)).astype(np.float32)
        dx, ix, dy, iy = nn_search_bidirectional(
            jnp.asarray(x), jnp.asarray(y), norm=norm, backend="pallas_interpret"
        )
        dx_r, ix_r = brute_nn(x, y, norm)
        dy_r, iy_r = brute_nn(y, x, norm)
        np.testing.assert_allclose(np.asarray(dx), dx_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dy), dy_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ix), ix_r)
        np.testing.assert_array_equal(np.asarray(iy), iy_r)

    @pytest.mark.parametrize("norm", [1, 2])
    def test_accumulator_variant_matches(self, rng, norm):
        """The large-cloud accumulator kernel (_nn_bidir_pallas_acc,
        column minima in one revisited (1, M) block) must match the brute
        oracle exactly, including first-min argmin tie semantics."""
        from autourdf_tpu.ops.knn import _nn_bidir_pallas_acc

        x = rng.normal(size=(517, 3)).astype(np.float32)
        y = rng.normal(size=(333, 3)).astype(np.float32)
        dx, ix, dy, iy = _nn_bidir_pallas_acc(
            jnp.asarray(x), jnp.asarray(y), norm, 64, True)
        dx_r, ix_r = brute_nn(x, y, norm)
        dy_r, iy_r = brute_nn(y, x, norm)
        np.testing.assert_allclose(np.asarray(dx), dx_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dy), dy_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ix), ix_r)
        np.testing.assert_array_equal(np.asarray(iy), iy_r)

    def test_nonmultiple_sizes_multi_tile(self, rng):
        # > 1 x-tile (tx<=256) with non-multiple sizes: exercises both the
        # x padding and the cross-tile column-minima fold at knn.py:202-205
        x = rng.normal(size=(517, 3)).astype(np.float32)
        y = rng.normal(size=(333, 3)).astype(np.float32)
        dx, ix, dy, iy = nn_search_bidirectional(
            jnp.asarray(x), jnp.asarray(y), norm=1, backend="pallas_interpret"
        )
        dx_r, ix_r = brute_nn(x, y, 1)
        dy_r, iy_r = brute_nn(y, x, 1)
        np.testing.assert_allclose(np.asarray(dx), dx_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dy), dy_r, rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(ix), ix_r)
        np.testing.assert_array_equal(np.asarray(iy), iy_r)

    def test_column_fold_picks_global_minimum_across_tiles(self, rng):
        # construct y points whose nearest x lives in a *late* tile so a
        # broken fold (e.g. first-tile bias) fails loudly
        x = rng.normal(size=(512, 3)).astype(np.float32) + 10.0
        x[500] = (0.0, 0.0, 0.0)  # the only x near the origin, in tile 2
        y = rng.normal(scale=0.01, size=(64, 3)).astype(np.float32)
        dx, ix, dy, iy = nn_search_bidirectional(
            jnp.asarray(x), jnp.asarray(y), norm=1, backend="pallas_interpret"
        )
        assert np.all(np.asarray(iy) == 500)

    def test_padded_sentinel_inputs(self, rng):
        # sentinel-padded x and y rows must never be selected in either
        # direction for the *real* rows
        x = np.concatenate([rng.normal(size=(90, 3)), np.full((38, 3), PAD_COORD)])
        y = np.concatenate([rng.normal(size=(70, 3)), np.full((58, 3), PAD_COORD)])
        x, y = x.astype(np.float32), y.astype(np.float32)
        dx, ix, dy, iy = nn_search_bidirectional(
            jnp.asarray(x), jnp.asarray(y), norm=1, backend="pallas_interpret"
        )
        assert np.all(np.asarray(ix[:90]) < 70)
        assert np.all(np.asarray(iy[:70]) < 90)
        dx_r, ix_r = brute_nn(x[:90], y[:70], 1)
        np.testing.assert_allclose(np.asarray(dx[:90]), dx_r, rtol=1e-5, atol=1e-6)

    def test_vmem_budget_predicate(self):
        # the default workload fits the fused kernel; very large clouds do not
        assert _bidir_vmem_ok(300, 400, 256)
        assert _bidir_vmem_ok(5000, 5000, 64)
        n_big = 100_000
        assert not any(_bidir_vmem_ok(n_big, n_big, t) for t in (256, 128, 64))


class TestMinOnlyBidirectionalNN:
    """The forward-only chamfer primitive (ops/knn.py::nn_min_bidirectional):
    min distances both directions with no argmin bookkeeping — the primal
    body of the chamfer custom-VJP dispatches here."""

    @pytest.mark.parametrize("norm", [1, 2])
    def test_matches_bruteforce(self, rng, norm):
        x = rng.normal(size=(300, 3)).astype(np.float32)
        y = rng.normal(size=(420, 3)).astype(np.float32)
        dx, dy = nn_min_bidirectional(
            jnp.asarray(x), jnp.asarray(y), norm=norm, backend="pallas_interpret"
        )
        np.testing.assert_allclose(np.asarray(dx), brute_nn(x, y, norm)[0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dy), brute_nn(y, x, norm)[0],
                                   rtol=1e-5, atol=1e-6)

    def test_multi_tile_accumulator(self, rng):
        # > 1 x-tile with non-multiple sizes: exercises the revisited
        # (1, M) column-min accumulator across sequential grid steps
        x = rng.normal(size=(517, 3)).astype(np.float32)
        y = rng.normal(size=(333, 3)).astype(np.float32)
        from autourdf_tpu.ops.knn import _nn_min_bidir_pallas

        dx, dy = _nn_min_bidir_pallas(jnp.asarray(x), jnp.asarray(y), 1, 64, True)
        np.testing.assert_allclose(np.asarray(dx), brute_nn(x, y, 1)[0],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(dy), brute_nn(y, x, 1)[0],
                                   rtol=1e-5, atol=1e-6)

    def test_forward_value_equals_grad_path_value(self, rng):
        # the custom-VJP primal (min-only kernel) and fwd rule (indexed
        # kernel) must agree on the loss value exactly
        x = jnp.asarray(rng.normal(size=(150, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(170, 3)).astype(np.float32))
        fwd_only = chamfer_distance(x, y, backend="pallas_interpret")
        with_grad, _ = jax.value_and_grad(
            lambda a: chamfer_distance(a, y, backend="pallas_interpret"))(x)
        np.testing.assert_allclose(np.asarray(fwd_only), np.asarray(with_grad),
                                   rtol=1e-6)

    def test_two_pass_fallback_dispatch(self, rng, monkeypatch):
        # force the budget check to fail so the two-pass fallback branch of
        # nn_search_bidirectional runs, and stays exact
        import autourdf_tpu.ops.knn as knn_mod

        monkeypatch.setattr(knn_mod, "_bidir_vmem_ok", lambda n, m, t: False)
        x = rng.normal(size=(200, 3)).astype(np.float32)
        y = rng.normal(size=(150, 3)).astype(np.float32)
        dx, ix, dy, iy = knn_mod.nn_search_bidirectional(
            jnp.asarray(x), jnp.asarray(y), norm=1, backend="pallas_interpret"
        )
        dx_r, ix_r = brute_nn(x, y, 1)
        dy_r, iy_r = brute_nn(y, x, 1)
        np.testing.assert_array_equal(np.asarray(ix), ix_r)
        np.testing.assert_array_equal(np.asarray(iy), iy_r)
        np.testing.assert_allclose(np.asarray(dx), dx_r, rtol=1e-5, atol=1e-6)

    @pytest.mark.parametrize("norm", [1, 2])
    def test_chamfer_through_fused_kernel(self, rng, norm):
        x = rng.normal(size=(260, 3)).astype(np.float32)
        y = rng.normal(size=(317, 3)).astype(np.float32)
        loss = chamfer_distance(
            jnp.asarray(x), jnp.asarray(y), norm=norm, backend="pallas_interpret"
        )
        np.testing.assert_allclose(float(loss), brute_chamfer(x, y, norm), rtol=1e-5)

    def test_chamfer_masked_through_fused_kernel(self, rng):
        x = rng.normal(size=(100, 3)).astype(np.float32)
        y = rng.normal(size=(90, 3)).astype(np.float32)
        ref = brute_chamfer(x, y, 1)
        xp = np.concatenate([x, np.full((28, 3), 7.7, np.float32)])
        yp = np.concatenate([y, np.full((38, 3), -9.9, np.float32)])
        xm = np.arange(128) < 100
        ym = np.arange(128) < 90
        loss = chamfer_distance(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(xm), jnp.asarray(ym),
            backend="pallas_interpret",
        )
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_chamfer_grad_through_fused_kernel(self, rng):
        x = rng.normal(size=(40, 3)).astype(np.float32)
        y = rng.normal(size=(50, 3)).astype(np.float32)

        def f(x):
            return chamfer_distance(x, jnp.asarray(y), backend="pallas_interpret")

        g = np.asarray(jax.grad(f)(jnp.asarray(x)))
        eps = 1e-3
        for (i, d) in [(0, 0), (7, 1), (21, 2), (39, 0)]:
            xp = x.copy(); xp[i, d] += eps
            xm = x.copy(); xm[i, d] -= eps
            fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
            np.testing.assert_allclose(g[i, d], fd, atol=2e-3)


class TestChamfer:
    @pytest.mark.parametrize("norm", [1, 2])
    def test_matches_bruteforce(self, rng, norm):
        x = rng.normal(size=(256, 3)).astype(np.float32)
        y = rng.normal(size=(300, 3)).astype(np.float32)
        loss = chamfer_distance(jnp.asarray(x), jnp.asarray(y), norm=norm, backend="xla")
        np.testing.assert_allclose(float(loss), brute_chamfer(x, y, norm), rtol=1e-5)

    def test_identical_clouds_zero(self, rng):
        x = rng.normal(size=(128, 3)).astype(np.float32)
        loss = chamfer_distance(jnp.asarray(x), jnp.asarray(x), backend="xla")
        assert float(loss) < 1e-6

    def test_masked_equals_unpadded(self, rng):
        x = rng.normal(size=(100, 3)).astype(np.float32)
        y = rng.normal(size=(90, 3)).astype(np.float32)
        ref = brute_chamfer(x, y, 1)
        xp = np.concatenate([x, np.full((28, 3), 7.7, np.float32)])
        yp = np.concatenate([y, np.full((38, 3), -9.9, np.float32)])
        xm = np.arange(128) < 100
        ym = np.arange(128) < 90
        loss = chamfer_distance(
            jnp.asarray(xp), jnp.asarray(yp), jnp.asarray(xm), jnp.asarray(ym),
            backend="xla",
        )
        np.testing.assert_allclose(float(loss), ref, rtol=1e-5)

    def test_gradient_matches_fd(self, rng):
        x = rng.normal(size=(40, 3)).astype(np.float32)
        y = rng.normal(size=(50, 3)).astype(np.float32)

        def f(x):
            return chamfer_distance(x, jnp.asarray(y), backend="xla")

        g = np.asarray(jax.grad(f)(jnp.asarray(x)))
        # central finite differences on a few coordinates
        eps = 1e-3
        for (i, d) in [(0, 0), (7, 1), (21, 2), (39, 0)]:
            xp = x.copy(); xp[i, d] += eps
            xm = x.copy(); xm[i, d] -= eps
            fd = (float(f(jnp.asarray(xp))) - float(f(jnp.asarray(xm)))) / (2 * eps)
            np.testing.assert_allclose(g[i, d], fd, atol=2e-3)

    @pytest.mark.parametrize("norm", [1, 2])
    @pytest.mark.parametrize("masked", [False, True])
    def test_custom_vjp_matches_gather_rebuild_autodiff(self, rng, norm, masked):
        """The scatter-free custom VJP must agree with plain autodiff
        through the explicit gather + pointwise rebuild of the loss."""
        from autourdf_tpu.ops.chamfer import (
            _apply_mask, _masked_mean, _pointwise,
        )
        from autourdf_tpu.ops.knn import nn_search_bidirectional

        x = jnp.asarray(rng.normal(size=(70, 3)), dtype=jnp.float32)
        y = jnp.asarray(rng.normal(size=(55, 3)), dtype=jnp.float32)
        xm = jnp.asarray(rng.random(70) > 0.2) if masked else None
        ym = jnp.asarray(rng.random(55) > 0.2) if masked else None

        def rebuilt(x, y):
            xs = _apply_mask(x, xm)
            ys = _apply_mask(y, ym)
            _, ix, _, iy = nn_search_bidirectional(
                jax.lax.stop_gradient(xs), jax.lax.stop_gradient(ys),
                norm, "xla",
            )
            d_xy = _pointwise(x - y[ix], norm)
            d_yx = _pointwise(y - x[iy], norm)
            return _masked_mean(d_xy, xm) + _masked_mean(d_yx, ym)

        def cvjp(x, y):
            return chamfer_distance(x, y, xm, ym, norm=norm, backend="xla")

        l1, (g1x, g1y) = jax.value_and_grad(rebuilt, argnums=(0, 1))(x, y)
        l2, (g2x, g2y) = jax.value_and_grad(cvjp, argnums=(0, 1))(x, y)
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(g1x), np.asarray(g2x), atol=1e-6)
        np.testing.assert_allclose(np.asarray(g1y), np.asarray(g2y), atol=1e-6)

    def test_grad_flows_to_both_inputs(self, rng):
        x = jnp.asarray(rng.normal(size=(30, 3)), dtype=jnp.float32)
        y = jnp.asarray(rng.normal(size=(30, 3)), dtype=jnp.float32)
        gx, gy = jax.grad(
            lambda x, y: chamfer_distance(x, y, backend="xla"), argnums=(0, 1)
        )(x, y)
        assert float(jnp.abs(gx).sum()) > 0 and float(jnp.abs(gy).sum()) > 0

    def test_vmap(self, rng):
        xs = rng.normal(size=(3, 64, 3)).astype(np.float32)
        ys = rng.normal(size=(3, 80, 3)).astype(np.float32)
        batched = jax.vmap(lambda a, b: chamfer_distance(a, b, backend="xla"))(
            jnp.asarray(xs), jnp.asarray(ys)
        )
        for b in range(3):
            np.testing.assert_allclose(
                float(batched[b]), brute_chamfer(xs[b], ys[b], 1), rtol=1e-5
            )


class TestCorrespondenceAPI:
    def test_from_indices_equals_chamfer_when_fresh(self, rng):
        from autourdf_tpu.ops.chamfer import (
            chamfer_correspondences,
            chamfer_from_indices,
        )

        x = jnp.asarray(rng.normal(size=(120, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(140, 3)), jnp.float32)
        ix, iy = chamfer_correspondences(x, y, backend="xla")
        np.testing.assert_allclose(
            float(chamfer_from_indices(x, y, ix, iy)),
            float(chamfer_distance(x, y, backend="xla")),
            rtol=1e-6,
        )

    def test_stale_indices_upper_bound(self, rng):
        from autourdf_tpu.ops.chamfer import (
            chamfer_correspondences,
            chamfer_from_indices,
        )

        x = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        ix, iy = chamfer_correspondences(x, y, backend="xla")
        x2 = x + 0.05 * jnp.asarray(rng.normal(size=(100, 3)), jnp.float32)
        stale = float(chamfer_from_indices(x2, y, ix, iy))
        true = float(chamfer_distance(x2, y, backend="xla"))
        assert stale >= true - 1e-6

    def test_masked_from_indices(self, rng):
        from autourdf_tpu.ops.chamfer import (
            chamfer_correspondences,
            chamfer_from_indices,
        )

        x = rng.normal(size=(80, 3)).astype(np.float32)
        y = rng.normal(size=(90, 3)).astype(np.float32)
        xm = jnp.asarray(np.arange(80) < 60)
        ym = jnp.asarray(np.arange(90) < 70)
        xj, yj = jnp.asarray(x), jnp.asarray(y)
        ix, iy = chamfer_correspondences(xj, yj, xm, ym, backend="xla")
        np.testing.assert_allclose(
            float(chamfer_from_indices(xj, yj, ix, iy, xm, ym)),
            float(chamfer_distance(xj, yj, xm, ym, backend="xla")),
            rtol=1e-6,
        )


class TestAmortizedTraining:
    def _setup(self, rng, K=4, N=200):
        import jax as _jax

        from autourdf_tpu.models.regmlp import init_params

        centers = rng.normal(scale=0.3, size=(K, 3)).astype(np.float32)
        m0 = np.tile(np.eye(4, dtype=np.float32), (K, 1, 1))
        m0[:, :3, 3] = centers
        labels = rng.integers(0, K, N).astype(np.int32)
        pts = rng.normal(scale=0.05, size=(N, 3)).astype(np.float32)
        world = pts + centers[labels]
        target = world + np.float32(0.02)  # small rigid shift to recover
        model, params = init_params(_jax.random.PRNGKey(0), "q", K, 32)
        return (model, params, jnp.asarray(m0), jnp.asarray(target),
                jnp.asarray(pts), jnp.asarray(labels))

    def test_amortized_converges_close_to_exact(self, rng):
        from autourdf_tpu.registration.optimizer import train_pose_mlp

        model, params, m0, target, pts, labels = self._setup(rng)
        exact = train_pose_mlp(model, params, m0, target, pts, labels,
                               epochs=60, chamfer_backend="xla")
        amort = train_pose_mlp(model, params, m0, target, pts, labels,
                               epochs=60, chamfer_backend="xla", corr_every=4)
        # both must reduce the loss strongly and land in the same regime
        assert float(amort.best_loss) < 0.7 * float(amort.loss_history[0])
        assert float(amort.best_loss) <= 1.25 * float(exact.best_loss) + 1e-4

    def test_corr_every_one_is_exact_path(self, rng):
        from autourdf_tpu.registration.optimizer import train_pose_mlp

        model, params, m0, target, pts, labels = self._setup(rng)
        a = train_pose_mlp(model, params, m0, target, pts, labels,
                           epochs=20, chamfer_backend="xla")
        b = train_pose_mlp(model, params, m0, target, pts, labels,
                           epochs=20, chamfer_backend="xla", corr_every=1)
        np.testing.assert_allclose(
            np.asarray(a.loss_history), np.asarray(b.loss_history), rtol=1e-6
        )

    def test_indivisible_epochs_raise(self, rng):
        from autourdf_tpu.registration.optimizer import train_pose_mlp

        model, params, m0, target, pts, labels = self._setup(rng)
        with pytest.raises(ValueError):
            train_pose_mlp(model, params, m0, target, pts, labels,
                           epochs=25, chamfer_backend="xla", corr_every=4)


class TestKMeans:
    def test_lloyd_converges_to_sklearn(self, rng):
        from sklearn.cluster import k_means as sk_kmeans

        pts = np.concatenate(
            [rng.normal(loc=c, scale=0.05, size=(100, 3)) for c in
             [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1)]]
        ).astype(np.float32)
        init = np.asarray([(0.1, 0, 0), (0.9, 0.1, 0), (0, 0.9, 0), (0, 0, 1.1)], np.float32)
        res = lloyd(jnp.asarray(pts), jnp.asarray(init), iters=32)
        sk_centers, sk_labels, _ = sk_kmeans(pts, 4, init=init, n_init=1)
        # same partition (up to identical label ids since both warm-start)
        np.testing.assert_array_equal(np.asarray(res.labels), sk_labels)
        np.testing.assert_allclose(np.asarray(res.centers), sk_centers, atol=1e-4)

    def test_warm_start_preserves_cluster_identity(self, rng):
        # moving clusters slightly should keep labels stable under warm start
        pts = np.concatenate(
            [rng.normal(loc=c, scale=0.03, size=(50, 3)) for c in
             [(0, 0, 0), (1, 1, 1)]]
        ).astype(np.float32)
        init = np.asarray([(0.05, 0, 0), (0.95, 1, 1)], np.float32)
        res = lloyd(jnp.asarray(pts), jnp.asarray(init), iters=16)
        assert set(np.asarray(res.labels[:50])) == {0}
        assert set(np.asarray(res.labels[50:])) == {1}

    def test_kmeanspp_full(self, rng):
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        res = kmeans(jax.random.PRNGKey(0), jnp.asarray(pts), k=8, iters=16, n_init=2)
        assert res.labels.shape == (200,)
        assert len(np.unique(np.asarray(res.labels))) == 8
        assert np.isfinite(float(res.inertia))

    def test_mask_excludes_points(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        pts[50:] += 100.0  # junk region
        mask = np.arange(100) < 50
        init = pts[:4].copy()
        res = lloyd(jnp.asarray(pts), jnp.asarray(init), iters=16, mask=jnp.asarray(mask))
        assert np.all(np.abs(np.asarray(res.centers)) < 10)


class TestFPS:
    def test_spreads_points(self, rng):
        pts = rng.normal(size=(500, 3)).astype(np.float32)
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 50))
        assert len(np.unique(idx)) == 50
        # FPS min pairwise distance should beat random sampling's
        sub = pts[idx]
        d = np.linalg.norm(sub[:, None] - sub[None, :], axis=-1)
        np.fill_diagonal(d, np.inf)
        rnd = pts[rng.choice(500, 50, replace=False)]
        dr = np.linalg.norm(rnd[:, None] - rnd[None, :], axis=-1)
        np.fill_diagonal(dr, np.inf)
        assert d.min() > dr.min()

    def test_starts_at_zero(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 10))
        assert idx[0] == 0

    def test_mask(self, rng):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        mask = np.arange(100) >= 30  # first 30 invalid
        idx = np.asarray(farthest_point_sample(jnp.asarray(pts), 20, jnp.asarray(mask)))
        assert np.all(idx >= 30)


class TestTruncatedChamfer:
    """Robust chain-fit loss (ops/chamfer.py::chamfer_distance_trunc):
    per-point matched distances clipped at mult x the per-direction
    median — the occlusion-bias attack (zero gradient beyond tau)."""

    def test_huge_mult_equals_plain(self, rng):
        from autourdf_tpu.ops.chamfer import chamfer_distance_trunc

        x = jnp.asarray(rng.normal(size=(200, 3)).astype(np.float32))
        y = jnp.asarray(rng.normal(size=(240, 3)).astype(np.float32))
        plain = chamfer_distance(x, y, backend="xla")
        trunc = chamfer_distance_trunc(x, y, mult=1e6, backend="xla")
        np.testing.assert_allclose(np.asarray(trunc), np.asarray(plain),
                                   rtol=1e-6)

    def test_outlier_gradient_zeroed(self, rng):
        from autourdf_tpu.ops.chamfer import chamfer_distance_trunc

        # tight cluster + one far outlier in x: with a small mult the
        # outlier's per-point distance saturates, so its gradient is 0
        # while inlier gradients match the plain loss direction
        base = rng.normal(size=(100, 3)).astype(np.float32) * 0.01
        x = np.concatenate([base + 0.001, [[5.0, 5.0, 5.0]]]).astype(np.float32)
        y = jnp.asarray(base)
        gt = jax.grad(lambda a: chamfer_distance_trunc(
            a, y, mult=3.0, backend="xla"))(jnp.asarray(x))
        gp = jax.grad(lambda a: chamfer_distance(a, y, backend="xla"))(
            jnp.asarray(x))
        assert float(jnp.linalg.norm(gt[-1])) == 0.0
        assert float(jnp.linalg.norm(gp[-1])) > 0.0
        # inliers keep a nonzero, same-signed gradient field
        inner_dot = float(jnp.sum(gt[:-1] * gp[:-1]))
        assert inner_dot > 0.0

    def test_truncated_value_below_plain(self, rng):
        from autourdf_tpu.ops.chamfer import chamfer_distance_trunc

        base = rng.normal(size=(128, 3)).astype(np.float32)
        x = np.concatenate([base, [[3.0, 3.0, 3.0]]]).astype(np.float32)
        y = jnp.asarray(base)
        plain = float(chamfer_distance(jnp.asarray(x), y, backend="xla"))
        trunc = float(chamfer_distance_trunc(jnp.asarray(x), y, mult=3.0,
                                             backend="xla"))
        assert trunc < plain

    def test_masked_quantile(self, rng):
        from autourdf_tpu.ops.chamfer import _masked_quantile

        vals = jnp.asarray(np.arange(10, dtype=np.float32))
        mask = jnp.asarray((np.arange(10) < 5).astype(np.float32))
        med = float(_masked_quantile(vals, mask, 0.5))
        assert med == 2.0  # median of 0..4
        full = float(_masked_quantile(vals, None, 0.5))
        assert full == 4.0  # nearest-rank median of 0..9
