"""Tests for the differentiable joint refinement (single-joint + chain)."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

import jax
import jax.numpy as jnp

from autourdf_tpu.joints import fit_revolute_joint
from autourdf_tpu.joints.chain import refine_chain
from autourdf_tpu.joints.screw import JointEstimate


class TestFitRevolute:
    def test_recovers_axis_from_bad_init(self, rng):
        T, P = 5, 256
        x = rng.uniform([-0.1, -0.05, -0.05], [0.4, 0.05, 0.05], (200, 3)).astype(np.float32)
        u_true = np.array([0.0, 0.0, 1.0])
        o_true = np.array([0.05, 0.02, 0.0])
        parent_T = np.tile(np.eye(4, dtype=np.float32), (T, 1, 1))
        obs = np.zeros((T, P, 3), np.float32)
        mask = np.zeros((T, P), bool)
        for t in range(T):
            Rm = ScipyRot.from_rotvec(u_true * 0.15 * t).as_matrix()
            obs[t, :200] = (x - o_true) @ Rm.T + o_true
            mask[t, :200] = True
        u0 = np.array([0.3, 0.2, 0.9], np.float32)
        u0 /= np.linalg.norm(u0)
        res = fit_revolute_joint(
            jnp.asarray(parent_T), jnp.asarray(obs), jnp.asarray(mask),
            jnp.asarray(u0), jnp.zeros(3, jnp.float32), jnp.zeros(T, jnp.float32),
            steps=300,
        )
        cos = abs(float(res.axis @ u_true))
        assert np.degrees(np.arccos(min(1.0, cos))) < 2.0
        np.testing.assert_allclose(
            np.asarray(res.thetas), [0, 0.15, 0.3, 0.45, 0.6], atol=0.02
        )

    def test_gradients_finite_at_zero_angle(self):
        # regression: rotvec norm gradient at theta == 0 must not NaN
        from autourdf_tpu.core import rotations as R

        g = jax.grad(lambda th: jnp.sum(R.rotvec_to_matrix(jnp.ones(3) * th)))(0.0)
        assert np.isfinite(float(g))


class TestChainRefine:
    @pytest.mark.parametrize("balance,canonical_frames",
                             [(False, 1), (True, 1), (False, 3)])
    def test_improves_perturbed_axes(self, rng, balance, canonical_frames):
        # synthetic 2-link chain via the CoordMap fixture machinery
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_structure_joints_mesh import make_hinge_coordmap

        from autourdf_tpu.structure import (
            cluster_mst,
            combined_sum_map,
            coord_clustering,
            kinematics_tree,
        )

        cm = make_hinge_coordmap(num_frames=6, angle_step=0.2)
        sum_map = combined_sum_map([cm], "pose")
        groups, _, _ = coord_clustering(sum_map, 2)
        g0 = cluster_mst(cm)
        links = kinematics_tree(cm, groups, g0)

        # frames = world clouds reconstructed from the coordmap
        frames = []
        for t in range(6):
            pts = np.asarray(cm.cluster_points[t])
            labels = np.asarray(cm.cluster_labels[t])
            world = np.zeros_like(pts)
            for k in range(cm.num_coords):
                sel = labels == k
                M = cm.matrices[t, k]
                world[sel] = pts[sel] @ M[:3, :3].T + M[:3, 3]
            frames.append(world.astype(np.float32))
        frames = np.stack(frames)[None]  # (1, T, N, 3)

        # start from a deliberately wrong joint: axis tilted 25 degrees
        bad_axis = ScipyRot.from_rotvec([0.44, 0, 0]).as_matrix() @ np.array([0, 0, 1.0])
        child = links[1]
        joints = [JointEstimate(
            parent_link=links[0].id, child_link=child.id,
            local_axis=bad_axis, local_pos=np.zeros(4),
            global_pos=np.array([0.02, -0.03, 0.0]),
            global_axis=bad_axis,
        )]
        refined, result = refine_chain(
            links, joints, [cm], frames, steps=200, points_per_link=256,
            balance=balance, canonical_frames=canonical_frames,
        )
        ax = refined[0].global_axis / np.linalg.norm(refined[0].global_axis)
        err = np.degrees(np.arccos(min(1.0, abs(ax @ np.array([0, 0, 1.0])))))
        assert err < 5.0, f"axis err {err}"
        # origin should lie near the true axis (through origin)
        gp = refined[0].global_pos[:3]
        perp = gp - (gp @ np.array([0, 0, 1.0])) * np.array([0, 0, 1.0])
        assert np.linalg.norm(perp) < 0.05
        # freeze-delta probe: the hinge really articulates ~57 deg over
        # the sequence, so freezing it must leave large unexplained
        # chamfer (the drift-veto discriminator; joints/chain.py)
        assert result.freeze_deltas is not None
        assert result.freeze_deltas[0] > 1.0, (
            f"real hinge freeze delta {result.freeze_deltas[0]}")


class TestMultiAnchorChain:
    def test_anchored_and_averaged_fit_recover_axis(self, rng):
        """refine_chain_multi_anchor: two fits anchored at different steps
        average to the true hinge axis, expressed at step 0 for the
        writer; the anchored (non-zero) fit pins sequence 0 at its own
        anchor step instead of all sequences at step 0."""
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_structure_joints_mesh import make_hinge_coordmap

        from autourdf_tpu.joints.chain import refine_chain_multi_anchor
        from autourdf_tpu.structure import (
            cluster_mst,
            combined_sum_map,
            coord_clustering,
            kinematics_tree,
        )

        cm = make_hinge_coordmap(num_frames=6, angle_step=0.2)
        sum_map = combined_sum_map([cm], "pose")
        groups, _, _ = coord_clustering(sum_map, 2)
        links = kinematics_tree(cm, groups, cluster_mst(cm))

        frames = []
        for t in range(6):
            pts = np.asarray(cm.cluster_points[t])
            labels = np.asarray(cm.cluster_labels[t])
            world = np.zeros_like(pts)
            for k in range(cm.num_coords):
                sel = labels == k
                M = cm.matrices[t, k]
                world[sel] = pts[sel] @ M[:3, :3].T + M[:3, 3]
            frames.append(world.astype(np.float32))
        frames = np.stack(frames)[None]

        bad_axis = ScipyRot.from_rotvec([0.44, 0, 0]).as_matrix() @ np.array([0, 0, 1.0])
        joints = [JointEstimate(
            parent_link=links[0].id, child_link=links[1].id,
            local_axis=bad_axis, local_pos=np.zeros(4),
            global_pos=np.array([0.02, -0.03, 0.0]),
            global_axis=bad_axis,
        )]
        refined, result = refine_chain_multi_anchor(
            links, joints, [cm], frames, anchors=2,
            steps=200, points_per_link=256,
        )
        ax = refined[0].global_axis / np.linalg.norm(refined[0].global_axis)
        err = np.degrees(np.arccos(min(1.0, abs(ax @ np.array([0, 0, 1.0])))))
        assert err < 5.0, f"axis err {err}"
        gp = refined[0].global_pos[:3]
        perp = gp - (gp @ np.array([0, 0, 1.0])) * np.array([0, 0, 1.0])
        assert np.linalg.norm(perp) < 0.05
        # ChainResult carries the averaged parent-frame axis + anchor-0
        # thetas (pruning consumes the ranges)
        assert result.thetas.shape == (1, 6, 1)
        rng_deg = np.degrees(float(np.asarray(result.thetas).max()
                                   - np.asarray(result.thetas).min()))
        assert rng_deg > 20.0

    def test_anchors_one_delegates(self, rng):
        """anchors=1 must be byte-identical to plain refine_chain (the
        campaign default path is untouched)."""
        from autourdf_tpu.joints.chain import (
            refine_chain,
            refine_chain_multi_anchor,
        )
        import sys, os
        sys.path.insert(0, os.path.dirname(__file__))
        from test_structure_joints_mesh import make_hinge_coordmap

        from autourdf_tpu.structure import (
            cluster_mst,
            combined_sum_map,
            coord_clustering,
            kinematics_tree,
        )

        cm = make_hinge_coordmap(num_frames=4, angle_step=0.2)
        sum_map = combined_sum_map([cm], "pose")
        groups, _, _ = coord_clustering(sum_map, 2)
        links = kinematics_tree(cm, groups, cluster_mst(cm))
        frames = []
        for t in range(4):
            pts = np.asarray(cm.cluster_points[t])
            labels = np.asarray(cm.cluster_labels[t])
            world = np.zeros_like(pts)
            for k in range(cm.num_coords):
                sel = labels == k
                M = cm.matrices[t, k]
                world[sel] = pts[sel] @ M[:3, :3].T + M[:3, 3]
            frames.append(world.astype(np.float32))
        frames = np.stack(frames)[None]
        joints = [JointEstimate(
            parent_link=links[0].id, child_link=links[1].id,
            local_axis=np.array([0, 0, 1.0]), local_pos=np.zeros(4),
            global_pos=np.zeros(3), global_axis=np.array([0, 0, 1.0]),
        )]
        r1, c1 = refine_chain(links, joints, [cm], frames, steps=20,
                              points_per_link=128)
        r2, c2 = refine_chain_multi_anchor(links, joints, [cm], frames,
                                           anchors=1, steps=20,
                                           points_per_link=128)
        np.testing.assert_array_equal(np.asarray(c1.axes), np.asarray(c2.axes))
        np.testing.assert_array_equal(np.asarray(c1.thetas),
                                      np.asarray(c2.thetas))
        np.testing.assert_allclose(r1[0].global_axis, r2[0].global_axis)


class TestFreezeDeltaDiscriminator:
    def test_symmetry_flat_motion_is_chamfer_free(self):
        """The mechanism behind the freeze-delta veto: a cylinder split
        into two full annular bands (the shape of a single-linkage split
        of a drifting cylindrical shell — the trashcan case) can rotate
        one band about the cylinder axis for free, while the same
        rotation about a transverse axis moves points off-surface and
        costs real loss."""
        from autourdf_tpu.joints.chain import ChainSpec, _theta_loss

        rng = np.random.default_rng(3)

        def cylinder(m):
            phi = rng.uniform(0, 2 * np.pi, m)
            z = rng.uniform(-0.3, 0.3, m)
            return np.stack(
                [0.2 * np.cos(phi), 0.2 * np.sin(phi), z], -1
            ).astype(np.float32), z

        # canonical bands and observed frames sampled INDEPENDENTLY (as
        # in the pipeline: FPS-subsampled canonicals vs per-step capture)
        # so the baseline sits at the sampling-density floor already
        pts, zc = cylinder(6000)
        P = 1024
        shell_a = pts[zc < 0.0][:P]   # lower band (full ring)
        shell_b = pts[zc >= 0.0][:P]  # upper band (full ring)
        link_pts = jnp.asarray(np.stack([shell_a, shell_b]))
        link_masks = jnp.ones((2, P), bool)
        frames0 = jnp.tile(jnp.eye(4, dtype=jnp.float32), (2, 1, 1))
        spec = ChainSpec(parent_index=(0,), child_index=(1,), root_index=0)

        T = 3
        n = 5000
        frames = jnp.asarray(
            np.stack([cylinder(n)[0] for _ in range(T)])[None])
        fmasks = jnp.ones((1, T, n), bool)
        o = jnp.zeros((1, 3), jnp.float32)
        th0 = jnp.zeros((1, T, 1), jnp.float32)
        th_wander = jnp.asarray(
            np.array([0.0, 0.5, 1.0], np.float32).reshape(1, T, 1))

        def loss(u, th):
            return float(_theta_loss(spec, frames0, link_pts, link_masks,
                                     jnp.asarray(u, jnp.float32).reshape(1, 3),
                                     o, th, frames, fmasks))

        base = loss([0, 0, 1.0], th0)
        flat = loss([0, 0, 1.0], th_wander)       # about the cylinder axis
        off = loss([1.0, 0, 0], th_wander)        # transverse axis
        # 57 deg of axial wander is nearly free; the same wander off-axis
        # is catastrophic — this gap is what the veto reads
        assert flat / base - 1.0 < 0.15, f"flat delta {flat / base - 1}"
        assert off / base - 1.0 > 1.0, f"off-axis delta {off / base - 1}"


class TestPruneStaticJoints:
    def _mk(self):
        from autourdf_tpu.structure.tree import LinkNode

        links = [
            LinkNode(id=0, cluster_idx={0, 1}, parent_id=None),
            LinkNode(id=1, cluster_idx={2}, parent_id=0),
            LinkNode(id=2, cluster_idx={3, 4}, parent_id=1),
        ]
        mk_joint = lambda p, c: JointEstimate(
            parent_link=p, child_link=c, local_axis=np.array([0, 0, 1.0]),
            local_pos=np.array([0, 0, 0, 1.0]), global_pos=np.zeros(3),
            global_axis=np.array([0, 0, 1.0]))
        return links, mk_joint

    def test_static_leaf_joint_merged(self):
        from autourdf_tpu.joints.chain import prune_static_joints

        links, mk = self._mk()
        joints = [mk(0, 1), mk(1, 2)]
        thetas = np.zeros((2, 5, 2), np.float32)
        thetas[:, :, 0] = np.linspace(0, 0.5, 5)   # joint 0 moves
        thetas[0, :, 1] = 0.01 * np.arange(5) / 5  # joint 1: noise only
        out, pruned = prune_static_joints(links, joints, thetas)
        assert pruned
        assert [l.id for l in out] == [0, 1]
        assert out[1].cluster_idx == {2, 3, 4}

    def test_static_middle_joint_reparents_grandchild(self):
        from autourdf_tpu.joints.chain import prune_static_joints

        links, mk = self._mk()
        joints = [mk(0, 1), mk(1, 2)]
        thetas = np.zeros((1, 5, 2), np.float32)
        thetas[:, :, 1] = np.linspace(0, 0.5, 5)   # only the leaf moves
        out, pruned = prune_static_joints(links, joints, thetas)
        assert pruned
        # ids renumbered contiguously (mesh files + writer colors index by id)
        assert [l.id for l in out] == [0, 1]
        assert out[0].cluster_idx == {0, 1, 2}
        assert out[1].cluster_idx == {3, 4}
        assert out[1].parent_id == 0

    def test_all_moving_untouched(self):
        from autourdf_tpu.joints.chain import prune_static_joints

        links, mk = self._mk()
        joints = [mk(0, 1), mk(1, 2)]
        thetas = np.tile(np.linspace(0, 0.5, 5)[None, :, None], (1, 1, 2))
        out, pruned = prune_static_joints(links, joints, thetas.astype(np.float32))
        assert not pruned
        assert out is links

    def test_extra_static_vetoes_moving_joint(self):
        """The drift veto passes extra indices: a joint above the range
        threshold still merges when listed (workflow's axis-incoherence
        veto), and resolve() reparents through it."""
        from autourdf_tpu.joints.chain import prune_static_joints

        links, mk = self._mk()
        joints = [mk(0, 1), mk(1, 2)]
        thetas = np.tile(np.linspace(0, 0.5, 5)[None, :, None], (1, 1, 2))
        out, pruned = prune_static_joints(
            links, joints, thetas.astype(np.float32), extra_static=[0])
        assert pruned
        assert [l.id for l in out] == [0, 1]
        assert out[0].cluster_idx == {0, 1, 2}
        assert out[1].parent_id == 0

    def test_best_sequence_counts(self):
        """A joint excited in only ONE of several sequences survives."""
        from autourdf_tpu.joints.chain import prune_static_joints

        links, mk = self._mk()
        joints = [mk(0, 1), mk(1, 2)]
        thetas = np.zeros((3, 5, 2), np.float32)
        thetas[:, :, 0] = np.linspace(0, 0.5, 5)
        thetas[2, :, 1] = np.linspace(0, 0.4, 5)   # seq 2 only
        _, pruned = prune_static_joints(links, joints, thetas)
        assert not pruned


class TestCanonicalUnionPolish:
    def test_rigid_registration_error_removed_new_surface_kept(self, rng):
        """A later-step cloud carrying a small rigid registration error is
        re-aligned onto the step-0 cloud before the union; points of newly
        visible surface (no overlap with step 0) ride the same rigid fix."""
        from scipy.spatial.transform import Rotation as ScipyRot

        from autourdf_tpu.joints.chain import _polish_canonical_union

        base = rng.uniform(-0.1, 0.1, (400, 3)).astype(np.float32)
        base[:, 0] *= 3.0  # elongated link
        # step-1 observation: same surface + a brand-new patch, both moved
        # by a small rigid "registration error"
        new_patch = rng.uniform(-0.05, 0.05, (80, 3)).astype(np.float32)
        new_patch[:, 0] = new_patch[:, 0] * 0.2 + 0.45
        err_R = ScipyRot.from_rotvec([0.0, 0.0, 0.02]).as_matrix().astype(np.float32)
        err_t = np.array([0.004, -0.003, 0.002], np.float32)
        moved = np.concatenate([base, new_patch]) @ err_R.T + err_t

        out = _polish_canonical_union([base, moved], np.random.default_rng(0))
        assert len(out) == 2 and out[0] is base
        polished = out[1]
        # the overlapping part must land back on base (sub-mm)
        resid = np.linalg.norm(polished[:400] - base, axis=1)
        assert float(np.median(resid)) < 5e-4
        # the new patch must be carried by the same inverse transform
        expected_patch = (new_patch @ err_R.T + err_t - err_t) @ err_R
        patch_resid = np.linalg.norm(polished[400:] - expected_patch, axis=1)
        assert float(np.median(patch_resid)) < 2e-3

    def test_tiny_base_cloud_is_left_alone(self):
        from autourdf_tpu.joints.chain import _polish_canonical_union

        tiny = [np.zeros((4, 3), np.float32), np.ones((8, 3), np.float32)]
        out = _polish_canonical_union(tiny, np.random.default_rng(0))
        assert out is tiny


class TestCoarticulationMerge:
    """merge_coarticulated_siblings: the split-door structure error.

    Fixture geometry mirrors the storage cabinet: a static cabinet link
    with door links hinged on vertical axes at its left/right edges
    (scale 1.0 cloud diagonal)."""

    def _mk(self, n_children=2):
        from autourdf_tpu.structure.tree import LinkNode

        links = [LinkNode(id=0, cluster_idx={0, 1}, parent_id=None)]
        for i in range(n_children):
            links.append(LinkNode(id=i + 1, cluster_idx={2 + i}, parent_id=0))
        return links

    def _joint(self, p, c, pos):
        return JointEstimate(
            parent_link=p, child_link=c, local_axis=np.array([0, 0, 1.0]),
            local_pos=np.array([0, 0, 0, 1.0]),
            global_pos=np.asarray(pos, np.float64),
            global_axis=np.array([0, 0, 1.0]))

    def _swing(self, S=2, T=10, seed=0):
        rng = np.random.default_rng(seed)
        return np.cumsum(rng.uniform(-0.2, 0.2, size=(S, T)), axis=1)

    def test_split_door_merged(self):
        """Two siblings on the SAME hinge line with identical swings (up
        to small fit noise) collapse into one link."""
        from autourdf_tpu.joints.chain import merge_coarticulated_siblings

        links = self._mk(2)
        joints = [self._joint(0, 1, [0.5, 0, 0]),
                  self._joint(0, 2, [0.5, 0.02, 0])]
        swing = self._swing()
        thetas = np.stack([swing, swing + 0.01 * self._swing(seed=9)], axis=-1)
        out, merged = merge_coarticulated_siblings(
            links, joints, thetas, scale=1.0)
        assert merged
        assert len(out) == 2
        assert out[1].cluster_idx == {2, 3}  # victim absorbed into sibling

    def test_two_real_doors_kept(self):
        """Parallel axes on OPPOSITE cabinet edges (distinct hinge lines,
        independent swings) must survive."""
        from autourdf_tpu.joints.chain import merge_coarticulated_siblings

        links = self._mk(2)
        joints = [self._joint(0, 1, [-0.5, 0, 0]),
                  self._joint(0, 2, [0.5, 0, 0])]
        thetas = np.stack([self._swing(seed=1), self._swing(seed=2)], axis=-1)
        out, merged = merge_coarticulated_siblings(
            links, joints, thetas, scale=1.0)
        assert not merged
        assert len(out) == 3

    def test_same_line_independent_motion_kept(self):
        """Coincident axis lines alone are not enough: independent theta
        trajectories (chance corr << 0.92 over 20 samples) block the merge."""
        from autourdf_tpu.joints.chain import merge_coarticulated_siblings

        links = self._mk(2)
        joints = [self._joint(0, 1, [0.5, 0, 0]),
                  self._joint(0, 2, [0.5, 0.02, 0])]
        thetas = np.stack([self._swing(seed=3), self._swing(seed=4)], axis=-1)
        _, merged = merge_coarticulated_siblings(
            links, joints, thetas, scale=1.0)
        assert not merged

    def test_weak_joint_left_to_other_vetoes(self):
        """A pair where one joint barely moves belongs to the static/drift
        vetoes, not this merge."""
        from autourdf_tpu.joints.chain import merge_coarticulated_siblings

        links = self._mk(2)
        joints = [self._joint(0, 1, [0.5, 0, 0]),
                  self._joint(0, 2, [0.5, 0.02, 0])]
        swing = self._swing()
        thetas = np.stack([swing, 0.01 * swing], axis=-1)  # corr 1, tiny range
        _, merged = merge_coarticulated_siblings(
            links, joints, thetas, scale=1.0)
        assert not merged

    def test_grandchild_reparented_and_ids_renumbered(self):
        """Merging the victim re-parents its children and renumbers ids
        contiguously (downstream mesh naming indexes by id)."""
        from autourdf_tpu.joints.chain import merge_coarticulated_siblings
        from autourdf_tpu.structure.tree import LinkNode

        links = self._mk(2)
        links.append(LinkNode(id=3, cluster_idx={4}, parent_id=2))
        joints = [self._joint(0, 1, [0.5, 0, 0]),
                  self._joint(0, 2, [0.5, 0.02, 0]),
                  self._joint(2, 3, [0.5, 0.5, 0])]
        swing = self._swing()
        thetas = np.stack(
            [swing, swing + 0.01 * self._swing(seed=9), self._swing(seed=5)],
            axis=-1)
        out, merged = merge_coarticulated_siblings(
            links, joints, thetas, scale=1.0)
        assert merged
        ids = sorted(l.id for l in out)
        assert ids == [0, 1, 2]
        grandchild = next(l for l in out if l.cluster_idx == {4})
        keeper = next(l for l in out if l.cluster_idx == {2, 3})
        assert grandchild.parent_id == keeper.id
