"""Structure discovery, joint estimation, and meshing on synthetic ground truth.

Builds an analytically-known 2-link hinge trajectory (cluster frames
attached to each link with exact poses), so link grouping, tree, joint
axis, and joint origin all have closed-form expected values.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from autourdf_tpu.joints import estimate_joints_from_tree
from autourdf_tpu.mesh import cloud_to_mesh, is_watertight, marching_tetrahedra
from autourdf_tpu.structure import (
    CoordMap,
    cluster_mst,
    combined_sum_map,
    consolidate_links,
    coord_clustering,
    kinematics_tree,
    silhouette_dof_search,
)


def make_hinge_coordmap(
    num_frames=8, angle_step=0.12, axis=(0, 0, 1.0), pivot=(0.0, 0.0, 0.0), seed=0
):
    """Two links, 3 clusters each; link B rotates about `axis` through `pivot`."""
    rng = np.random.default_rng(seed)
    axis = np.asarray(axis, float)
    pivot = np.asarray(pivot, float)
    # cluster frame offsets (static in link frames)
    offs_a = np.asarray([[-0.5, 0, 0], [-0.35, 0.1, 0], [-0.2, -0.1, 0.05]])
    offs_b = np.asarray([[0.2, 0, 0], [0.4, 0.05, 0], [0.6, -0.05, 0.1]])
    K = 6
    T = num_frames
    matrices = np.tile(np.eye(4), (T, K, 1, 1))
    pts_per_cluster = 40
    cluster_points, cluster_labels, raw_clouds = [], [], []
    local_pts = rng.normal(scale=0.05, size=(K, pts_per_cluster, 3))
    for t in range(T):
        ang = t * angle_step
        rot = ScipyRot.from_rotvec(axis * ang).as_matrix()
        world_pts = []
        labels = []
        for k in range(3):
            matrices[t, k, :3, 3] = offs_a[k]
            world_pts.append(local_pts[k] + offs_a[k])
            labels += [k] * pts_per_cluster
        for k in range(3):
            pos = pivot + rot @ (offs_b[k] - pivot)
            matrices[t, 3 + k, :3, :3] = rot
            matrices[t, 3 + k, :3, 3] = pos
            world_pts.append(local_pts[3 + k] @ rot.T + pos)
            labels += [3 + k] * pts_per_cluster
        cluster_points.append(np.tile(local_pts.reshape(-1, 3), (1, 1)))
        cluster_labels.append(np.asarray(labels, np.int32))
        raw_clouds.append(np.concatenate(world_pts))
    return CoordMap.from_arrays(matrices, cluster_points, cluster_labels, raw_clouds)


class TestCoordMap:
    def test_pose_map_separates_links(self):
        cm = make_hinge_coordmap()
        _, sum_map = cm.dist_map("pose")
        sum_map = (sum_map - sum_map.min()) / (sum_map.max() - sum_map.min())
        # within-link dissimilarity must be far below cross-link
        within = [sum_map[i, j] for i in range(3) for j in range(3) if i != j]
        across = [sum_map[i, j + 3] for i in range(3) for j in range(3)]
        assert max(within) < min(across)

    @pytest.mark.parametrize("mode", ["pose", "diff", "legacy", "rigid"])
    def test_modes_produce_valid_maps(self, mode):
        cm = make_hinge_coordmap()
        stacked, sum_map = cm.dist_map(mode)
        assert sum_map.shape == (6, 6)
        assert np.all(np.isfinite(sum_map))
        np.testing.assert_allclose(sum_map, sum_map.T, atol=1e-6)
        np.testing.assert_allclose(np.diag(sum_map), 0, atol=1e-6)

    def test_rigid_map_zero_within_links(self):
        cm = make_hinge_coordmap()
        _, sum_map = cm.dist_map("rigid")
        within = [sum_map[i, j] for i in range(3) for j in range(3) if i != j]
        within += [sum_map[i + 3, j + 3] for i in range(3) for j in range(3) if i != j]
        across = [sum_map[i, j + 3] for i in range(3) for j in range(3)]
        # same-link relative poses are exactly constant in the synthetic ->
        # deviation is at float-arccos noise; cross-link pairs see the hinge
        assert max(within) < 1e-5
        assert min(across) > 1e-3
        assert max(within) < 0.01 * min(across)

    def test_rigid_map_beats_proximity_confound(self):
        """Interleaved links: clusters of different links are spatially
        closer than same-link clusters.  The reference's mean-pose map
        groups by proximity here; the rigid deviation map must still
        recover the articulation split."""
        from autourdf_tpu.structure import merge_gap_dof_search

        rng = np.random.default_rng(1)
        T, K = 8, 6
        axis = np.asarray([0.0, 0.0, 1.0])
        pivot = np.asarray([0.0, 0.0, 0.0])
        # link A clusters at x = 0, 0.2, 0.4; link B at x = 0.1, 0.3, 0.5
        offs_a = np.asarray([[0.0, 0, 0], [0.2, 0, 0], [0.4, 0, 0]])
        offs_b = np.asarray([[0.1, 0.02, 0], [0.3, 0.02, 0], [0.5, 0.02, 0]])
        matrices = np.tile(np.eye(4), (T, K, 1, 1))
        raw = []
        for t in range(T):
            ang = t * 0.06  # small excitation
            rot = ScipyRot.from_rotvec(axis * ang).as_matrix()
            for k in range(3):
                matrices[t, k, :3, 3] = offs_a[k]
            for k in range(3):
                matrices[t, 3 + k, :3, :3] = rot
                matrices[t, 3 + k, :3, 3] = pivot + rot @ (offs_b[k] - pivot)
            raw.append(rng.normal(size=(50, 3)))
        pts = [np.zeros((1, 3))] * T
        labs = [np.zeros(1, np.int32)] * T
        cm = CoordMap.from_arrays(matrices, pts, labs, raw)

        rigid = combined_sum_map([cm], "rigid")
        groups, labels, ratios, nls = merge_gap_dof_search(rigid, link_range=(2, 6))
        assert sorted(sorted(g) for g in groups) == [[0, 1, 2], [3, 4, 5]]
        # and the split must be decisive: near-zero within, clear across
        within = max(rigid[i, j] for g in ([0, 1, 2], [3, 4, 5])
                     for i in g for j in g if i != j)
        across = min(rigid[i, j] for i in (0, 1, 2) for j in (3, 4, 5))
        assert within < 0.05 * across


class TestClustering:
    def test_two_groups(self):
        cm = make_hinge_coordmap()
        sum_map = combined_sum_map([cm], "pose")
        groups, labels, score = coord_clustering(sum_map, 2)
        assert sorted(sorted(g) for g in groups) == [[0, 1, 2], [3, 4, 5]]

    def test_silhouette_search_exact_on_rich_map(self):
        # 12 clusters on 3 links with distinct motion
        rng = np.random.default_rng(0)
        centers = np.asarray([0.0, 5.0, 10.0])
        vals = np.concatenate([np.full(4, c) for c in centers]) + rng.normal(
            scale=0.05, size=12
        )
        d = np.abs(vals[:, None] - vals[None, :])
        groups, labels, scores, nls = silhouette_dof_search(d, link_range=(2, 7))
        assert len(groups) == 3

    def test_recursive_gap_split_multiscale(self):
        """The global gap cut finds only the dominant motion scale; the
        recursive pass must recover a fine split hidden inside one group
        (solo12's knee-inside-a-leg failure mode) while leaving a smooth
        noise-continuum group intact."""
        from autourdf_tpu.structure import recursive_gap_split

        # 12 clusters: group A = {0..7} with an internal fine split
        # {0-3} vs {4-7} (within 0.01, between 0.1); group B = {8..11}
        # a smooth continuum (heights 0.010/0.012/0.014, no decisive gap);
        # A-B separation huge (10.0) so the global cut stops at 2 groups.
        d = np.full((12, 12), 10.0)
        rng = np.random.default_rng(0)
        for blk in (range(0, 4), range(4, 8)):
            for i in blk:
                for j in blk:
                    d[i, j] = 0.01
        for i in range(0, 4):
            for j in range(4, 8):
                d[i, j] = d[j, i] = 0.1
        bvals = np.asarray([0.0, 0.010, 0.022, 0.036])
        for a in range(4):
            for b in range(4):
                d[8 + a, 8 + b] = abs(bvals[a] - bvals[b])
        np.fill_diagonal(d, 0.0)

        groups = [set(range(0, 8)), set(range(8, 12))]
        out = recursive_gap_split(d, groups)
        assert sorted(sorted(g) for g in out) == [
            [0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]

        # with a validate map: the same split must be vetoed when its
        # between-subgroup motion evidence is far below the partition's
        # real-joint scale (a false split inside one rigid link) ...
        weak = np.full((12, 12), 1e-4)
        for i in range(8):
            for j in range(8, 12):
                weak[i, j] = weak[j, i] = 0.5  # cross-group scale
        out_veto = recursive_gap_split(d, groups, validate_map=weak)
        assert sorted(len(g) for g in out_veto) == [4, 8]

        # ... and accepted when the evidence is comparable to that scale
        strong = weak.copy()
        for i in range(0, 4):
            for j in range(4, 8):
                strong[i, j] = strong[j, i] = 0.2
        out_ok = recursive_gap_split(d, groups, validate_map=strong)
        assert sorted(sorted(g) for g in out_ok) == [
            [0, 1, 2, 3], [4, 5, 6, 7], [8, 9, 10, 11]]

    def test_rigidity_guard_escalates_undersplit(self):
        """A seed-collapsed pick (everything in one group) must be
        escalated to the true partition by the carry rigidity test; a
        correct pick must pass untouched (fired=False)."""
        from autourdf_tpu.structure import (
            carry_excess_matrix,
            partition_rigidity,
            rigidity_guarded_groups,
        )

        K = 8
        links = [list(range(0, 4)), list(range(4, 8))]
        floor = 0.002
        stack = np.full((2, K, K), 0.02)  # cross-link carry: 10x floor
        for g in links:
            for i in g:
                for j in g:
                    stack[:, i, j] = 0.0025  # same-link: just above floor
        for i in range(K):
            stack[:, i, i] = floor
        ex, med_floor = carry_excess_matrix(stack)
        assert abs(med_floor - floor) < 1e-9
        assert partition_rigidity(ex, [set(range(K))]) > 5 * floor
        assert partition_rigidity(ex, [set(g) for g in links]) < floor

        # pose map consistent with the links (values only order the
        # dendrogram; the guard decides from the carry stack)
        pose = np.full((K, K), 1.0)
        for g in links:
            for i in g:
                for j in g:
                    pose[i, j] = 0.1
        np.fill_diagonal(pose, 0.0)

        groups, fired = rigidity_guarded_groups(pose, stack,
                                                [set(range(K))])
        assert fired
        assert sorted(sorted(g) for g in groups) == links

        groups2, fired2 = rigidity_guarded_groups(
            pose, stack, [set(g) for g in links])
        assert not fired2
        assert sorted(sorted(g) for g in groups2) == links

    def test_refine_shared_stack_matches_internal(self):
        """Passing a precomputed swap_consistency_stack must reproduce
        refine_groups_by_carry's internal computation exactly (the
        pipeline computes the stack once and shares it with the guard)."""
        from autourdf_tpu.structure import (
            refine_groups_by_carry,
            swap_consistency_stack,
        )

        cm = make_wrist_trap_chain()
        groups = [{0, 1}, {2}, {3, 4}, {5, 6}]
        a = refine_groups_by_carry([cm], groups)
        b = refine_groups_by_carry([cm], groups,
                                   stack=swap_consistency_stack([cm]))
        assert sorted(sorted(g) for g in a) == sorted(sorted(g) for g in b)

    def test_partition_rigidity_median_ignores_boundary_cluster(self):
        """One straddling cluster inside a correct 5-cluster group must
        not push the group's median within-pair excess above the floor
        (the q75 statistic false-fired on exactly this)."""
        from autourdf_tpu.structure import (
            carry_excess_matrix,
            partition_rigidity,
        )

        K = 5
        stack = np.full((1, K, K), 0.0022)
        for i in range(K):
            stack[:, i, i] = 0.002
        # cluster 4 is the straddler: carries badly with everyone
        stack[:, 4, :4] = stack[:, :4, 4] = 0.02
        ex, floor = carry_excess_matrix(stack)
        rig = partition_rigidity(ex, [set(range(K))], q=0.5)
        assert rig < floor  # 4 bad pairs of 10: median unaffected
        rig75 = partition_rigidity(ex, [set(range(K))], q=0.75)
        assert rig75 > floor  # the old statistic would have fired

    def test_default_range_reaches_two_links(self):
        """1-DoF objects (laptop etc.) need the widened default range:
        the reference scans 4..25 and can never return 2 links."""
        from autourdf_tpu.structure import auto_dof_search

        rng = np.random.default_rng(1)
        vals = np.concatenate([np.zeros(5), np.full(5, 8.0)]) + rng.normal(
            scale=0.05, size=10
        )
        d = np.abs(vals[:, None] - vals[None, :])
        for fn in (auto_dof_search, silhouette_dof_search):
            groups, labels, scores, nls = fn(d)
            assert len(groups) == 2, fn.__name__
            assert int(nls[0]) == 2


class TestLadderSelect:
    """Fixtures are the MEASURED probe-loss curves from the round-3 seed
    sweep (scripts/probe_k_ladder.py; see structure/model_select.py)."""

    def _run(self, curve, k0, **kw):
        from autourdf_tpu.structure.model_select import ladder_select

        calls = []

        def loss(k):
            calls.append(k)
            return curve.get(k, curve[max(curve)])

        return ladder_select(loss, k0, **kw), calls

    def test_wx200_seed2026_flat_before_drop(self):
        # statistical pick 4; flat 4->5, big drop at 6, over-split drift
        # after — the lookahead must walk past the flat
        curve = {3: 0.0531, 4: 0.0296, 5: 0.0295, 6: 0.0187, 7: 0.0182,
                 8: 0.0177, 9: 0.0174}
        k, calls = self._run(curve, 4)
        assert k == 6
        assert max(calls) <= 9  # bounded window, no full-range scan

    def test_correct_pick_confirmed_cheaply(self):
        # base-seed shape: pick 6 is right; probe must confirm with a
        # handful of calls and not drift into the over-split tail
        curve = {5: 0.0295, 6: 0.0187, 7: 0.0182, 8: 0.0177, 9: 0.0174,
                 10: 0.0172}
        k, calls = self._run(curve, 6)
        assert k == 6
        assert len(set(calls)) <= 6

    def test_over_split_pick_walks_down(self):
        # pick 9 on the same landscape: descending is flat until 6,
        # significant increase at 5 stops the walk -> select 6
        curve = {5: 0.0295, 6: 0.0187, 7: 0.0182, 8: 0.0177, 9: 0.0174,
                 10: 0.0172, 11: 0.0171, 12: 0.0170}
        k, _ = self._run(curve, 9)
        assert k == 6

    def test_catastrophic_underpick_two_drops(self):
        # two hidden joints (franka-seed shape): drops at 5 AND 7 —
        # the LAST significant drop wins
        curve = {3: 0.09, 4: 0.085, 5: 0.05, 6: 0.048, 7: 0.030, 8: 0.029,
                 9: 0.0285, 10: 0.028}
        k, _ = self._run(curve, 4)
        assert k == 7

    def test_one_dof_object_all_flat(self):
        # laptop shape: pick 2 correct, everything above is drift;
        # no significant drop in window -> smallest within margin
        curve = {2: 0.040, 3: 0.0398, 4: 0.0395, 5: 0.0393}
        k, _ = self._run(curve, 2, k_min=2)
        assert k == 2

    def test_laptop_drift_not_mistaken_for_joints(self):
        """Measured laptop curve (campaign r3): the probe loss declines
        ~8-10% per spurious extra link (capture noise on large surfaces).
        A fixed 10% threshold picked k=4; the drift-normalized rule must
        keep the statistical pick 2."""
        curve = {2: 0.08849, 3: 0.08076, 4: 0.07344, 5: 0.06798,
                 6: 0.0634, 7: 0.0593}
        k, _ = self._run(curve, 2, k_min=2)
        assert k == 2

    def test_real_drop_beats_matching_drift(self):
        # a 25% drop over 4% drift is real even though both exceed eps
        curve = {4: 0.050, 5: 0.048, 6: 0.0384, 7: 0.0369, 8: 0.0355,
                 9: 0.0341}
        k, _ = self._run(curve, 4)
        assert k == 6

    def test_share_norm_rescues_small_link_splits(self):
        """Measured pxs seed-2025 curve: the last three leg segments buy
        only 3-7% global chamfer each (small distal links), so the raw
        rule under-splits to 16; normalized by the split region's ~8%
        point share the k=17..19 drops are plainly significant while the
        >=20 noise drops stay insignificant."""
        curve = {15: 0.02448, 16: 0.02165, 17: 0.02095, 18: 0.02036,
                 19: 0.01903, 20: 0.01903, 21: 0.01900, 22: 0.01898}
        k_raw, _ = self._run(curve, 19)
        assert k_raw == 16  # the measured failure, pinned
        k_norm, _ = self._run(curve, 19, share=lambda k: 0.08)
        assert k_norm == 19

    def test_share_norm_keeps_laptop_drift_insignificant(self):
        # the drift-normalized guard must survive share normalization:
        # laptop's spurious splits change ~half the object (share 0.5),
        # so normalization at most doubles the drift drops and the
        # 2.5x-local-drift rule still rejects them
        curve = {2: 0.08849, 3: 0.08076, 4: 0.07344, 5: 0.06798,
                 6: 0.0634, 7: 0.0593}
        k, _ = self._run(curve, 2, k_min=2, share=lambda k: 0.5)
        assert k == 2

    def test_inf_candidates_skipped(self):
        from autourdf_tpu.structure.model_select import ladder_select

        curve = {3: np.inf, 4: 0.03, 5: 0.029, 6: 0.0185, 7: 0.018,
                 8: 0.0178, 9: 0.0177}
        k = ladder_select(lambda k: curve.get(k, 0.0175), 4)
        assert k == 6

    def test_all_inf_returns_none(self):
        from autourdf_tpu.structure.model_select import ladder_select

        assert ladder_select(lambda k: np.inf, 4) is None


class TestTree:
    def test_hinge_tree(self):
        cm = make_hinge_coordmap()
        sum_map = combined_sum_map([cm], "pose")
        groups, _, _ = coord_clustering(sum_map, 2)
        g0 = cluster_mst(cm)
        links = kinematics_tree(cm, groups, g0)
        assert len(links) == 2
        root = links[0]
        assert root.parent_id is None and root.tree_id == 0
        # root is the static link (clusters 0-2)
        assert root.cluster_idx == {0, 1, 2}
        assert links[1].parent_id == root.id


def make_wrist_trap_chain(num_frames=8, seed=0):
    """Chain A -> B -> C -> D mimicking the ur5 wrist mis-ordering.

    C is a small in-between link (one cluster, slightly off the B-D
    line), and one of D's clusters sits marginally closer to B's tip
    than C does — so the reference-style cluster MST wires B-D and D-C,
    skipping C's true place.  The relative motion B->D is then a
    two-revolute composite (skew axes x then y) no estimator can fit.
    True joints: J1 (A->B) z@(0.5,0,0); J2 (B->C) x@(1.2,0.06,0);
    J3 (C->D) y@(1.33,0.07,0)."""
    rng = np.random.default_rng(seed)
    p1 = np.array([0.5, 0.0, 0.0])
    p2 = np.array([1.2, 0.06, 0.0])
    p3 = np.array([1.33, 0.07, 0.0])
    offs_a = np.asarray([[-0.1, 0, 0], [0.1, 0, 0]])
    offs_b = np.asarray([[0.9, 0, 0], [1.1, 0, 0]])
    offs_c = np.asarray([[1.33, 0.18, 0]])
    offs_d = np.asarray([[1.37, -0.075, 0], [1.55, 0.075, 0]])
    K, T = 7, num_frames
    matrices = np.tile(np.eye(4), (T, K, 1, 1))
    local_pts = rng.normal(scale=0.03, size=(K, 30, 3))
    cluster_points, cluster_labels, raw_clouds = [], [], []
    for t in range(T):
        r1 = ScipyRot.from_rotvec([0, 0, 0.05 * t]).as_matrix()
        r2 = ScipyRot.from_rotvec([0.06 * t, 0, 0]).as_matrix()
        r3 = ScipyRot.from_rotvec([0, 0.08 * t, 0]).as_matrix()
        world_pts, labels = [], []

        def put(k, R, pos):
            matrices[t, k, :3, :3] = R
            matrices[t, k, :3, 3] = pos
            world_pts.append(local_pts[k] @ R.T + pos)
            labels.extend([k] * 30)

        for k in range(2):
            put(k, np.eye(3), offs_a[k])
        for k in range(2):
            put(2 + k, r1, p1 + r1 @ (offs_b[k] - p1))
        Rc = r1 @ r2
        put(4, Rc, p1 + r1 @ ((p2 - p1) + r2 @ (offs_c[0] - p2)))
        Rd = Rc @ r3
        for k in range(2):
            pos = p1 + r1 @ ((p2 - p1) + r2 @ ((p3 - p2) + r3 @ (offs_d[k] - p3)))
            put(5 + k, Rd, pos)
        cluster_points.append(local_pts.reshape(-1, 3))
        cluster_labels.append(np.asarray(labels, np.int32))
        raw_clouds.append(np.concatenate(world_pts))
    return CoordMap.from_arrays(matrices, cluster_points, cluster_labels,
                                raw_clouds)


class TestMotionTree:
    def _groups(self):
        return [{0, 1}, {2, 3}, {4}, {5, 6}]

    def test_proximity_mst_falls_into_the_trap(self):
        """Documents WHY motion_tree exists: the reference-parity tree
        skips the small in-between link C (as it does the ur5 wrist_1)."""
        cm = make_wrist_trap_chain()
        links = kinematics_tree(cm, self._groups(), cluster_mst(cm))
        by_cluster = {frozenset(l.cluster_idx): l for l in links}
        b = by_cluster[frozenset({2, 3})]
        c = by_cluster[frozenset({4})]
        d = by_cluster[frozenset({5, 6})]
        assert d.parent_id == b.id  # the trap: D adopted directly by B
        assert c.parent_id == d.id

    def test_motion_tree_recovers_true_chain(self):
        from autourdf_tpu.structure import motion_tree

        cm = make_wrist_trap_chain()
        links = motion_tree([cm], self._groups(), num_steps=8)
        by_cluster = {frozenset(l.cluster_idx): l for l in links}
        a = by_cluster[frozenset({0, 1})]
        b = by_cluster[frozenset({2, 3})]
        c = by_cluster[frozenset({4})]
        d = by_cluster[frozenset({5, 6})]
        assert a.parent_id is None
        assert b.parent_id == a.id
        assert c.parent_id == b.id
        assert d.parent_id == c.id

    def test_carry_reassignment_fixes_boundary_cluster(self):
        """A cluster grouped with the wrong link (the franka elbow case)
        is moved back by the observation-level carry test."""
        from autourdf_tpu.structure import refine_groups_by_carry

        cm = make_wrist_trap_chain()
        wrong = [{0, 1}, {2}, {3, 4}, {5, 6}]   # B's tip cluster 3 put in C's link
        fixed = refine_groups_by_carry([cm], wrong)
        assert sorted(sorted(g) for g in fixed) == [[0, 1], [2, 3], [4], [5, 6]]

    def test_carry_reassignment_keeps_correct_groups(self):
        from autourdf_tpu.structure import refine_groups_by_carry

        cm = make_wrist_trap_chain()
        right = self._groups()
        fixed = refine_groups_by_carry([cm], right)
        assert sorted(sorted(g) for g in fixed) == sorted(sorted(g) for g in right)

    def test_consistency_matrix_separates_composites(self):
        from autourdf_tpu.structure import revolute_consistency_matrix

        cm = make_wrist_trap_chain()
        D = revolute_consistency_matrix([cm], self._groups(), num_steps=8)
        # true single-revolute pairs beat the skew-axis composite B->D
        assert D[1, 2] < D[1, 3]
        assert D[2, 3] < D[1, 3]


class TestJoints:
    @pytest.mark.parametrize(
        "axis,pivot",
        [
            ((0, 0, 1.0), (0.0, 0.0, 0.0)),
            ((0, 1.0, 0), (0.1, 0.0, 0.2)),
        ],
    )
    def test_recovers_axis_and_origin(self, axis, pivot):
        cm = make_hinge_coordmap(num_frames=9, angle_step=0.15, axis=axis, pivot=pivot)
        sum_map = combined_sum_map([cm], "pose")
        groups, _, _ = coord_clustering(sum_map, 2)
        g0 = cluster_mst(cm)
        links = kinematics_tree(cm, groups, g0)
        joints = estimate_joints_from_tree([l for l in links], [cm],
                                           start_step=0, num_steps=9, interval=4)
        assert len(joints) == 1
        j = joints[0]
        ax = np.asarray(axis, float)
        ax /= np.linalg.norm(ax)
        cos = abs(j.global_axis @ ax)
        assert cos > 0.999, f"axis {j.global_axis} vs {ax}"
        # joint origin should lie on the true axis line through pivot
        diff = j.global_pos[:3] - np.asarray(pivot)
        perp = diff - (diff @ ax) * ax
        assert np.linalg.norm(perp) < 0.02, f"origin off axis by {np.linalg.norm(perp)}"


class TestLinksConsolidation:
    def test_consolidate_shapes(self):
        cm = make_hinge_coordmap()
        sum_map = combined_sum_map([cm], "pose")
        groups, _, _ = coord_clustering(sum_map, 2)
        art = consolidate_links(cm, groups)
        T = cm.coords.shape[0]
        assert art.matrices.shape == (T, 2, 4, 4)
        # link-local clouds should be stable across steps (rigid link)
        c0 = art.clusters[0][1]
        cL = art.clusters[T - 1][1]
        np.testing.assert_allclose(
            np.sort(c0.round(4), axis=0), np.sort(cL.round(4), axis=0), atol=2e-3
        )


class TestMeshing:
    def test_sphere_mesh_watertight(self, rng):
        # dense ball sample -> voxelize -> watertight surface of ~right area
        dirs = rng.normal(size=(20000, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        pts = dirs * (0.1 * rng.random((20000, 1)) ** (1 / 3) + 0.0)  # solid ball r=0.1
        mesh = cloud_to_mesh(pts, voxel_size=0.01, smooth_iterations=1)
        assert len(mesh.faces) > 100
        assert is_watertight(mesh)
        # surface area within a factor of the true sphere area
        true_area = 4 * np.pi * 0.1**2
        assert 0.5 * true_area < mesh.area < 2.5 * true_area

    def test_marching_tet_cube(self):
        vol = np.zeros((6, 6, 6), bool)
        vol[2:4, 2:4, 2:4] = True
        mesh = marching_tetrahedra(vol, voxel_size=1.0)
        assert is_watertight(mesh)
        # 2x2x2 occupied lattice points, surface at the half crossing:
        # enclosed volume = 2^3 minus the 8 corner chamfers ~ 6.75, and the
        # signed volume must be positive (outward-oriented normals)
        v = mesh.vertices
        f = mesh.faces
        vol_signed = np.sum(
            np.einsum("ij,ij->i", v[f[:, 0]],
                      np.cross(v[f[:, 1]], v[f[:, 2]]))) / 6.0
        assert 5.0 < vol_signed < 8.0

    def test_empty_cloud(self):
        mesh = marching_tetrahedra(np.zeros((4, 4, 4), bool))
        assert len(mesh.faces) == 0

    def test_projection_tightens_surface(self, rng):
        """Vertex projection + Taubin must cut the surface error of the raw
        half-crossing isosurface roughly in half on a known sphere, and
        keep the mesh watertight."""
        r = 0.1
        dirs = rng.normal(size=(20000, 3))
        dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
        pts = dirs * r  # surface-only sample (like a scanned shell)
        vox = 0.012

        raw = cloud_to_mesh(pts, vox, project=False, smooth_iterations=1)
        tight = cloud_to_mesh(pts, vox, project=True)
        assert is_watertight(raw) and is_watertight(tight)

        def surf_err(m):
            return float(np.abs(np.linalg.norm(m.vertices, axis=1) - r).mean())

        e_raw, e_tight = surf_err(raw), surf_err(tight)
        assert e_tight < 0.6 * e_raw, (e_raw, e_tight)
        assert e_tight < 0.35 * vox

    def test_taubin_preserves_volume(self, rng):
        vol = np.zeros((8, 8, 8), bool)
        vol[2:6, 2:6, 2:6] = True
        mesh = marching_tetrahedra(vol, voxel_size=1.0)

        def signed_volume(m):
            v, f = m.vertices, m.faces
            return float(np.sum(np.einsum("ij,ij->i", v[f[:, 0]],
                                          np.cross(v[f[:, 1]], v[f[:, 2]]))) / 6.0)

        from autourdf_tpu.mesh.meshing import laplacian_smooth, taubin_smooth

        v0 = signed_volume(mesh)
        v_taubin = signed_volume(taubin_smooth(mesh, iterations=10))
        v_lap = signed_volume(laplacian_smooth(mesh, iterations=10))
        assert abs(v_taubin - v0) < 0.15 * v0      # Taubin: volume held
        assert v_lap < 0.75 * v0                   # Laplacian: shrinks hard


class TestUrdfWriterSparseIds:
    def test_write_urdf_noncontiguous_link_ids(self, tmp_path):
        """Static-joint pruning can leave link ids with gaps (toilet: ids
        {0, 2, 3} after pruning); the writer must not index its palette or
        frames by raw id."""
        from autourdf_tpu.joints.screw import JointEstimate
        from autourdf_tpu.structure.coord_map import CoordMap
        from autourdf_tpu.structure.tree import LinkNode
        from autourdf_tpu.urdf.writer import write_urdf

        K, T = 4, 2
        mats = np.tile(np.eye(4, dtype=np.float32), (T, K, 1, 1))
        for k in range(K):
            mats[:, k, :3, 3] = [0.1 * k, 0.0, 0.0]
        coords = np.zeros((T, K, 7), np.float32)
        coords[..., 3] = 1.0
        coords[..., :3] = mats[..., :3, 3]
        cm = CoordMap(matrices=mats, coords=coords,
                      cluster_points=[np.zeros((4, 3), np.float32)] * T,
                      cluster_labels=[np.zeros(4, np.int64)] * T,
                      bbox_diag=1.0)

        # ids 0, 2, 3 — id 3 >= len(links), id 1 absent
        links = [LinkNode(id=0, cluster_idx={0}, parent_id=None),
                 LinkNode(id=2, cluster_idx={1, 2}, parent_id=0),
                 LinkNode(id=3, cluster_idx={3}, parent_id=2)]
        joints = [
            JointEstimate(parent_link=0, child_link=2,
                          local_axis=np.array([0.0, 0.0, 1.0]),
                          local_pos=np.zeros(3),
                          global_pos=np.array([0.1, 0.0, 0.0]),
                          global_axis=np.array([0.0, 0.0, 1.0])),
            JointEstimate(parent_link=2, child_link=3,
                          local_axis=np.array([0.0, 0.0, 1.0]),
                          local_pos=np.zeros(3),
                          global_pos=np.array([0.3, 0.0, 0.0]),
                          global_axis=np.array([0.0, 0.0, 1.0])),
        ]
        out = tmp_path / "sparse.urdf"
        path = write_urdf(links, joints, cm, str(out))
        txt = out.read_text()
        assert path == str(out)
        assert 'name="link_3"' in txt and 'name="link_1"' not in txt


def make_drift_coordmap(num_frames=10, drift_deg=3.0, seed=0):
    """Two 'links' that are really ONE rigid body: clusters 3-5 get a small
    random rotation/translation per frame (registration drift), not a joint."""
    rng = np.random.default_rng(seed)
    offs_a = np.asarray([[-0.5, 0, 0], [-0.35, 0.1, 0], [-0.2, -0.1, 0.05]])
    offs_b = np.asarray([[0.2, 0, 0], [0.4, 0.05, 0], [0.6, -0.05, 0.1]])
    K, T = 6, num_frames
    matrices = np.tile(np.eye(4), (T, K, 1, 1))
    pts = rng.normal(scale=0.05, size=(K, 20, 3))
    cluster_points, cluster_labels, raw_clouds = [], [], []
    for t in range(T):
        # cumulative small random walk of the 'child' shell: random axis,
        # few-degree step — drift has no consistent screw
        if t == 0:
            rot = np.eye(3)
        else:
            ax = rng.normal(size=3)
            ax /= np.linalg.norm(ax)
            step = ScipyRot.from_rotvec(ax * np.radians(drift_deg)).as_matrix()
            rot = step @ matrices[t - 1, 3, :3, :3]
        world_pts, labels = [], []
        for k in range(3):
            matrices[t, k, :3, 3] = offs_a[k]
            world_pts.append(pts[k] + offs_a[k])
            labels += [k] * 20
        for k in range(3):
            matrices[t, 3 + k, :3, :3] = rot
            matrices[t, 3 + k, :3, 3] = rot @ offs_b[k]
            world_pts.append(pts[3 + k] @ rot.T + rot @ offs_b[k])
            labels += [3 + k] * 20
        cluster_points.append(pts.reshape(-1, 3))
        cluster_labels.append(np.asarray(labels, np.int32))
        raw_clouds.append(np.concatenate(world_pts))
    return CoordMap.from_arrays(matrices, cluster_points, cluster_labels, raw_clouds)


class TestJointCoherence:
    """joints.screw.joint_screw_coherence: real revolute joints produce
    tightly clustered per-interval screw axes across sequences; drift-born
    'joints' scatter (the spurious-Sapien-joint veto signal)."""

    def _links(self):
        from autourdf_tpu.structure.tree import LinkNode

        return [LinkNode(id=0, cluster_idx={0, 1, 2}, parent_id=None),
                LinkNode(id=1, cluster_idx={3, 4, 5}, parent_id=0)]

    def test_real_hinge_is_coherent(self):
        from autourdf_tpu.joints import joint_screw_coherence

        cms = [make_hinge_coordmap(num_frames=10, angle_step=0.10, seed=s)
               for s in (0, 1)]
        (st,) = joint_screw_coherence(self._links(), cms, 0, 10, interval=4)
        assert st.concentration > 0.97
        assert st.median_dev_deg < 10.0
        assert st.seq_spread_deg < 10.0

    def test_drift_shell_is_incoherent(self):
        from autourdf_tpu.joints import joint_screw_coherence

        cms = [make_drift_coordmap(num_frames=10, seed=s) for s in (0, 1)]
        (st,) = joint_screw_coherence(self._links(), cms, 0, 10, interval=4)
        assert st.concentration < 0.9
        assert st.seq_spread_deg > 30.0
