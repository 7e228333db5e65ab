"""Unit tests for the evaluation module (axis-line errors, joint matching)."""

import numpy as np
import pytest

from autourdf_tpu.eval import compare_joints, joint_error

TWO_LINK = """<?xml version="1.0"?>
<robot name="r">
  <link name="base"/>
  <link name="arm"/>
  <link name="tip"/>
  <joint name="j1" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="j2" type="revolute">
    <parent link="arm"/><child link="tip"/>
    <origin xyz="0.4 0 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
</robot>
"""


COLLINEAR = """<?xml version="1.0"?>
<robot name="c">
  <link name="base"/>
  <link name="l1"/>
  <link name="l2"/>
  <link name="l3"/>
  <joint name="pan" type="revolute">
    <parent link="base"/><child link="l1"/>
    <origin xyz="0 0 0.3"/><axis xyz="0 0 1"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="lift" type="revolute">
    <parent link="l1"/><child link="l2"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="roll" type="revolute">
    <parent link="l2"/><child link="l3"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
</robot>
"""


class TestJointError:
    def test_identical_lines(self):
        pe, de = joint_error([0, 0, 0], [0, 0, 1], [0, 0, 5], [0, 0, 1])
        assert pe == pytest.approx(0.0, abs=1e-12)  # same line, offset along axis
        assert de == pytest.approx(0.0, abs=1e-9)

    def test_parallel_offset(self):
        pe, de = joint_error([0, 0, 0], [0, 0, 1], [0.3, 0, 0], [0, 0, 1])
        assert pe == pytest.approx(0.3, abs=1e-9)
        assert de == pytest.approx(0.0, abs=1e-9)

    def test_skew_lines(self):
        # line A: z-axis; line B: parallel to x through (0, 1, 0) -> distance 1
        pe, de = joint_error([0, 0, 0], [0, 0, 1], [0, 1, 0], [1, 0, 0])
        assert pe == pytest.approx(1.0, abs=1e-9)
        assert de == pytest.approx(90.0, abs=1e-6)

    def test_degenerate_axis(self):
        pe, de = joint_error([0, 0, 0], [0, 0, 0], [0, 0, 0], [0, 0, 1])
        assert pe == float("inf") and de == 90.0


class TestCompareJoints:
    @pytest.fixture
    def urdf(self, tmp_path):
        p = tmp_path / "r.urdf"
        p.write_text(TWO_LINK)
        return str(p)

    def test_identical_urdfs_zero_error(self, urdf):
        cmp = compare_joints(urdf, urdf, dof=2, offset=np.zeros(2))
        assert max(cmp.pos_errors) < 1e-9
        assert max(cmp.dir_errors) < 1e-6
        assert list(cmp.joint_map) == [0, 1]
        assert cmp.direction_map == [1, 1]

    def test_collinear_joints_match_in_chain_order(self, tmp_path):
        """franka regression: pan and roll share one axis LINE at the
        home config, so line-to-line cost cannot distinguish them and a
        swapped match sends re-sim commands to the wrong joints.  The
        chain-depth tie-breaker must keep the identity assignment."""
        p = tmp_path / "c.urdf"
        p.write_text(COLLINEAR)
        cmp = compare_joints(str(p), str(p), dof=3, offset=np.zeros(3))
        assert list(cmp.joint_map) == [0, 1, 2]
        assert max(cmp.pos_errors) < 1e-9
        assert max(cmp.dir_errors) < 1e-6

    def test_flipped_axis_detected(self, tmp_path, urdf):
        flipped = TWO_LINK.replace('<axis xyz="0 0 1"/>', '<axis xyz="0 0 -1"/>')
        p = tmp_path / "f.urdf"
        p.write_text(flipped)
        cmp = compare_joints(str(p), urdf, dof=2, offset=np.zeros(2))
        assert cmp.direction_map[0] == -1  # folded to < 90 with a sign flag
        assert cmp.dir_errors[0] < 1e-6

    def test_hand_joint_map(self, tmp_path, urdf):
        # swap the joints in the pred URDF, then correct via the map
        swapped = TWO_LINK.replace("j1", "TMP").replace("j2", "j1").replace("TMP", "j2")
        # swapping names only doesn't change order; instead test an explicit map
        cmp = compare_joints(urdf, urdf, dof=2, offset=np.zeros(2),
                             joint_map=np.asarray([1, 0]))
        # mismatched pairing should produce large errors
        assert max(cmp.dir_errors) > 10

    def test_partial_match_when_pred_underdiscovers(self, tmp_path, urdf):
        one_joint = """<?xml version="1.0"?>
<robot name="p">
  <link name="base"/><link name="arm"/>
  <joint name="only" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
</robot>
"""
        p = tmp_path / "one.urdf"
        p.write_text(one_joint)
        cmp = compare_joints(str(p), urdf, dof=2, offset=np.zeros(2))
        assert (cmp.joint_map == -1).sum() == 1  # one gt joint unmatched
        assert len(cmp.pos_errors) == 1          # errors only over matched
        assert cmp.pos_errors[0] < 1e-9

    def test_coverage_and_penalized_aggregate(self, tmp_path, urdf):
        """Under-discovery must be visible: matched/total + penalized means."""
        one_joint = """<?xml version="1.0"?>
<robot name="p">
  <link name="base"/><link name="arm"/>
  <joint name="only" type="revolute">
    <parent link="base"/><child link="arm"/>
    <origin xyz="0 0 0.2"/><axis xyz="0 0 1"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
</robot>
"""
        p = tmp_path / "one.urdf"
        p.write_text(one_joint)
        cmp = compare_joints(str(p), urdf, dof=2, offset=np.zeros(2))
        assert cmp.matched == 1 and cmp.total == 2
        assert len(cmp.dir_errors_complete) == 2
        # the unmatched joint carries the defined 90-deg / robot-scale penalty
        assert cmp.dir_mean_complete == pytest.approx((cmp.dir_errors[0] + 90.0) / 2)
        assert cmp.dir_mean_complete > cmp.dir_mean_matched
        assert cmp.pos_errors_complete[1] >= 0.1

    def test_full_match_complete_equals_matched(self, urdf):
        cmp = compare_joints(urdf, urdf, dof=2, offset=np.zeros(2))
        assert cmp.matched == cmp.total == 2
        assert cmp.dir_mean_complete == pytest.approx(cmp.dir_mean_matched)
        assert cmp.pos_mean_complete == pytest.approx(cmp.pos_mean_matched)


REF_JOINT_MAP_DIR = "/root/reference/Sim/joint_map"


class TestReferenceJointMapProtocol:
    """The reference's hand-authored Sim/joint_map/*.txt permutations are
    its published evaluation protocol (/root/reference/Sim/evaluation.py:409-416):
    row i holds the predicted-joint index paired with gt joint i.  Run the
    actual fixture files through the file-based path."""

    import os as _os

    needs_ref = pytest.mark.skipif(
        not _os.path.isdir(REF_JOINT_MAP_DIR), reason="reference checkout absent"
    )

    @needs_ref
    def test_wx200_5_identity_map_on_gt(self):
        import os

        from autourdf_tpu.config import get_robot

        gt = get_robot("wx200_5").gt_path()
        jm = np.loadtxt(os.path.join(REF_JOINT_MAP_DIR, "wx200_5.txt"), dtype=int)
        assert list(jm) == [0, 1, 2, 3, 4]  # the published wx200 map is identity
        cmp = compare_joints(gt, gt, dof=5, offset=np.zeros(5), joint_map=jm)
        assert cmp.matched == cmp.total == 5
        assert max(cmp.dir_errors) < 1e-6
        assert max(cmp.pos_errors) < 1e-9

    @needs_ref
    def test_pxs_permutation_map_on_gt(self):
        """pxs.txt is a true permutation of 18 joints; the file-based path
        must consume every row, index pred joints by value, and keep the
        permuted (wrong-on-purpose vs identity) pairings in the error
        lists rather than dropping them."""
        import os

        from autourdf_tpu.config import get_robot

        gt = get_robot("pxs").gt_path()
        jm = np.loadtxt(os.path.join(REF_JOINT_MAP_DIR, "pxs.txt"), dtype=int)
        assert sorted(jm.tolist()) == list(range(18))
        cmp = compare_joints(gt, gt, dof=18, offset=np.zeros(18), joint_map=jm)
        assert cmp.matched == cmp.total == 18
        assert np.all(np.isfinite(cmp.dir_errors))
        assert np.asarray(cmp.joint_map).tolist() == jm.tolist()
        # identity pairing on the same URDF is exact; the permuted pairing
        # pairs different legs, so the errors must be nonzero overall
        ident = compare_joints(gt, gt, dof=18, offset=np.zeros(18),
                               joint_map=np.arange(18))
        assert max(ident.dir_errors) < 1e-6
        assert float(np.mean(cmp.pos_errors)) > float(np.mean(ident.pos_errors))


BIPED_GT = """<?xml version="1.0"?>
<robot name="b">
  <link name="base"/>
  <link name="thigh_l"/><link name="shank_l"/>
  <link name="thigh_r"/><link name="shank_r"/>
  <joint name="hip_l" type="revolute">
    <parent link="base"/><child link="thigh_l"/>
    <origin xyz="0 0.1 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="knee_l" type="revolute">
    <parent link="thigh_l"/><child link="shank_l"/>
    <origin xyz="0 0 -0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="hip_r" type="revolute">
    <parent link="base"/><child link="thigh_r"/>
    <origin xyz="0 -0.1 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="knee_r" type="revolute">
    <parent link="thigh_r"/><child link="shank_r"/>
    <origin xyz="0 0 -0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
</robot>
"""

# identical geometry, but joints listed breadth-first (both hips, then
# both knees) — the discovered-URDF ordering that sent the depth
# tie-breaker across bolt's legs
BIPED_PRED = """<?xml version="1.0"?>
<robot name="b">
  <link name="base"/>
  <link name="thigh_a"/><link name="shank_a"/>
  <link name="thigh_b"/><link name="shank_b"/>
  <joint name="hip_a" type="revolute">
    <parent link="base"/><child link="thigh_a"/>
    <origin xyz="0 0.1 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="hip_b" type="revolute">
    <parent link="base"/><child link="thigh_b"/>
    <origin xyz="0 -0.1 0"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="knee_a" type="revolute">
    <parent link="thigh_a"/><child link="shank_a"/>
    <origin xyz="0 0 -0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
  <joint name="knee_b" type="revolute">
    <parent link="thigh_b"/><child link="shank_b"/>
    <origin xyz="0 0 -0.2"/><axis xyz="0 1 0"/>
    <limit lower="-1" upper="1" effort="1" velocity="1"/>
  </joint>
</robot>
"""


class TestChainConsistentMatching:
    def test_symmetric_biped_not_crossed(self, tmp_path):
        """bolt regression: both hip axes share one LINE (and both knee
        axes another), so geometry cannot separate the legs and the
        independent Hungarian assignment crossed them — each per-joint
        error tiny, but commanding one gt joint split the posture across
        two predicted legs (resim 0.109).  The matching must preserve
        ancestor relations: whatever pred leg gt's left hip lands on,
        gt's left knee must land DOWN-CHAIN of it."""
        from autourdf_tpu.eval.joints_eval import _joint_ancestor_matrix
        from autourdf_tpu.urdf.parser import load_urdf

        g = tmp_path / "gt.urdf"
        g.write_text(BIPED_GT)
        p = tmp_path / "pred.urdf"
        p.write_text(BIPED_PRED)
        cmp = compare_joints(str(p), str(g), dof=4, offset=np.zeros(4))
        anc_p = _joint_ancestor_matrix(load_urdf(str(p), load_meshes=False))
        jm = cmp.joint_map
        assert anc_p[jm[0], jm[1]], jm   # left hip above left knee
        assert anc_p[jm[2], jm[3]], jm   # right hip above right knee
        assert max(cmp.pos_errors) < 1e-9
        assert max(cmp.dir_errors) < 1e-6

    def test_ancestor_matrix(self, tmp_path):
        from autourdf_tpu.eval.joints_eval import _joint_ancestor_matrix
        from autourdf_tpu.urdf.parser import load_urdf

        g = tmp_path / "gt.urdf"
        g.write_text(BIPED_GT)
        anc = _joint_ancestor_matrix(load_urdf(str(g), load_meshes=False))
        expect = np.zeros((4, 4), bool)
        expect[0, 1] = expect[2, 3] = True
        assert (anc == expect).all()
