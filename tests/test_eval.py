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
