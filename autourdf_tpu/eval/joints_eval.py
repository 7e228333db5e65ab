"""Joint-accuracy evaluation: predicted URDF vs ground truth.

Rebuilds compare_joints (/root/reference/Sim/evaluation.py:84-224) on our
FK stack: load both URDFs, compute world-frame axis lines of the first
``dof`` revolute joints (gt posed at the recorded start offsets), pair
them through a joint index map, and report the line-to-line normal
distance and the axis angle folded at 90 degrees.

The reference requires a hand-authored Sim/joint_map/{robot}.txt
permutation; we support those files *and* an automatic assignment
(Hungarian matching on the combined error) when no map is given.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from ..urdf.fk import joint_world_frames
from ..urdf.parser import load_urdf

# Chain-depth tie-breaker weight for the automatic Hungarian assignment,
# as a fraction of the finite-cost spread (see compare_joints).  Must
# stay far below 1 so it can only resolve geometric ties (collinear
# joints), never override a genuine distinction.
TIE_BREAK_SCALE = 1e-3


def joint_error(pos_a, uv_a, pos_b, uv_b) -> tuple[float, float]:
    """(normal distance between axis lines, angle between axes in deg)."""
    na, nb = np.linalg.norm(uv_a), np.linalg.norm(uv_b)
    if na < 1e-12 or nb < 1e-12 or not (np.all(np.isfinite(uv_a)) and np.all(np.isfinite(uv_b))):
        return float("inf"), 90.0  # degenerate axis: worst-case but finite angle
    uv_a = np.asarray(uv_a) / na
    uv_b = np.asarray(uv_b) / nb
    cross = np.cross(uv_a, uv_b)
    cmag = np.linalg.norm(cross)
    diff = np.asarray(pos_b) - np.asarray(pos_a)
    if cmag == 0:
        pos_error = np.linalg.norm(np.cross(diff, uv_a))
    else:
        pos_error = abs(diff @ cross) / cmag
    dot = float(np.clip(np.dot(uv_a, uv_b), -1.0, 1.0))
    return float(pos_error), float(np.degrees(np.arccos(dot)))


@dataclass
class JointComparison:
    pos_errors: list[float]
    dir_errors: list[float]
    direction_map: list[int]   # +1 / -1 per joint (axis flipped vs gt)
    joint_map: np.ndarray      # pred joint index used for each gt joint
    # coverage accounting: under-discovery must not silently flatter the
    # matched-subset means, so unmatched gt joints carry a defined penalty
    # (90 deg direction, robot-scale position) in the *complete* aggregates.
    matched: int = 0
    total: int = 0
    pos_errors_complete: list[float] | None = None
    dir_errors_complete: list[float] | None = None

    @property
    def dir_mean_matched(self) -> float:
        return float(np.mean(self.dir_errors)) if self.dir_errors else 90.0

    @property
    def pos_mean_matched(self) -> float:
        return float(np.mean(self.pos_errors)) if self.pos_errors else float("nan")

    @property
    def dir_mean_complete(self) -> float:
        return float(np.mean(self.dir_errors_complete)) if self.dir_errors_complete else 90.0

    @property
    def pos_mean_complete(self) -> float:
        return (float(np.mean(self.pos_errors_complete))
                if self.pos_errors_complete else float("nan"))


def _world_axes(urdf_path, base_orientation, q, dof, global_scale, asset_root):
    from scipy.spatial.transform import Rotation as ScipyRot

    model = load_urdf(urdf_path, asset_root=asset_root, load_meshes=False,
                      global_scale=global_scale)
    base = np.eye(4)
    base[:3, :3] = ScipyRot.from_euler("xyz", base_orientation).as_matrix()
    frames = joint_world_frames(model, q, base)
    return frames[:dof] if dof else frames


def compare_joints(
    pred_urdf_path: str,
    gt_urdf_path: str,
    dof: int,
    offset: np.ndarray | None = None,
    sim_ori=(0, 0, 0),
    pred_ori=(0, 0, 0),
    joint_map: np.ndarray | None = None,
    global_scale: float = 1.0,
    asset_root: str | None = None,
) -> JointComparison:
    pred_all = _world_axes(pred_urdf_path, pred_ori, None, None, global_scale, asset_root)

    gt_model = load_urdf(gt_urdf_path, asset_root=asset_root, load_meshes=False)
    q = {}
    if offset is not None:
        for j, o in zip(gt_model.revolute_joints[:dof], offset):
            q[j.name] = float(o)
    from scipy.spatial.transform import Rotation as ScipyRot

    gt_base = np.eye(4)
    gt_base[:3, :3] = ScipyRot.from_euler("xyz", sim_ori).as_matrix()
    gt_frames = joint_world_frames(gt_model, q, gt_base, dof=dof)

    n = min(dof, len(gt_frames))
    if joint_map is None:
        # automatic assignment: Hungarian on pos + scaled dir error.
        # When the predicted URDF has fewer joints than the gt dof
        # (under-discovered DoF), unmatched gt joints get map entry -1 and
        # are skipped in the error lists.
        from scipy.optimize import linear_sum_assignment

        np_pred = len(pred_all)
        cost = np.full((n, max(np_pred, 1)), 1e6)
        for gi in range(n):
            for pi in range(np_pred):
                pe, de = joint_error(
                    pred_all[pi].position, pred_all[pi].axis,
                    gt_frames[gi].position, gt_frames[gi].axis,
                )
                de = min(de, 180.0 - de)
                cost[gi, pi] = pe + de / 90.0
        cost = np.where(np.isfinite(cost), cost, 1e6)  # degenerate axes
        # COLLINEAR joints (franka's pan and roll share one axis line at
        # the home config) have identical line-to-line cost either way, so
        # the assignment would be arbitrary — and a swap sends re-sim
        # commands to the wrong joints.  A tiny chain-depth tie-breaker
        # (both joint lists are in kinematic order) resolves exactly those
        # ties without ever overriding a genuine geometric distinction.
        if n > 1 and np_pred > 1:
            gi_d = np.arange(n)[:, None] / (n - 1)
            pi_d = np.arange(np_pred)[None, :] / (np_pred - 1)
            # the epsilon scales with the spread of the real (finite,
            # sub-sentinel) costs so the tie-breaker stays three orders of
            # magnitude below genuine geometric distinctions even when the
            # whole cost matrix is tightly grouped (sub-mm differences)
            real = cost[cost < 1e5]
            spread = float(real.max() - real.min()) if real.size else 1.0
            cost = cost + TIE_BREAK_SCALE * max(spread, 1e-9) * np.abs(gi_d - pi_d)
        rows, cols = linear_sum_assignment(cost)
        joint_map = np.full(n, -1, dtype=int)
        joint_map[rows] = cols
    else:
        joint_map = np.asarray(joint_map, dtype=int)

    # penalty scale for unmatched gt joints: the span of the gt joint
    # positions (a robot-scale length), floored to avoid a zero penalty on
    # single-joint robots.
    gt_pos = np.array([g.position for g in gt_frames[:n]]) if n else np.zeros((0, 3))
    pos_penalty = 0.1
    if len(gt_pos) >= 2:
        span = float(np.linalg.norm(gt_pos.max(0) - gt_pos.min(0)))
        pos_penalty = max(span, 0.1)

    pos_errors, dir_errors, dir_map = [], [], []
    pos_complete, dir_complete = [], []
    for gi in range(n):
        if joint_map[gi] < 0 or joint_map[gi] >= len(pred_all):
            dir_map.append(1)
            pos_complete.append(pos_penalty)
            dir_complete.append(90.0)
            continue
        p = pred_all[joint_map[gi]]
        g = gt_frames[gi]
        pe, de = joint_error(p.position, p.axis, g.position, g.axis)
        if de > 90.0:
            de = 180.0 - de
            dir_map.append(-1)
        else:
            dir_map.append(1)
        pos_errors.append(pe)
        dir_errors.append(de)
        pos_complete.append(pe)
        dir_complete.append(de)
    return JointComparison(
        pos_errors, dir_errors, dir_map, joint_map,
        matched=len(pos_errors), total=n,
        pos_errors_complete=pos_complete, dir_errors_complete=dir_complete,
    )
