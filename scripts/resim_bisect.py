"""Decompose a robot's re-simulation Chamfer into its error sources.

The resim metric (eval/resim.py, reference Sim/evaluation.py:228-381)
mixes four error sources; this tool measures each in isolation so a bad
number (bolt/dishwasher ~0.11 in round 2) can be attributed:

  floor     gt URDF against itself at identical random configs, different
            camera rigs — the capture + FPS-sampling + ICP noise floor.
  static    pred vs gt at the home configuration (zero command) — link
            mesh fidelity + base alignment, no joint errors involved.
  joint j   pred vs gt commanding ONLY gt joint j (+-0.7 rad), rest at
            home — the static error plus joint j's axis/origin error,
            swept through the two worst-case directions.
  full      the standard 3-random-config resim (the headline number).

    python scripts/resim_bisect.py --robot bolt [--data-root data]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", required=True)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--asset-root", default=None)
    ap.add_argument("--amp", type=float, default=0.7,
                    help="per-joint sweep amplitude (rad)")
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig, get_robot
    from autourdf_tpu.eval import compare_joints, load_offset, resim_chamfer

    cfg = PipelineConfig(robot=args.robot, data_root=args.data_root)
    robot = get_robot(cfg.robot)
    offset = load_offset(cfg.raw_dir())
    gt_path = robot.gt_path(args.asset_root)

    cmp = compare_joints(
        pred_urdf_path=cfg.urdf_path(), gt_urdf_path=gt_path, dof=robot.dof,
        offset=offset, sim_ori=robot.sim_ori, pred_ori=robot.ori,
        joint_map=None, global_scale=robot.global_scale,
        asset_root=args.asset_root,
    )
    common = dict(
        gt_urdf_path=gt_path, dof=robot.dof, offset=offset,
        joint_map=cmp.joint_map, direction_map=cmp.direction_map,
        sim_ori=robot.sim_ori, pred_ori=robot.ori, radius=robot.cam_dist,
        num_cameras=cfg.num_cameras, global_scale=robot.global_scale,
        asset_root=args.asset_root, seed=cfg.seed,
    )
    report = {"robot": args.robot}

    # 1. capture/ICP floor: gt against itself, identical commands
    rng = np.random.default_rng(cfg.seed)
    a_rand = rng.random((3, robot.dof)) * 2.0 - 1.0
    floor_common = dict(common)
    floor_common.update(
        joint_map=np.arange(robot.dof), direction_map=[1.0] * robot.dof,
        pred_ori=robot.sim_ori, offset=np.zeros_like(np.asarray(offset)),
    )
    _, floor, _ = resim_chamfer(pred_urdf_path=gt_path, a_list=a_rand,
                                **floor_common)
    report["floor"] = floor
    print(f"floor (gt-vs-gt capture noise): {floor:.4f}")

    # 2. static geometry: pred home vs gt home
    _, static, _ = resim_chamfer(
        pred_urdf_path=cfg.urdf_path(),
        a_list=np.zeros((1, robot.dof)), **common)
    report["static"] = static
    print(f"static (home config, mesh+base): {static:.4f}")

    # 3. per-joint sweeps
    per_joint = []
    for j in range(robot.dof):
        a = np.zeros((2, robot.dof))
        a[0, j] = args.amp
        a[1, j] = -args.amp
        _, m, _ = resim_chamfer(pred_urdf_path=cfg.urdf_path(),
                                a_list=a, **common)
        per_joint.append(m)
        print(f"joint {j:2d} (+-{args.amp} rad): {m:.4f} "
              f"(excess over static {m - static:+.4f})")
    report["per_joint"] = per_joint

    # 4. the headline 3-random-config number
    _, full, full_std = resim_chamfer(pred_urdf_path=cfg.urdf_path(),
                                      **common)
    report["full"] = full
    print(f"full (3 random configs): {full:.4f} +- {full_std:.4f}")

    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
