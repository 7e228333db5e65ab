"""Real-scan-layout validation run: wx200_real through the ragged pipeline.

The reference ships real-scan configs (`wx200_real_4/5`,
/root/reference/parameters.json:281-303) and a loader for the flat
`data/raw/{robot}/V*/####/robot.ply` layout with per-frame-varying point
counts (/root/reference/PointCloud/mlp_reg.py:424-426), but not the scans
themselves.  This script validates the same contract end to end at full
scale: it captures sequences from the reference's *real* wx200 URDF
(which differs from the sim model), degrades them into ragged real-like
scans (random per-frame point counts, dropout), writes them in the flat
layout, and drives registration -> structure -> URDF -> evaluation
through the masked/padded code path.

Usage: python scripts/realscan_run.py [--data-root data_real]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-root", default="data_real")
    ap.add_argument("--robot", default="wx200_real_5")
    ap.add_argument("--num-videos", type=int, default=5)
    ap.add_argument("--min-keep", type=float, default=0.88,
                    help="lower bound on per-frame point keep fraction")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--dist-mode", default="swap")
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig
    from autourdf_tpu.io.ply import read_ply, write_ply
    from autourdf_tpu.sim.datagen import collect
    from autourdf_tpu.workflow import (
        run_build_urdf,
        run_evaluation,
        run_registration,
    )

    cfg = PipelineConfig(robot=args.robot, data_root=args.data_root,
                         num_videos=args.num_videos)
    rng = np.random.default_rng(args.seed)

    # 1. capture sequences from the real-robot URDF (sim layout first)
    sim_root = os.path.join(args.data_root, "_capture")
    sim_cfg = PipelineConfig(robot=args.robot, data_root=sim_root,
                             num_videos=args.num_videos)
    if len(glob.glob(os.path.join(sim_cfg.raw_dir(), "V*"))) < args.num_videos:
        print("[realscan] capturing from", sim_cfg.robot, flush=True)
        collect(sim_cfg, asset_root=os.environ.get(
            "AUTOURDF_ASSET_ROOT", "/root/reference"), epochs=args.num_videos)

    # 2. degrade into ragged real-like scans in the FLAT layout
    flat_root = os.path.join(args.data_root, "raw", args.robot)
    if not glob.glob(os.path.join(flat_root, "V*")):
        for vdir in sorted(glob.glob(os.path.join(sim_cfg.raw_dir(), "V*"))):
            vout = os.path.join(flat_root, os.path.basename(vdir))
            for fdir in sorted(glob.glob(os.path.join(vdir, "*/"))):
                ply = os.path.join(fdir, "robot.ply")
                if not os.path.exists(ply):
                    continue
                pts = read_ply(ply)
                keep = rng.uniform(args.min_keep, 1.0)
                n = int(len(pts) * keep)
                sel = rng.choice(len(pts), n, replace=False)
                fout = os.path.join(vout, os.path.basename(os.path.normpath(fdir)))
                os.makedirs(fout, exist_ok=True)
                write_ply(os.path.join(fout, "robot.ply"), pts[sel])
                for aux in ("joint_cfg.txt", "noise.txt"):
                    src = os.path.join(fdir, aux)
                    if os.path.exists(src):
                        shutil.copy(src, os.path.join(fout, aux))
        print("[realscan] flat ragged layout at", flat_root, flush=True)

    counts = sorted({len(read_ply(p)) for p in glob.glob(
        os.path.join(flat_root, "V*", "*", "robot.ply"))})
    print(f"[realscan] per-frame counts range {counts[0]}..{counts[-1]} "
          f"({len(counts)} distinct)", flush=True)
    assert len(counts) > 1, "degradation produced uniform counts"

    # 3. masked registration -> structure -> URDF -> evaluation
    stats = run_registration(cfg, verbose=True)
    print("[realscan] registration mean loss", stats["mean_loss"], flush=True)
    run_build_urdf(cfg, unknown_dof=True, dist_mode=args.dist_mode,
                   end_video=args.num_videos)
    # the registry's ori corrects the reference's rolled REAL scans; our
    # own capture is already in sim_ori's frame
    results = run_evaluation(cfg, pred_ori=(0.0, 0.0, 0.0))
    print(json.dumps({"registration_mean_loss": stats["mean_loss"],
                      "eval": {k: v for k, v in results.items()
                               if isinstance(v, (int, float, str))}}))


if __name__ == "__main__":
    main()
