"""Probe-loss-vs-k ladder measurement for DoF model selection (CPU-able).

For each candidate link count k, cut the pose dendrogram, apply the carry
reassignment, build the kinematic tree, estimate joints, run a SHORT
chain-fit probe, and print the probe loss.  The measurement behind the
round-3 k-selection arbiter: under-split partitions (k below the true
link count) cannot track the clouds and sit far above the curve's
plateau, while over-split partitions improve only marginally (extra
joints absorb registration noise, see structure/model_select.py).

    python scripts/probe_k_ladder.py --robot wx200_5 --data-root data_seeds/s2026 \
        --kmin 3 --kmax 9 [--cpu] [--steps 60] [--ppl 256] [--seqs 2]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="wx200_5")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--kmin", type=int, default=3)
    ap.add_argument("--kmax", type=int, default=9)
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--ppl", type=int, default=256)
    ap.add_argument("--seqs", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--tree", default="mst", choices=["mst", "motion"])
    ap.add_argument("--json-out", default=None)
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import numpy as np

    from autourdf_tpu.config import PipelineConfig
    from autourdf_tpu.joints.chain import refine_chain
    from autourdf_tpu.joints.screw import estimate_joints_from_tree
    from autourdf_tpu.structure import (
        cluster_mst,
        combined_sum_map,
        coord_clustering,
        kinematics_tree,
        motion_tree,
        refine_groups_by_carry,
        swap_consistency_stack,
    )
    from autourdf_tpu.workflow import (
        _load_refine_frames,
        build_coord_maps,
    )

    cfg = PipelineConfig(robot=args.robot, data_root=args.data_root)
    cms, _ = build_coord_maps(cfg)
    sum_map = combined_sum_map(cms, "pose")
    stack = swap_consistency_stack(cms)
    frames, fmasks = _load_refine_frames(cfg, cfg.num_videos)
    sub_cms = cms[: args.seqs]
    sub_frames = frames[: args.seqs]
    sub_masks = fmasks[: args.seqs] if fmasks is not None else None
    T = sub_frames.shape[1]

    rows = []
    for k in range(args.kmin, args.kmax + 1):
        t0 = time.time()
        groups, _, _ = coord_clustering(sum_map, k)
        groups = refine_groups_by_carry(cms, groups, stack=stack)
        keff = len(groups)
        try:
            if args.tree == "motion":
                links = motion_tree(cms, groups, T)
            else:
                links = kinematics_tree(sub_cms[0], groups,
                                        cluster_mst(sub_cms[0]))
            joints = estimate_joints_from_tree(links, sub_cms, 0, T, interval=4)
            if not joints:
                loss = float("inf")
            else:
                _, result = refine_chain(
                    links, joints, sub_cms, sub_frames, steps=args.steps,
                    points_per_link=args.ppl, frame_masks=sub_masks,
                )
                loss = float(result.loss)
        except Exception as e:
            print(f"k={k}: FAILED {type(e).__name__}: {e}")
            rows.append({"k": k, "keff": keff, "loss": None})
            continue
        dt = time.time() - t0
        rows.append({"k": k, "keff": keff, "loss": loss})
        print(f"k={k} (eff {keff}): probe loss {loss:.5f}  [{dt:.0f}s]",
              flush=True)

    finite = [r for r in rows if r["loss"] is not None]
    if finite:
        best = min(r["loss"] for r in finite)
        print("\nrelative to best:")
        for r in finite:
            print(f"  k={r['k']}: {r['loss'] / best:.3f}x")
    if args.json_out:
        with open(args.json_out, "w") as f:
            json.dump({"robot": args.robot, "root": args.data_root,
                       "rows": rows}, f, indent=1)


if __name__ == "__main__":
    main()
