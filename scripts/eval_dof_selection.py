"""Family-wide DoF model-selection evaluation (CPU-only, no TPU).

For every robot with registration artifacts under data/part, compare DoF
search variants against the FK ground-truth cluster labels:

    python scripts/eval_dof_selection.py [--robots wx200_5 solo12 ...]

Prints, per robot and variant: discovered link count, gt link count,
misassigned clusters under majority-vote group->gt-link mapping, and the
number of distinct gt links recovered as a group majority.  Used to
calibrate recursive_gap_split without re-running any TPU stage.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

from collections import Counter

import numpy as np  # noqa: E402


def partition_stats(groups, labels_gt, names):
    """(misassigned, distinct-majority-gt-links) under majority mapping."""
    err = 0
    majs = set()
    for g in groups:
        members = sorted(g)
        c = Counter(names[labels_gt[j]] for j in members)
        name, maj = c.most_common(1)[0]
        err += len(members) - maj
        majs.add(name)
    return err, len(majs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robots", nargs="*", default=None)
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--dist-mode", default="pose")
    ap.add_argument("--gap-threshold", type=float, default=1.45)
    ap.add_argument("--min-size", type=int, default=4)
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig, ROBOTS
    from autourdf_tpu.structure import (
        auto_dof_search,
        combined_sum_map,
        recursive_gap_split,
        refine_groups_by_carry,
    )
    from autourdf_tpu.workflow import build_coord_maps
    from gt_cluster_labels import gt_labels

    part = os.path.join(args.data_root, "part")
    avail = {}
    for d in sorted(os.listdir(part)):
        if d.endswith("_seg"):
            robot, k = d.rsplit("_", 2)[0], int(d.rsplit("_", 2)[1])
            avail.setdefault(robot, []).append(k)
    robots = args.robots or sorted(avail)

    print(f"{'robot':<14} {'K':>3} {'gt':>3} | {'auto':>4} {'mis':>3} "
          f"{'rec':>4} {'mis':>3} {'cov':>3} | note")
    for robot in robots:
        if robot not in avail:
            print(f"{robot:<14} -- no artifacts")
            continue
        for K in avail[robot]:
            cfg = PipelineConfig(robot=robot, data_root=args.data_root,
                                 num_seg=K)
            try:
                cms, _ = build_coord_maps(cfg, num_videos=5)
                labels_gt, names, _ = gt_labels(cfg, num_videos=5)
            except Exception as e:  # missing artifacts / assets
                print(f"{robot:<14} {K:>3} -- skipped: {type(e).__name__}: {e}")
                continue
            m = combined_sum_map(cms, mode=args.dist_mode)
            # raw (un-normalized) swap deviations: motion-evidence oracle
            from autourdf_tpu.structure import swap_consistency_map
            raw_swap = np.max([swap_consistency_map(cm) for cm in cms], axis=0)
            groups_a, _, _, _ = auto_dof_search(m)
            groups_a = refine_groups_by_carry(cms, groups_a)
            groups_r = recursive_gap_split(
                m, groups_a, gap_threshold=args.gap_threshold,
                min_size=args.min_size, validate_map=raw_swap)
            groups_r = refine_groups_by_carry(cms, groups_r)
            n_gt = len(set(names))
            ea, _ = partition_stats(groups_a, labels_gt, names)
            er, cov = partition_stats(groups_r, labels_gt, names)
            note = "" if len(groups_r) == len(groups_a) else \
                f"split {len(groups_a)}->{len(groups_r)}"
            print(f"{robot:<14} {K:>3} {n_gt:>3} | {len(groups_a):>4} {ea:>3} "
                  f"{len(groups_r):>4} {er:>3} {cov:>3} | {note}")


if __name__ == "__main__":
    main()
