"""Structure-discovery diagnostics for a registered robot (CPU-only).

Prints the discovered link partition (clusters per link), the FK
ground-truth link of every cluster (via scripts/gt_cluster_labels), and
the per-link composition — the tool used to verify e.g. that the ur5
partition is exactly the true one and that wx200_5's wrist link is a
singleton cluster.

    python scripts/inspect_structure.py --robot wx200_5 [--dist-mode pose]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")  # diagnostics never need the TPU

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--robot", default="wx200_5")
    ap.add_argument("--data-root", default="data")
    ap.add_argument("--num-seg", type=int, default=None)
    ap.add_argument("--dist-mode", default="pose")
    ap.add_argument("--num-videos", type=int, default=5)
    ap.add_argument("--no-carry", action="store_true")
    args = ap.parse_args()

    from collections import Counter

    from autourdf_tpu.config import PipelineConfig
    from autourdf_tpu.structure import (
        auto_dof_search,
        combined_sum_map,
        refine_groups_by_carry,
    )
    from autourdf_tpu.workflow import build_coord_maps
    from gt_cluster_labels import gt_labels

    cfg = PipelineConfig(robot=args.robot, data_root=args.data_root,
                         num_seg=args.num_seg)
    cms, _ = build_coord_maps(cfg, num_videos=args.num_videos)
    m = combined_sum_map(cms, mode=args.dist_mode)
    groups, _, ratios, _ = auto_dof_search(m)
    print(f"{args.robot}: discovered {len(groups)} links "
          f"(DoF {len(groups) - 1}), best merge-gap ratio {max(ratios):.2f}")
    if not args.no_carry:
        groups = refine_groups_by_carry(cms, groups, verbose=True)

    try:
        labels, names, conf = gt_labels(cfg, num_videos=args.num_videos)
    except Exception as e:  # assets may be absent
        print(f"(no FK gt available: {e})")
        labels, names = None, None

    for gi, g in enumerate(sorted(groups, key=lambda s: -len(s))):
        line = f"  link {gi}: {len(g)} clusters {sorted(g)}"
        if labels is not None:
            comp = Counter(names[labels[j]] for j in sorted(g))
            line += "  <- gt: " + ", ".join(
                f"{n.split('/')[-1]}x{c}" for n, c in comp.most_common())
        print(line)
    if labels is not None:
        covered = {names[labels[j]] for g in groups for j in g}
        missing = [n for n in names if n not in covered]
        if missing:
            print(f"  gt links with NO clusters: {missing}")


if __name__ == "__main__":
    main()
