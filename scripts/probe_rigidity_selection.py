"""Probe: per-k rigidity scoring of pose-map partitions (CPU-only).

The pose map's single-linkage partitions assign clusters well at the
RIGHT k (seed sweeps show 1-2 misassigned); what fails across seeds is
choosing k from dendrogram gap statistics.  This probe scores every
candidate k with observation-level evidence instead: a partition is
over-merged iff some group internally contains an articulated pair, as
measured by the floor-calibrated carry excess (meters).  Selection rule
under test:

    k* = smallest k such that rigidity(k) <= tau,
    rigidity(k) = max over groups of q-quantile of within-group pair
                  excess (q robust to boundary clusters)

Prints the rigidity profile per k with the gt-optimal k marked, for the
headline datasets and the failing seed roots.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from scipy.cluster.hierarchy import fcluster, linkage  # noqa: E402
from scipy.spatial.distance import squareform  # noqa: E402

from probe_carry_rule import carry_stack, excess_matrix, stats  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="*", default=["data"])
    ap.add_argument("--robots", nargs="*", default=None)
    ap.add_argument("--quantile", type=float, default=0.75)
    ap.add_argument("--combine", default="mean")
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig
    from autourdf_tpu.structure import combined_sum_map
    from autourdf_tpu.workflow import build_coord_maps
    from gt_cluster_labels import gt_labels

    for root in args.roots:
        part = os.path.join(root, "part")
        if not os.path.isdir(part):
            continue
        avail = {}
        for d in sorted(os.listdir(part)):
            if d.endswith("_seg"):
                r, k = d.rsplit("_", 2)[0], int(d.rsplit("_", 2)[1])
                avail.setdefault(r, []).append(k)
        for robot in (args.robots or sorted(avail)):
            for K in avail.get(robot, []):
                cfg = PipelineConfig(robot=robot, data_root=root, num_seg=K)
                try:
                    stack = carry_stack(cfg, os.path.join(root, "carry"))
                    cms, _ = build_coord_maps(cfg, num_videos=5)
                    labels_gt, names, _ = gt_labels(cfg, num_videos=5)
                except Exception as e:
                    print(f"{root}/{robot}_{K}: skip {type(e).__name__}: {e}",
                          flush=True)
                    continue
                ex, med_floor = excess_matrix(stack, args.combine)
                pose = combined_sum_map(cms, "pose")
                Z = linkage(squareform(
                    0.5 * (pose + pose.T), checks=False), method="single")
                gt_n = len(set(labels_gt.tolist()))
                print(f"\n=== {root}/{robot}_{K} gt_links={gt_n} "
                      f"floor={med_floor * 1e3:.2f}mm", flush=True)
                kmax = min(stack.shape[1], 2 * gt_n + 6)
                for k in range(2, kmax + 1):
                    lab = fcluster(Z, t=k, criterion="maxclust") - 1
                    n = lab.max() + 1
                    rig = 0.0
                    for g in range(n):
                        idx = np.nonzero(lab == g)[0]
                        if len(idx) < 2:
                            continue
                        vals = [ex[i, j] for ii, i in enumerate(idx)
                                for j in idx[ii + 1:]]
                        rig = max(rig, float(np.quantile(vals,
                                                         args.quantile)))
                    err, cov = stats(lab, n, labels_gt,
                                     np.asarray(names, object))
                    mark = " <== gt" if n == gt_n else ""
                    print(f"  k={k:>2} n={n:>2} rigidity={rig * 1e3:7.2f}mm "
                          f"mis={err:>2} cov={cov:>2}{mark}", flush=True)


if __name__ == "__main__":
    main()
