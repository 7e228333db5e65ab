"""Probe: full rigidity split+merge selection algorithm (CPU-only).

Algorithm under test ("rigidity selection"):
  1. pose-map single-linkage dendrogram (assignment-quality partitions)
  2. OVER-SPLIT: k_over = smallest k whose partition has every group
     internally rigid (q-quantile of within-group carry excess
     <= c_split * floor)
  3. MERGE: greedily merge the group pair with minimal cross excess
     (median over cross pairs) while that minimum <= c_merge * floor
  4. report (n_links, misassigned, gt coverage) vs FK ground truth

Evidence base: rigidity profiles show true-joint cross excess >= ~2x
floor while same-link within excess <= ~0.5x floor on every dataset and
seed probed (/tmp/rigidity_all.log).
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


def group_rigidity(ex, idx, q):
    if len(idx) < 2:
        return 0.0
    vals = [ex[i, j] for a, i in enumerate(idx) for j in idx[a + 1:]]
    return float(np.quantile(vals, q))


def cross_excess(ex, ga, gb, q=0.5):
    vals = [ex[i, j] for i in ga for j in gb]
    return float(np.quantile(vals, q))


def split_merge(ex, floor, pose, c_split=0.5, c_merge=1.5, q_split=0.75,
                q_merge=0.5, trace=None):
    K = ex.shape[0]
    Z = linkage(squareform(0.5 * (pose + pose.T), checks=False),
                method="single")
    # 2. over-split
    k_over = K
    for k in range(2, K + 1):
        lab = fcluster(Z, t=k, criterion="maxclust") - 1
        rig = max(group_rigidity(ex, np.nonzero(lab == g)[0], q_split)
                  for g in range(lab.max() + 1))
        if rig <= c_split * floor:
            k_over = k
            break
    lab = fcluster(Z, t=k_over, criterion="maxclust") - 1
    groups = [list(np.nonzero(lab == g)[0]) for g in range(lab.max() + 1)]
    if trace is not None:
        trace.append(f"k_over={k_over}")
    # 3. greedy merge
    while len(groups) > 1:
        best = None
        for a in range(len(groups)):
            for b in range(a + 1, len(groups)):
                v = cross_excess(ex, groups[a], groups[b], q_merge)
                if best is None or v < best[0]:
                    best = (v, a, b)
        v, a, b = best
        if trace is not None:
            trace.append(f"min-cross={v * 1e3:.2f}mm "
                         f"({'merge' if v <= c_merge * floor else 'stop'})")
        if v > c_merge * floor:
            break
        groups[a] = groups[a] + groups[b]
        del groups[b]
    lab = np.zeros(K, int)
    for gi, g in enumerate(groups):
        for j in g:
            lab[j] = gi
    return lab, len(groups)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="*", default=["data"])
    ap.add_argument("--robots", nargs="*", default=None)
    ap.add_argument("--c-split", type=float, default=0.5)
    ap.add_argument("--c-merge", type=float, default=1.5)
    ap.add_argument("--trace", action="store_true")
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
                cache = os.path.join(root, "carry",
                                     f"{robot}_{K}_carry_raw.npy")
                if not os.path.exists(cache):
                    continue  # only evaluate robots with cached stacks
                try:
                    stack = carry_stack(cfg, os.path.join(root, "carry"))
                    cms, _ = build_coord_maps(cfg, num_videos=5)
                    labels_gt, names, _ = gt_labels(cfg, num_videos=5)
                except Exception as e:
                    print(f"{root}/{robot}_{K}: skip {type(e).__name__}: {e}",
                          flush=True)
                    continue
                ex, floor = excess_matrix(stack)
                pose = combined_sum_map(cms, "pose")
                tr = [] if args.trace else None
                lab, n = split_merge(ex, floor, pose, args.c_split,
                                     args.c_merge, trace=tr)
                err, cov = stats(lab, n, labels_gt,
                                 np.asarray(names, object))
                gt_n = len(set(labels_gt.tolist()))
                ok = "OK " if (n == gt_n and err == 0) else "   "
                print(f"{ok}{root}/{robot}_{K}: gt={gt_n} -> n={n} "
                      f"mis={err} cov={cov} floor={floor * 1e3:.1f}mm",
                      flush=True)
                if tr:
                    print("    " + " | ".join(tr), flush=True)


if __name__ == "__main__":
    main()
