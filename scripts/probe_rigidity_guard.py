"""Probe: rigidity GUARD on top of the existing auto DoF search.

Rule under test (minimal change to the shipping pipeline):
  1. groups = auto_dof_search(pose map)  (unchanged)
  2. groups = carry-refine boundary clusters  (unchanged)
  3. if the refined partition still contains an articulated pair
     (rigidity = max over groups of q75 within-group carry excess
     > c_guard * floor)  ->  UNDER-SPLIT: escalate k through the pose
     dendrogram, carry-refining each candidate, until rigid.

The catastrophic seed failures (k collapsed to 2-5) have rigidity
10-100x floor; correct picks sit at ~<=1x floor after refinement, so
the guard should fire only on genuine under-splits.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
from scipy.cluster.hierarchy import fcluster, linkage  # noqa: E402
from scipy.spatial.distance import squareform  # noqa: E402

from probe_carry_rule import carry_stack, stats  # noqa: E402


def norm_excess_matrix(stack):
    """Per-pair floor-NORMALIZED excess (unitless) + median floor."""
    import numpy as np
    exs, floors = [], []
    for s in range(stack.shape[0]):
        d = stack[s]
        floor = np.diag(d)
        pf = np.maximum(np.maximum(floor[:, None], floor[None, :]), 1e-9)
        ex = (d - pf) / pf
        ex = np.maximum(ex, ex.T)
        exs.append(np.maximum(ex, 0.0))
        floors.append(floor)
    comb = np.stack(exs).mean(axis=0)
    np.fill_diagonal(comb, 0.0)
    return comb, float(np.median(np.stack(floors)))
from probe_split_merge import group_rigidity  # noqa: E402


def refine_by_carry_cached(d, groups, margin=0.8):
    """refine_groups_by_carry semantics on a precomputed mean carry d."""
    K = d.shape[0]
    labels = np.full(K, -1)
    for gi, g in enumerate(groups):
        for j in g:
            labels[j] = gi
    out = [set(g) for g in groups]
    for j in range(K):
        cur = labels[j]
        if cur < 0 or len(out[cur]) <= 1:
            continue

        def score(gi):
            mem = [k for k in out[gi] if k != j]
            return min(d[j, k] for k in mem) if mem else np.inf

        cur_s = score(cur)
        best_gi, best_s = cur, cur_s
        for gi in range(len(out)):
            if gi != cur:
                s = score(gi)
                if s < best_s:
                    best_gi, best_s = gi, s
        if best_gi != cur and best_s < margin * cur_s:
            out[cur].discard(j)
            out[best_gi].add(j)
            labels[j] = best_gi
    return [g for g in out if g]


def partition_rigidity(ex, groups, q=0.5):
    return max(group_rigidity(ex, np.asarray(sorted(g)), q)
               for g in groups)


def guarded_search(pose, ex, d_mean, floor, auto_groups, c_guard=1.5,
                   q=0.5, trace=None):
    groups = refine_by_carry_cached(d_mean, auto_groups)
    rig = partition_rigidity(ex, groups, q)
    if trace is not None:
        trace.append(f"auto k={len(auto_groups)} rig={rig / floor:.2f}xfloor")
    if rig <= c_guard * floor:
        return groups, False
    Z = linkage(squareform(0.5 * (pose + pose.T), checks=False),
                method="single")
    K = ex.shape[0]
    for k in range(len(groups) + 1, K + 1):
        lab = fcluster(Z, t=k, criterion="maxclust") - 1
        cand = [set(np.nonzero(lab == g)[0].tolist())
                for g in range(lab.max() + 1)]
        cand = refine_by_carry_cached(d_mean, cand)
        rig = partition_rigidity(ex, cand, q)
        if trace is not None:
            trace.append(f"k={k} rig={rig / floor:.2f}")
        if rig <= c_guard * floor:
            return cand, True
    return groups, True  # unsatisfiable: keep the original pick


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="*",
                    default=["data", "data_seeds/s2025", "data_seeds/s2026"])
    ap.add_argument("--robots", nargs="*", default=None)
    ap.add_argument("--c-guard", type=float, default=1.5)
    ap.add_argument("--q", type=float, default=0.5)
    ap.add_argument("--stat", default="norm", choices=["norm", "mm"])
    ap.add_argument("--trace", action="store_true")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--targets", type=int, default=2048)
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig
    from autourdf_tpu.structure import auto_dof_search, combined_sum_map
    from autourdf_tpu.workflow import build_coord_maps
    from gt_cluster_labels import gt_labels

    for root in args.roots:
        part = os.path.join(root, "part")
        if not os.path.isdir(part):
            continue
        avail = {}
        for dd in sorted(os.listdir(part)):
            if dd.endswith("_seg"):
                r, k = dd.rsplit("_", 2)[0], int(dd.rsplit("_", 2)[1])
                avail.setdefault(r, []).append(k)
        for robot in (args.robots or sorted(avail)):
            for K in avail.get(robot, []):
                cache = os.path.join(root, "carry",
                                     f"{robot}_{K}_carry_raw.npy")
                if not os.path.exists(cache):
                    continue
                cfg = PipelineConfig(robot=robot, data_root=root, num_seg=K)
                try:
                    stack = carry_stack(cfg, os.path.join(root, "carry"),
                                        samples=args.samples,
                                        targets=args.targets)
                    cms, _ = build_coord_maps(cfg, num_videos=5)
                    labels_gt, names, _ = gt_labels(cfg, num_videos=5)
                except Exception as e:
                    print(f"{root}/{robot}_{K}: skip {e}", flush=True)
                    continue
                if args.stat == "norm":
                    ex, _ = norm_excess_matrix(stack)
                    floor = 1.0
                else:
                    from probe_carry_rule import excess_matrix
                    ex, floor = excess_matrix(stack)
                d_mean = stack.mean(axis=0)
                pose = combined_sum_map(cms, "pose")
                auto_groups, _, _, _ = auto_dof_search(pose)
                tr = [] if args.trace else None
                groups, fired = guarded_search(pose, ex, d_mean, floor,
                                               auto_groups, args.c_guard,
                                               args.q, tr)
                lab = np.zeros(ex.shape[0], int)
                for gi, g in enumerate(groups):
                    for j in g:
                        lab[j] = gi
                err, cov = stats(lab, len(groups), labels_gt,
                                 np.asarray(names, object))
                gt_n = len(set(labels_gt.tolist()))
                ok = "OK " if (len(groups) == gt_n and err == 0) else "   "
                print(f"{ok}{root}/{robot}_{K}: gt={gt_n} "
                      f"auto={len(auto_groups)} -> n={len(groups)} "
                      f"mis={err} cov={cov} guard={'FIRED' if fired else 'no'}",
                      flush=True)
                if tr:
                    print("    " + " | ".join(tr), flush=True)


if __name__ == "__main__":
    main()
