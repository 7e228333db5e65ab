"""Probe: carry-equivalence components as DoF model selection (CPU-only).

Hypothesis: the raw carry matrix d[j, k] (mean off-surface distance of
cluster j's frame-0 points transported by cluster k's registered motion,
`swap_consistency_map(raw=True)`) separates same-link from cross-link
pairs ABSOLUTELY once calibrated by its own diagonal noise floor
d[j, j]: clusters j, k lie on one rigid link iff

    d[j, k] <= c * max(d[j, j], d[k, k])   (both directions)

Links = connected components of that graph; the link count needs no
dendrogram statistic at all.  This script evaluates the rule against FK
ground-truth cluster labels for every cached registration (including
seed-sweep roots), sweeping c, and caches the per-sequence raw carry
stacks under data*/carry/ so re-runs are cheap.

    python scripts/probe_carry_rule.py --roots data data_seeds/s2025 \
        --robots franka ur5 wx200_5
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


def carry_stack(cfg, cache_dir, num_videos=5, samples=64, targets=2048):
    """(S, K, K) per-sequence raw carry matrices, cached on disk."""
    from autourdf_tpu.structure import swap_consistency_map
    from autourdf_tpu.workflow import build_coord_maps

    res = "" if (samples, targets) == (64, 2048) else f"_{samples}x{targets}"
    tag = f"{cfg.robot}_{cfg.num_seg}{res}"
    path = os.path.join(cache_dir, f"{tag}_carry_raw.npy")
    if os.path.exists(path):
        return np.load(path)
    cms, _ = build_coord_maps(cfg, num_videos=num_videos)
    stack = np.stack([
        swap_consistency_map(cm, samples_per_cluster=samples,
                             target_points=targets, raw=True)
        for cm in cms])
    os.makedirs(cache_dir, exist_ok=True)
    np.save(path, stack)
    return stack


def components(adj):
    k = adj.shape[0]
    lab = np.full(k, -1)
    nxt = 0
    for s in range(k):
        if lab[s] >= 0:
            continue
        stack = [s]
        lab[s] = nxt
        while stack:
            u = stack.pop()
            for v in np.nonzero(adj[u])[0]:
                if lab[v] < 0:
                    lab[v] = nxt
                    stack.append(v)
        nxt += 1
    return lab, nxt


def excess_matrix(stack, combine="mean"):
    """Symmetric floor-calibrated excess (meters) + median floor."""
    exs = []
    floors = []
    for s in range(stack.shape[0]):
        d = stack[s]
        floor = np.diag(d)
        ex = d - np.maximum(floor[:, None], floor[None, :])
        ex = np.maximum(ex, ex.T)  # articulated if EITHER direction fails
        exs.append(np.maximum(ex, 0.0))
        floors.append(floor)
    exs = np.stack(exs)
    comb = exs.mean(axis=0) if combine == "mean" else exs.max(axis=0)
    np.fill_diagonal(comb, 0.0)
    return comb, float(np.median(np.stack(floors)))


def linkage_cut(ex, tau, method="average"):
    from scipy.cluster.hierarchy import fcluster, linkage
    from scipy.spatial.distance import squareform

    Z = linkage(squareform(ex, checks=False), method=method)
    lab = fcluster(Z, t=tau, criterion="distance") - 1
    return lab, lab.max() + 1


def carry_components(stack, c, combine="mean"):
    """Rule: same-link iff d[j,k] and d[k,j] <= c*max(floor_j, floor_k)."""
    if combine == "mean":
        d = stack.mean(axis=0)
        floor = np.diag(d)
        thr = c * np.maximum(floor[:, None], floor[None, :])
        adj = (d <= thr) & (d.T <= thr)
    else:  # "all": every sequence must individually agree it is rigid
        adjs = []
        for s in range(stack.shape[0]):
            d = stack[s]
            floor = np.diag(d)
            thr = c * np.maximum(floor[:, None], floor[None, :])
            adjs.append((d <= thr) & (d.T <= thr))
        adj = np.logical_and.reduce(adjs)
    np.fill_diagonal(adj, True)
    return components(adj)


def stats(lab, n, labels_gt, names):
    from collections import Counter

    groups = [np.nonzero(lab == g)[0] for g in range(n)]
    err, majs = 0, set()
    for g in groups:
        cnt = Counter(names[labels_gt[j]] for j in g)
        name, maj = cnt.most_common(1)[0]
        err += len(g) - maj
        majs.add(name)
    return err, len(majs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--roots", nargs="*", default=["data"])
    ap.add_argument("--robots", nargs="*", default=None)
    ap.add_argument("--cs", nargs="*", type=float,
                    default=[1.2, 1.5, 2.0, 3.0, 4.0])
    ap.add_argument("--combine", default="mean", choices=["mean", "max", "all"])
    ap.add_argument("--rule", default="average",
                    choices=["components", "single", "average", "complete"])
    args = ap.parse_args()

    from autourdf_tpu.config import PipelineConfig
    from gt_cluster_labels import gt_labels

    for root in args.roots:
        part = os.path.join(root, "part")
        if not os.path.isdir(part):
            print(f"{root}: no part dir")
            continue
        avail = {}
        for d in sorted(os.listdir(part)):
            if d.endswith("_seg"):
                r, k = d.rsplit("_", 2)[0], int(d.rsplit("_", 2)[1])
                avail.setdefault(r, []).append(k)
        robots = args.robots or sorted(avail)
        for robot in robots:
            for K in avail.get(robot, []):
                cfg = PipelineConfig(robot=robot, data_root=root, num_seg=K)
                try:
                    stack = carry_stack(cfg, os.path.join(root, "carry"))
                    labels_gt, names, _ = gt_labels(cfg, num_videos=5)
                except Exception as e:
                    print(f"{root}/{robot}_{K}: skip {type(e).__name__}: {e}")
                    continue
                gt_n = len(set(labels_gt.tolist()))
                ex, med_floor = excess_matrix(stack, args.combine)
                row = [f"{root}/{robot}_{K}:", f"gt={gt_n}",
                       f"floor={med_floor * 1e3:.2f}mm"]
                for c in args.cs:
                    if args.rule == "components":
                        lab, n = carry_components(stack, c, args.combine)
                    else:
                        lab, n = linkage_cut(ex, c * med_floor, args.rule)
                    err, cov = stats(lab, n, labels_gt, names)
                    row.append(f"c{c:g}:{n}L/{err}m/{cov}c")
                print(" ".join(row), flush=True)


if __name__ == "__main__":
    main()
