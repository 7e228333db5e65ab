"""Chain-fit model selection for DoF discovery (experimental, ours).

Silhouette and merge-gap scores judge the motion-dissimilarity *map*;
this criterion judges candidate structures by what actually matters: how
well a fitted kinematic chain with that many links explains the raw
frames.  For each candidate link count, build the tree, estimate joints,
run a short global chain fit (joints/chain.py), and score

    score = chamfer_loss * (1 + penalty * num_joints)

— under-segmentation cannot explain the motion (high chamfer), while the
per-joint penalty counters the marginal gains of over-segmentation.
Cost: one short chain fit per candidate (~seconds each on TPU).

Status: experimental — with a multiplicative per-joint penalty the
criterion still prefers over-segmentation (extra joints absorb
registration noise: on wx200, 18 links fit chamfer 0.0109 vs 0.0163 for
the true 6).  A usable version needs a noise-floor-aware penalty (e.g.
BIC with sigma estimated from the registration loss floor); see
ROADMAP.md item 1.
"""

from __future__ import annotations

import numpy as np

from .clustering import coord_clustering, merge_gap_dof_search, silhouette_dof_search
from .coord_map import CoordMap
from .tree import cluster_mst, kinematics_tree


def candidate_link_counts(
    d_map: np.ndarray, link_range: tuple[int, int] | None = None, top: int = 3
) -> list[int]:
    """Shortlist: top candidates by silhouette plus top by merge gap."""
    _, _, s_scores, nls = silhouette_dof_search(d_map, link_range)
    _, _, g_scores, _ = merge_gap_dof_search(d_map, link_range)
    order_s = [int(nls[i]) for i in np.argsort(s_scores)[::-1][:top]]
    order_g = [int(nls[i]) for i in np.argsort(g_scores)[::-1][:top]]
    seen, out = set(), []
    for n in order_s + order_g:
        if n not in seen:
            seen.add(n)
            out.append(n)
    return out


def chain_fit_dof_search(
    d_map: np.ndarray,
    cms: list[CoordMap],
    frames: np.ndarray,
    link_range: tuple[int, int] | None = None,
    fit_steps: int = 120,
    points_per_link: int = 512,
    joint_penalty: float = 0.02,
    num_sequences: int = 2,
    verbose: bool = False,
):
    """Returns (groups, labels, scores, candidates) like the other searches.

    ``scores`` are the penalized chain-fit losses (lower is better) for the
    shortlisted candidates.
    """
    from ..joints.chain import refine_chain
    from ..joints.screw import estimate_joints_from_tree

    cands = candidate_link_counts(d_map, link_range)
    sub_cms = cms[:num_sequences]
    sub_frames = frames[:num_sequences]
    T = sub_frames.shape[1]

    results = []
    for nl in cands:
        groups, labels, _ = coord_clustering(d_map, nl)
        g0 = cluster_mst(sub_cms[0])
        links = kinematics_tree(sub_cms[0], groups, g0)
        try:
            joints = estimate_joints_from_tree(links, sub_cms, 0, T, interval=4)
            _, chain = refine_chain(
                links, joints, sub_cms, sub_frames, steps=fit_steps,
                points_per_link=points_per_link,
            )
            loss = float(chain.loss)
        except Exception as e:  # degenerate candidate (e.g. cyclic graph)
            if verbose:
                print(f"[chainfit] links={nl}: failed ({type(e).__name__})")
            results.append((nl, np.inf, groups, labels))
            continue
        score = loss * (1.0 + joint_penalty * len(joints))
        if verbose:
            print(f"[chainfit] links={nl}: chamfer {loss:.5f} "
                  f"score {score:.5f}")
        results.append((nl, score, groups, labels))

    results.sort(key=lambda r: r[1])
    best_nl, _, groups, labels = results[0]
    scores = [s for _, s, _, _ in sorted(results, key=lambda r: cands.index(r[0]))]
    return groups, labels, scores, np.asarray(cands)
