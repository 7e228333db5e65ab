"""Cluster -> link grouping and DoF discovery.

Rebuilds coord_clustering + silhouette_score_method
(/root/reference/PointCloud/coord_map.py:70-129).  The reference's
decreasing-threshold connectivity sweep is exactly single-linkage
agglomerative clustering, so we compute it directly from the linkage
dendrogram (identical partitions, no 1e-4 threshold quantization), and
score candidate link counts with the silhouette coefficient on the
precomputed dissimilarity.
"""

from __future__ import annotations

import numpy as np
from scipy.cluster.hierarchy import fcluster, linkage
from scipy.spatial.distance import squareform
from sklearn.metrics import silhouette_score


def single_linkage_components(d_map: np.ndarray, num_links: int) -> np.ndarray:
    """Labels (K,) of the single-linkage partition into >= num_links groups.

    Equivalent to the reference's ``threshold -= 1e-4`` sweep over
    ``d < threshold`` connectivity: components merge in order of edge
    weight, so cutting the dendrogram at ``num_links`` clusters reproduces
    the first threshold where the component count reaches num_links.
    """
    d = np.asarray(d_map, dtype=np.float64)
    d = 0.5 * (d + d.T)
    np.fill_diagonal(d, 0.0)
    Z = linkage(squareform(d, checks=False), method="single")
    labels = fcluster(Z, t=num_links, criterion="maxclust") - 1
    return labels


def labels_to_groups(labels: np.ndarray) -> list[set[int]]:
    return [set(np.where(labels == g)[0].tolist()) for g in np.unique(labels)]


def coord_clustering(
    d_map: np.ndarray, num_links: int
) -> tuple[list[set[int]], np.ndarray, float]:
    """Group clusters into links; returns (groups, labels, silhouette)."""
    d = 0.5 * (np.asarray(d_map, np.float64) + np.asarray(d_map, np.float64).T)
    np.fill_diagonal(d, 0.0)  # sklearn rejects float-noise diagonals
    labels = single_linkage_components(d, num_links)
    n_groups = len(np.unique(labels))
    if 1 < n_groups < len(labels):
        score = float(silhouette_score(d, labels, metric="precomputed"))
    else:
        score = -1.0
    return labels_to_groups(labels), labels, score


def merge_gap_dof_search(
    d_map: np.ndarray, link_range: tuple[int, int] | None = None
) -> tuple[list[set[int]], np.ndarray, list[float], np.ndarray]:
    """Link count from the largest relative merge-height gap.

    Rigid-part motion makes within-link dissimilarities collapse toward
    zero while cross-link merges happen at clearly higher heights; the
    cut with the largest ratio between consecutive single-linkage merge
    heights is therefore the natural part count.  More robust than the
    reference's silhouette scan when adjacent links move weakly (e.g. the
    wx200 wrist): on our captures silhouette narrowly prefers merging
    base+shoulder while the merge-gap ratio recovers the true 6 links.

    Same return signature as silhouette_dof_search; "scores" are the
    merge-height ratios per candidate link count.
    """
    k = d_map.shape[0]
    if link_range is None:
        # the reference scans 4..min(25, K) (coord_map.py:685-706), which
        # can never discover the 2-link Sapien objects (laptop etc.); the
        # widened lower bound is verified not to regress any robot family
        # (tests + RESULTS.md round-2 table)
        link_range = (2, min(25, k))
    d = 0.5 * (np.asarray(d_map, np.float64) + np.asarray(d_map, np.float64).T)
    np.fill_diagonal(d, 0.0)
    Z = linkage(squareform(d, checks=False), method="single")
    h = Z[:, 2]
    nls = np.arange(link_range[0], link_range[1])
    scores = []
    for nl in nls:
        # allowing K - nl merges leaves nl clusters; the cut sits between
        # merge heights h[K-nl-1] and h[K-nl]  (len(h) == K - 1)
        i = len(h) - nl + 1
        if 0 < i < len(h):
            scores.append(float(h[i] / max(h[i - 1], 1e-12)))
        else:
            scores.append(0.0)
    best = int(nls[int(np.argmax(scores))])
    groups, labels, _ = coord_clustering(d, best)
    return groups, labels, scores, nls


def auto_dof_search(
    d_map: np.ndarray,
    link_range: tuple[int, int] | None = None,
    gap_threshold: float = 1.45,
) -> tuple[list[set[int]], np.ndarray, list[float], np.ndarray]:
    """Hybrid model selection: trust the merge-gap pick only when the gap
    is decisive (best height ratio >= gap_threshold); otherwise fall back
    to the reference's silhouette scan.

    Calibration: wx200 (true 6 links) shows ratio 1.78 at the correct cut
    while silhouette merges base+shoulder; franka's landscape has no ratio
    above 1.31 anywhere and the gap pick over-segments badly.
    """
    groups, labels, ratios, nls = merge_gap_dof_search(d_map, link_range)
    if max(ratios) >= gap_threshold:
        return groups, labels, ratios, nls
    return silhouette_dof_search(d_map, link_range)


def carry_excess_matrix(stack: np.ndarray) -> tuple[np.ndarray, float]:
    """Floor-calibrated carry excess (meters) + median noise floor.

    ``stack`` is (S, K, K) per-sequence raw carry matrices
    (coord_map.swap_consistency_stack): stack[s, j, k] = mean off-surface
    distance of cluster j's frame-0 points transported by cluster k's
    registered motion.  The diagonal is each cluster's self-carry — the
    dataset's own registration + sampling noise floor in meters.  Excess
    above the pairwise floor is articulation evidence in absolute units;
    it is symmetrized by max because a pair is articulated if EITHER
    direction fails to stay on the observed surface."""
    exs, floors = [], []
    for s in range(stack.shape[0]):
        d = stack[s]
        floor = np.diag(d)
        ex = d - np.maximum(floor[:, None], floor[None, :])
        ex = np.maximum(ex, ex.T)
        exs.append(np.maximum(ex, 0.0))
        floors.append(floor)
    comb = np.stack(exs).mean(axis=0)
    np.fill_diagonal(comb, 0.0)
    return comb, float(np.median(np.stack(floors)))


def partition_rigidity(
    excess: np.ndarray, groups: list[set[int]], q: float = 0.5
) -> float:
    """Worst within-group articulation evidence of a partition (meters).

    Median (q=0.5) over each group's within pairs, maxed over groups: an
    under-split group (two real links merged) has ~half its pairs across
    the hidden joint, so the median stays >> the noise floor, while a
    single straddling boundary cluster in a correct group contributes
    too few pairs to move the median (q=0.75 false-fired on ur5, where
    one unmoved boundary cluster inflated the upper quartile)."""
    worst = 0.0
    for g in groups:
        idx = sorted(g)
        if len(idx) < 2:
            continue
        vals = [excess[i, j] for a, i in enumerate(idx) for j in idx[a + 1:]]
        worst = max(worst, float(np.quantile(vals, q)))
    return worst


def rigidity_guarded_groups(
    d_map: np.ndarray,
    stack: np.ndarray,
    groups: list[set[int]],
    c_fire: float = 2.5,
    c_stop: float = 1.2,
    q: float = 0.5,
    margin: float = 0.8,
    k_max: int | None = None,
    verbose: bool = False,
) -> tuple[list[set[int]], bool]:
    """Escalate a catastrophically under-split DoF pick until the
    partition is observation-rigid (ours, beyond reference).

    The pose map's dendrogram statistics (gap / silhouette) pick the
    link count from RELATIVE merge heights and collapse on captures
    where the map is a smooth continuum (seed sweep: ur5/franka fall to
    2-5 links) — while the pose PARTITIONS at the correct k remain
    nearly perfect.  The carry matrix supplies what they lack: an
    ABSOLUTE validity test in meters.  A partition whose groups still
    contain pairs with median carry excess far above the dataset's own
    self-carry noise floor is under-split.

    Calibration over 28 cached registrations x 3 capture seeds
    (scripts/probe_rigidity_guard.py escalation profiles):

    - catastrophic under-splits sit at 2.8-5.1x floor at the auto pick
      (franka seeds, ur5 seeds, solo12, allegro_16) while every correct
      pick — including noisy large objects whose rigid groups carry
      1.4-2.1x floor of registration drift (toilet, op3, trashcan,
      allegro K=45) — stays below 2.2x.  Hence ``c_fire = 2.5``.
    - during escalation, true rescues drop below ~1.2x floor within a
      few k (solo12 0.81x at k=11, allegro_16 1.19x at k=18); noisy
      datasets never do before k_max.  Hence ``c_stop = 1.2`` and
      revert-to-original when unsatisfiable (firing on toilet would
      otherwise walk to k=21+).
    - q = 0.5 (median within-group excess, maxed over groups): a single
      straddling boundary cluster cannot move a group median; q = 0.75
      false-fired on exactly that (ur5 headline).

    Known blind spots (mild, documented): joints whose relative motion
    maps the observed surface onto itself (near-symmetric wrists) sit
    below the carry floor, and under-splits missing a single such link
    score 1.0-1.5x floor — inside the noisy-correct band, so the guard
    leaves them to the pose-map statistics.

    Returns (groups, fired)."""
    from .coord_map import _refine_groups_with_matrix

    excess, floor = carry_excess_matrix(stack)
    d_mean = stack.mean(axis=0)
    groups = _refine_groups_with_matrix(d_mean, groups, margin)
    rig = partition_rigidity(excess, groups, q)
    if verbose:
        print(f"[structure] rigidity guard: partition rigidity "
              f"{rig * 1e3:.2f}mm = {rig / max(floor, 1e-12):.2f}x floor "
              f"({floor * 1e3:.2f}mm)")
    if rig <= c_fire * floor:
        return groups, False
    K = excess.shape[0]
    k_max = k_max or min(K, 25)
    d = 0.5 * (np.asarray(d_map, np.float64) + np.asarray(d_map).T)
    np.fill_diagonal(d, 0.0)
    Z = linkage(squareform(d, checks=False), method="single")
    for k in range(len(groups) + 1, k_max + 1):
        lab = fcluster(Z, t=k, criterion="maxclust") - 1
        cand = [set(np.nonzero(lab == g)[0].tolist())
                for g in range(lab.max() + 1)]
        cand = _refine_groups_with_matrix(d_mean, cand, margin)
        rig = partition_rigidity(excess, cand, q)
        if verbose:
            print(f"[structure] rigidity guard: k={k} "
                  f"rigidity {rig / max(floor, 1e-12):.2f}x floor")
        if rig <= c_stop * floor:
            return cand, True
    # no candidate became rigid within k_max: the high rigidity is
    # dataset noise, not hidden articulation — keep the original pick
    return groups, False


def _cross_group_scale(
    validate_map: np.ndarray, groups: list[set[int]]
) -> float:
    """Median raw deviation across the partition's cross-group pairs —
    the magnitude a REAL joint produces in the validate map."""
    k = validate_map.shape[0]
    glab = np.zeros(k, dtype=int)
    for gi, g in enumerate(groups):
        for j in g:
            glab[j] = gi
    vals = [float(validate_map[i, j]) for i in range(k)
            for j in range(i + 1, k) if glab[i] != glab[j]]
    return float(np.median(vals)) if vals else 0.0


def _split_motion_evidence(
    validate_map: np.ndarray, idx: np.ndarray, lab: np.ndarray, scale: float
) -> float:
    """Candidate split's between-subgroup deviation as a fraction of the
    partition's real-joint scale.

    A true articulation split separates clusters whose relative motion
    leaves point-level misfit comparable to the partition's existing
    joints; a false split inside one rigid link separates registration
    noise orders of magnitude below that scale.  Normalizing by the
    cross-group median (not the candidate's own within-noise) keeps the
    statistic stable at the noise floor, where within-means of ~1e-4
    would make between/within ratios explode for static groups.

    Measured calibration on this repo's registrations (pose map + raw
    swap validate map): false splits (ur5 upper-arm/forearm, franka
    base, wx200 base/shoulder) score 0.01-0.15; solo12's true knee/hip
    splits score 0.22-0.30.
    """
    between = [float(validate_map[idx[a], idx[b]])
               for a in range(len(idx)) for b in range(a + 1, len(idx))
               if lab[a] != lab[b]]
    if not between or scale <= 0.0:
        return 0.0
    return float(np.mean(between) / scale)


def recursive_gap_split(
    d_map: np.ndarray,
    groups: list[set[int]],
    gap_threshold: float = 1.45,
    min_size: int = 4,
    max_rounds: int = 8,
    validate_map: np.ndarray | None = None,
    validate_factor: float = 0.2,
) -> list[set[int]]:
    """Multi-scale refinement: re-run the merge-gap test INSIDE each group.

    The global merge-gap cut finds the single dominant scale of motion
    (e.g. solo12's whole-leg-vs-body signal) and hides finer articulation
    whose merge heights interleave with other subtrees' (the knee within a
    leg).  The height *ratio* is scale-invariant, so re-applying the same
    decisiveness test to each group's own sub-dendrogram recovers joints
    at any motion magnitude: a leg group's internal knee gap is decisive
    locally even though globally it drowns.  Static groups are a smooth
    noise continuum with no decisive ratio and are never split.

    Measured on this repo's registrations (20k points): solo12's pose map
    at the global cut yields 6 links; recursive splitting reaches the
    13-link partition that k=13 single-linkage shows is present in the map
    (5/45 clusters misassigned).  Groups smaller than ``min_size`` are
    left alone (order statistics of 2-3 merge heights are meaningless).
    """
    d = 0.5 * (np.asarray(d_map, np.float64) + np.asarray(d_map, np.float64).T)
    np.fill_diagonal(d, 0.0)
    out = [set(g) for g in groups]
    for _ in range(max_rounds):
        changed = False
        nxt: list[set[int]] = []
        scale = (_cross_group_scale(validate_map, out)
                 if validate_map is not None else 0.0)
        for g in out:
            if len(g) < min_size:
                nxt.append(g)
                continue
            idx = np.asarray(sorted(g))
            sub = d[np.ix_(idx, idx)]
            Z = linkage(squareform(sub, checks=False), method="single")
            h = Z[:, 2]
            # candidate cuts leaving 2..len-1 subgroups; ratio between the
            # first excluded merge and the last included one
            best_ratio, best_nl = 0.0, None
            for nl in range(2, len(idx)):
                i = len(h) - nl + 1
                if 0 < i < len(h) and h[i - 1] > 1e-12:
                    r = float(h[i] / h[i - 1])
                    if r > best_ratio:
                        best_ratio, best_nl = r, nl
            # the final merge (joining the last 2 subtrees) has no
            # successor height; score it against the previous merge so a
            # clean 2-way split is also discoverable
            if len(h) >= 2 and h[-2] > 1e-12:
                r = float(h[-1] / h[-2])
                if r > best_ratio:
                    best_ratio, best_nl = r, 2
            accept = best_nl is not None and best_ratio >= gap_threshold
            if accept:
                lab = fcluster(Z, t=best_nl, criterion="maxclust") - 1
                if validate_map is not None:
                    ev = _split_motion_evidence(validate_map, idx, lab, scale)
                    accept = ev >= validate_factor
            if accept:
                for sg in range(best_nl):
                    members = set(idx[lab == sg].tolist())
                    if members:
                        nxt.append(members)
                changed = True
            else:
                nxt.append(g)
        out = nxt
        if not changed:
            break
    return out


def silhouette_dof_search(
    d_map: np.ndarray, link_range: tuple[int, int] | None = None
) -> tuple[list[set[int]], np.ndarray, list[float], np.ndarray]:
    """Scan link counts, pick max silhouette -> DoF = links - 1.

    Default range matches the reference main(): (4, min(25, K)), upper
    exclusive (coord_map.py:685-706).
    """
    k = d_map.shape[0]
    if link_range is None:
        link_range = (2, min(25, k))  # reference: (4, ...); see merge_gap note
    nls = np.arange(link_range[0], link_range[1])
    scores = []
    for nl in nls:
        _, _, s = coord_clustering(d_map, int(nl))
        scores.append(s)
    best = int(nls[int(np.argmax(scores))])
    groups, labels, _ = coord_clustering(d_map, best)
    return groups, labels, scores, nls
