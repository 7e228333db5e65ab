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
