"""Kinematic tree construction from motion-grouped clusters.

Rebuilds coord_mst + kinematics_tree
(/root/reference/PointCloud/coord_map.py:334-441): a minimum spanning
tree over time-summed cluster centers gives cluster adjacency; link-level
edges come from MST edges crossing link groups; the root is the link
whose mean 7-D coordinate moves least over time; BFS assigns parents and
breadth-first tree ids.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import networkx as nx
import numpy as np

from .coord_map import CoordMap


@dataclass
class LinkNode:
    id: int
    cluster_idx: set[int]
    connected_links: set[int] = field(default_factory=set)
    parent_id: int | None = None
    tree_id: int | None = None
    movement: float = 0.0


def cluster_mst(cm: CoordMap) -> nx.Graph:
    d = cm.summed_center_distance_matrix()
    mst = nx.minimum_spanning_tree(nx.Graph(d))
    g = nx.Graph()
    g.add_nodes_from(range(cm.num_coords))
    g.add_edges_from(mst.edges)
    return g


def build_link_graph(groups: list[set[int]], g0: nx.Graph) -> list[LinkNode]:
    links = [LinkNode(id=i, cluster_idx=set(g)) for i, g in enumerate(groups)]
    for link in links:
        for cid in link.cluster_idx:
            for neighbor in g0.neighbors(cid):
                for other in links:
                    if other.id != link.id and neighbor in other.cluster_idx:
                        link.connected_links.add(other.id)
    return links


def kinematics_tree(cm: CoordMap, groups: list[set[int]], g0: nx.Graph) -> list[LinkNode]:
    links = build_link_graph(groups, g0)

    link_graph = nx.Graph()
    link_graph.add_nodes_from(range(len(links)))
    for link in links:
        for c in link.connected_links:
            link_graph.add_edge(link.id, c)
    if not (nx.is_connected(link_graph) and nx.is_forest(link_graph)):
        # same non-fatal warning behavior as the reference (it prints and
        # continues; BFS below still yields a spanning tree of reachables)
        pass

    # root: minimum total movement of the mean 7-D coordinate (note: the
    # reference includes the quaternion components in this norm)
    for link in links:
        centers = np.mean(cm.coords[:, sorted(link.cluster_idx), :], axis=1)
        link.movement = float(np.sum(np.linalg.norm(np.diff(centers, axis=0), axis=1)))
    links_by_movement = sorted(links, key=lambda l: l.movement)

    root = links_by_movement[0]
    root.parent_id = None
    root.tree_id = 0
    tree_id = 1
    layer = [root]
    visited = {root.id}
    while layer:
        nxt = []
        for cur in layer:
            children = cur.connected_links - ({cur.parent_id} if cur.parent_id is not None else set())
            for cid in sorted(children):
                if cid in visited:
                    continue
                child = next(l for l in links if l.id == cid)
                child.parent_id = cur.id
                child.tree_id = tree_id
                tree_id += 1
                visited.add(cid)
                nxt.append(child)
        layer = nxt

    return sorted(links, key=lambda l: (l.tree_id if l.tree_id is not None else 1 << 30))


# ---------------------------------------------------------------------------
# Motion-consistency tree (beyond reference)
# ---------------------------------------------------------------------------

def _link_pose_series(cm_list, groups, num_steps):
    """Precomputed mean link poses: [seq][group][step] -> (pos, quat)."""
    from ..joints.screw import cluster_pose_mean

    return [
        [[cluster_pose_mean(cm, sorted(g), t) for t in range(num_steps)]
         for g in groups]
        for cm in cm_list
    ]


def revolute_consistency_matrix(
    cm_list, groups: list[set[int]], num_steps: int, interval: int = 4
) -> np.ndarray:
    """(L, L) single-revolute misfit between every link pair, in radians.

    For a pair connected by one revolute joint, every relative screw
    sample (parent-motion-cancelled, across steps/strides/sequences)
    shares one axis; for pairs separated by two or more joints the
    sampled axes wander.  Score = rotation-angle-weighted mean angle
    between each sample axis and the sign-aligned principal axis — the
    same statistic that separates the ur5 wrist mis-ordering (38 deg for
    the forearm->wrist2 composite vs <=11 deg for every true joint).
    """
    from ..joints.screw import (
        _principal_axis,
        filter_screws,
        screw_axes_from_pose_series,
    )

    interval = max(1, min(interval, num_steps // 2))
    L = len(groups)
    series = _link_pose_series(cm_list, groups, num_steps)
    D = np.zeros((L, L))
    for i in range(L):
        for j in range(i + 1, L):
            all_axes, all_angles = [], []
            for s in range(len(cm_list)):
                for a in range(interval):
                    steps = list(range(a, num_steps, interval))
                    pp = [series[s][i][t] for t in steps]
                    pc = [series[s][j][t] for t in steps]
                    axes, angles, pts = screw_axes_from_pose_series(pp, pc)
                    kept, _ = filter_screws(axes, angles, pts)
                    kept_ang = [ang for ax, ang in zip(axes, angles)
                                if any(ax is k for k in kept)]
                    all_axes.extend(kept)
                    all_angles.extend(kept_ang)
            if not all_axes:
                D[i, j] = D[j, i] = np.pi
                continue
            pa = _principal_axis(all_axes)
            w = np.asarray(all_angles)
            dev = np.asarray([
                np.arccos(min(abs(float(
                    ax / max(np.linalg.norm(ax), 1e-12) @ pa)), 1.0))
                for ax in all_axes
            ])
            D[i, j] = D[j, i] = float(np.sum(dev * w) / max(np.sum(w), 1e-12))
    return D


def motion_tree(
    cm_list,
    groups: list[set[int]],
    num_steps: int,
    lambda_prox: float = 1.5,
    interval: int = 4,
) -> list[LinkNode]:
    """Kinematic tree from single-revolute consistency + spatial proximity.

    The reference's tree is a proximity MST over cluster centers
    (coord_map.py:334-441, reproduced by :func:`cluster_mst` +
    :func:`kinematics_tree`), which mis-orders compact regions: on ur5 it
    wires forearm->wrist2->wrist1, making the forearm->wrist2 "joint" a
    two-revolute composite no estimator can fit.  Here the link-level MST
    weight is instead

        misfit_degrees(i, j) + lambda_prox * 100 * center_dist / bbox_diag

    so edges must BOTH look like a single revolute and be spatially
    plausible; the proximity term dominates only when consistency cannot
    discriminate (weakly excited joints).  Root selection and BFS ids
    reuse the reference scheme.
    """
    import networkx as nx

    cm = cm_list[0]
    L = len(groups)
    D = revolute_consistency_matrix(cm_list, groups, num_steps, interval)
    centers = np.stack([
        cm.coords[:, sorted(g), :3].mean(axis=1).mean(axis=0) for g in groups
    ])
    P = np.linalg.norm(centers[:, None] - centers[None, :], axis=-1)
    W = np.degrees(D) + lambda_prox * 100.0 * P / max(cm.bbox_diag, 1e-9)

    G = nx.Graph()
    for a in range(L):
        for b in range(a + 1, L):
            G.add_edge(a, b, weight=float(W[a, b]))
    mst = nx.minimum_spanning_tree(G)

    # rebuild LinkNode adjacency from the motion MST, then reuse the
    # reference's root pick + BFS by faking a cluster graph whose edges
    # connect one representative cluster per MST link edge
    links = [LinkNode(id=i, cluster_idx=set(g)) for i, g in enumerate(groups)]
    for a, b in mst.edges:
        links[a].connected_links.add(b)
        links[b].connected_links.add(a)

    for link in links:
        centers_t = np.mean(cm.coords[:, sorted(link.cluster_idx), :], axis=1)
        link.movement = float(
            np.sum(np.linalg.norm(np.diff(centers_t, axis=0), axis=1)))
    root = min(links, key=lambda l: l.movement)
    root.parent_id = None
    root.tree_id = 0
    tree_id = 1
    layer = [root]
    visited = {root.id}
    while layer:
        nxt = []
        for cur in layer:
            children = cur.connected_links - (
                {cur.parent_id} if cur.parent_id is not None else set())
            for cid in sorted(children):
                if cid in visited:
                    continue
                child = links[cid]
                child.parent_id = cur.id
                child.tree_id = tree_id
                tree_id += 1
                visited.add(cid)
                nxt.append(child)
        layer = nxt
    return sorted(links, key=lambda l: (l.tree_id if l.tree_id is not None
                                        else 1 << 30))
