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
