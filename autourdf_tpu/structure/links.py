"""Link consolidation: merge member clusters into per-link frames + clouds.

Rebuilds cluster_to_link (/root/reference/PointCloud/coord_map.py:443-502),
save_links and refine_links_clusters (/root/reference/PointCloud/link.py:68-127):
per link per step, the link frame is (mean member xyz, eigen-averaged
member quaternion); member points map to world and back into the link
frame; then every step's link-local cloud is ICP-aligned to step 0's
(batched on device instead of N sequential Open3D calls) and accumulated
into a dense canonical cloud per link for meshing.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core import se3
from ..core.quat_np import mean_link_frame_np
from ..io.artifacts import save_cluster_npz
from ..ops.icp import icp_point_to_point
from .coord_map import CoordMap
from .tree import LinkNode


@dataclass
class LinkArtifacts:
    matrices: np.ndarray           # (T, L, 4, 4) link frames per step
    clusters: list[list[np.ndarray]]   # [T][L] link-local point clouds
    clusters_wf: list[list[np.ndarray]]  # [T][L] world-frame clouds
    refined: list[list[np.ndarray]] | None = None  # [T][L] step->0 aligned


def link_frame(cm: CoordMap, members: list[int], t: int) -> np.ndarray:
    """(4, 4) link frame at step t: mean xyz + eigen-average quaternion."""
    return mean_link_frame_np(cm.coords[t, members, :])


def consolidate_links(cm: CoordMap, groups: list[set[int]]) -> LinkArtifacts:
    T_steps = cm.coords.shape[0]
    L = len(groups)
    matrices = np.zeros((T_steps, L, 4, 4))
    clusters: list[list[np.ndarray]] = [[None] * L for _ in range(T_steps)]
    clusters_wf: list[list[np.ndarray]] = [[None] * L for _ in range(T_steps)]
    for li, group in enumerate(groups):
        members = sorted(group)
        for t in range(T_steps):
            Tl = link_frame(cm, members, t)
            matrices[t, li] = Tl
            pts = np.asarray(cm.cluster_points[t])
            labels = np.asarray(cm.cluster_labels[t])
            mask = np.isin(labels, members)
            world_parts = []
            for m in members:
                sel = labels == m
                M = cm.matrices[t, m]
                world_parts.append(pts[sel] @ M[:3, :3].T + M[:3, 3])
            wf = np.concatenate(world_parts, axis=0) if world_parts else np.zeros((0, 3))
            inv = np.linalg.inv(Tl)
            lf = wf @ inv[:3, :3].T + inv[:3, 3]
            clusters[t][li] = lf
            clusters_wf[t][li] = wf
    return LinkArtifacts(matrices, clusters, clusters_wf)


def refine_link_clusters(
    art: LinkArtifacts,
    max_iterations: int = 50,
    threshold: float = 1.0,
    backend: str = "auto",
) -> LinkArtifacts:
    """ICP-align every step's link-local cloud onto step 0's, batched.

    (refine_links_clusters, link.py:85-127 — the reference runs one
    Open3D ICP per link per step; here all links of a step run as one
    vmapped device program over padded point sets.)
    """
    T_steps = len(art.clusters)
    L = len(art.clusters[0])
    p_max = max(len(art.clusters[t][l]) for t in range(T_steps) for l in range(L))

    def pad(c):
        out = np.zeros((p_max, 3), np.float32)
        out[: len(c)] = c
        mask = np.zeros((p_max,), bool)
        mask[: len(c)] = True
        return out, mask

    ref_pts, ref_masks = zip(*[pad(art.clusters[0][l]) for l in range(L)])
    ref_pts = jnp.asarray(np.stack(ref_pts))
    ref_masks = jnp.asarray(np.stack(ref_masks))

    batched_icp = jax.jit(jax.vmap(
        lambda s, sm, t, tm: icp_point_to_point(
            s, t, max_iterations=max_iterations, threshold=threshold,
            source_mask=sm, target_mask=tm, backend=backend,
        ).transform
    ))

    refined: list[list[np.ndarray]] = []
    for t in range(T_steps):
        if t == 0:
            refined.append([c.copy() for c in art.clusters[0]])
            continue
        src_pts, src_masks = zip(*[pad(art.clusters[t][l]) for l in range(L)])
        Ts = np.asarray(batched_icp(
            jnp.asarray(np.stack(src_pts)), jnp.asarray(np.stack(src_masks)),
            ref_pts, ref_masks,
        ))
        step_out = []
        for l in range(L):
            c = art.clusters[t][l]
            step_out.append(c @ Ts[l][:3, :3].T + Ts[l][:3, 3])
        refined.append(step_out)
    return LinkArtifacts(art.matrices, art.clusters, art.clusters_wf, refined)


def canonical_link_clouds(art: LinkArtifacts) -> list[np.ndarray]:
    """Accumulate refined steps per link (visualize_links' {i:04}.ply)."""
    L = len(art.clusters[0])
    source = art.refined if art.refined is not None else art.clusters
    return [
        np.concatenate([source[t][l] for t in range(len(source))], axis=0)
        for l in range(L)
    ]


def save_link_artifacts(link_dir: str, art: LinkArtifacts) -> None:
    """Persist the reference's mesh-stage layout (link.py:68-83,127,197)."""
    os.makedirs(os.path.join(link_dir, "matrix"), exist_ok=True)
    os.makedirs(os.path.join(link_dir, "cluster"), exist_ok=True)
    os.makedirs(os.path.join(link_dir, "cluster_wf"), exist_ok=True)
    if art.refined is not None:
        os.makedirs(os.path.join(link_dir, "cluster_rf"), exist_ok=True)
    for t in range(len(art.clusters)):
        np.save(os.path.join(link_dir, "matrix", f"{t:04}.npy"), art.matrices[t])
        save_cluster_npz(os.path.join(link_dir, "cluster", f"{t:04}.npz"), art.clusters[t])
        save_cluster_npz(os.path.join(link_dir, "cluster_wf", f"{t:04}.npz"), art.clusters_wf[t])
        if art.refined is not None:
            save_cluster_npz(os.path.join(link_dir, "cluster_rf", f"{t:04}.npz"), art.refined[t])
