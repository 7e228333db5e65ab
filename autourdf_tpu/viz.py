"""Headless visualization (matplotlib): plots, renders, animations.

Replaces the reference's interactive Open3D/PyBullet windows
(/root/reference/PointCloud/visualize.py, coord_map.py GUI calls,
Sim/vis.py, Sim/test_urdf.py) with file outputs — every artifact the
reference shows in a window is emitted as a PNG/GIF, so the pipeline runs
on display-less TPU hosts.
"""

from __future__ import annotations

import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt
import numpy as np


def _save(fig, path: str) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=150, bbox_inches="tight")
    plt.close(fig)
    return path


def plot_silhouette_scores(nls, scores, path: str) -> str:
    """Silhouette-vs-link-count curve (coord_map.py:696-704)."""
    fig, ax = plt.subplots(figsize=(6, 4))
    ax.plot(np.asarray(nls), np.asarray(scores), marker="o")
    ax.set_xlabel("Number of Links")
    ax.set_ylabel("Silhouette Score")
    ax.grid(True)
    return _save(fig, path)


def plot_distance_map(sum_map: np.ndarray, path: str) -> str:
    """Motion-correlation heatmap (coord_map.py:673-679 style)."""
    fig, ax = plt.subplots(figsize=(5, 5))
    im = ax.imshow(1.0 - np.asarray(sum_map), cmap="Blues")
    fig.colorbar(im, ax=ax)
    ax.set_axis_off()
    return _save(fig, path)


def plot_loss_history(losses, path: str, lrs=None) -> str:
    """Training loss (+ optional lr) curves (mlp_reg.py:126-150)."""
    rows = 2 if lrs is not None else 1
    fig, axes = plt.subplots(rows, 1, figsize=(8, 4 * rows), squeeze=False)
    losses = np.asarray(losses)
    axes[0][0].plot(losses[np.isfinite(losses)])
    axes[0][0].set_xlabel("Epoch")
    axes[0][0].set_ylabel("Loss")
    axes[0][0].grid(True)
    if lrs is not None:
        axes[1][0].plot(np.asarray(lrs))
        axes[1][0].set_yscale("log")
        axes[1][0].set_xlabel("Epoch")
        axes[1][0].set_ylabel("Learning rate")
        axes[1][0].grid(True)
    return _save(fig, path)


def _scatter3d(ax, pts, **kw):
    ax.scatter(pts[:, 0], pts[:, 1], pts[:, 2], **kw)


def _equal_aspect(ax, pts):
    lo, hi = pts.min(0), pts.max(0)
    c = (lo + hi) / 2
    r = max((hi - lo).max() / 2, 1e-6)
    ax.set_xlim(c[0] - r, c[0] + r)
    ax.set_ylim(c[1] - r, c[1] + r)
    ax.set_zlim(c[2] - r, c[2] + r)


def render_cloud(points: np.ndarray, path: str, colors=None, title=None,
                 point_size: float = 1.0) -> str:
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    _scatter3d(ax, np.asarray(points), s=point_size, c=colors)
    _equal_aspect(ax, np.asarray(points))
    if title:
        ax.set_title(title)
    ax.set_axis_off()
    return _save(fig, path)


def render_clusters(points: np.ndarray, labels: np.ndarray, path: str,
                    num_clusters: int | None = None, title=None) -> str:
    """Cluster-colored cloud (the reference's per-cluster paint)."""
    labels = np.asarray(labels)
    k = num_clusters or int(labels.max()) + 1
    cmap = plt.get_cmap("jet")
    colors = cmap(labels / max(k - 1, 1))
    return render_cloud(points, path, colors=colors, title=title)


def render_kinematic_tree(
    coords: np.ndarray,            # (K, >=3) cluster centers
    groups: list,                  # link groups (sets of cluster ids)
    edges: list[tuple[int, int]],  # cluster adjacency edges
    path: str,
    joints=None,                   # optional list with .global_pos/.global_axis
    axis_len: float = 0.08,
) -> str:
    """Link-colored body graph + joint axes
    (visualize.visualize_kinematic_tree equivalent)."""
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    pts = np.asarray(coords)[:, :3]
    cmap = plt.get_cmap("jet")
    for gi, group in enumerate(groups):
        sel = pts[sorted(group)]
        _scatter3d(ax, sel, s=40, color=cmap(gi / max(len(groups) - 1, 1)))
    for a, b in edges:
        seg = pts[[a, b]]
        ax.plot(seg[:, 0], seg[:, 1], seg[:, 2], color="gray", lw=1)
    if joints:
        for j in joints:
            p = np.asarray(j.global_pos)[:3]
            d = np.asarray(j.global_axis)[:3]
            d = d / max(np.linalg.norm(d), 1e-9) * axis_len
            ax.plot(*np.stack([p - d, p + d]).T, color="red", lw=3)
            _scatter3d(ax, p[None], s=60, color="red", marker="x")
    _equal_aspect(ax, pts)
    ax.set_axis_off()
    return _save(fig, path)


def render_mesh(mesh, path: str, title=None) -> str:
    """Trisurf render of a TriMesh."""
    fig = plt.figure(figsize=(6, 6))
    ax = fig.add_subplot(projection="3d")
    v, f = np.asarray(mesh.vertices), np.asarray(mesh.faces)
    ax.plot_trisurf(v[:, 0], v[:, 1], f, v[:, 2], color="lightgray",
                    edgecolor="none")
    _equal_aspect(ax, v)
    if title:
        ax.set_title(title)
    ax.set_axis_off()
    return _save(fig, path)


def animate_clouds(clouds: list[np.ndarray], path: str, labels=None,
                   fps: int = 4, point_size: float = 1.0) -> str:
    """GIF of a point-cloud sequence (Sim/vis.py + animate_raw_pcd)."""
    from PIL import Image

    frames = []
    allpts = np.concatenate([np.asarray(c) for c in clouds])
    for i, cloud in enumerate(clouds):
        fig = plt.figure(figsize=(5, 5))
        ax = fig.add_subplot(projection="3d")
        colors = None
        if labels is not None:
            k = int(np.max(labels[i])) + 1
            colors = plt.get_cmap("jet")(np.asarray(labels[i]) / max(k - 1, 1))
        _scatter3d(ax, np.asarray(cloud), s=point_size, c=colors)
        _equal_aspect(ax, allpts)
        ax.set_axis_off()
        fig.canvas.draw()
        buf = np.asarray(fig.canvas.buffer_rgba())
        frames.append(Image.fromarray(buf))
        plt.close(fig)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    frames[0].save(
        path, save_all=True, append_images=frames[1:],
        duration=int(1000 / fps), loop=0,
    )
    return path


def replay_posed_meshes(
    link_dir: str,
    out_path: str,
    start: int = 0,
    end: int | None = None,
    fps: int = 4,
) -> str:
    """Replay recovered link meshes posed by per-step link matrices
    (reference PointCloud/mesh.py:9-56 equivalent, headless GIF)."""
    import glob as globmod

    from .io.mesh_io import load_stl, sample_surface

    m_files = sorted(globmod.glob(os.path.join(link_dir, "matrix", "*.npy")))[start:end]
    stl_files = sorted(globmod.glob(os.path.join(link_dir, "[0-9]*.stl")))
    rng = np.random.default_rng(0)
    link_samples = [sample_surface(load_stl(f), 800, rng) for f in stl_files]
    clouds, labels = [], []
    for mf in m_files:
        mats = np.load(mf)
        step_pts, step_lab = [], []
        for i, pts in enumerate(link_samples):
            T = mats[i]
            step_pts.append(pts @ T[:3, :3].T + T[:3, 3])
            step_lab.append(np.full(len(pts), i))
        clouds.append(np.concatenate(step_pts))
        labels.append(np.concatenate(step_lab))
    return animate_clouds(clouds, out_path, labels=labels, fps=fps)


def urdf_snapshot(
    urdf_path: str,
    out_path: str,
    q: dict | None = None,
    num_points: int = 4000,
    asset_root: str | None = None,
) -> str:
    """Render a URDF at a configuration with its joint axes drawn
    (Sim/test_urdf.py's axis visualization, headless)."""
    from .urdf.fk import joint_world_frames, link_points_world, sample_link_surfaces
    from .urdf.parser import load_urdf

    model = load_urdf(urdf_path, asset_root=asset_root)
    samples = sample_link_surfaces(model, total_points=num_points * 4)
    pts = link_points_world(model, samples, q or {})
    frames = joint_world_frames(model, q or {})

    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(projection="3d")
    _scatter3d(ax, pts[:: max(1, len(pts) // num_points)], s=1, color="gray")
    span = max(float(np.ptp(pts, axis=0).max()), 1e-6)
    for f in frames:
        d = f.axis / max(np.linalg.norm(f.axis), 1e-9) * 0.12 * span
        ax.plot(*np.stack([f.position - d, f.position + d]).T, color="red", lw=2)
        ax.text(*f.position, f.name, fontsize=7)
    _equal_aspect(ax, pts)
    ax.set_axis_off()
    return _save(fig, out_path)


def sweep_joint_gif(
    urdf_path: str,
    joint_name: str,
    out_path: str,
    num_frames: int = 16,
    amplitude: float = 1.0,
    num_points: int = 2000,
    asset_root: str | None = None,
) -> str:
    """Sine-sweep one joint of a URDF and record a GIF
    (Sim/test_urdf.py:160-195 equivalent, headless)."""
    from .urdf.fk import link_points_world, sample_link_surfaces
    from .urdf.parser import load_urdf

    model = load_urdf(urdf_path, asset_root=asset_root)
    samples = sample_link_surfaces(model, total_points=num_points * 4)
    clouds = []
    for t in range(num_frames):
        q = {joint_name: amplitude * np.sin(2 * np.pi * t / num_frames)}
        clouds.append(link_points_world(model, samples, q))
    return animate_clouds(clouds, out_path)
