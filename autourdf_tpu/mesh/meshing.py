"""Link mesh generation: point cloud -> watertight STL.

Rebuilds link_mesh (/root/reference/PointCloud/link.py:204-318):
statistical outlier removal (20 NN, 2 sigma) -> voxel occupancy at the
robot's configured voxel size -> isosurface (marching tetrahedra, closed
by construction — no pymeshfix needed) -> one Laplacian smoothing pass ->
binary STL per link.
"""

from __future__ import annotations

import os

import numpy as np
from scipy.spatial import cKDTree

from ..io.mesh_io import TriMesh, save_stl
from .marching import marching_tetrahedra


def remove_statistical_outliers(
    points: np.ndarray, nb_neighbors: int = 20, std_ratio: float = 2.0
) -> np.ndarray:
    """Open3D remove_statistical_outlier semantics: drop points whose mean
    distance to their nb_neighbors nearest neighbors exceeds
    mean + std_ratio * std of that statistic."""
    if len(points) <= nb_neighbors:
        return points
    tree = cKDTree(points)
    d, _ = tree.query(points, k=nb_neighbors + 1)
    mean_d = d[:, 1:].mean(axis=1)
    mu, sigma = mean_d.mean(), mean_d.std()
    return points[mean_d <= mu + std_ratio * sigma]


def voxelize(points: np.ndarray, voxel_size: float) -> tuple[np.ndarray, np.ndarray]:
    """Occupancy volume + origin from a point cloud (Open3D VoxelGrid +
    dense volume, link.py:225-245)."""
    lo = points.min(0)
    idx = np.floor((points - lo) / voxel_size).astype(np.int64)
    dims = idx.max(0) + 1
    vol = np.zeros(dims, dtype=bool)
    vol[idx[:, 0], idx[:, 1], idx[:, 2]] = True
    return vol, lo


def laplacian_smooth(mesh: TriMesh, iterations: int = 1) -> TriMesh:
    """Uniform-weight Laplacian smoothing (filter_smooth_simple)."""
    v = mesh.vertices.copy()
    f = mesh.faces
    n = len(v)
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    for _ in range(iterations):
        acc = np.zeros_like(v)
        cnt = np.zeros(n)
        np.add.at(acc, src, v[dst])
        np.add.at(cnt, src, 1.0)
        nonzero = cnt > 0
        v[nonzero] = acc[nonzero] / cnt[nonzero, None]
    return TriMesh(v, f)


def _neighbor_means(v: np.ndarray, f: np.ndarray) -> np.ndarray:
    edges = np.concatenate([f[:, [0, 1]], f[:, [1, 2]], f[:, [2, 0]]], axis=0)
    src = np.concatenate([edges[:, 0], edges[:, 1]])
    dst = np.concatenate([edges[:, 1], edges[:, 0]])
    acc = np.zeros_like(v)
    cnt = np.zeros(len(v))
    np.add.at(acc, src, v[dst])
    np.add.at(cnt, src, 1.0)
    cnt = np.maximum(cnt, 1.0)
    return acc / cnt[:, None]


def taubin_smooth(mesh: TriMesh, iterations: int = 5,
                  lam: float = 0.5, mu: float = -0.53) -> TriMesh:
    """Taubin lambda/mu smoothing: low-pass without the volume shrinkage
    plain Laplacian smoothing causes (each shrink step is followed by a
    slightly stronger inflate step).  Pure vertex relocation — topology
    and watertightness are untouched."""
    v = mesh.vertices.copy()
    f = mesh.faces
    for _ in range(iterations):
        v += lam * (_neighbor_means(v, f) - v)
        v += mu * (_neighbor_means(v, f) - v)
    return TriMesh(v, f)


def vertex_normals(mesh: TriMesh) -> np.ndarray:
    """Area-weighted per-vertex normals (outward for CCW watertight
    meshes), unit length."""
    v, f = mesh.vertices, mesh.faces
    fn = np.cross(v[f[:, 1]] - v[f[:, 0]], v[f[:, 2]] - v[f[:, 0]])
    vn = np.zeros_like(v)
    for c in range(3):
        np.add.at(vn, f[:, c], fn)
    n = np.linalg.norm(vn, axis=1, keepdims=True)
    return vn / np.maximum(n, 1e-12)


def project_to_cloud(
    mesh: TriMesh, points: np.ndarray, voxel_size: float,
    k: int = 8, max_shift_voxels: float = 0.75,
) -> TriMesh:
    """Snap mesh vertices toward the scanned surface (ours, beyond the
    reference's raw marching-cubes output).

    Binary-occupancy isosurfaces sit on voxel-edge midpoints, a ~voxel/2
    inflation around the true surface that dominates re-simulation Chamfer
    on large flat parts.  Each vertex moves ALONG ITS OUTWARD NORMAL by
    the median signed offset of its k nearest cloud points — the median,
    not the centroid: on plates thinner than a voxel the k-neighborhood
    contains BOTH sides of the part, and a centroid target would drag the
    two shells onto the midplane (the laptop-lid failure) while the
    near-side majority keeps the median on the vertex's own side.  The
    shift is clamped to ``max_shift_voxels * voxel_size`` so relocation
    cannot fold the (watertight-by-construction) topology, and purely
    normal motion preserves tangential vertex spacing.
    """
    if len(points) < k or len(mesh.vertices) == 0 or len(mesh.faces) == 0:
        return mesh
    tree = cKDTree(points)
    _, idx = tree.query(mesh.vertices, k=k)
    n = vertex_normals(mesh)
    offs = np.einsum("vkc,vc->vk", points[idx] - mesh.vertices[:, None, :], n)
    shift = np.median(offs, axis=1)
    max_shift = max_shift_voxels * voxel_size
    shift = np.clip(shift, -max_shift, max_shift)
    return TriMesh(mesh.vertices + shift[:, None] * n, mesh.faces)


def cloud_to_mesh(
    points: np.ndarray,
    voxel_size: float,
    nb_neighbors: int = 20,
    std_ratio: float = 2.0,
    smooth_iterations: int = 1,
    project: bool = True,
    taubin_iterations: int = 4,
) -> TriMesh:
    """Point cloud -> watertight mesh.

    Pipeline: outlier removal -> voxel occupancy -> marching tetrahedra
    (watertight by construction) -> vertex projection onto the cloud
    (removes the half-voxel isosurface inflation) -> Taubin smoothing
    (shrinkage-free).  ``project=False, taubin_iterations=0`` recovers the
    reference-shaped path (plain occupancy surface + one Laplacian pass,
    /root/reference/PointCloud/link.py:204-318).
    """
    pts = remove_statistical_outliers(points, nb_neighbors, std_ratio)
    vol, origin = voxelize(pts, voxel_size)
    mesh = marching_tetrahedra(vol, voxel_size, origin)
    if len(mesh.faces) == 0:
        return mesh
    if project:
        mesh = project_to_cloud(mesh, pts, voxel_size)
        if taubin_iterations > 0:
            mesh = taubin_smooth(mesh, taubin_iterations)
    elif smooth_iterations > 0:
        mesh = laplacian_smooth(mesh, smooth_iterations)
    return mesh


def generate_link_meshes(
    link_clouds: list[np.ndarray],
    out_dir: str,
    voxel_size: float,
    smooth_iterations: int = 1,
) -> list[str]:
    """Mesh every link cloud and write {link:04}.stl (link.py:314)."""
    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, cloud in enumerate(link_clouds):
        mesh = cloud_to_mesh(cloud, voxel_size, smooth_iterations=smooth_iterations)
        path = os.path.join(out_dir, f"{i:04}.stl")
        save_stl(path, mesh)
        paths.append(path)
    return paths
