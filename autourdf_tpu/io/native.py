"""ctypes bindings to the native host runtime (native/libautourdf_native.so).

The TPU compute path is JAX/Pallas; this library accelerates the host-side
loops the reference delegated to C++ dependencies: marching-tetrahedra
mesh extraction (PyMCubes' role), binary PLY sequence loading (Open3D's
role), and host FPS.  Everything degrades to the pure-numpy
implementations when the shared library is absent; set
``AUTOURDF_NATIVE=0`` to force the fallback.

Built lazily with the in-repo Makefile on first use if g++ is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _native_dir() -> str:
    return os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), "native")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("AUTOURDF_NATIVE", "1") == "0":
        return None
    so = os.path.join(_native_dir(), "libautourdf_native.so")
    if not os.path.exists(so):
        try:
            subprocess.run(
                ["make", "-C", _native_dir()], check=True,
                capture_output=True, timeout=120,
            )
        except Exception:
            return None
    if not os.path.exists(so):
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None

    lib.mt_run.restype = ctypes.c_void_p
    lib.mt_run.argtypes = [
        ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
    ]
    lib.mt_num_verts.restype = ctypes.c_int64
    lib.mt_num_verts.argtypes = [ctypes.c_void_p]
    lib.mt_num_faces.restype = ctypes.c_int64
    lib.mt_num_faces.argtypes = [ctypes.c_void_p]
    lib.mt_copy.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.mt_free.argtypes = [ctypes.c_void_p]

    lib.ply_read_xyz.restype = ctypes.c_int64
    lib.ply_read_xyz.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.ply_write_xyz.restype = ctypes.c_int
    lib.ply_write_xyz.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64,
    ]
    lib.fps_sample.argtypes = [
        ctypes.POINTER(ctypes.c_float), ctypes.c_int64, ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _LIB = lib
    return lib


def available() -> bool:
    return _load() is not None


def marching_tetrahedra_native(volume: np.ndarray):
    """Returns (verts (V,3) float64 index-space, faces (F,3) int32) or None."""
    lib = _load()
    if lib is None:
        return None
    vol = np.ascontiguousarray(volume.astype(np.uint8))
    h = lib.mt_run(
        vol.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        vol.shape[0], vol.shape[1], vol.shape[2],
    )
    try:
        nv = lib.mt_num_verts(h)
        nf = lib.mt_num_faces(h)
        verts = np.empty((nv, 3), np.float64)
        faces = np.empty((nf, 3), np.int32)
        if nv:
            lib.mt_copy(
                h,
                verts.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
                faces.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
        return verts, faces
    finally:
        lib.mt_free(h)


def read_ply_native(path: str) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    n = lib.ply_read_xyz(path.encode(), None, 0)
    if n < 0:
        return None  # ascii / exotic layout: fall back to the numpy reader
    out = np.empty((n, 3), np.float32)
    got = lib.ply_read_xyz(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n
    )
    return out if got == n else None


def write_ply_native(path: str, pts: np.ndarray) -> bool:
    lib = _load()
    if lib is None:
        return False
    pts = np.ascontiguousarray(pts, np.float32)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    return lib.ply_write_xyz(
        path.encode(), pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts)
    ) == 0


def fps_native(pts: np.ndarray, k: int) -> np.ndarray | None:
    lib = _load()
    if lib is None:
        return None
    pts = np.ascontiguousarray(pts, np.float32)
    out = np.empty((k,), np.int32)
    lib.fps_sample(
        pts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(pts), k,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    return out
