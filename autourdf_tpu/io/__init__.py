from .mesh_io import TriMesh, load_mesh, load_obj, load_stl, save_stl, sample_surface
from .ply import read_ply, write_ply

__all__ = [
    "TriMesh",
    "load_mesh",
    "load_stl",
    "load_obj",
    "save_stl",
    "sample_surface",
    "read_ply",
    "write_ply",
]
