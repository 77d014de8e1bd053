from .delaunay import find_average_spacing, triangulate
from .mesh import TetrahedraMesh, build_adjacency, build_mesh
from .ply import read_ply, write_ply
from .io import load_tetrahedra, save_tetrahedra

__all__ = [
    "triangulate",
    "find_average_spacing",
    "TetrahedraMesh",
    "build_adjacency",
    "build_mesh",
    "read_ply",
    "write_ply",
    "load_tetrahedra",
    "save_tetrahedra",
]
