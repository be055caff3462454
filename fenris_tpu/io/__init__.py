"""Mesh/solution I/O: VTU export and Gmsh .msh import."""

from .msh import load_msh, load_msh_from_bytes
from .vtk import FiniteElementMeshDataSetBuilder, write_vtu
