"""fenris-tpu: a TPU-native finite element library.

A from-scratch JAX/XLA/Pallas re-design of the capability surface of the
``fenris`` FEM library (Rust): reference elements and quadrature, meshes,
batched local assembly, deterministic global scatter assembly, sparse
solvers, hyperelastic materials, Newton solvers, interpolation, error
estimation, and VTK/Gmsh I/O — built struct-of-arrays, compiler-first, and
sharding-ready for multi-chip TPU meshes.

Quick start::

    import fenris_tpu as ft

    mesh = ft.mesh.procedural.create_unit_square_uniform_quad_mesh_2d(32)
    result = ft.fem.solve_poisson(
        mesh,
        ft.quadrature.quadrilateral_gauss(2),
        ft.quadrature.quadrilateral_gauss(6),
        source=lambda x, p: 1.0,
        dirichlet_nodes=mesh.find_boundary_vertices(),
    )
"""

from . import (
    assembly,
    config,
    elasticity,
    error,
    fem,
    geometry,
    integrate,
    io,
    mesh,
    operators,
    optimize,
    parallel,
    quadrature,
    solid,
    space,
    sparse,
)
from .mesh import Mesh
from .reference_elements import ELEMENTS, ReferenceElement, element

__version__ = "0.1.0"

__all__ = [
    "Mesh",
    "ReferenceElement",
    "ELEMENTS",
    "element",
    "assembly",
    "config",
    "elasticity",
    "error",
    "fem",
    "geometry",
    "integrate",
    "io",
    "mesh",
    "operators",
    "optimize",
    "parallel",
    "quadrature",
    "solid",
    "space",
    "sparse",
]
