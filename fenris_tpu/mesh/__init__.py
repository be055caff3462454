"""Meshes as struct-of-arrays.

TPU-first design: a mesh is ``(points[N, d] float, cells[E, n] int32)`` plus
an element type — no per-cell objects, no trait dispatch.  Mesh *topology*
operations (boundary extraction, conversion, refinement, reordering) run on
the host in vectorized numpy (setup cost, not in the hot loop); the arrays
then feed device-resident assembly spaces.

Capability parity with the reference's ``Mesh<T, D, Connectivity>``
(src/mesh.rs:23): boundary cell/face/vertex extraction (:154,:167,:208),
``split_into_triangles`` (:276), ``keep_cells`` (:305),
``extract_surface_mesh`` (:505), vertex transforms, plus the typed
constructors.  Heterogeneous meshes are dictionaries of per-element-type
blocks (replacing ``AggregateElementAssembler``).
"""

from __future__ import annotations

from dataclasses import dataclass, replace
from typing import Callable, Dict, Optional, Tuple

import numpy as np

from ..reference_elements import ELEMENTS, ReferenceElement, element

__all__ = ["Mesh", "procedural", "convert", "refinement", "reorder"]


@dataclass(frozen=True)
class Mesh:
    """A homogeneous finite element mesh.

    Attributes:
        points: ``[num_vertices, dim]`` float64 vertex coordinates.
        cells: ``[num_cells, nodes_per_cell]`` int32 node indices, ordered
            per the element type's reference node ordering.
        element: the reference element type of every cell.
    """

    points: np.ndarray
    cells: np.ndarray
    element: ReferenceElement

    def __post_init__(self):
        object.__setattr__(
            self, "points", np.ascontiguousarray(np.asarray(self.points, dtype=np.float64))
        )
        cells = np.ascontiguousarray(np.asarray(self.cells, dtype=np.int32))
        if cells.ndim == 1:
            cells = cells.reshape(0, self.element.num_nodes)
        object.__setattr__(self, "cells", cells)
        if self.cells.shape[0] and self.cells.shape[1] != self.element.num_nodes:
            raise ValueError(
                f"cells have {self.cells.shape[1]} nodes but element "
                f"{self.element.name} has {self.element.num_nodes}"
            )

    # -- basic queries --------------------------------------------------------

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    @property
    def num_vertices(self) -> int:
        return self.points.shape[0]

    @property
    def num_cells(self) -> int:
        return self.cells.shape[0]

    def cell_points(self) -> np.ndarray:
        """Gathered node coordinates per cell: ``[E, n, dim]``."""
        return self.points[self.cells]

    def diameters(self) -> np.ndarray:
        """Per-cell diameter = max pairwise distance between corner vertices.

        Parity: ``FiniteElement::diameter`` — higher-order elements delegate
        to their corner (geometry) element in the reference.
        """
        nv = self.element.num_vertices
        X = self.points[self.cells[:, :nv]]  # [E, v, d]
        diff = X[:, :, None, :] - X[:, None, :, :]
        return np.sqrt((diff**2).sum(-1)).max(axis=(1, 2))

    # -- topology --------------------------------------------------------------

    def _face_arrays(self) -> Tuple[np.ndarray, np.ndarray]:
        """All faces of all cells.

        Returns ``(face_nodes[E * f, fn], corner_key[E * f, fv_sorted])``
        where ``face_nodes`` carries full face connectivity (global node
        indices, face-element ordering) and ``corner_key`` is the sorted
        corner-vertex tuple used for matching shared faces.
        """
        fnodes = self.element.face_nodes()
        fel = self.element.face_element()
        nfv = fel.num_vertices if fel is not None else len(fnodes[0])
        faces = np.stack(
            [self.cells[:, list(fn)] for fn in fnodes], axis=1
        )  # [E, f, fn]
        faces = faces.reshape(-1, faces.shape[-1])
        corner_key = np.sort(faces[:, :nfv], axis=1)
        return faces, corner_key

    def _boundary_face_mask(self) -> Tuple[np.ndarray, np.ndarray]:
        faces, key = self._face_arrays()
        _, inverse, counts = np.unique(
            key, axis=0, return_inverse=True, return_counts=True
        )
        return faces, counts[inverse] == 1

    def find_boundary_faces(self) -> np.ndarray:
        """Face connectivities (``[B, fn]``) occurring in exactly one cell.

        Parity: src/mesh.rs:167 (``find_boundary_faces``).
        """
        faces, mask = self._boundary_face_mask()
        return faces[mask]

    def find_boundary_cells(self) -> np.ndarray:
        """Indices of cells having at least one boundary face (src/mesh.rs:154)."""
        nf = len(self.element.face_nodes())
        _, mask = self._boundary_face_mask()
        per_cell = mask.reshape(self.num_cells, nf)
        return np.flatnonzero(per_cell.any(axis=1))

    def find_boundary_vertices(self) -> np.ndarray:
        """Sorted unique vertex indices on the boundary (src/mesh.rs:208)."""
        return np.unique(self.find_boundary_faces())

    def boundary_mesh(self) -> "Mesh":
        """Mesh of the boundary faces (same vertex array, face element type)."""
        fel = self.element.face_element()
        if fel is None:
            raise ValueError(f"{self.element.name} has no face element type")
        return Mesh(self.points, self.find_boundary_faces(), fel)

    # -- editing ---------------------------------------------------------------

    def keep_cells(self, cell_indices) -> "Mesh":
        """Keep only the given cells; drop and relabel vertices (src/mesh.rs:305)."""
        cell_indices = np.asarray(cell_indices, dtype=np.int64)
        kept = self.cells[cell_indices]
        used = np.unique(kept)
        remap = np.full(self.num_vertices, -1, dtype=np.int32)
        remap[used] = np.arange(len(used), dtype=np.int32)
        return Mesh(self.points[used], remap[kept], self.element)

    def transform_points(self, f: Callable[[np.ndarray], np.ndarray]) -> "Mesh":
        """Return a mesh with ``points = f(points)`` (vectorized over rows)."""
        return replace(self, points=np.asarray(f(self.points), dtype=np.float64))

    def translate(self, offset) -> "Mesh":
        return replace(self, points=self.points + np.asarray(offset)[None, :])

    def scale(self, factor) -> "Mesh":
        return replace(self, points=self.points * factor)

    def split_into_triangles(self) -> "Mesh":
        """Split a quad mesh into triangles (src/mesh.rs:276).

        Convex quads split along the (0, 2) diagonal into (0,1,2) and
        (0,2,3); concave quads split at the concave corner, matching
        ``Quad2d::split_into_triangle_connectivities``
        (fenris-geometry/src/primitives/quad.rs:76).
        """
        if self.element.name != "quad4":
            raise ValueError("split_into_triangles requires a quad4 mesh")
        X = self.cell_points()  # [E, 4, 2]
        # 2D cross products at each corner i: (v_{i+1} - v_i) x (v_{i-1} - v_i)
        nxt = X[:, [1, 2, 3, 0], :] - X
        prv = X[:, [3, 0, 1, 2], :] - X
        cross = nxt[..., 0] * prv[..., 1] - nxt[..., 1] * prv[..., 0]
        concave = cross < 0.0  # [E, 4]
        has_concave = concave.any(axis=1)
        ci = np.where(has_concave, concave.argmax(axis=1), 0)
        # Reference: triangles ((i+2, i+3, i), (i+2, i, i+1)) at concave
        # corner i+1, i.e. concave_corner() returns i+1 for corner index i+1.
        # concave_corner returns "i + 1" where i is the *previous* corner in
        # its loop; our `ci` already is the concave corner index.  Triangles:
        tri_a = np.stack([(ci + 2) % 4, (ci + 3) % 4, ci], axis=1)
        tri_b = np.stack([(ci + 2) % 4, ci, (ci + 1) % 4], axis=1)
        conv_a = np.broadcast_to(np.array([0, 1, 2]), tri_a.shape)
        conv_b = np.broadcast_to(np.array([0, 2, 3]), tri_b.shape)
        la = np.where(has_concave[:, None], tri_a, conv_a)
        lb = np.where(has_concave[:, None], tri_b, conv_b)
        ta = np.take_along_axis(self.cells, la.astype(np.int64), axis=1)
        tb = np.take_along_axis(self.cells, lb.astype(np.int64), axis=1)
        tris = np.stack([ta, tb], axis=1).reshape(-1, 3)
        return Mesh(self.points, tris, ELEMENTS["tri3"])

    def extract_surface_mesh(self) -> "Mesh":
        """Boundary mesh with unused vertices dropped (src/mesh.rs:505)."""
        bm = self.boundary_mesh()
        used = np.unique(bm.cells)
        remap = np.full(self.num_vertices, -1, dtype=np.int32)
        remap[used] = np.arange(len(used), dtype=np.int32)
        return Mesh(self.points[used], remap[bm.cells], bm.element)

    # -- misc -------------------------------------------------------------------

    def with_element(self, el) -> "Mesh":
        el = element(el) if isinstance(el, str) else el
        return replace(self, element=el)

    def __repr__(self):
        return (
            f"Mesh({self.element.name}, {self.num_vertices} vertices, "
            f"{self.num_cells} cells, dim={self.dim})"
        )


from . import convert, procedural, refinement, reorder  # noqa: E402
