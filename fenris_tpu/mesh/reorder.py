"""Bandwidth-reducing mesh reordering ((reverse) Cuthill–McKee).

Parity: src/mesh/reorder.rs — ``cuthill_mckee`` (:171),
``reverse_cuthill_mckee`` (:236), ``reorder_mesh_par`` (:54).  On TPU the
payoff is locality of the CSR/ELL sparse structure (smaller gather spans in
SpMV) rather than cache lines, but the algorithm is identical and runs on
the host.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np

from . import Mesh

__all__ = ["cuthill_mckee", "reverse_cuthill_mckee", "reorder_mesh"]


def _vertex_adjacency(mesh: Mesh) -> Tuple[np.ndarray, np.ndarray]:
    """CSR adjacency (offsets, neighbors) of the mesh's vertex graph.

    Vertices are adjacent iff they share a cell (the sparsity pattern of a
    scalar FEM matrix).
    """
    cells = mesh.cells.astype(np.int64)
    n = cells.shape[1]
    rows = np.repeat(cells, n, axis=1).reshape(-1)
    cols = np.tile(cells, (1, n)).reshape(-1)
    mask = rows != cols
    pairs = np.unique(np.stack([rows[mask], cols[mask]], axis=-1), axis=0)
    offsets = np.searchsorted(pairs[:, 0], np.arange(mesh.num_vertices + 1))
    return offsets, pairs[:, 1]


def cuthill_mckee(mesh: Mesh) -> np.ndarray:
    """Cuthill–McKee permutation: ``perm[new_index] = old_index``.

    Dispatches to the C++ implementation (native/reorder.cpp, ~70x at
    250k hex elements on the single-core host) when available; the numpy
    path below is the fallback and the semantic reference (both pinned
    identical by tests/test_native.py).
    """
    from ..native import cuthill_mckee_native

    perm = cuthill_mckee_native(np.asarray(mesh.cells), mesh.num_vertices)
    if perm is not None:
        return perm
    return _cuthill_mckee_numpy(mesh)


def _cuthill_mckee_numpy(mesh: Mesh) -> np.ndarray:
    offsets, neighbors = _vertex_adjacency(mesh)
    nv = mesh.num_vertices
    degree = np.diff(offsets)
    visited = np.zeros(nv, dtype=bool)
    perm = np.empty(nv, dtype=np.int64)
    pos = 0
    # Process connected components, seeding each from its min-degree vertex.
    order_by_degree = np.argsort(degree, kind="stable")
    seed_ptr = 0
    while pos < nv:
        while seed_ptr < nv and visited[order_by_degree[seed_ptr]]:
            seed_ptr += 1
        seed = order_by_degree[seed_ptr]
        visited[seed] = True
        perm[pos] = seed
        head = pos
        pos += 1
        while head < pos:
            u = perm[head]
            head += 1
            nbrs = neighbors[offsets[u] : offsets[u + 1]]
            new = nbrs[~visited[nbrs]]
            if len(new):
                new = np.unique(new)
                new = new[np.argsort(degree[new], kind="stable")]
                visited[new] = True
                perm[pos : pos + len(new)] = new
                pos += len(new)
    return perm


def reverse_cuthill_mckee(mesh: Mesh) -> np.ndarray:
    """Reverse Cuthill–McKee permutation (reorder.rs:236)."""
    return cuthill_mckee(mesh)[::-1].copy()


def reorder_mesh(mesh: Mesh, perm: np.ndarray | None = None) -> Tuple[Mesh, np.ndarray]:
    """Apply a vertex permutation (default: RCM) to a mesh.

    Returns the permuted mesh and the permutation used
    (``perm[new] = old``).  Cells keep their order; their node indices are
    relabeled.
    """
    if perm is None:
        perm = reverse_cuthill_mckee(mesh)
    perm = np.asarray(perm, dtype=np.int64)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(len(perm))
    return Mesh(mesh.points[perm], inv[mesh.cells.astype(np.int64)], mesh.element), perm
