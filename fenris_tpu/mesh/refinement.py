"""Uniform (red) mesh refinement.

Parity: src/mesh/refinement.rs (``refine_uniformly`` :116,
``refine_uniformly_repeat`` :128) with edge-midpoint vertex dedup via
canonical sorted edge labels (refinement/detail.rs:28-62).  The reference
implements the rule only for Tri3; fenris-tpu additionally covers Quad4,
Tet4 and Hex8 (red refinement with face/cell centers as needed).
"""

from __future__ import annotations

import numpy as np

from ..reference_elements import ELEMENTS
from . import Mesh

__all__ = [
    "refine_uniformly",
    "refine_uniformly_repeat",
    "prolongation_for_refinement",
]


def _edge_midpoint_indices(mesh: Mesh, edges):
    """Create one new vertex per unique undirected edge.

    Returns ``(new_points, edge_idx[E, n_edges])`` where ``edge_idx`` holds
    global indices of the edge midpoints (offset past existing vertices).
    """
    cells = mesh.cells.astype(np.int64)
    pairs = np.stack(
        [np.stack([cells[:, a], cells[:, b]], axis=-1) for a, b in edges], axis=1
    )  # [E, ne, 2]
    canon = np.sort(pairs, axis=-1)
    flat = canon.reshape(-1, 2)
    uniq, inverse = np.unique(flat, axis=0, return_inverse=True)
    mids = (mesh.points[uniq[:, 0]] + mesh.points[uniq[:, 1]]) / 2.0
    idx = (mesh.num_vertices + inverse).reshape(cells.shape[0], len(edges))
    return mids, idx


def refine_uniformly(mesh: Mesh) -> Mesh:
    """One level of red refinement (4 children in 2D, 8 in 3D)."""
    name = mesh.element.name
    cells = mesh.cells.astype(np.int64)
    if name == "tri3":
        # children (a,d,f),(d,b,e),(f,e,c),(d,e,f) — detail.rs:122-127
        mids, eidx = _edge_midpoint_indices(mesh, [(0, 1), (1, 2), (2, 0)])
        a, b, c = cells[:, 0], cells[:, 1], cells[:, 2]
        d, e, f = eidx[:, 0], eidx[:, 1], eidx[:, 2]
        children = np.stack(
            [
                np.stack([a, d, f], -1),
                np.stack([d, b, e], -1),
                np.stack([f, e, c], -1),
                np.stack([d, e, f], -1),
            ],
            axis=1,
        ).reshape(-1, 3)
        return Mesh(np.concatenate([mesh.points, mids]), children, mesh.element)
    if name == "quad4":
        mids, eidx = _edge_midpoint_indices(mesh, [(0, 1), (1, 2), (2, 3), (3, 0)])
        centers = mesh.cell_points().mean(axis=1)
        cidx = mesh.num_vertices + len(mids) + np.arange(mesh.num_cells)
        a, b, c, d = (cells[:, i] for i in range(4))
        e01, e12, e23, e30 = (eidx[:, i] for i in range(4))
        m = cidx
        children = np.stack(
            [
                np.stack([a, e01, m, e30], -1),
                np.stack([e01, b, e12, m], -1),
                np.stack([m, e12, c, e23], -1),
                np.stack([e30, m, e23, d], -1),
            ],
            axis=1,
        ).reshape(-1, 4)
        return Mesh(np.concatenate([mesh.points, mids, centers]), children, mesh.element)
    if name == "tet4":
        mids, eidx = _edge_midpoint_indices(
            mesh, [(0, 1), (1, 2), (0, 2), (0, 3), (2, 3), (1, 3)]
        )
        v0, v1, v2, v3 = (cells[:, i] for i in range(4))
        m01, m12, m02, m03, m23, m13 = (eidx[:, i] for i in range(6))
        # 4 corner tets + central octahedron split along the (m02, m13)
        # diagonal into 4 tets; orientation preserved (equator cycle
        # m01 -> m03 -> m23 -> m12, each tet (d1, d2, next, cur)).
        eq = [m01, m03, m23, m12]
        oct_children = [
            np.stack([m02, m13, eq[(i + 1) % 4], eq[i]], -1) for i in range(4)
        ]
        children = np.stack(
            [
                np.stack([v0, m01, m02, m03], -1),
                np.stack([m01, v1, m12, m13], -1),
                np.stack([m02, m12, v2, m23], -1),
                np.stack([m03, m13, m23, v3], -1),
            ]
            + oct_children,
            axis=1,
        ).reshape(-1, 4)
        return Mesh(np.concatenate([mesh.points, mids]), children, mesh.element)
    if name == "hex8":
        edges = ELEMENTS["hex8"].edges
        mids, eidx = _edge_midpoint_indices(mesh, edges)
        edge_pos = {e: i for i, e in enumerate(edges)}

        def emid(i, j):
            return eidx[:, edge_pos[(i, j)] if (i, j) in edge_pos else edge_pos[(j, i)]]

        # face centers (deduped by sorted corner tuple)
        faces = ELEMENTS["hex8"].faces
        fkeys = np.sort(
            np.stack([cells[:, list(f)] for f in faces], axis=1), axis=-1
        ).reshape(-1, 4)
        funiq, finv = np.unique(fkeys, axis=0, return_inverse=True)
        fpts = mesh.points[funiq].mean(axis=1)
        foffset = mesh.num_vertices + len(mids)
        fidx = (foffset + finv).reshape(mesh.num_cells, len(faces))
        fpos = {tuple(sorted(f)): i for i, f in enumerate(faces)}

        def fmid(*vs):
            return fidx[:, fpos[tuple(sorted(vs))]]

        centers = mesh.cell_points().mean(axis=1)
        coffset = foffset + len(fpts)
        cc = coffset + np.arange(mesh.num_cells)

        v = [cells[:, i] for i in range(8)]
        # standard hexahedral octasection: child at corner i spans
        # (corner, 3 adjacent edge mids, 3 adjacent face centers, cell center)
        corner_children = [
            (0, (0, 1), (0, 3), (0, 4), (0, 1, 2, 3), (0, 1, 5, 4), (0, 3, 7, 4)),
            (1, (1, 2), (0, 1), (1, 5), (0, 1, 2, 3), (1, 2, 6, 5), (0, 1, 5, 4)),
            (2, (2, 3), (1, 2), (2, 6), (0, 1, 2, 3), (2, 3, 7, 6), (1, 2, 6, 5)),
            (3, (0, 3), (2, 3), (3, 7), (0, 1, 2, 3), (0, 3, 7, 4), (2, 3, 7, 6)),
            (4, (4, 5), (4, 7), (0, 4), (4, 5, 6, 7), (0, 1, 5, 4), (0, 3, 7, 4)),
            (5, (5, 6), (4, 5), (1, 5), (4, 5, 6, 7), (1, 2, 6, 5), (0, 1, 5, 4)),
            (6, (6, 7), (5, 6), (2, 6), (4, 5, 6, 7), (2, 3, 7, 6), (1, 2, 6, 5)),
            (7, (4, 7), (6, 7), (3, 7), (4, 5, 6, 7), (0, 3, 7, 4), (2, 3, 7, 6)),
        ]
        children = []
        for ci_, (corner, ea, eb, ec, fa, fb, fc) in enumerate(corner_children):
            # Build a geometrically valid hex via reference-cube positions:
            # lower face (corner, mid_a, face_a, mid_b), upper (mid_c, f_b, c, f_c)
            del ci_
            if corner in (0, 1, 2, 3):
                lo = [v[corner], emid(*ea), fmid(*fa), emid(*eb)]
                hi = [emid(*ec), fmid(*fb), cc, fmid(*fc)]
            else:
                lo = [emid(*ec), fmid(*fb), cc, fmid(*fc)]
                hi = [v[corner], emid(*ea), fmid(*fa), emid(*eb)]
            children.append(np.stack(lo + hi, -1))
        children = np.stack(children, axis=1).reshape(-1, 8)
        pts = np.concatenate([mesh.points, mids, fpts, centers])
        return Mesh(pts, children, mesh.element)
    raise ValueError(f"uniform refinement not supported for {name}")


def refine_uniformly_repeat(mesh: Mesh, times: int) -> Mesh:
    for _ in range(times):
        mesh = refine_uniformly(mesh)
    return mesh


def prolongation_for_refinement(mesh: Mesh):
    """Sparse prolongation from ``mesh`` to ``refine_uniformly(mesh)``.

    Returns ``(parents [N_fine, 8] int32, weights [N_fine, 8] f64)`` such
    that fine nodal values of any P1/Q1 field are
    ``sum_k weights[n, k] * u_coarse[parents[n, k]]`` — the geometric-MG
    transfer operator (restriction is its transpose).  Vertex ordering
    matches :func:`refine_uniformly` exactly: coarse vertices first
    (identity rows), then edge midpoints, then (quad/hex) face centers,
    then cell centers; the ``np.unique`` calls reproduce the refinement's
    dedup order bit-for-bit.
    """
    name = mesh.element.name
    cells = mesh.cells.astype(np.int64)
    N = mesh.num_vertices
    edge_lists = {
        "tri3": [(0, 1), (1, 2), (2, 0)],
        "quad4": [(0, 1), (1, 2), (2, 3), (3, 0)],
        "tet4": [(0, 1), (1, 2), (0, 2), (0, 3), (2, 3), (1, 3)],
        "hex8": ELEMENTS["hex8"].edges,
    }
    if name not in edge_lists:
        raise ValueError(f"uniform refinement not supported for {name}")
    blocks = []  # (parents [n, k], weight 1/k)
    blocks.append((np.arange(N, dtype=np.int64)[:, None], 1.0))
    edges = edge_lists[name]
    pairs = np.stack(
        [np.stack([cells[:, a], cells[:, b]], axis=-1) for a, b in edges], axis=1
    )
    canon = np.sort(pairs, axis=-1).reshape(-1, 2)
    uniq = np.unique(canon, axis=0)
    blocks.append((uniq, 0.5))
    if name == "hex8":
        faces = ELEMENTS["hex8"].faces
        fkeys = np.sort(
            np.stack([cells[:, list(f)] for f in faces], axis=1), axis=-1
        ).reshape(-1, 4)
        funiq = np.unique(fkeys, axis=0)
        blocks.append((funiq, 0.25))
    if name in ("quad4", "hex8"):
        blocks.append((cells, 1.0 / cells.shape[1]))
    kmax = max(b[0].shape[1] for b in blocks)
    parents = []
    weights = []
    for par, w in blocks:
        n, k = par.shape
        p = np.zeros((n, kmax), dtype=np.int32)
        p[:, :k] = par
        wts = np.zeros((n, kmax))
        wts[:, :k] = w
        parents.append(p)
        weights.append(wts)
    return np.concatenate(parents), np.concatenate(weights)
