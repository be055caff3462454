"""Order elevation / element-type conversion between meshes.

Parity: src/mesh_convert.rs — Tri3→Tri6 (:332), Quad4→Quad9 (:385),
Tet4→Tet10 (:42), Hex8→Hex20 (:168), Hex8→Hex27 (:85), Tet4→Tet20 (:659).

Design: one generic algorithm instead of per-pair hand-written rules.  Each
node of the target element has exact rational interpolation weights over the
source element's corner vertices (the target's reference nodes evaluated in
the source's linear geometry basis).  A new global node is keyed by its
multiset of ``(global parent vertex, weight)`` pairs — orientation
independent, so shared edge/face nodes dedup exactly (this subsumes the
reference's (child-index, sorted-parents) labels and the Tet20 edge-flip
normalization in mesh_convert.rs:684-691).
"""

from __future__ import annotations

from fractions import Fraction
from functools import lru_cache
from typing import Tuple

import numpy as np

from ..reference_elements import ELEMENTS, ReferenceElement, element
from . import Mesh

__all__ = ["convert_mesh"]

_ALLOWED = {
    ("tri3", "tri6"),
    ("quad4", "quad8"),
    ("quad4", "quad9"),
    ("tet4", "tet10"),
    ("tet4", "tet20"),
    ("hex8", "hex20"),
    ("hex8", "hex27"),
}


@lru_cache(maxsize=None)
def _node_parent_weights(src_name: str, tgt_name: str):
    """Per target node: (local corner indices, rational weights).

    Returns a list of length ``n_tgt`` of ``(locals, weights)`` with
    ``weights`` as ``Fraction`` tuples summing to 1.
    """
    src, tgt = ELEMENTS[src_name], ELEMENTS[tgt_name]
    phi, _ = src.tabulate(tgt.nodes)  # [n_t, n_src] float
    out = []
    for t in range(tgt.num_nodes):
        locals_, weights = [], []
        for c in range(src.num_nodes):
            w = Fraction(float(phi[t, c])).limit_denominator(3**6 * 2**10)
            if w != 0:
                assert abs(float(w) - phi[t, c]) < 1e-12
                locals_.append(c)
                weights.append(w)
        assert sum(weights) == 1
        out.append((tuple(locals_), tuple(weights)))
    return tuple(out)


def convert_mesh(mesh: Mesh, target) -> Mesh:
    """Elevate ``mesh`` to the given higher-order element type.

    New vertices (edge/face/interior nodes) are appended after deduplication
    across shared edges/faces; original corner vertices keep their indices.
    """
    tgt = element(target) if isinstance(target, str) else target
    src = mesh.element
    if (src.name, tgt.name) not in _ALLOWED:
        raise ValueError(f"unsupported conversion {src.name} -> {tgt.name}")

    pw = _node_parent_weights(src.name, tgt.name)
    E = mesh.num_cells
    n_t = tgt.num_nodes

    # Encode each (parents, weights) pair set as a fixed-width integer key
    # row: interleaved (global_parent, weight_id) sorted by global parent,
    # padded with (-1, -1).
    weight_ids: dict[Tuple[Fraction, ...], int] = {}
    max_p = max(len(ls) for ls, _ in pw)

    keys = np.full((E, n_t, 2 * max_p), -1, dtype=np.int64)
    coords = np.zeros((E, n_t, mesh.dim))
    pts = mesh.points
    for t, (ls, ws) in enumerate(pw):
        parents = mesh.cells[:, list(ls)].astype(np.int64)  # [E, p]
        worder = np.argsort(parents, axis=1, kind="stable")
        parents_sorted = np.take_along_axis(parents, worder, axis=1)
        # weights permuted consistently; map each permutation of ws to an id
        wmat = np.array([float(w) for w in ws])[None, :].repeat(E, 0)
        wsorted = np.take_along_axis(wmat, worder, axis=1)
        # quantize weights exactly (weights are from a tiny rational set)
        wq = np.round(wsorted * (3**6 * 2**10)).astype(np.int64)
        keys[:, t, 0 : 2 * len(ls) : 2] = parents_sorted
        keys[:, t, 1 : 2 * len(ls) : 2] = wq
        coords[:, t, :] = np.einsum("ep,epd->ed", wsorted, pts[parents_sorted, :])

    flat_keys = keys.reshape(E * n_t, -1)
    uniq, inverse = np.unique(flat_keys, axis=0, return_inverse=True)

    # Assign final indices: original vertices first (in their original
    # order, matching the reference's Tri6/Quad9/Tet10 conversions), then
    # new nodes in order of first appearance.
    is_vertex_key = (uniq[:, 2] == -1) if uniq.shape[1] > 2 else np.ones(len(uniq), bool)
    final_index = np.empty(len(uniq), dtype=np.int64)
    # vertex keys: (gid, W, -1, ...) keep gid
    final_index[is_vertex_key] = uniq[is_vertex_key, 0]
    n_orig = mesh.num_vertices
    new_ids = np.flatnonzero(~is_vertex_key)
    # order new nodes by first appearance in the flattened cell stream
    first_occurrence = np.full(len(uniq), np.iinfo(np.int64).max)
    np.minimum.at(first_occurrence, inverse, np.arange(len(inverse)))
    order = new_ids[np.argsort(first_occurrence[new_ids], kind="stable")]
    final_index[order] = n_orig + np.arange(len(order))

    num_final = n_orig + len(new_ids)
    new_points = np.zeros((num_final, mesh.dim))
    new_points[:n_orig] = pts
    flat_coords = coords.reshape(E * n_t, mesh.dim)
    new_points[final_index[inverse]] = flat_coords  # idempotent per key

    new_cells = final_index[inverse].reshape(E, n_t).astype(np.int32)
    return Mesh(new_points, new_cells, tgt)
