"""Aggregate (multi-block) assembly tests (cf. AggregateElementAssembler)."""

import jax.numpy as jnp
import numpy as np

from fenris_tpu import quadrature as quad
from fenris_tpu.assembly import global_ as G
from fenris_tpu.assembly import local as L
from fenris_tpu.assembly.aggregate import (
    aggregate_csr_pattern,
    assemble_aggregate_csr,
    assemble_aggregate_vector,
)
from fenris_tpu.mesh import procedural
from fenris_tpu.operators import LaplaceOperator
from fenris_tpu.sparse import from_pattern, to_dense


def test_mixed_tri_quad_poisson_matches_dense(rng):
    """A square meshed with quads on the left, triangles on the right,
    sharing the interface nodes — one global Poisson matrix."""
    quads = procedural.create_rectangular_uniform_quad_mesh_2d(
        0.5, 1, 2, 2, (0.0, 1.0)
    )
    # triangles on [0.5, 1] x [0, 1]: build quad mesh then split
    tris = procedural.create_rectangular_uniform_quad_mesh_2d(
        0.5, 1, 2, 2, (0.5, 1.0)
    ).split_into_triangles()
    # merge node spaces with dedup on coordinates
    all_pts = np.concatenate([quads.points, tris.points])
    uniq, inverse = np.unique(np.round(all_pts, 12), axis=0, return_inverse=True)
    qcells = inverse[quads.cells.astype(np.int64)]
    tcells = inverse[tris.cells.astype(np.int64) + quads.num_vertices]
    N = len(uniq)

    agg = aggregate_csr_pattern([qcells, tcells], N, 1)

    op = LaplaceOperator()
    tabq = L.tabulate(quads.element, quad.quadrilateral_gauss(2))
    tabt = L.tabulate(tris.element, quad.total_order.triangle(2))
    Xq = jnp.asarray(uniq[qcells])
    Xt = jnp.asarray(uniq[tcells])
    Aq = L.assemble_element_elliptic_matrices(
        Xq, jnp.zeros((len(qcells), 4, 1)), op, None, tabq
    )
    At = L.assemble_element_elliptic_matrices(
        Xt, jnp.zeros((len(tcells), 3, 1)), op, None, tabt
    )
    values = assemble_aggregate_csr([Aq, At], agg)
    A = np.asarray(to_dense(from_pattern(agg.pattern, values)))

    dense = np.zeros((N, N))
    for cells, mats in ((qcells, np.asarray(Aq)), (tcells, np.asarray(At))):
        for e in range(len(cells)):
            c = cells[e]
            for i in range(len(c)):
                for j in range(len(c)):
                    dense[c[i], c[j]] += mats[e, i, j]
    assert np.abs(A - dense).max() < 1e-13
    # row sums of interior rows vanish for the Laplacian
    interior = np.flatnonzero(
        (uniq[:, 0] > 1e-9) & (uniq[:, 0] < 1 - 1e-9)
        & (uniq[:, 1] > 1e-9) & (uniq[:, 1] < 1 - 1e-9)
    )
    assert np.abs(A[interior].sum(axis=1)).max() < 1e-13


def test_aggregate_vector(rng):
    mesh = procedural.create_unit_square_uniform_tri_mesh_2d(2)
    half = mesh.num_cells // 2
    b1 = rng.standard_normal((half, 3))
    b2 = rng.standard_normal((mesh.num_cells - half, 3))
    dofs = G.element_dof_indices(mesh.cells, 1)
    out = assemble_aggregate_vector(
        [jnp.asarray(b1), jnp.asarray(b2)], [dofs[:half], dofs[half:]], mesh.num_vertices
    )
    ref = np.zeros(mesh.num_vertices)
    np.add.at(ref, dofs.reshape(-1), np.concatenate([b1, b2]).reshape(-1))
    assert np.abs(np.asarray(out) - ref).max() < 1e-12
