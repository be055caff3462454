"""Local + global assembly correctness tests.

Mirrors the reference's FD-identity strategy
(tests/unit_tests/assembly/local/elliptic.rs): with mock nonlinear
operators, the element vector must be the gradient of the element energy
and the element matrix the jacobian of the element vector.  Global
assembly is validated against dense reference accumulation.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu import quadrature as quad
from fenris_tpu.assembly import global_ as G
from fenris_tpu.assembly import local as L
from fenris_tpu.mesh import procedural
from fenris_tpu.operators import EllipticOperator, LaplaceOperator
from fenris_tpu.optimize import approximate_gradient_fd, approximate_jacobian_fd
from fenris_tpu.reference_elements import ELEMENTS


class MockScalarEnergy(EllipticOperator):
    """Nonlinear scalar operator via autodiff (cf. MockScalarEllipticEnergy)."""

    solution_dim = 1
    symmetric = True

    def energy(self, G_, params):
        # smooth, nonlinear, anisotropic
        return jnp.sum(G_**2) + jnp.sum(G_**4) + 0.5 * G_[0, 0] * jnp.sum(G_)


class MockVectorEnergy(EllipticOperator):
    """Nonlinear vector-valued operator (s = 2 in 2D)."""

    solution_dim = 2
    symmetric = True

    def energy(self, G_, params):
        return jnp.sum(G_**2) + jnp.sum(jnp.sin(G_)) + (jnp.trace(G_) ** 2)


def _random_element(name, rng, scale=0.15):
    el = ELEMENTS[name]
    # perturbed reference element (stays invertible for small scale)
    X = el.nodes + rng.uniform(-scale, scale, size=el.nodes.shape)
    geo = el.geometry
    return el, jnp.asarray(X[None, : geo.num_nodes, :])


@pytest.mark.parametrize("name", ["tri3", "quad4", "tri6", "tet4", "hex8"])
@pytest.mark.parametrize("opcls", [MockScalarEnergy, MockVectorEnergy])
def test_vector_is_gradient_of_energy(name, opcls, rng):
    el = ELEMENTS[name]
    if opcls is MockVectorEnergy and el.ref_dim != 2:
        pytest.skip("mock vector operator is 2D")
    op = opcls()
    s = op.solution_dim
    rule = quad.total_order.for_domain(el.domain, 4)
    tab = L.tabulate(el, rule)
    _, X = _random_element(name, rng)
    # pad X to geometry nodes only; u over all nodes
    u = rng.uniform(-0.3, 0.3, size=(1, el.num_nodes, s))

    def energy_of(u_flat):
        ue = jnp.asarray(u_flat.reshape(1, el.num_nodes, s))
        return float(
            jnp.sum(L.compute_element_elliptic_energy(X, ue, op, None, tab))
        )

    vec = np.asarray(
        L.assemble_element_elliptic_vectors(X, jnp.asarray(u), op, None, tab)
    )[0]
    fd_grad = approximate_gradient_fd(energy_of, u.reshape(-1), h=1e-6)
    assert np.abs(vec - fd_grad).max() < 1e-5 * max(1.0, np.abs(vec).max())


@pytest.mark.parametrize("name", ["tri3", "quad4", "tet4"])
@pytest.mark.parametrize("opcls", [MockScalarEnergy, MockVectorEnergy])
def test_matrix_is_jacobian_of_vector(name, opcls, rng):
    el = ELEMENTS[name]
    if opcls is MockVectorEnergy and el.ref_dim != 2:
        pytest.skip("mock vector operator is 2D")
    op = opcls()
    s = op.solution_dim
    rule = quad.total_order.for_domain(el.domain, 4)
    tab = L.tabulate(el, rule)
    _, X = _random_element(name, rng)
    u = rng.uniform(-0.3, 0.3, size=(1, el.num_nodes, s))

    def vector_of(u_flat):
        ue = jnp.asarray(u_flat.reshape(1, el.num_nodes, s))
        return np.asarray(
            L.assemble_element_elliptic_vectors(X, ue, op, None, tab)
        )[0]

    mat = np.asarray(
        L.assemble_element_elliptic_matrices(X, jnp.asarray(u), op, None, tab)
    )[0]
    fd_jac = approximate_jacobian_fd(vector_of, u.reshape(-1), h=1e-6)
    assert np.abs(mat - fd_jac).max() < 1e-5 * max(1.0, np.abs(mat).max())


def test_laplace_stiffness_exact_tri3():
    """P1 stiffness on the reference triangle has a known closed form."""
    el = ELEMENTS["tri3"]
    tab = L.tabulate(el, quad.total_order.triangle(2))
    X = jnp.asarray(el.nodes[None])
    u0 = jnp.zeros((1, 3, 1))
    A = np.asarray(
        L.assemble_element_elliptic_matrices(X, u0, LaplaceOperator(), None, tab)
    )[0]
    # gradients: phi0 = (-x-y)/2 -> grad (-1/2, -1/2), phi1 x/2, phi2 y/2;
    # area = 2 -> A_ij = area * grad_i . grad_j
    grads = np.array([[-0.5, -0.5], [0.5, 0.0], [0.0, 0.5]])
    A_exact = 2.0 * grads @ grads.T
    assert np.abs(A - A_exact).max() < 1e-14


def test_mass_matrix_exact_reference_quad():
    el = ELEMENTS["quad4"]
    tab = L.tabulate(el, quad.quadrilateral_gauss(2))
    X = jnp.asarray(el.nodes[None])
    M = np.asarray(L.assemble_element_mass_matrices(X, 2.5, 1, tab))[0]
    # On [-1,1]^2 with rho = 2.5: M_ii = rho*(2/3)^2*... use exact bilinear
    # mass matrix: (4/9, 2/9, 1/9 pattern) * rho
    base = np.array(
        [[4, 2, 1, 2], [2, 4, 2, 1], [1, 2, 4, 2], [2, 1, 2, 4]], dtype=float
    ) / 9.0
    assert np.abs(M - 2.5 * base).max() < 1e-13


def test_mass_matrix_vector_valued_block_structure(rng):
    el = ELEMENTS["tri3"]
    tab = L.tabulate(el, quad.total_order.triangle(2))
    X = jnp.asarray(el.nodes[None])
    M1 = np.asarray(L.assemble_element_mass_matrices(X, 1.0, 1, tab))[0]
    M2 = np.asarray(L.assemble_element_mass_matrices(X, 1.0, 2, tab))[0]
    assert M2.shape == (6, 6)
    for i in range(3):
        for j in range(3):
            blk = M2[2 * i : 2 * i + 2, 2 * j : 2 * j + 2]
            assert np.abs(blk - M1[i, j] * np.eye(2)).max() < 1e-14


def test_source_vector_constant_source():
    """Constant source f on any mesh: b_I = f * ∫ φ_I; sums to f * volume."""
    mesh = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    el = mesh.element
    tab = L.tabulate(el, quad.total_order.tetrahedron(2))
    X = jnp.asarray(mesh.cell_points())
    b_el = L.assemble_element_source_vectors(
        X, lambda x, p: jnp.array([3.0]), None, 1, tab
    )
    dofs = G.element_dof_indices(mesh.cells, 1)
    b = G.assemble_vector(b_el, jnp.asarray(dofs), mesh.num_vertices)
    assert abs(float(jnp.sum(b)) - 3.0) < 1e-12  # 3 * unit volume


def test_global_csr_matches_dense_accumulation(rng):
    mesh = procedural.create_unit_square_uniform_tri_mesh_2d(3)
    el = mesh.element
    tab = L.tabulate(el, quad.total_order.triangle(2))
    X = jnp.asarray(mesh.cell_points())
    u0 = jnp.zeros((mesh.num_cells, 3, 1))
    A_el = np.asarray(
        L.assemble_element_elliptic_matrices(X, u0, LaplaceOperator(), None, tab)
    )
    pat = G.csr_pattern(mesh.cells, mesh.num_vertices, 1)
    vals = np.asarray(G.assemble_csr(jnp.asarray(A_el), pat))
    # dense reference accumulation
    N = mesh.num_vertices
    dense = np.zeros((N, N))
    for e in range(mesh.num_cells):
        c = mesh.cells[e]
        for i in range(3):
            for j in range(3):
                dense[c[i], c[j]] += A_el[e, i, j]
    from fenris_tpu.sparse import from_pattern, to_dense

    A = np.asarray(to_dense(from_pattern(pat, jnp.asarray(vals))))
    assert np.abs(A - dense).max() < 1e-13


def test_global_csr_vector_valued(rng):
    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(2)
    s = 2
    E, n = mesh.num_cells, 4
    A_el = rng.standard_normal((E, n * s, n * s))
    pat = G.csr_pattern(mesh.cells, mesh.num_vertices, s)
    vals = np.asarray(G.assemble_csr(jnp.asarray(A_el), pat))
    N = mesh.num_vertices * s
    dense = np.zeros((N, N))
    dofs = G.element_dof_indices(mesh.cells, s)
    for e in range(E):
        for a in range(n * s):
            for b in range(n * s):
                dense[dofs[e, a], dofs[e, b]] += A_el[e, a, b]
    from fenris_tpu.sparse import from_pattern, to_dense

    A = np.asarray(to_dense(from_pattern(pat, jnp.asarray(vals))))
    assert np.abs(A - dense).max() < 1e-12


def test_dirichlet_bc_symmetric_elimination(rng):
    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(3)
    tab = L.tabulate(mesh.element, quad.quadrilateral_gauss(2))
    X = jnp.asarray(mesh.cell_points())
    u0 = jnp.zeros((mesh.num_cells, 4, 1))
    A_el = L.assemble_element_elliptic_matrices(X, u0, LaplaceOperator(), None, tab)
    pat = G.csr_pattern(mesh.cells, mesh.num_vertices, 1)
    vals = G.assemble_csr(A_el, pat)
    nodes = mesh.find_boundary_vertices()
    vals_bc = np.asarray(G.apply_homogeneous_dirichlet_bc_csr(vals, pat, nodes))
    from fenris_tpu.sparse import from_pattern, to_dense

    A = np.asarray(to_dense(from_pattern(pat, jnp.asarray(vals_bc))))
    # rows/cols zeroed, symmetric, diagonal = scale
    assert np.abs(A - A.T).max() < 1e-14
    scale = np.asarray(vals)[pat.diag_positions[np.flatnonzero(np.asarray(vals)[pat.diag_positions] != 0)[0]]]
    for nd in nodes:
        row = A[nd].copy()
        row[nd] = 0.0
        assert np.abs(row).max() == 0.0
        assert A[nd, nd] == abs(scale)


def test_chunked_scatter_matches_unchunked(rng):
    mesh = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    E, n = mesh.num_cells, 4
    A_el = jnp.asarray(rng.standard_normal((E, n, n)))
    pat = G.csr_pattern(mesh.cells, mesh.num_vertices, 1)
    v1 = np.asarray(G.assemble_csr(A_el, pat, num_chunks=1))
    v2 = np.asarray(G.assemble_csr(A_el, pat, num_chunks=7))
    assert np.abs(v1 - v2).max() < 1e-12


def test_chunked_element_matrices_match_unchunked(rng):
    """chunk= bounds TPU memory; must not change values (incl. per-el params)."""
    from fenris_tpu.fem import FemSpace
    from fenris_tpu.quadrature.canonical import canonical_stiffness
    from fenris_tpu.solid import (
        LameParameters,
        MaterialEllipticOperator,
        NeoHookeanMaterial,
    )

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(3)  # 27 elements
    space = FemSpace.create(mesh)
    op = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    E, n = mesh.num_cells, mesh.element.num_nodes
    params = LameParameters(
        mu=jnp.asarray(rng.uniform(300.0, 400.0, E)),  # per-element leaf
        lam=jnp.asarray(576.9),
    )
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    u = jnp.asarray(rng.uniform(-0.01, 0.01, size=(E, n, 3)))
    A0 = np.asarray(
        L.assemble_element_elliptic_matrices(space.X_geo, u, op, params, tab)
    )
    # chunk=4 does not divide 27: exercises the repeated-element padding tail
    A1 = np.asarray(
        L.assemble_element_elliptic_matrices(
            space.X_geo, u, op, params, tab, chunk=4
        )
    )
    # reduction-order roundoff only (XLA fuses the two programs differently)
    assert np.abs(A0 - A1).max() < 1e-12 * np.abs(A0).max()


def test_surface_traction_load():
    """Traction on the top face of a cube: total load = traction * area."""
    import jax.numpy as jnp

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    surf = mesh.boundary_mesh()
    # keep only the z = 1 faces
    top = np.flatnonzero(
        (np.abs(mesh.points[surf.cells][:, :, 2] - 1.0) < 1e-12).all(axis=1)
    )
    faces = surf.cells[top]
    tab = L.tabulate(surf.element, quad.quadrilateral_gauss(2))
    X = jnp.asarray(mesh.points[faces])
    traction = np.array([0.0, 0.0, -7.5])
    b_el = L.assemble_element_surface_source_vectors(
        X, lambda x, p: jnp.asarray(traction, dtype=x.dtype), None, 3, tab
    )
    dofs = G.element_dof_indices(faces, 3)
    b = G.assemble_vector(b_el, jnp.asarray(dofs), mesh.num_vertices * 3)
    totals = np.asarray(b).reshape(-1, 3).sum(axis=0)
    assert np.abs(totals - traction).max() < 1e-12  # area = 1
    # load only on top-face nodes
    loaded = np.flatnonzero(np.abs(np.asarray(b)) > 1e-14) // 3
    assert (np.abs(mesh.points[np.unique(loaded), 2] - 1.0) < 1e-12).all()


@pytest.mark.parametrize("upresent", [False, True])
def test_mxu_layout_matches_einsum(upresent, rng):
    """The MXU-reassociated matrix assembly == the direct einsum path.

    Covers scalar, per-element, and per-(element, point) parameter leaves
    and both vector-valued (Neo-Hookean) and scalar (Laplace) operators.
    """
    from fenris_tpu.fem import FemSpace
    from fenris_tpu.mesh.convert import convert_mesh
    from fenris_tpu.quadrature.canonical import canonical_stiffness
    from fenris_tpu.solid import (
        LameParameters,
        MaterialEllipticOperator,
        NeoHookeanMaterial,
    )

    mesh = convert_mesh(procedural.create_unit_box_uniform_hex_mesh_3d(2), "hex20")
    space = FemSpace.create(mesh)
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    E, n = mesh.num_cells, mesh.element.num_nodes
    mop = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    u = jnp.asarray(rng.standard_normal((E, n, 3)) * 0.01) if upresent else None
    for params in [
        LameParameters(mu=384.0, lam=577.0),
        LameParameters(
            mu=jnp.asarray(rng.uniform(300, 400, E)),
            lam=jnp.asarray(rng.uniform(500, 600, E)),
        ),
        LameParameters(
            mu=jnp.asarray(rng.uniform(300, 400, (E, tab.num_points))), lam=577.0
        ),
    ]:
        A1 = L.assemble_element_elliptic_matrices(
            space.X_geo, u, mop, params, tab, layout="einsum"
        )
        A2 = L.assemble_element_elliptic_matrices(
            space.X_geo, u, mop, params, tab, layout="mxu"
        )
        np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), rtol=5e-13, atol=1e-13)

    # scalar operator (s=1, d=2)
    qmesh = procedural.create_unit_square_uniform_quad_mesh_2d(3)
    qtab = L.tabulate(qmesh.element, quad.quadrilateral_gauss(2))
    X = jnp.asarray(qmesh.cell_points())
    A1 = L.assemble_element_elliptic_matrices(X, None, LaplaceOperator(), None, qtab, layout="einsum")
    A2 = L.assemble_element_elliptic_matrices(X, None, LaplaceOperator(), None, qtab, layout="mxu")
    np.testing.assert_allclose(np.asarray(A1), np.asarray(A2), rtol=1e-13, atol=1e-15)


@pytest.mark.parametrize("upresent", [False, True])
def test_element_matrices_em_layout_matches(upresent, rng):
    """assemble_element_elliptic_matrices_em == the [E, ns, ns] assembler
    transposed (same MXU reassociation, element-minor output)."""
    from fenris_tpu.fem import FemSpace
    from fenris_tpu.quadrature.canonical import canonical_stiffness
    from fenris_tpu.solid import (
        LameParameters,
        MaterialEllipticOperator,
        NeoHookeanMaterial,
    )

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(3)
    mop = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    params = LameParameters(mu=384.0, lam=577.0)
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    space = FemSpace.create(mesh)
    u = (
        jnp.asarray(rng.uniform(-1e-3, 1e-3, (mesh.num_cells, 8, 3)))
        if upresent
        else None
    )
    A = L.assemble_element_elliptic_matrices(
        space.X_geo, u, mop, params, tab, layout="mxu"
    )
    A_em = L.assemble_element_elliptic_matrices_em(space.X_geo, u, mop, params, tab)
    np.testing.assert_allclose(
        np.asarray(A_em), np.transpose(np.asarray(A), (1, 2, 0)), rtol=1e-12, atol=1e-12
    )
    # component-pair layout [(i, j), (a, b), E]: same values reordered
    E, n, s = mesh.num_cells, 8, 3
    R = L.assemble_element_elliptic_matrices_pairs(space.X_geo, u, mop, params, tab)
    R_ref = np.transpose(
        np.asarray(A).reshape(E, n, s, n, s), (2, 4, 1, 3, 0)
    ).reshape(s * s, n * n, E)
    np.testing.assert_allclose(np.asarray(R), R_ref, rtol=1e-12, atol=1e-12)


def test_affine_constant_contraction_fast_path(rng):
    """Linear operators on affine (simplex) elements take the q-hoisted
    fast path (local._elliptic_matrices_affine_const) and match the
    general MXU path exactly; non-affine / per-qp-param cases fall back."""
    from fenris_tpu.mesh.convert import convert_mesh
    from fenris_tpu.quadrature.canonical import canonical_stiffness
    from fenris_tpu.solid import (
        LameParameters,
        LinearElasticMaterial,
        MaterialEllipticOperator,
        NeoHookeanMaterial,
    )

    mesh = convert_mesh(
        procedural.create_rectangular_uniform_tet_mesh(1.0, 1, 1, 1, 3), "tet10"
    )
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    assert L._affine_geometry(tab)
    E, n = mesh.num_cells, mesh.element.num_nodes
    # distorted geometry: per-element jacobians all differ
    from fenris_tpu.fem import FemSpace

    Xg0 = FemSpace.create(mesh).X_geo  # [E, m, 3] corner geometry
    Xg = jnp.asarray(
        np.asarray(Xg0) + 0.03 * rng.standard_normal(Xg0.shape)
    )
    mop = MaterialEllipticOperator(LinearElasticMaterial(), dim=3)
    assert mop.constant_contraction
    u = jnp.asarray(0.01 * rng.standard_normal((E, n, 3)))
    for params in [
        LameParameters(mu=384.0, lam=577.0),
        LameParameters(
            mu=jnp.asarray(rng.uniform(300, 400, E)),
            lam=jnp.asarray(rng.uniform(500, 600, E)),
        ),
    ]:
        A_fast = L._elliptic_matrices_affine_const(Xg, u, mop, params, tab, "e")
        A_gen = L._elliptic_matrices_mxu(Xg, u, mop, params, tab)
        # reduction-order roundoff only (the q-hoist reassociates sums)
        np.testing.assert_allclose(
            np.asarray(A_fast), np.asarray(A_gen), rtol=1e-10, atol=1e-12
        )
        # the public entry dispatches to the fast path for these inputs
        A_pub = L.assemble_element_elliptic_matrices(Xg, u, mop, params, tab)
        np.testing.assert_array_equal(np.asarray(A_pub), np.asarray(A_fast))
    # element-minor entry: same dispatch, transposed layout
    A_em = L.assemble_element_elliptic_matrices_em(
        Xg, u, mop, LameParameters(mu=384.0, lam=577.0), tab
    )
    A_e = L._elliptic_matrices_affine_const(
        Xg, u, mop, LameParameters(mu=384.0, lam=577.0), tab, "e"
    )
    np.testing.assert_allclose(
        np.asarray(A_em), np.transpose(np.asarray(A_e), (1, 2, 0)), rtol=1e-12, atol=1e-13
    )
    # per-ELEMENT params: the element-batched D branch (not the unbatched
    # scalar-D fold) must produce the same integrals as the einsum path
    pe = LameParameters(mu=jnp.asarray(rng.uniform(300, 400, E)), lam=577.0)
    A_pe1 = L.assemble_element_elliptic_matrices(Xg, u, mop, pe, tab, layout="einsum")
    A_pe2 = L.assemble_element_elliptic_matrices(Xg, u, mop, pe, tab, layout="mxu")
    np.testing.assert_allclose(
        np.asarray(A_pe1), np.asarray(A_pe2), rtol=5e-13, atol=1e-13
    )
    # per-qp params must NOT take the fast path (D would vary per point)
    pq = LameParameters(
        mu=jnp.asarray(rng.uniform(300, 400, (E, tab.num_points))), lam=577.0
    )
    assert L._has_per_point_params(pq, E, tab.num_points)
    A_q1 = L.assemble_element_elliptic_matrices(Xg, u, mop, pq, tab, layout="einsum")
    A_q2 = L.assemble_element_elliptic_matrices(Xg, u, mop, pq, tab, layout="mxu")
    np.testing.assert_allclose(np.asarray(A_q1), np.asarray(A_q2), rtol=5e-13, atol=1e-13)
    # nonlinear material: constant_contraction must be False
    nh = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    assert not nh.constant_contraction
    # non-affine geometry (hex) is detected
    hmesh = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    htab = L.tabulate(hmesh.element, canonical_stiffness(hmesh.element))
    assert not L._affine_geometry(htab)
