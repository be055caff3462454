"""Sparse algebra and CG solver tests (cf. fenris-sparse/tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.assembly import global_ as G
from fenris_tpu.sparse import CsrMatrix, from_pattern, spmv, to_dense
from fenris_tpu.sparse.cg import (
    CG_CONVERGED,
    CG_INDEFINITE_OPERATOR,
    CG_MAX_ITER,
    conjugate_gradient,
)


def random_csr(rng, n=40, density=0.2):
    dense = rng.standard_normal((n, n)) * (rng.uniform(size=(n, n)) < density)
    np.fill_diagonal(dense, rng.uniform(1, 2, size=n))
    rows, cols = np.nonzero(dense)
    order = np.lexsort((cols, rows))
    rows, cols = rows[order], cols[order]
    row_ptr = np.searchsorted(rows, np.arange(n + 1))
    return (
        CsrMatrix(
            row_ptr=jnp.asarray(row_ptr),
            col_indices=jnp.asarray(cols.astype(np.int32)),
            values=jnp.asarray(dense[rows, cols]),
            shape=(n, n),
        ),
        dense,
    )


def test_spmv_matches_dense(rng):
    A, dense = random_csr(rng)
    v = rng.standard_normal(dense.shape[0])
    assert np.abs(np.asarray(spmv(A, jnp.asarray(v))) - dense @ v).max() < 1e-12


def test_to_dense_roundtrip(rng):
    A, dense = random_csr(rng)
    assert np.abs(np.asarray(to_dense(A)) - dense).max() == 0.0


def test_diagonal(rng):
    A, dense = random_csr(rng)
    assert np.abs(np.asarray(A.diagonal()) - np.diag(dense)).max() == 0.0


def _spd_csr(rng, n=60):
    B = rng.standard_normal((n, n))
    dense = B @ B.T + n * np.eye(n)
    rows, cols = np.nonzero(dense)
    row_ptr = np.searchsorted(rows, np.arange(n + 1))
    return (
        CsrMatrix(
            row_ptr=jnp.asarray(row_ptr),
            col_indices=jnp.asarray(cols.astype(np.int32)),
            values=jnp.asarray(dense[rows, cols]),
            shape=(n, n),
        ),
        dense,
    )


def test_cg_solves_spd_system(rng):
    A, dense = _spd_csr(rng)
    x_true = rng.standard_normal(dense.shape[0])
    b = jnp.asarray(dense @ x_true)
    res = conjugate_gradient(A, b, rel_tolerance=1e-12, max_iter=1000)
    assert int(res.status) == CG_CONVERGED
    assert np.abs(np.asarray(res.x) - x_true).max() < 1e-8


def test_cg_preconditioned_converges_faster(rng):
    n = 80
    # badly scaled SPD diagonal-dominant system
    scales = 10.0 ** rng.uniform(-3, 3, size=n)
    B = rng.standard_normal((n, n)) * 0.1
    dense = np.diag(scales) + B @ B.T * 1e-3
    dense = (dense + dense.T) / 2
    A = jnp.asarray(dense)
    b = jnp.asarray(rng.standard_normal(n))
    op = lambda v: A @ v
    res_plain = conjugate_gradient(op, b, rel_tolerance=1e-10, max_iter=2000)
    inv_diag = 1.0 / jnp.diag(A)
    res_prec = conjugate_gradient(
        op, b, preconditioner=lambda v: inv_diag * v, rel_tolerance=1e-10, max_iter=2000
    )
    assert int(res_prec.status) == CG_CONVERGED
    assert int(res_prec.num_iterations) <= int(res_plain.num_iterations)


def test_cg_matrix_free_operator(rng):
    n = 50
    d = jnp.asarray(rng.uniform(1, 5, size=n))
    op = lambda v: d * v  # diagonal SPD operator, matrix-free
    b = jnp.asarray(rng.standard_normal(n))
    res = conjugate_gradient(op, b, rel_tolerance=1e-14, max_iter=200)
    assert int(res.status) == CG_CONVERGED
    assert np.abs(np.asarray(res.x) - np.asarray(b / d)).max() < 1e-10


def test_cg_indefinite_operator_detected(rng):
    n = 20
    vals = np.ones(n)
    vals[3] = -1.0  # indefinite diagonal
    op = lambda v: jnp.asarray(vals) * v
    b = jnp.asarray(rng.standard_normal(n))
    res = conjugate_gradient(op, b, rel_tolerance=1e-14, max_iter=200)
    assert int(res.status) in (CG_INDEFINITE_OPERATOR, CG_MAX_ITER)


def test_cg_max_iterations(rng):
    A, dense = _spd_csr(rng)
    b = jnp.asarray(rng.standard_normal(dense.shape[0]))
    res = conjugate_gradient(A, b, rel_tolerance=1e-14, max_iter=2)
    assert int(res.status) == CG_MAX_ITER
    assert int(res.num_iterations) == 2


def test_cg_zero_rhs():
    n = 10
    op = lambda v: 2.0 * v
    res = conjugate_gradient(op, jnp.zeros(n), rel_tolerance=1e-10)
    assert int(res.status) == CG_CONVERGED
    assert int(res.num_iterations) == 0
    assert np.abs(np.asarray(res.x)).max() == 0.0


def test_block_ell_matches_csr_spmv(rng):
    """Block-ELL matvec == CSR SpMV on an assembled elasticity Hessian."""
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.sparse import from_pattern, spmv
    from fenris_tpu.sparse.block_ell import block_ell_from_csr

    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=np.arange(25),
    )
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    values = model.assemble_hessian_csr(u)
    csr = from_pattern(model.space.pattern, values)
    ell = block_ell_from_csr(model.space.pattern, values)
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    np.testing.assert_allclose(
        np.asarray(ell @ v), np.asarray(spmv(csr, v)), rtol=1e-12, atol=1e-12
    )


def test_block_ell_scalar_poisson(rng):
    """s = 1 block-ELL (Poisson stiffness) == CSR SpMV."""
    import jax.numpy as jnp

    from fenris_tpu import quadrature as quad
    from fenris_tpu.assembly import global_ as G
    from fenris_tpu.assembly import local as L
    from fenris_tpu.mesh.procedural import create_unit_square_uniform_quad_mesh_2d
    from fenris_tpu.operators import LaplaceOperator
    from fenris_tpu.sparse import from_pattern, spmv
    from fenris_tpu.sparse.block_ell import block_ell_from_csr

    mesh = create_unit_square_uniform_quad_mesh_2d(7)
    tab = L.tabulate(mesh.element, quad.quadrilateral_gauss(2))
    X = jnp.asarray(mesh.cell_points())
    A_el = L.assemble_element_elliptic_matrices(X, None, LaplaceOperator(), None, tab)
    pattern = G.csr_pattern(np.asarray(mesh.cells), mesh.num_vertices, 1)
    values = G.assemble_csr(A_el, pattern)
    csr = from_pattern(pattern, values)
    ell = block_ell_from_csr(pattern, values)
    v = jnp.asarray(rng.standard_normal(mesh.num_vertices))
    np.testing.assert_allclose(
        np.asarray(ell @ v), np.asarray(spmv(csr, v)), rtol=1e-12, atol=1e-13
    )


def test_cg_host_loop_matches_device_loop(rng):
    """host_loop=True runs the same algorithm as the jitted while_loop:
    identical iterate, iteration count, and status taxonomy."""
    n = 70
    B = rng.standard_normal((n, n))
    dense = B @ B.T + n * np.eye(n)
    A = jnp.asarray(dense)
    b = jnp.asarray(rng.standard_normal(n))
    op = lambda v: A @ v
    inv_diag = 1.0 / jnp.diag(A)
    prec = lambda v: inv_diag * v
    dev = conjugate_gradient(op, b, preconditioner=prec, rel_tolerance=1e-11)
    host = conjugate_gradient(
        op, b, preconditioner=prec, rel_tolerance=1e-11, host_loop=True
    )
    assert int(host.status) == CG_CONVERGED
    assert int(host.num_iterations) == int(dev.num_iterations)
    np.testing.assert_allclose(np.asarray(host.x), np.asarray(dev.x), rtol=0, atol=0)

    # status taxonomy: max-iter cap, indefinite operator, converged x0
    capped = conjugate_gradient(op, b, rel_tolerance=1e-15, max_iter=4, host_loop=True)
    assert int(capped.status) == CG_MAX_ITER and int(capped.num_iterations) == 4
    indef = conjugate_gradient(lambda v: -(A @ v), b, host_loop=True)
    assert int(indef.status) == CG_INDEFINITE_OPERATOR
    trivial = conjugate_gradient(op, jnp.zeros(n), host_loop=True)
    assert int(trivial.status) == CG_CONVERGED and int(trivial.num_iterations) == 0


def test_solve_mixed_host_loop_agrees(rng):
    """solve_mixed(cg_host_loop=True) matches the device-loop solve."""
    import jax

    if not jax.config.jax_enable_x64:
        import pytest

        pytest.skip("requires x64")
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.structured import StructuredHyperelasticModel

    nodes = 9 * 9 * 9
    mask = np.zeros(nodes * 3, dtype=bool)
    mask[: 81 * 3] = True
    model = StructuredHyperelasticModel(
        cells=(8, 8, 8),
        spacing=1.0 / 8,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        dirichlet_mask=mask,
        body_force=np.array([0.0, 0.0, -4.0]),
        dtype=jnp.float32,
    )
    r_dev = model.solve_mixed(tolerance=1e-10, cg_host_loop=False)
    r_host = model.solve_mixed(tolerance=1e-10, cg_host_loop=True)
    assert int(r_host.status) == int(r_dev.status)
    nd = np.linalg.norm(np.asarray(r_dev.x))
    assert np.linalg.norm(np.asarray(r_host.x) - np.asarray(r_dev.x)) <= 1e-9 * nd


def test_host_loop_validate_operator_catches_bad_program(rng):
    """conjugate_gradient(validate_operator=True) probes the compiled
    operator against its eager evaluation and falls back to eager on
    mismatch (the XLA:TPU fusion-miscompile guard; CLAUDE.md).  An
    operator whose traced behavior differs from its eager behavior stands
    in for a miscompiled program."""
    import warnings

    import jax.core

    n = 48
    Q = rng.standard_normal((n, n))
    A = jnp.asarray(Q @ Q.T + n * np.eye(n), jnp.float32)
    b = jnp.asarray(rng.standard_normal(n), jnp.float32)

    # consistent operator: no warning
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        res = conjugate_gradient(
            lambda v: A @ v, b, rel_tolerance=1e-5,
            host_loop=True, validate_operator=True,
        )
    assert int(res.status) == CG_CONVERGED

    def inconsistent(v):
        if isinstance(v, jax.core.Tracer):  # the compiled program is wrong
            return 2.0 * (A @ v)
        return A @ v

    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        res2 = conjugate_gradient(
            inconsistent, b, rel_tolerance=1e-5,
            host_loop=True, validate_operator=True,
        )
    assert any("disagrees" in str(x.message) for x in w)
    assert int(res2.status) == CG_CONVERGED  # eager fallback still solves
    x_ref = np.linalg.solve(np.asarray(A, np.float64), np.asarray(b, np.float64))
    assert np.linalg.norm(np.asarray(res2.x) - x_ref) < 1e-3 * np.linalg.norm(x_ref)


def test_block_dia_matches_csr_spmv(rng):
    """Block-DIA matvec == CSR SpMV on an assembled elasticity Hessian.

    The uniform hex mesh (node-major ordering) has exactly 27 node-offset
    diagonals, so the remainder must be empty.
    """
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.sparse import from_pattern, spmv
    from fenris_tpu.sparse.block_dia import block_dia_from_csr

    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=np.arange(25),
    )
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    values = model.assemble_hessian_csr(u)
    csr = from_pattern(model.space.pattern, values)
    dia = block_dia_from_csr(model.space.pattern, values)
    assert dia.num_diagonals == 27
    assert dia.remainder is None
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    np.testing.assert_allclose(
        np.asarray(dia @ v), np.asarray(spmv(csr, v)), rtol=1e-12, atol=1e-12
    )


def test_block_dia_remainder_spill(rng):
    """Capped diagonals spill to the ELL remainder; result stays exact.

    A random node permutation destroys the diagonal structure, so with
    max_diagonals small most entries must go through the remainder path.
    """
    import jax.numpy as jnp

    from fenris_tpu import quadrature as quad
    from fenris_tpu.assembly import global_ as G
    from fenris_tpu.assembly import local as L
    from fenris_tpu.mesh import Mesh
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.operators import LaplaceOperator
    from fenris_tpu.sparse import from_pattern, spmv
    from fenris_tpu.sparse.block_dia import block_dia_from_csr

    base = create_unit_box_uniform_hex_mesh_3d(3)
    perm = rng.permutation(base.num_vertices)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(base.num_vertices)
    mesh = Mesh(
        points=np.asarray(base.points)[perm],
        cells=inv[np.asarray(base.cells)],
        element=base.element,
    )
    tab = L.tabulate(mesh.element, quad.hexahedron_gauss(2))
    X = jnp.asarray(mesh.cell_points())
    A_el = L.assemble_element_elliptic_matrices(X, None, LaplaceOperator(), None, tab)
    pattern = G.csr_pattern(np.asarray(mesh.cells), mesh.num_vertices, 1)
    values = G.assemble_csr(A_el, pattern)
    csr = from_pattern(pattern, values)
    dia = block_dia_from_csr(pattern, values, max_diagonals=5)
    assert dia.num_diagonals == 5
    assert dia.remainder is not None
    v = jnp.asarray(rng.standard_normal(mesh.num_vertices))
    np.testing.assert_allclose(
        np.asarray(dia @ v), np.asarray(spmv(csr, v)), rtol=1e-12, atol=1e-12
    )


def test_block_dia_direct_assembly_matches_csr_route(rng):
    """assemble_block_dia(plan, A_el) == block_dia_from_csr(assemble_csr).

    The direct element→band segment-sum (no symbolic CSR phase) must land
    every entry on the same slot as the CSR route; values agree exactly up
    to summation order.
    """
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.sparse.block_dia import (
        assemble_block_dia,
        block_dia_assembly_plan,
        block_dia_from_csr,
    )

    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
    )
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    A_el = model.assemble_hessian_matrices(u)
    ref = block_dia_from_csr(
        model.space.pattern, G.assemble_csr(A_el, model.space.pattern)
    )
    plan = block_dia_assembly_plan(np.asarray(mesh.cells), mesh.num_vertices, 3)
    assert plan.rem_k == 0 and plan.offsets == ref.offsets
    m = assemble_block_dia(plan, A_el)
    np.testing.assert_allclose(
        np.asarray(m.bands), np.asarray(ref.bands), rtol=1e-13, atol=1e-13
    )
    # chunked scatter agrees with the single-pass scatter
    m4 = assemble_block_dia(plan, A_el, num_chunks=4)
    np.testing.assert_allclose(
        np.asarray(m4.bands), np.asarray(ref.bands), rtol=1e-13, atol=1e-13
    )


def test_block_dia_plan_cache_is_tracer_safe(rng):
    """First-touching the lazy plan caches under a trace must not poison them.

    Round-3 regression: bench.py first called assemble_hessian_block_dia
    inside a jitted fori_loop body; block_dia_plan/block_dia_expand_plan
    cached tracer-backed arrays, and every later eager call raised
    UnexpectedTracerError.  The caches now build plans under
    jax.ensure_compile_time_eval(), so a jit-first call sequence caches
    concrete arrays and the eager result matches.
    """
    import jax
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(3)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
    )
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)

    # plans are untouched: the first build happens under the jit trace,
    # inside a fori_loop body exactly like the round-3 bench
    assert getattr(model, "_dia_plans", None) is None

    @jax.jit
    def traced(u):
        def body(i, uu):
            m = model.assemble_hessian_block_dia(uu)
            return uu + 1e-20 * m.bands[0, :3].sum()

        return jax.lax.fori_loop(0, 2, body, u)

    _ = traced(u)
    # cached plan leaves must be concrete, never tracers
    for plan in model._dia_plans.values():
        for leaf in jax.tree_util.tree_leaves(plan):
            assert not isinstance(leaf, jax.core.Tracer)
    # ... and the subsequent EAGER call (what raised in round 3) works
    m_eager = model.assemble_hessian_block_dia(u)
    m_fresh = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
    ).assemble_hessian_block_dia(u)
    np.testing.assert_allclose(
        np.asarray(m_eager.bands), np.asarray(m_fresh.bands), rtol=1e-13, atol=1e-13
    )


def test_block_dia_direct_assembly_remainder(rng):
    """Direct assembly with capped diagonals: ELL spill stays exact.

    Oracle: dense scatter of the element matrices on a node-permuted mesh.
    """
    import jax.numpy as jnp

    from fenris_tpu import quadrature as quad
    from fenris_tpu.assembly import local as L
    from fenris_tpu.mesh import Mesh
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.operators import LaplaceOperator
    from fenris_tpu.sparse.block_dia import (
        assemble_block_dia,
        block_dia_assembly_plan,
    )

    base = create_unit_box_uniform_hex_mesh_3d(3)
    perm = rng.permutation(base.num_vertices)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(base.num_vertices)
    mesh = Mesh(
        points=np.asarray(base.points)[perm],
        cells=inv[np.asarray(base.cells)],
        element=base.element,
    )
    tab = L.tabulate(mesh.element, quad.hexahedron_gauss(2))
    X = jnp.asarray(mesh.cell_points())
    A_el = L.assemble_element_elliptic_matrices(X, None, LaplaceOperator(), None, tab)
    N = mesh.num_vertices
    plan = block_dia_assembly_plan(np.asarray(mesh.cells), N, 1, max_diagonals=7)
    assert plan.num_diagonals == 7 and plan.rem_k > 0
    assert 0 in plan.offsets  # Jacobi diagonal always on a band
    m = assemble_block_dia(plan, A_el)
    dense = np.zeros((N, N))
    cells = np.asarray(mesh.cells)
    for e in range(cells.shape[0]):
        dense[np.ix_(cells[e], cells[e])] += np.asarray(A_el[e])
    v = rng.standard_normal(N)
    np.testing.assert_allclose(
        np.asarray(m @ jnp.asarray(v)), dense @ v, rtol=1e-12, atol=1e-12
    )


def test_block_dia_min_fill_spills_sparse_diagonals(rng):
    """min_fill moves sparsely-populated deltas to the remainder."""
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.sparse.block_dia import block_dia_assembly_plan

    mesh = create_unit_box_uniform_hex_mesh_3d(3)
    exact = block_dia_assembly_plan(np.asarray(mesh.cells), mesh.num_vertices, 1)
    assert exact.rem_k == 0
    # demanding near-full bands forces boundary-truncated deltas out
    filtered = block_dia_assembly_plan(
        np.asarray(mesh.cells), mesh.num_vertices, 1, min_fill=0.99
    )
    assert filtered.num_diagonals < exact.num_diagonals
    assert 0 in filtered.offsets
    assert filtered.rem_k > 0


def test_solve_poisson_assembled_matches_csr_route():
    """solve_poisson_assembled (block-DIA, no CSR) == solve_poisson (CSR).

    Same system, same Jacobi-CG; the block-DIA route assembles element
    matrices straight onto bands and masks BCs at the operator level, so
    the converged solutions and error estimates must agree.
    """
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
    import jax.numpy as jnp
    from mms_common import (
        dirichlet_nodes,
        source_2d,
        source_3d,
        u_exact_2d,
        u_exact_3d,
        u_exact_grad_2d,
        u_exact_grad_3d,
    )

    from fenris_tpu import quadrature as quad
    from fenris_tpu.fem import solve_poisson, solve_poisson_assembled
    from fenris_tpu.mesh import procedural

    cases = [
        (
            procedural.create_unit_box_uniform_hex_mesh_3d(6),
            quad.tensor.hexahedron_gauss(2),
            quad.tensor.hexahedron_gauss(4),
            source_3d,
            u_exact_3d,
            u_exact_grad_3d,
        ),
        (
            procedural.create_unit_square_uniform_quad_mesh_2d(8),
            quad.tensor.quadrilateral_gauss(2),
            quad.tensor.quadrilateral_gauss(4),
            source_2d,
            u_exact_2d,
            u_exact_grad_2d,
        ),
    ]
    for mesh, rule, erule, src, ue, ug in cases:
        dn = dirichlet_nodes(mesh)
        r0 = solve_poisson(mesh, rule, erule, src, ue, ug, dn)
        r1 = solve_poisson_assembled(mesh, rule, erule, src, ue, ug, dn)
        np.testing.assert_allclose(np.asarray(r1.u), np.asarray(r0.u), atol=1e-10)
        np.testing.assert_allclose(r1.l2_error, r0.l2_error, rtol=1e-10)
        np.testing.assert_allclose(
            r1.h1_seminorm_error, r0.h1_seminorm_error, rtol=1e-10
        )
        # capped diagonals: the ELL remainder keeps the solve exact
        r2 = solve_poisson_assembled(
            mesh, rule, erule, src, ue, ug, dn, max_diagonals=5
        )
        np.testing.assert_allclose(np.asarray(r2.u), np.asarray(r0.u), atol=1e-10)


def test_band_expand_assembly_matches_flat_scatter(rng):
    """Class-static MXU expansion assembly == flat per-entry scatter.

    A uniform box hex mesh has exactly one slot-signature class (coverage
    1.0), so the fast path handles every element: the expansion + one
    row segment_sum must reproduce the flat scatter to summation-order
    roundoff, chunked and unchunked.
    """
    import jax.numpy as jnp

    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.sparse.block_dia import (
        assemble_block_dia,
        band_expand_plan,
        block_dia_assembly_plan,
    )

    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    cells = np.asarray(mesh.cells)
    plan = block_dia_assembly_plan(cells, mesh.num_vertices, 3)
    ep = band_expand_plan(cells, plan)
    assert ep is not None and ep.num_classes == 1 and ep.coverage == 1.0
    assert ep.slow_idx is None
    E, n = cells.shape
    A_el = jnp.asarray(rng.standard_normal((E, 3 * n, 3 * n)))
    ref = assemble_block_dia(plan, A_el)
    for nc in (1, 3):
        m = assemble_block_dia(plan, A_el, num_chunks=nc, expand=ep)
        np.testing.assert_allclose(
            np.asarray(m.bands), np.asarray(ref.bands), rtol=1e-13, atol=1e-13
        )


def test_band_expand_assembly_with_fallback_subset(rng):
    """Out-of-class elements route through the flat scatter and still land.

    Appending rotated copies of some cells creates a second signature
    class; with max_classes=1 those elements take the fallback subset and
    the combined result must still match the all-flat scatter.
    """
    import jax.numpy as jnp

    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.sparse.block_dia import (
        assemble_block_dia,
        band_expand_plan,
        block_dia_assembly_plan,
    )

    mesh = create_unit_box_uniform_hex_mesh_3d(3)
    cells = np.asarray(mesh.cells)
    cells2 = np.concatenate([cells, np.roll(cells[:5], 2, axis=1)], axis=0)
    plan = block_dia_assembly_plan(cells2, mesh.num_vertices, 2)
    ep = band_expand_plan(cells2, plan, max_classes=1)
    assert ep is not None and ep.slow_idx is not None and len(ep.slow_idx) == 5
    E, n = cells2.shape
    A_el = jnp.asarray(rng.standard_normal((E, 2 * n, 2 * n)))
    ref = assemble_block_dia(plan, A_el)
    m = assemble_block_dia(plan, A_el, expand=ep)
    np.testing.assert_allclose(
        np.asarray(m.bands), np.asarray(ref.bands), rtol=1e-12, atol=1e-12
    )
    assert (m.remainder is None) == (ref.remainder is None)
    if ref.remainder is not None:
        np.testing.assert_allclose(
            np.asarray(m.remainder.blocks),
            np.asarray(ref.remainder.blocks),
            rtol=1e-12,
            atol=1e-12,
        )


def test_hoist_closure_hoists_concrete_arrays():
    """hoist_closure extracts concrete closure arrays as arguments.

    jax.closure_convert leaves concrete closures embedded as program
    literals — at 1M elements the chunked model's tables (~0.5 GB) blow
    the remote-compile request size (HTTP 413).  The hoisted form must
    (a) expose the arrays as consts and (b) evaluate identically, eager
    and jitted, including under an outer jit (tracer closure).
    """
    import jax
    import jax.numpy as jnp

    from fenris_tpu.utils import hoist_closure

    big = jnp.asarray(np.arange(300, dtype=np.float64).reshape(100, 3))
    idx = jnp.asarray(np.arange(100)[::-1].copy())
    f = lambda u: (big * u[idx][:, None]).sum(1)
    u0 = jnp.linspace(0.0, 1.0, 100)
    conv, consts = hoist_closure(f, u0)
    assert any(np.shape(c) == (100, 3) for c in consts)
    out = jax.jit(lambda u, *c: conv(u, *c))(u0, *consts)
    np.testing.assert_allclose(np.asarray(out), np.asarray(f(u0)), rtol=1e-14)

    def outer(x):
        g = lambda u: (x * u).sum() * u
        cg_, cc = hoist_closure(g, u0)
        return cg_(u0, *cc)

    np.testing.assert_allclose(
        np.asarray(jax.jit(outer)(u0)), np.asarray(outer(u0))
    )


def test_scalar_spmv_tpu_size_guard(monkeypatch, rng):
    """spmv refuses TPU dispatch above the worker-crash cap (r2-r4:
    scalar-CSR at 81M nnz kills the TPU worker process)."""
    import fenris_tpu.sparse as S

    m = S.CsrMatrix(
        row_ptr=jnp.asarray(np.array([0, 1], np.int64)),
        col_indices=jnp.zeros(1, jnp.int32),
        values=jnp.ones(1, jnp.float32),
        shape=(1, 1),
    )
    # fake a TPU backend and a huge nnz via a subclassed view
    monkeypatch.setattr(S.jax, "default_backend", lambda: "tpu")
    big = m._replace(col_indices=jnp.zeros(1, jnp.int32))
    monkeypatch.setattr(
        type(big), "nnz", property(lambda self: S.TPU_SCALAR_SPMV_MAX_NNZ + 1)
    )
    with pytest.raises(NotImplementedError, match="safety cap"):
        S.spmv(big, jnp.ones(1, jnp.float32))


def test_block_dia_streamed_assembly_matches_materialized(rng):
    """Streaming fused assemble+scatter == materialized-buffer route.

    assemble_hessian_block_dia with chunk_size < E takes the streamed
    path (_assemble_block_dia_streamed: per-chunk element-minor matrices
    expanded to band rows inside one scan, the full [E, nd, nd] buffer
    never built — the round-4 HBM fix that made the 10.1M-dof assembled
    solve fit in 16 GB).  Bands must match the unchunked materialized
    assembly to summation-order roundoff; the ELL spill and slow-element
    fallback subsets must match too.
    """
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(4)

    def build(**kw):
        return HyperelasticModel(
            mesh=mesh,
            material=NeoHookeanMaterial(),
            params=LameParameters(mu=384.0, lam=577.0),
            **kw,
        )

    u = jnp.asarray(rng.standard_normal(3 * mesh.num_vertices) * 0.01)

    m_ref = build().assemble_hessian_block_dia(u)
    model_s = build(chunk_size=13)  # E=64 > 13 -> streamed, ragged last chunk
    assert model_s.block_dia_expand_plan() is not None
    m_str = model_s.assemble_hessian_block_dia(u)
    assert m_str.offsets == m_ref.offsets
    np.testing.assert_allclose(
        np.asarray(m_str.bands), np.asarray(m_ref.bands), rtol=1e-12, atol=1e-12
    )

    # stream-chunk cap branch: when chunk_size exceeds the expansion
    # budget, streaming builds dedicated smaller-chunk copies
    import fenris_tpu.elasticity as EL

    old = EL._STREAM_EXPAND_BUDGET_BYTES, EL._STREAM_CHUNK_FLOOR
    EL._STREAM_EXPAND_BUDGET_BYTES, EL._STREAM_CHUNK_FLOOR = 1.0, 7
    try:
        m_cap = build(chunk_size=33).assemble_hessian_block_dia(u)
    finally:
        EL._STREAM_EXPAND_BUDGET_BYTES, EL._STREAM_CHUNK_FLOOR = old
    np.testing.assert_allclose(
        np.asarray(m_cap.bands), np.asarray(m_ref.bands), rtol=1e-12, atol=1e-12
    )

    # capped diagonals: remainder spill + slow-element fallback through the
    # streamed route must still reproduce the materialized result
    m_ref7 = build().assemble_hessian_block_dia(u, max_diagonals=7)
    m_str7 = build(chunk_size=13).assemble_hessian_block_dia(u, max_diagonals=7)
    assert m_str7.offsets == m_ref7.offsets
    np.testing.assert_allclose(
        np.asarray(m_str7.bands), np.asarray(m_ref7.bands), rtol=1e-12, atol=1e-12
    )
    if m_ref7.remainder is not None:
        np.testing.assert_allclose(
            np.asarray(m_str7.remainder.blocks),
            np.asarray(m_ref7.remainder.blocks),
            rtol=1e-12,
            atol=1e-12,
        )
