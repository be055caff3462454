"""Banded MXU gather/scatter: plan construction, exactness, autodiff.

The TPU Pallas kernels are exercised on real hardware via the bench/examples;
here the XLA fallback validates the plan logic and the linear_call wiring
(the kernel itself is validated bit-exactly against this fallback on TPU).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
from fenris_tpu.ops.banded import BandedPlan, gather, make_banded_plan, scatter_add


def _synthetic_plan(res=12, s=3, r_nodes=1024, rowt=256):
    mesh = create_unit_box_uniform_hex_mesh_3d(res)
    cells = np.asarray(mesh.cells)
    plan = make_banded_plan(cells, mesh.num_vertices, s=s, r_nodes=r_nodes, rowt=rowt)
    return mesh, cells, plan


def test_plan_row_layout_consistency():
    mesh, cells, plan = _synthetic_plan()
    # every valid row's (a, b) recombines to the global node minus window start
    a = np.asarray(plan.a_loc).reshape(plan.k_blocks, plan.rows)
    b = np.asarray(plan.b_loc).reshape(plan.k_blocks, plan.rows)
    nodes = np.asarray(plan.nodes_padded).reshape(plan.k_blocks, plan.rows)
    valid = np.asarray(plan.valid_rows).reshape(plan.k_blocks, plan.rows) > 0
    for k in range(plan.k_blocks):
        vr = valid[k]
        loc = a[k, vr] * 128 + b[k, vr]
        assert np.array_equal(loc, nodes[k, vr] - k * plan.ra * 128)
        assert loc.max(initial=0) < plan.wa * 128
    # row blocks of n consecutive rows map to single elements in perm order
    counts = plan.counts
    starts = np.concatenate([[0], np.cumsum(counts)])
    for k in range(plan.k_blocks):
        c = int(counts[k])
        seg = nodes[k, : c * plan.n].reshape(c, plan.n)
        assert np.array_equal(seg, cells[plan.perm[starts[k] : starts[k] + c]])


def test_gather_matches_direct_indexing():
    mesh, cells, plan = _synthetic_plan()
    rng = np.random.default_rng(3)
    u = rng.standard_normal((mesh.num_vertices, 3))
    out = np.asarray(gather(plan, jnp.asarray(u)))
    valid = np.asarray(plan.valid_rows).reshape(-1) > 0
    ref = u[cells[plan.perm].reshape(-1)]
    assert np.array_equal(out.reshape(-1, 3)[valid], ref)
    assert np.all(out.reshape(-1, 3)[~valid] == 0.0)


def test_scatter_matches_segment_sum():
    mesh, cells, plan = _synthetic_plan()
    rng = np.random.default_rng(4)
    f_el = rng.standard_normal((plan.padded_elements, plan.n, 3))
    out = np.asarray(scatter_add(plan, jnp.asarray(f_el)))
    valid = np.asarray(plan.valid_rows).reshape(-1) > 0
    ref = np.zeros((mesh.num_vertices, 3))
    np.add.at(
        ref,
        np.asarray(plan.nodes_padded).reshape(-1)[valid],
        f_el.reshape(-1, 3)[valid],
    )
    np.testing.assert_allclose(out, ref, rtol=0, atol=1e-12)


def test_gather_scatter_are_transposes():
    """<gather(u), f> == <u, scatter(f)> exactly (linear_call contract)."""
    mesh, cells, plan = _synthetic_plan(res=6, r_nodes=1024, rowt=256)
    rng = np.random.default_rng(5)
    u = jnp.asarray(rng.standard_normal((mesh.num_vertices, 3)))
    f = jnp.asarray(rng.standard_normal((plan.padded_elements, plan.n, 3)))
    lhs = jnp.vdot(gather(plan, u), f)
    rhs = jnp.vdot(u, scatter_add(plan, f))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-13)


def test_autodiff_through_gather_and_scatter():
    mesh, cells, plan = _synthetic_plan(res=6, r_nodes=1024, rowt=256)
    rng = np.random.default_rng(6)
    u = jnp.asarray(rng.standard_normal((mesh.num_vertices, 3)))
    w = jnp.asarray(rng.standard_normal((plan.padded_elements, plan.n, 3)))

    # grad of <gather(u), w> is scatter(w)
    g = jax.grad(lambda x: jnp.vdot(gather(plan, x), w))(u)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(scatter_add(plan, w)), rtol=0, atol=1e-13
    )
    # jvp of the linear map is the map itself
    _, jv = jax.jvp(lambda x: gather(plan, x), (u,), (u,))
    np.testing.assert_allclose(np.asarray(jv), np.asarray(gather(plan, u)))
    # grad through scatter is gather
    gs = jax.grad(lambda x: jnp.vdot(scatter_add(plan, x), u))(w)
    np.testing.assert_allclose(
        np.asarray(gs), np.asarray(gather(plan, u)), rtol=0, atol=1e-13
    )


def test_jit_and_scalar_component():
    mesh, cells, plan = _synthetic_plan(res=6, s=1, r_nodes=1024, rowt=256)
    rng = np.random.default_rng(7)
    u = jnp.asarray(rng.standard_normal((mesh.num_vertices, 1)))
    out = jax.jit(lambda x: gather(plan, x))(u)
    valid = np.asarray(plan.valid_rows).reshape(-1) > 0
    ref = np.asarray(u)[np.asarray(cells)[plan.perm].reshape(-1)]
    assert np.array_equal(np.asarray(out).reshape(-1, 1)[valid], ref)


def test_bandwidth_guard():
    # an element connecting node 0 to a far node forces a huge window
    cells = np.array([[0, 1, 2, 3, 4, 5, 6, 500000]], np.int64)
    with pytest.raises(ValueError, match="bandwidth"):
        make_banded_plan(cells, 500001, s=1, max_wa=64)


def test_pad_elements_and_valid_mask():
    mesh, cells, plan = _synthetic_plan(res=6, r_nodes=1024, rowt=256)
    arr = np.arange(mesh.num_cells, dtype=np.float64)[:, None] * np.ones(4)
    padded = plan.pad_elements(arr)
    assert padded.shape == (plan.padded_elements, 4)
    v = plan.valid_elements()
    starts = np.concatenate([[0], np.cumsum(plan.counts)])
    bp = plan.elements_per_block
    for k in range(plan.k_blocks):
        c = int(plan.counts[k])
        np.testing.assert_array_equal(
            padded[k * bp : k * bp + c, 0], plan.perm[starts[k] : starts[k] + c]
        )
        assert v[k * bp : k * bp + c].all()
        assert not v[k * bp + c : (k + 1) * bp].any()


def test_hyperelastic_model_banded_agreement():
    """banded=True must reproduce the default path exactly (f64, CPU)."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(8)
    kw = dict(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=np.arange(81),
        body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0]),
    )
    m0 = HyperelasticModel(**kw)
    # chunk_size tiny to force the chunked lax.scan sweep (C > 1)
    m1 = HyperelasticModel(**kw, banded=True, banded_r_nodes=1024, chunk_size=64)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(m0.space.num_dofs) * 0.01)
    v = jnp.asarray(rng.standard_normal(m0.space.num_dofs))
    np.testing.assert_allclose(
        float(m0.energy(u)), float(m1.energy(u)), rtol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(m0.residual(u)), np.asarray(m1.residual(u)), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(m0.hessian_vector_product(u, v)),
        np.asarray(m1.hessian_vector_product(u, v)),
        rtol=0,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(m0.hessian_diagonal(u)),
        np.asarray(m1.hessian_diagonal(u)),
        rtol=1e-12,
    )
    # end-to-end Newton solve through the banded kernels
    r = m1.solve(tolerance=1e-9, max_newton_iterations=10)
    assert float(r.residual_norm) < 1e-9


def test_banded_agreement_per_element_params():
    """banded=True == banded=False with per-element [E] material params.

    Guards the params-axis convention: both paths must map an [E] leaf over
    the element axis (assembly/local.py `_vmap2` keyed on shape[0] == E,
    local_em.py `_params_axis` keyed on shape[-1] == E).
    """
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(6)
    rng = np.random.default_rng(7)
    mu_el = jnp.asarray(300.0 + 200.0 * rng.random(mesh.num_cells))
    kw = dict(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=mu_el, lam=577.0),
        dirichlet_nodes=np.arange(49),
    )
    m0 = HyperelasticModel(**kw)
    m1 = HyperelasticModel(**kw, banded=True, banded_r_nodes=1024, chunk_size=64)
    u = jnp.asarray(rng.standard_normal(m0.space.num_dofs) * 0.01)
    v = jnp.asarray(rng.standard_normal(m0.space.num_dofs))
    np.testing.assert_allclose(float(m0.energy(u)), float(m1.energy(u)), rtol=1e-13)
    np.testing.assert_allclose(
        np.asarray(m0.residual(u)), np.asarray(m1.residual(u)), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(m0.hessian_vector_product(u, v)),
        np.asarray(m1.hessian_vector_product(u, v)),
        rtol=0,
        atol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(m0.hessian_diagonal(u)),
        np.asarray(m1.hessian_diagonal(u)),
        rtol=1e-12,
    )


def test_banded_rejects_per_qp_params():
    """[E, q] per-point payloads fail loudly on the banded path."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.quadrature.canonical import canonical_stiffness
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(3)
    q = len(canonical_stiffness(mesh.element).weights)
    mu_eq = jnp.full((mesh.num_cells, q), 384.0)
    with pytest.raises(ValueError, match="per-quadrature-point"):
        HyperelasticModel(
            mesh=mesh,
            material=NeoHookeanMaterial(),
            params=LameParameters(mu=mu_eq, lam=577.0),
            dirichlet_nodes=np.arange(16),
            banded=True,
            banded_r_nodes=1024,
        )


@pytest.mark.parametrize("target", ["tet10", "hex20"])
def test_banded_higher_order_elements(target):
    """Subparametric tet10/hex20 through the banded path match the default."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.convert import convert_mesh
    from fenris_tpu.mesh.procedural import create_rectangular_uniform_tet_mesh
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    if target == "tet10":
        mesh = convert_mesh(create_rectangular_uniform_tet_mesh(1.0, 2, 2, 2, 2), "tet10")
    else:
        mesh = convert_mesh(create_unit_box_uniform_hex_mesh_3d(5), "hex20")
    kw = dict(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=np.arange(12),
    )
    m0 = HyperelasticModel(**kw)
    m1 = HyperelasticModel(**kw, banded=True, banded_r_nodes=1024, chunk_size=64)
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(m0.space.num_dofs) * 0.01)
    v = jnp.asarray(rng.standard_normal(m0.space.num_dofs))
    np.testing.assert_allclose(
        np.asarray(m0.residual(u)), np.asarray(m1.residual(u)), rtol=0, atol=1e-11
    )
    np.testing.assert_allclose(
        np.asarray(m0.hessian_vector_product(u, v)),
        np.asarray(m1.hessian_vector_product(u, v)),
        rtol=0,
        atol=1e-9,
    )


def test_matrix_free_poisson_matches_assembled():
    """solve_poisson_matrix_free == solve_poisson (CSR) on 2D and 3D MMS."""
    import sys

    sys.path.insert(0, str(__import__("pathlib").Path(__file__).parent))
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
    from fenris_tpu.fem import solve_poisson, solve_poisson_matrix_free
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
        r1 = solve_poisson_matrix_free(
            mesh, rule, erule, src, ue, ug, dn, banded_r_nodes=1024
        )
        np.testing.assert_allclose(np.asarray(r1.u), np.asarray(r0.u), atol=1e-10)
        np.testing.assert_allclose(r1.l2_error, r0.l2_error, rtol=1e-10)
        # non-eigenvector RHS: still agree after real CG iterations
        bump = lambda x, p: jnp.exp(-10.0 * jnp.sum((x - 0.3) ** 2))
        r2 = solve_poisson(mesh, rule, erule, bump, dirichlet_nodes=dn)
        r3 = solve_poisson_matrix_free(
            mesh, rule, erule, bump, dirichlet_nodes=dn, banded_r_nodes=1024
        )
        assert r3.cg_iterations > 1
        np.testing.assert_allclose(np.asarray(r3.u), np.asarray(r2.u), atol=1e-9)
