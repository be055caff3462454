"""Geometric multigrid preconditioner tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.multigrid import StructuredMGPreconditioner, _prolong, _restrict
from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
from fenris_tpu.sparse.cg import CG_CONVERGED, conjugate_gradient
from fenris_tpu.structured import StructuredHyperelasticModel

PARAMS = LameParameters(mu=384.614, lam=576.923)


def _model(cells=(8, 8, 8)):
    ncx, ncy, ncz = cells
    nodes = (ncz + 1) * (ncy + 1) * (ncx + 1)
    mask = np.zeros(nodes * 3, dtype=bool)
    mask[: (ncy + 1) * (ncx + 1) * 3] = True  # clamp z = 0 plane
    return StructuredHyperelasticModel(
        cells=cells,
        spacing=1.0 / cells[0],
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_mask=mask,
        body_force=np.array([0.0, 0.0, -2.0]),
        dtype=jnp.float64,
    )


def test_transfer_adjointness(rng):
    """<P e_c, v_f> == <e_c, R v_f> (R = Pᵀ)."""
    ec = jnp.asarray(rng.standard_normal((3, 5, 4, 3)))
    vf = jnp.asarray(rng.standard_normal((3, 9, 7, 5)))
    lhs = float(jnp.vdot(_prolong(ec), vf))
    rhs = float(jnp.vdot(ec, _restrict(vf)))
    assert abs(lhs - rhs) < 1e-12 * abs(lhs)


def test_prolong_exact_on_linear_fields(rng):
    """Trilinear prolongation reproduces linear functions exactly."""
    zc, yc, xc = 5, 4, 6
    z, y, x = np.meshgrid(
        np.arange(zc), np.arange(yc), np.arange(xc), indexing="ij"
    )
    lin = 1.0 + 2 * x + 3 * y - z
    v = jnp.asarray(np.stack([lin, 2 * lin, -lin])[..., :])
    fine = np.asarray(_prolong(v))
    zf, yf, xf = np.meshgrid(
        np.arange(2 * zc - 1) / 2, np.arange(2 * yc - 1) / 2, np.arange(2 * xc - 1) / 2,
        indexing="ij",
    )
    lin_f = 1.0 + 2 * xf + 3 * yf - zf
    assert np.abs(fine[0] - lin_f).max() < 1e-12


def test_vcycle_contracts():
    model = _model((16, 16, 16))
    mg = StructuredMGPreconditioner(model)
    assert len(mg.levels) >= 3
    u0 = jnp.zeros(model.num_dofs, jnp.float64)
    b = model.residual(u0)
    A = lambda v: model.hessian_vector_product(u0, v)
    x = jnp.zeros_like(b)
    rn = [float(jnp.linalg.norm(b))]
    for _ in range(4):
        x = x + mg(b - A(x))
        rn.append(float(jnp.linalg.norm(b - A(x))))
    # healthy V-cycle: rho well below 1 every iteration
    for k in range(1, len(rn)):
        assert rn[k] < 0.7 * rn[k - 1], rn


def test_mg_cg_beats_jacobi_and_agrees():
    model = _model((16, 16, 16))
    u0 = jnp.zeros(model.num_dofs, jnp.float64)
    b = model.residual(u0)
    A = lambda v: model.hessian_vector_product(u0, v)
    inv_d = 1.0 / model.hessian_diagonal(u0)
    res_j = conjugate_gradient(
        A, b, preconditioner=lambda v: inv_d * v, rel_tolerance=1e-8,
        max_iter=2000, check_definiteness=False,
    )
    mg = StructuredMGPreconditioner(model)
    res_m = conjugate_gradient(
        A, b, preconditioner=mg, rel_tolerance=1e-8, max_iter=2000,
        check_definiteness=False,
    )
    assert int(res_m.status) == CG_CONVERGED
    assert int(res_m.num_iterations) * 4 < int(res_j.num_iterations)
    rel = float(jnp.abs(res_j.x - res_m.x).max() / jnp.abs(res_j.x).max())
    assert rel < 1e-5


def test_solve_with_mg_preconditioner():
    model = _model((8, 8, 8))
    res = model.solve(
        tolerance=1e-9, cg_rel_tolerance=1e-8, preconditioner="mg"
    )
    res_j = model.solve(tolerance=1e-9, cg_rel_tolerance=1e-8)
    assert np.abs(np.asarray(res.x) - np.asarray(res_j.x)).max() < 1e-7


# ---------------------------------------------------------------------------
# round 2: unstructured geometric MG over refinement hierarchies
# ---------------------------------------------------------------------------


@pytest.mark.parametrize("name,maker", [
    ("tri3", lambda: __import__("fenris_tpu.mesh.procedural", fromlist=["x"]).create_unit_square_uniform_tri_mesh_2d(3)),
    ("quad4", lambda: __import__("fenris_tpu.mesh.procedural", fromlist=["x"]).create_unit_square_uniform_quad_mesh_2d(3)),
    ("tet4", lambda: __import__("fenris_tpu.mesh.procedural", fromlist=["x"]).create_unit_box_uniform_tet_mesh_3d(2)),
    ("hex8", lambda: __import__("fenris_tpu.mesh.procedural", fromlist=["x"]).create_unit_box_uniform_hex_mesh_3d(2)),
])
def test_refinement_prolongation_reproduces_linear(name, maker, rng):
    """P interpolates P1/Q1-exactly: affine coarse fields prolong to the
    exact fine nodal values."""
    from fenris_tpu.mesh.refinement import (
        prolongation_for_refinement,
        refine_uniformly,
    )
    from fenris_tpu.multigrid import _prolong_unstructured, _restrict_unstructured

    coarse = maker()
    parents, weights = prolongation_for_refinement(coarse)
    fine = refine_uniformly(coarse)
    assert parents.shape[0] == fine.num_vertices
    d = coarse.dim
    a = rng.standard_normal(d)
    f = lambda p: p @ a + 0.7
    u_c = jnp.asarray(f(coarse.points))[:, None]
    u_f = np.asarray(
        _prolong_unstructured(jnp.asarray(parents), jnp.asarray(weights), u_c)
    )[:, 0]
    assert np.abs(u_f - f(fine.points)).max() < 1e-12
    # adjointness: <P u_c, r_f> == <u_c, P^T r_f>
    r_f = jnp.asarray(rng.standard_normal((fine.num_vertices, 2)))
    u_c2 = jnp.asarray(rng.standard_normal((coarse.num_vertices, 2)))
    lhs = float(jnp.vdot(_prolong_unstructured(jnp.asarray(parents), jnp.asarray(weights), u_c2), r_f))
    rhs = float(jnp.vdot(u_c2, _restrict_unstructured(jnp.asarray(parents), jnp.asarray(weights), r_f, coarse.num_vertices)))
    assert abs(lhs - rhs) < 1e-10 * max(1.0, abs(lhs))


def _mg_cg_iters(levels):
    """CG iterations (MG vs Jacobi) for linear elasticity at a hierarchy depth."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.mesh.refinement import refine_uniformly_repeat
    from fenris_tpu.multigrid import GeometricMGPreconditioner
    from fenris_tpu.solid import LinearElasticMaterial

    coarse = create_unit_box_uniform_hex_mesh_3d(3)
    fine = refine_uniformly_repeat(coarse, levels)
    fixed = np.flatnonzero(fine.points[:, 0] < 1e-12)
    model = HyperelasticModel(
        mesh=fine,
        material=LinearElasticMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=fixed,
    )
    mg = GeometricMGPreconditioner(model, coarse, levels, coarse_iters=30)
    rng = np.random.default_rng(0)
    b = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    b = jnp.where(model.free_mask, b, 0.0)
    hvp = model.hessian_operator(jnp.zeros_like(b))
    inv_diag = 1.0 / model.hessian_diagonal(jnp.zeros_like(b))
    res_j = conjugate_gradient(hvp, b, preconditioner=lambda v: inv_diag * v,
                               rel_tolerance=1e-8, max_iter=2000)
    res_m = conjugate_gradient(hvp, b, preconditioner=mg,
                               rel_tolerance=1e-8, max_iter=2000)
    assert int(res_j.status) == CG_CONVERGED and int(res_m.status) == CG_CONVERGED
    np.testing.assert_allclose(np.asarray(res_j.x), np.asarray(res_m.x), rtol=1e-5, atol=1e-8)
    return int(res_j.num_iterations), int(res_m.num_iterations)


def test_unstructured_mg_beats_jacobi_and_stays_flat():
    j1, m1 = _mg_cg_iters(1)
    j2, m2 = _mg_cg_iters(2)
    # MG wins at each level and its iteration count stays roughly flat
    # while Jacobi's grows with refinement
    assert m1 < j1 and m2 < j2
    assert m2 <= m1 + 5
    assert j2 > j1


def test_unstructured_mg_in_newton_solve():
    """Full nonlinear solve through solve(preconditioner=mg) matches Jacobi."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.mesh.refinement import refine_uniformly_repeat
    from fenris_tpu.multigrid import GeometricMGPreconditioner

    coarse = create_unit_box_uniform_hex_mesh_3d(2)
    fine = refine_uniformly_repeat(coarse, 1)
    fixed = np.flatnonzero(fine.points[:, 0] < 1e-12)
    kw = dict(
        mesh=fine,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -80.0]),
    )
    m_j = HyperelasticModel(**kw)
    m_m = HyperelasticModel(**kw)
    mg = GeometricMGPreconditioner(m_m, coarse, 1, coarse_iters=30)
    r_j = m_j.solve(tolerance=1e-9)
    r_m = m_m.solve(tolerance=1e-9, preconditioner=mg)
    assert float(r_j.residual_norm) < 1e-9
    assert float(r_m.residual_norm) < 1e-9
    np.testing.assert_allclose(np.asarray(r_j.x), np.asarray(r_m.x), rtol=0, atol=1e-7)


def test_unstructured_mg_rcm_banded_equivariance():
    """RCM-permuted banded MG is the plain MG conjugated by the permutation.

    ``rcm_refined_hierarchy`` + ``fine_permutation``/``banded=True`` must
    produce exactly the same V-cycle as the refinement-ordered
    preconditioner, just relabeled: M_rcm(P r) == P M_plain(r).
    """
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.mesh.refinement import refine_uniformly_repeat
    from fenris_tpu.multigrid import (
        GeometricMGPreconditioner,
        rcm_refined_hierarchy,
    )
    from fenris_tpu.solid import LinearElasticMaterial

    coarse = create_unit_box_uniform_hex_mesh_3d(2)
    levels = 2
    plain = refine_uniformly_repeat(coarse, levels)
    fine, perm = rcm_refined_hierarchy(coarse, levels)
    np.testing.assert_allclose(
        np.asarray(fine.points), np.asarray(plain.points)[perm]
    )
    dof_perm = (3 * perm[:, None] + np.arange(3)).reshape(-1)

    fixed_plain = np.flatnonzero(plain.points[:, 0] < 1e-12)
    fixed_rcm = np.flatnonzero(fine.points[:, 0] < 1e-12)
    kw = dict(
        material=LinearElasticMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
    )
    m_plain = HyperelasticModel(mesh=plain, dirichlet_nodes=fixed_plain, **kw)
    m_rcm = HyperelasticModel(
        mesh=fine,
        dirichlet_nodes=fixed_rcm,
        banded=True,
        banded_r_nodes=1024,
        **kw,
    )
    mg_plain = GeometricMGPreconditioner(m_plain, coarse, levels)
    mg_rcm = GeometricMGPreconditioner(
        m_rcm, coarse, levels, fine_permutation=perm, banded=True
    )

    rng = np.random.default_rng(7)
    r = rng.standard_normal(m_plain.space.num_dofs)
    out_plain = np.asarray(mg_plain(jnp.asarray(r)))
    out_rcm = np.asarray(mg_rcm(jnp.asarray(r[dof_perm])))
    np.testing.assert_allclose(out_rcm, out_plain[dof_perm], rtol=1e-10, atol=1e-12)


def test_unstructured_mg_rcm_banded_newton_solve():
    """Full Newton solve on the RCM/banded model with the permuted MG."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.mesh.refinement import refine_uniformly_repeat
    from fenris_tpu.multigrid import (
        GeometricMGPreconditioner,
        rcm_refined_hierarchy,
    )

    coarse = create_unit_box_uniform_hex_mesh_3d(2)
    plain = refine_uniformly_repeat(coarse, 1)
    fine, perm = rcm_refined_hierarchy(coarse, 1)
    dof_perm = (3 * perm[:, None] + np.arange(3)).reshape(-1)
    kw = dict(
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        body_force=lambda x, p: jnp.array([0.0, 0.0, -80.0]),
    )
    m_plain = HyperelasticModel(
        mesh=plain,
        dirichlet_nodes=np.flatnonzero(plain.points[:, 0] < 1e-12),
        **kw,
    )
    m_rcm = HyperelasticModel(
        mesh=fine,
        dirichlet_nodes=np.flatnonzero(fine.points[:, 0] < 1e-12),
        banded=True,
        banded_r_nodes=1024,
        **kw,
    )
    r_plain = m_plain.solve(
        tolerance=1e-9,
        preconditioner=GeometricMGPreconditioner(m_plain, coarse, 1),
    )
    r_rcm = m_rcm.solve(
        tolerance=1e-9,
        preconditioner=GeometricMGPreconditioner(
            m_rcm, coarse, 1, fine_permutation=perm, banded=True
        ),
    )
    assert float(r_plain.residual_norm) < 1e-9
    assert float(r_rcm.residual_norm) < 1e-9
    np.testing.assert_allclose(
        np.asarray(r_rcm.x),
        np.asarray(r_plain.x)[dof_perm],
        rtol=0,
        atol=1e-7,
    )
