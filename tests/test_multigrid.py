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
