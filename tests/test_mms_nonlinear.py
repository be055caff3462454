"""Nonlinear (hyperelastic) manufactured-solution convergence.

Extends the reference's linear-Poisson MMS methodology
(tests/convergence_tests/poisson_mms_common.rs:173) to the Neo-Hookean
operator: the body force is derived from a smooth exact displacement by
autodiff of the first Piola-Kirchhoff stress (fenris_tpu/solid/mms.py),
and the discrete solution must converge to it at O(h^2) in L2.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
from fenris_tpu.solid.mms import manufactured_body_force, sine_bubble_displacement
from fenris_tpu.structured import StructuredHyperelasticModel

PARAMS = LameParameters(mu=384.614, lam=576.923)


def _boundary_mask(cells):
    ncx, ncy, ncz = cells
    shape = (ncz + 1, ncy + 1, ncx + 1)
    m = np.zeros(shape, dtype=bool)
    m[0], m[-1] = True, True
    m[:, 0], m[:, -1] = True, True
    m[:, :, 0], m[:, :, -1] = True, True
    return np.repeat(m.reshape(-1), 3)


def _mms_model(c, body_force):
    return StructuredHyperelasticModel(
        cells=(c, c, c),
        spacing=1.0 / c,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_mask=_boundary_mask((c, c, c)),
        body_force=body_force,
        dtype=jnp.float64,
    )


def test_callable_body_force_matches_constant():
    kw = dict(
        cells=(5, 4, 3),
        spacing=0.25,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dtype=jnp.float64,
    )
    b = np.array([0.3, -0.7, -2.0])
    m0 = StructuredHyperelasticModel(body_force=b, **kw)
    m1 = StructuredHyperelasticModel(
        body_force=lambda x, p: jnp.asarray(b), **kw
    )
    np.testing.assert_allclose(
        np.asarray(m1._f_ext), np.asarray(m0._f_ext), rtol=0, atol=1e-13
    )


def test_l2_error_exact_on_interpolant():
    """l2_error of a linear field's nodal interpolant is ~0 (hex8 reproduces
    linears), and of u=0 vs that field equals its analytic L2 norm."""
    c = 6
    model = _mms_model(c, None)
    A = np.array([[0.1, 0.02, -0.03], [0.0, -0.2, 0.05], [0.04, 0.0, 0.3]])

    def u_lin(x):
        return A @ x

    # nodal interpolant: exact for linears
    zs = np.arange(c + 1) / c
    Z, Y, X = np.meshgrid(zs, zs, zs, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3)
    u_nodes = (pts @ A.T).reshape(-1)
    assert model.l2_error(jnp.asarray(u_nodes), u_lin) < 1e-13
    # ||u_lin||_L2 over the unit box: int x_k x_l dx = 1/3 (k=l) else 1/4
    ref = model.l2_error(jnp.zeros(model.num_dofs), u_lin)
    M = np.full((3, 3), 0.25) + np.diag([1 / 12.0] * 3)
    exact = float(np.sqrt(np.einsum("ik,il,kl->", A, A, M)))
    np.testing.assert_allclose(ref, exact, rtol=1e-12)


def test_neo_hookean_mms_l2_convergence():
    """Discrete Neo-Hookean solutions converge to u_exact at O(h^2) in L2."""
    u_exact = sine_bubble_displacement()
    f = manufactured_body_force(NeoHookeanMaterial(), PARAMS, u_exact)
    errs = []
    for c in (4, 8, 16):
        model = _mms_model(c, f)
        res = model.solve(
            tolerance=1e-11, cg_rel_tolerance=1e-8, max_newton_iterations=20
        )
        assert float(res.residual_norm) < 1e-11, f"{c}^3 Newton did not converge"
        errs.append(model.l2_error(res.x, u_exact))
    orders = [np.log2(errs[i] / errs[i + 1]) for i in range(len(errs) - 1)]
    assert orders[-1] == pytest.approx(2.0, abs=0.4), (errs, orders)
