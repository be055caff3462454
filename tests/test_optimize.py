"""Newton / line-search solver tests (cf. fenris-optimize/tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.optimize import (
    NEWTON_CONVERGED,
    NEWTON_MAX_ITER,
    newton,
    newton_line_search,
)


def test_newton_scalar_root():
    # F(x) = x^2 - 4 componentwise, root x = 2
    def residual(x):
        return x * x - 4.0

    def solve_jac(x, f):
        return f / (2.0 * x)

    res = newton(residual, solve_jac, jnp.asarray([3.0, 5.0]), tolerance=1e-12)
    assert int(res.status) == NEWTON_CONVERGED
    assert np.abs(np.asarray(res.x) - 2.0).max() < 1e-10


def test_newton_linear_system_one_step(rng):
    A = rng.standard_normal((6, 6)) + 6 * np.eye(6)
    b = rng.standard_normal(6)
    Aj = jnp.asarray(A)

    def residual(x):
        return Aj @ x - jnp.asarray(b)

    def solve_jac(x, f):
        return jnp.linalg.solve(Aj, f)

    res = newton(residual, solve_jac, jnp.zeros(6), tolerance=1e-10)
    assert int(res.status) == NEWTON_CONVERGED
    assert int(res.iterations) == 1
    assert np.abs(np.asarray(res.x) - np.linalg.solve(A, b)).max() < 1e-10


def test_newton_line_search_globalizes():
    # F(x) = atan(x): full Newton diverges from |x0| > ~1.39; line search saves it
    def residual(x):
        return jnp.arctan(x)

    def solve_jac(x, f):
        return f * (1.0 + x * x)

    x0 = jnp.asarray([2.0])
    res_plain = newton(residual, solve_jac, x0, tolerance=1e-10, max_iterations=30)
    res_ls = newton_line_search(
        residual, solve_jac, x0, tolerance=1e-10, max_iterations=50
    )
    assert int(res_ls.status) == NEWTON_CONVERGED
    assert np.abs(np.asarray(res_ls.x)).max() < 1e-8
    # plain newton should fail to converge (oscillates/diverges)
    assert int(res_plain.status) != NEWTON_CONVERGED or np.abs(
        np.asarray(res_plain.x)
    ).max() > np.abs(np.asarray(res_ls.x)).max()


def test_newton_max_iterations():
    def residual(x):
        return x + 1000.0  # never within tolerance quickly with tiny steps

    def solve_jac(x, f):
        return f * 1e-3  # deliberately bad Jacobian -> slow progress

    res = newton(
        residual, solve_jac, jnp.asarray([0.0]), tolerance=1e-12, max_iterations=3
    )
    assert int(res.status) == NEWTON_MAX_ITER
    assert int(res.iterations) == 3


def test_newton_already_converged():
    def residual(x):
        return x

    def solve_jac(x, f):
        return f

    res = newton(residual, solve_jac, jnp.zeros(4), tolerance=1e-10)
    assert int(res.status) == NEWTON_CONVERGED
    assert int(res.iterations) == 0
