"""Univariate Gauss, Gauss-Lobatto, and Gauss-Jacobi rules on [-1, 1].

Capability parity with fenris-quadrature/src/univariate.rs (Gauss via
Newton-on-Legendre, Gauss-Lobatto tables); here both families are computed
to machine precision for *arbitrary* point counts (the reference caps
Gauss-Lobatto at its committed table size).
"""

from __future__ import annotations

from functools import lru_cache

import numpy as np

__all__ = ["gauss", "gauss_lobatto", "gauss_jacobi"]


@lru_cache(maxsize=None)
def _gauss_cached(n: int):
    # numpy's leggauss: Golub-Welsch + Newton polish, accurate to ~1 ulp.
    x, w = np.polynomial.legendre.leggauss(n)
    return w.copy(), x.reshape(-1, 1).copy()


def gauss(num_points: int):
    """Gauss-Legendre rule with ``n`` points (exact to degree ``2n - 1``)."""
    if num_points < 1:
        raise ValueError("number of points must be positive")
    from . import Rule

    w, p = _gauss_cached(int(num_points))
    return Rule(w.copy(), p.copy())


def _legendre_deriv_roots(n: int) -> np.ndarray:
    """Roots of P'_{n-1} — the interior Gauss-Lobatto points."""
    # P'_{n-1} has degree n-2; use numpy Legendre derivative root finding
    c = np.zeros(n)
    c[-1] = 1.0
    dleg = np.polynomial.legendre.Legendre(c).deriv()
    roots = dleg.roots()
    # Newton-polish the roots for full f64 accuracy
    for _ in range(3):
        vals = dleg(roots)
        dvals = dleg.deriv()(roots)
        roots = roots - vals / dvals
    return np.sort(np.real(roots))


@lru_cache(maxsize=None)
def _gauss_lobatto_cached(n: int):
    if n == 2:
        x = np.array([-1.0, 1.0])
        w = np.array([1.0, 1.0])
    else:
        interior = _legendre_deriv_roots(n)
        x = np.concatenate([[-1.0], interior, [1.0]])
        # w_i = 2 / (n (n-1) P_{n-1}(x_i)^2)
        c = np.zeros(n)
        c[-1] = 1.0
        Pn1 = np.polynomial.legendre.Legendre(c)
        w = 2.0 / (n * (n - 1) * Pn1(x) ** 2)
    return w, x.reshape(-1, 1)


def gauss_lobatto(num_points: int):
    """Gauss-Lobatto rule with ``n >= 2`` points (exact to degree ``2n - 3``).

    Includes both endpoints ±1.
    """
    if num_points < 2:
        raise ValueError("Gauss-Lobatto requires at least 2 points")
    from . import Rule

    w, p = _gauss_lobatto_cached(int(num_points))
    return Rule(w.copy(), p.copy())


@lru_cache(maxsize=None)
def _gauss_jacobi_cached(n: int, alpha: float, beta: float):
    """Gauss-Jacobi rule for weight (1-x)^alpha (1+x)^beta on [-1, 1].

    Golub-Welsch on the symmetric Jacobi recurrence matrix.
    """
    a, b = float(alpha), float(beta)
    apb = a + b
    # Recurrence coefficients for monic Jacobi polynomials.
    # alpha_k = (b^2 - a^2) / ((2k+apb)(2k+apb+2)); at k = 0 this is 0/0 when
    # a + b = 0, with limit (b - a)/(apb + 2).
    A = np.empty(n, dtype=np.float64)
    A[0] = (b - a) / (apb + 2.0)
    if n > 1:
        k = np.arange(1, n, dtype=np.float64)
        A[1:] = (b**2 - a**2) / ((2 * k + apb) * (2 * k + apb + 2))
    k1 = np.arange(1, n, dtype=np.float64)
    B = (
        4.0
        * k1
        * (k1 + a)
        * (k1 + b)
        * (k1 + apb)
        / ((2 * k1 + apb) ** 2 * (2 * k1 + apb + 1) * (2 * k1 + apb - 1))
    )
    J = np.diag(A) + np.diag(np.sqrt(B), 1) + np.diag(np.sqrt(B), -1)
    x, V = np.linalg.eigh(J)
    from math import gamma, lgamma

    # mu0 = integral of the weight = 2^(a+b+1) B(a+1, b+1)
    log_mu0 = (apb + 1) * np.log(2.0) + lgamma(a + 1) + lgamma(b + 1) - lgamma(apb + 2)
    mu0 = np.exp(log_mu0)
    w = mu0 * V[0, :] ** 2
    return w, x.reshape(-1, 1)


def gauss_jacobi(num_points: int, alpha: float, beta: float):
    """Gauss-Jacobi rule for the weight ``(1-x)^alpha (1+x)^beta`` on [-1, 1]."""
    if num_points < 1:
        raise ValueError("number of points must be positive")
    from . import Rule

    w, p = _gauss_jacobi_cached(int(num_points), float(alpha), float(beta))
    return Rule(w.copy(), p.copy())
