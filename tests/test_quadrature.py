"""Quadrature exactness tests.

Mirrors fenris-quadrature/tests/unit_tests/polyquad.rs: every rule must
integrate all monomials up to its strength to tight absolute tolerance
against exact (rational) integrals over the reference domains.
"""

import itertools
from fractions import Fraction
from math import comb, factorial

import numpy as np
import pytest

from fenris_tpu import quadrature as q


def exact_box(dim, exps):
    out = 1.0
    for e in exps:
        out *= 2.0 / (e + 1) if e % 2 == 0 else 0.0
    return out


def exact_simplex(exps):
    """Exact integral of prod x_i^e_i over the [-1,1]-based simplex."""
    d = len(exps)
    total = Fraction(0)
    ranges = [range(e + 1) for e in exps]
    for alpha in itertools.product(*ranges):
        coef = 1
        for e, a in zip(exps, alpha):
            coef *= comb(e, a) * (2**a) * (-1) ** (e - a)
        num = 1
        for a in alpha:
            num *= factorial(a)
        total += Fraction(coef * num, factorial(sum(alpha) + d))
    return float(2**d * total)


def exact_prism(exps):
    return exact_simplex(exps[:2]) * (2.0 / (exps[2] + 1) if exps[2] % 2 == 0 else 0.0)


def exact_pyramid(exps):
    """∫ x^i y^j z^k over pyramid (base [-1,1]^2 at z=-1, apex (0,0,1))."""
    i, j, k = exps
    if i % 2 or j % 2:
        return 0.0
    # cross-section at z: [-s, s]^2, s = (1-z)/2:
    # ∫ x^i over [-s,s] = 2 s^(i+1)/(i+1)
    # => integral = 4/((i+1)(j+1)) ∫_{-1}^{1} s^(i+j+2) z^k dz
    n = i + j + 2
    total = Fraction(0)
    # s^n = ((1-z)/2)^n; expand and integrate z^k (1-z)^n / 2^n
    for m in range(n + 1):
        c = Fraction(comb(n, m) * (-1) ** m, 2**n)
        e = m + k
        total += c * (Fraction(2, e + 1) if e % 2 == 0 else 0)
    return float(Fraction(4, (i + 1) * (j + 1)) * total)


def monomials_upto(dim, strength):
    return [
        e
        for e in itertools.product(range(strength + 1), repeat=dim)
        if sum(e) <= strength
    ]


def check_rule(rule, strength, exact_fn, dim, tol=1e-13):
    worst = 0.0
    for exps in monomials_upto(dim, strength):
        vals = np.prod(rule.points ** np.array(exps), axis=1)
        approx = float(np.dot(rule.weights, vals))
        worst = max(worst, abs(approx - exact_fn(exps)))
    assert worst < tol, f"strength {strength}: worst error {worst}"


@pytest.mark.parametrize("domain,exact_fn,dim", [
    ("tri", exact_simplex, 2),
    ("quad", lambda e: exact_box(2, e), 2),
    ("tet", exact_simplex, 3),
    ("hex", lambda e: exact_box(3, e), 3),
    ("pri", exact_prism, 3),
    ("pyr", exact_pyramid, 3),
])
def test_polyquad_exactness_all_strengths(domain, exact_fn, dim):
    for s in q.polyquad.available_strengths(domain):
        rule = q.polyquad.rule(domain, s)
        check_rule(rule, s, exact_fn, dim)


def test_polyquad_minimum_point_selection():
    # requesting a low strength returns the min-point rule of >= strength
    r0 = q.polyquad.rule("tri", 0)
    assert r0.num_points == 1
    r3 = q.polyquad.rule("tet", 3)
    assert r3.num_points == 8


def test_polyquad_weights_positive():
    for domain in ("tri", "quad", "tet", "hex", "pri", "pyr"):
        for s in q.polyquad.available_strengths(domain):
            assert (q.polyquad.rule(domain, s).weights > 0).all()


@pytest.mark.parametrize("n", [1, 2, 3, 5, 8, 16, 31])
def test_gauss_exactness(n):
    w, p = q.gauss(n)
    for k in range(2 * n):
        exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        assert abs(np.dot(w, p[:, 0] ** k) - exact) < 1e-13


@pytest.mark.parametrize("n", [2, 3, 4, 7, 12, 20])
def test_gauss_lobatto_exactness_and_endpoints(n):
    w, p = q.gauss_lobatto(n)
    assert p[0, 0] == -1.0 and p[-1, 0] == 1.0
    for k in range(2 * n - 2):
        exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        assert abs(np.dot(w, p[:, 0] ** k) - exact) < 1e-12


@pytest.mark.parametrize("strength", [0, 1, 2, 5, 9, 15, 21, 30])
def test_collapsed_triangle_arbitrary_strength(strength):
    rule = q.simplex.triangle_collapsed(strength)
    check_rule(rule, strength, exact_simplex, 2, tol=1e-12)


@pytest.mark.parametrize("strength", [0, 2, 5, 11, 16])
def test_collapsed_tetrahedron_arbitrary_strength(strength):
    rule = q.simplex.tetrahedron_collapsed(strength)
    check_rule(rule, strength, exact_simplex, 3, tol=1e-12)


@pytest.mark.parametrize("strength", [0, 3, 7])
def test_collapsed_prism_pyramid(strength):
    check_rule(q.simplex.prism_collapsed(strength), strength, exact_prism, 3, tol=1e-12)
    check_rule(q.simplex.pyramid_collapsed(strength), strength, exact_pyramid, 3, tol=1e-12)


def test_tensor_rules_match_reference_ordering():
    r = q.quadrilateral_gauss(2)
    g = q.gauss(2)
    # x-major ordering: point 0 and 1 share x
    assert r.points[0, 0] == r.points[1, 0] == g.points[0, 0]
    assert r.num_points == 4
    assert q.hexahedron_gauss(3).num_points == 27


def test_canonical_rules_exact_for_mass_and_stiffness():
    from fenris_tpu.quadrature.canonical import canonical_mass, canonical_stiffness

    # Tri6 mass: integrand degree 4 -> canonical mass rule must integrate
    # degree-4 monomials exactly.
    check_rule(canonical_mass("tri6"), 4, exact_simplex, 2)
    check_rule(canonical_stiffness("tet10"), 2, exact_simplex, 3)


def test_subdivide_univariate():
    base = q.gauss(2)
    sub = q.subdivide_univariate(base, 4)
    assert sub.num_points == 8
    for k in range(4):
        exact = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        assert abs(np.dot(sub.weights, sub.points[:, 0] ** k) - exact) < 1e-13


def test_subdivide_triangle():
    base = q.total_order.triangle(2)
    sub = q.subdivide_triangle(base, 3)
    check_rule(sub, 2, exact_simplex, 2, tol=1e-12)


def test_gauss_jacobi():
    # weight (1-x)^1: integral of x^k (1-x) over [-1,1]
    w, p = q.gauss_jacobi(4, 1.0, 0.0)
    for k in range(6):
        i1 = 2.0 / (k + 1) if k % 2 == 0 else 0.0
        i2 = 2.0 / (k + 2) if (k + 1) % 2 == 0 else 0.0
        exact = i1 - i2
        assert abs(np.dot(w, p[:, 0] ** k) - exact) < 1e-13
