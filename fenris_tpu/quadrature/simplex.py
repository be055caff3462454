"""Collapsed-coordinate (Duffy / Gauss-Jacobi) rules for simplex-like domains.

Arbitrary-strength rules for the reference triangle, tetrahedron, prism and
pyramid, built from tensor products of Gauss-Legendre and Gauss-Jacobi rules
under the standard collapsed-coordinate maps (Karniadakis & Sherwin).  The
Jacobi weights absorb the collapse Jacobian exactly, so a strength-``p``
rule integrates all polynomials of total degree ``<= p`` to machine
precision.

These complement the tabulated Witherden–Vincent rules (:mod:`.polyquad`):
the tables are minimum-point but capped in strength; the collapsed rules
extend to arbitrary strength (the reference library errors beyond its
tables — fenris-quadrature/src/lib.rs:80 ``NoRuleAvailable``).
"""

from __future__ import annotations

import numpy as np

from .univariate import gauss, gauss_jacobi

__all__ = ["triangle_collapsed", "tetrahedron_collapsed", "prism_collapsed", "pyramid_collapsed"]


def _npts(strength: int) -> int:
    return max(1, (int(strength) + 2) // 2)  # ceil((p+1)/2)


def triangle_collapsed(strength: int):
    """Rule on the reference triangle (-1,-1),(1,-1),(-1,1), exact to ``strength``."""
    from . import Rule

    n = _npts(strength)
    wa, pa = gauss(n)
    wb, pb = gauss_jacobi(n, 1.0, 0.0)
    a = pa[:, 0][:, None]  # [na, 1]
    b = pb[:, 0][None, :]  # [1, nb]
    x = (1.0 + a) * (1.0 - b) / 2.0 - 1.0
    y = np.broadcast_to(b, x.shape)
    # dx dy = ((1-b)/2) da db; the (1-b) factor is the Jacobi weight
    w = (wa[:, None] * wb[None, :]) / 2.0
    pts = np.stack([x.reshape(-1), y.reshape(-1)], axis=-1)
    return Rule(w.reshape(-1), pts)


def tetrahedron_collapsed(strength: int):
    """Rule on the reference tetrahedron, exact to total degree ``strength``."""
    from . import Rule

    n = _npts(strength)
    wa, pa = gauss(n)
    wb, pb = gauss_jacobi(n, 1.0, 0.0)
    wc, pc = gauss_jacobi(n, 2.0, 0.0)
    a = pa[:, 0][:, None, None]
    b = pb[:, 0][None, :, None]
    c = pc[:, 0][None, None, :]
    x = (1.0 + a) * (1.0 - b) * (1.0 - c) / 4.0 - 1.0
    y = (1.0 + b) * (1.0 - c) / 2.0 - 1.0
    y = np.broadcast_to(y, x.shape)
    z = np.broadcast_to(c, x.shape)
    # dx dy dz = ((1-b)/2) ((1-c)/2)^2 da db dc; absorbed by Jacobi weights
    w = wa[:, None, None] * wb[None, :, None] * wc[None, None, :] / 8.0
    pts = np.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
    return Rule(w.reshape(-1), pts)


def prism_collapsed(strength: int):
    """Rule on the reference prism (triangle x segment), exact to ``strength``."""
    from . import Rule

    tri = triangle_collapsed(strength)
    n = _npts(strength)
    wz, pz = gauss(n)
    w = (tri.weights[:, None] * wz[None, :]).reshape(-1)
    xy = np.repeat(tri.points, n, axis=0)
    z = np.tile(pz[:, 0], tri.num_points)
    pts = np.concatenate([xy, z[:, None]], axis=-1)
    return Rule(w, pts)


def pyramid_collapsed(strength: int):
    """Rule on the reference pyramid (base [-1,1]^2 at z=-1, apex (0,0,1))."""
    from . import Rule

    n = _npts(strength)
    wa, pa = gauss(n)
    wc, pc = gauss_jacobi(n, 2.0, 0.0)
    a = pa[:, 0][:, None, None]
    b = pa[:, 0][None, :, None]
    c = pc[:, 0][None, None, :]
    s = (1.0 - c) / 2.0  # cross-section scale: 1 at z=-1, 0 at apex
    x = np.broadcast_to(a * s, (n, n, n))
    y = np.broadcast_to(b * s, (n, n, n))
    z = np.broadcast_to(c, (n, n, n))
    # dx dy dz = s^2 da db dc = ((1-c)/2)^2 da db dc; absorbed by GJ(2,0)
    w = wa[:, None, None] * wa[None, :, None] * wc[None, None, :] / 4.0
    pts = np.stack([x.reshape(-1), y.reshape(-1), z.reshape(-1)], axis=-1)
    return Rule(w.reshape(-1), pts)
