"""Composite quadrature rules by subdividing the reference domain.

Parity: src/quadrature/subdivide.rs (``subdivide_univariate`` :18,
``subdivide_triangle`` :74).  Useful for integrating non-smooth integrands
(e.g. error estimation of functions with kinks inside an element).
"""

from __future__ import annotations

import numpy as np

__all__ = ["subdivide_univariate", "subdivide_triangle"]


def subdivide_univariate(rule, pieces: int):
    """Apply ``rule`` in each of ``pieces`` equal subdivisions of [-1, 1]."""
    from . import Rule

    if pieces < 1:
        raise ValueError("number of pieces must be >= 1")
    w0 = np.asarray(rule.weights)
    x0 = np.asarray(rule.points).reshape(-1)
    size = 2.0 / pieces
    jac = size / 2.0
    weights, points = [], []
    for i in range(pieces):
        a = i * size - 1.0
        b = a + size
        weights.append(w0 * jac)
        points.append(((b - a) * x0 + (b + a)) / 2.0)
    return Rule(np.concatenate(weights), np.concatenate(points)[:, None])


def subdivide_triangle(rule, subdivisions: int):
    """Composite rule on the reference triangle via regular grid subdivision.

    The square [-1,1]^2 is subdivided into ``subdivisions^2`` cells; cells in
    the lower-left triangle are split into two triangles (diagonal cells keep
    only the lower half) and the base rule is mapped to each.
    """
    from . import Rule

    if subdivisions < 1:
        raise ValueError("number of subdivisions must be >= 1")
    w0 = np.asarray(rule.weights)
    p0 = np.asarray(rule.points).reshape(-1, 2)
    cell = 2.0 / subdivisions

    # Linear map from reference triangle (-1,-1),(1,-1),(-1,1) to a triangle
    # with vertices v0, v1, v2.
    def mapped(verts):
        v0, v1, v2 = (np.asarray(v) for v in verts)
        # x = v0 * phi0 + v1 * phi1 + v2 * phi2 with P1 basis on ref triangle
        phi0 = -0.5 * p0[:, 0] - 0.5 * p0[:, 1]
        phi1 = 0.5 * p0[:, 0] + 0.5
        phi2 = 0.5 * p0[:, 1] + 0.5
        x = np.outer(phi0, v0) + np.outer(phi1, v1) + np.outer(phi2, v2)
        J = np.stack([(v1 - v0) / 2.0, (v2 - v0) / 2.0], axis=-1)
        detJ = abs(np.linalg.det(J))
        return w0 * detJ, x

    weights, points = [], []
    for i in range(subdivisions):
        for j in range(i + 1):
            cx = -1.0 + cell * (j + 0.5)
            cy = 1.0 - cell * (i + 0.5)
            c00 = np.array([cx - cell / 2, cy - cell / 2])
            c10 = np.array([cx + cell / 2, cy - cell / 2])
            c11 = np.array([cx + cell / 2, cy + cell / 2])
            c01 = np.array([cx - cell / 2, cy + cell / 2])
            w, x = mapped([c00, c10, c01])
            weights.append(w)
            points.append(x)
            if i != j:
                w, x = mapped([c10, c11, c01])
                weights.append(w)
                points.append(x)
    return Rule(np.concatenate(weights), np.concatenate(points))
