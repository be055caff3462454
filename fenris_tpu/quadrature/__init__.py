"""Quadrature rules for the fenris-tpu reference domains.

Mirrors the capability surface of the reference's quadrature stack
(fenris-quadrature + src/quadrature/*): univariate Gauss and Gauss-Lobatto,
tensor-product rules for quads/hexes, minimum-point symmetric total-order
rules (Witherden–Vincent "polyquad" tables) for tri/quad/tet/hex/prism/
pyramid, arbitrary-strength collapsed-coordinate (Duffy/Gauss-Jacobi)
simplex rules beyond the table range, canonical per-element defaults, and
composite subdivided rules.

A rule is a plain ``Rule(weights[q], points[q, d])`` pair of float64 numpy
arrays; rules are host-side constants that get baked into jitted assembly
kernels as tabulated basis values.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

__all__ = [
    "Rule",
    "gauss",
    "gauss_lobatto",
    "tensor",
    "total_order",
    "canonical",
    "subdivide",
    "polyquad",
    "simplex",
]


class Rule(NamedTuple):
    """A quadrature rule ``(weights[q], points[q, d])`` on a reference domain."""

    weights: np.ndarray
    points: np.ndarray

    @property
    def num_points(self) -> int:
        return len(self.weights)

    @property
    def dim(self) -> int:
        return self.points.shape[1]

    def integrate(self, f) -> float:
        """Approximate the integral of callable ``f(point) -> scalar``."""
        vals = np.array([f(p) for p in self.points])
        return float(np.dot(self.weights, vals))


def _rule(weights, points, dim: int) -> Rule:
    w = np.ascontiguousarray(np.asarray(weights, dtype=np.float64).reshape(-1))
    p = np.ascontiguousarray(np.asarray(points, dtype=np.float64).reshape(-1, dim))
    assert w.shape[0] == p.shape[0]
    return Rule(w, p)


from . import canonical, polyquad, simplex, subdivide, tensor, total_order, univariate  # noqa: E402
from .canonical import canonical_mass, canonical_stiffness  # noqa: E402
from .subdivide import subdivide_triangle, subdivide_univariate  # noqa: E402
from .tensor import hexahedron_gauss, quadrilateral_gauss, tensor_product  # noqa: E402
from .univariate import gauss, gauss_jacobi, gauss_lobatto  # noqa: E402
