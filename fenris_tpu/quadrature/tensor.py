"""Tensor-product Gauss rules for quads and hexes.

Parity: fenris-quadrature/src/tensor.rs:13 (quadrilateral_gauss) and :36
(hexahedron_gauss).  Point ordering matches the reference (x-major, then y,
then z) so downstream tabulations are bit-identical.
"""

from __future__ import annotations

import numpy as np

from .univariate import gauss

__all__ = ["quadrilateral_gauss", "hexahedron_gauss", "tensor_product"]


def tensor_product(*rules):
    """Tensor product of 1D rules; first rule varies slowest (x-major)."""
    from . import Rule

    ws = [np.asarray(r.weights).reshape(-1) for r in rules]
    xs = [np.asarray(r.points).reshape(-1) for r in rules]
    grids = np.meshgrid(*xs, indexing="ij")
    wgrids = np.meshgrid(*ws, indexing="ij")
    points = np.stack([g.reshape(-1) for g in grids], axis=-1)
    weights = np.prod(np.stack([g.reshape(-1) for g in wgrids], axis=-1), axis=-1)
    return Rule(weights, points)


def quadrilateral_gauss(num_points_per_dim: int):
    """Gauss rule on the reference quad [-1,1]^2 (n points per dimension)."""
    g = gauss(num_points_per_dim)
    return tensor_product(g, g)


def hexahedron_gauss(num_points_per_dim: int):
    """Gauss rule on the reference hex [-1,1]^3 (n points per dimension)."""
    g = gauss(num_points_per_dim)
    return tensor_product(g, g, g)
