"""Finite element spaces: point location, inverse mapping, interpolation.

Parity: src/space/* and src/element.rs —

* ``map_physical_coordinates`` (element.rs:303): Newton inversion of the
  isoparametric (here: subparametric-geometry) map;
* ``project_physical_coordinates`` (element.rs:396): clamped projection for
  points outside the element;
* ``SpatiallyIndexed`` (space/spatially_indexed.rs:151): accelerated
  closest-element queries — the R*-tree is replaced by a TPU-friendly
  **candidate-set search**: vectorized AABB distances + top-k candidate
  gather + batched Newton, all deterministic dense ops;
* ``interpolate_at_points`` / ``interpolate_gradient_at_points``
  (space/interpolate.rs:161, :214);
* ``FixedInterpolator`` (space/fixed_interpolator.rs:13): precomputed
  sparse interpolation applied as gather + einsum.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .mesh import Mesh
from .reference_elements import ReferenceElement

__all__ = [
    "map_physical_coordinates",
    "reference_domain_distance",
    "find_closest_element",
    "interpolate_at_points",
    "interpolate_gradient_at_points",
    "FixedInterpolator",
]


def _geometry_phi_dphi(el: ReferenceElement, xi):
    geo = el.geometry
    return geo.phi(xi), geo.dphi(xi)


def map_physical_coordinates(
    el: ReferenceElement, X_geo, x, num_iterations: int = 24
):
    """Newton-invert the geometry map for a batch of (element, point) pairs.

    ``X_geo``: [B, m, d] per-query element geometry nodes; ``x``: [B, d]
    physical points.  Returns ``xi`` [B, d].  Matches element.rs:303
    (Newton on T(ξ) = x); a fixed iteration count keeps the computation
    shape-static (converges quadratically; 24 iterations is far beyond f64
    saturation, and linear-geometry elements converge in one step).
    """
    dtype = X_geo.dtype

    def body(_, xi):
        phi, dphi = _geometry_phi_dphi(el, xi)  # [B, m], [B, m, d]
        r = jnp.einsum("bm,bmd->bd", phi, X_geo) - x
        J = jnp.einsum("bmi,bmd->bid", X_geo, dphi)  # J[i, j] = dT_i/dxi_j
        # solve J dxi = r  (small d: use explicit solve)
        dxi = jnp.linalg.solve(J, r[..., None])[..., 0]
        return xi - dxi

    xi0 = jnp.zeros(x.shape, dtype)
    return jax.lax.fori_loop(0, num_iterations, body, xi0)


def reference_domain_distance(el: ReferenceElement, xi):
    """How far outside the reference domain ξ lies (0 = inside).

    Uses the max violation of the domain's defining inequalities; useful
    both for membership tests (<= tol) and for ranking candidate elements.
    """
    if el.domain in ("segment", "quad", "hex"):
        return jnp.maximum(jnp.max(jnp.abs(xi), axis=-1) - 1.0, 0.0)
    if el.domain in ("tri", "tet"):
        d = xi.shape[-1]
        bound = 2.0 - d  # x + y (+ z) <= 2 - d
        viol = jnp.maximum(jnp.max(-1.0 - xi, axis=-1), jnp.sum(xi, axis=-1) - bound)
        return jnp.maximum(viol, 0.0)
    raise ValueError(f"unknown domain {el.domain}")


def _clamp_to_reference(el: ReferenceElement, xi):
    """Project ξ onto the reference domain (approximate, for extrapolation)."""
    xi = jnp.clip(xi, -1.0, 1.0)
    if el.domain in ("tri", "tet"):
        d = xi.shape[-1]
        bound = 2.0 - d
        excess = jnp.maximum(jnp.sum(xi, axis=-1) - bound, 0.0)
        xi = xi - excess[..., None] / d
    return xi


class ClosestElementResult(NamedTuple):
    element_indices: jnp.ndarray  # [Q] int32
    reference_coords: jnp.ndarray  # [Q, d]
    domain_distance: jnp.ndarray  # [Q] 0 = inside


@dataclass(frozen=True)
class _Aabbs:
    lo: np.ndarray  # [E, d]
    hi: np.ndarray  # [E, d]


def _element_aabbs(mesh: Mesh) -> _Aabbs:
    X = mesh.cell_points()
    return _Aabbs(lo=X.min(axis=1), hi=X.max(axis=1))


def find_closest_element(
    mesh: Mesh, points, num_candidates: int = 8, tol: float = 1e-10
) -> ClosestElementResult:
    """Locate the element containing (or closest to) each query point.

    Strategy (replacing the reference's R*-tree pruned NN iteration,
    spatially_indexed.rs:116): compute squared distances from each query
    to every element AABB (one [Q, E] dense op, chunked), take the top-k
    nearest candidates, Newton-invert the geometry map on all candidates in
    a batch, and select the candidate whose reference coordinates violate
    the domain least (ties → smaller AABB distance).  Deterministic, fully
    vectorized, and exact for interior points whenever the true containing
    element is among the k candidates.
    """
    points = jnp.asarray(points)
    Q = points.shape[0]
    el = mesh.element
    k = min(num_candidates, mesh.num_cells)
    aabbs = _element_aabbs(mesh)
    lo = jnp.asarray(aabbs.lo)
    hi = jnp.asarray(aabbs.hi)
    m = el.geometry.num_nodes
    X_geo_all = jnp.asarray(mesh.cell_points()[:, :m, :])

    # [Q, E] clamped distance to AABBs (chunk over queries if enormous)
    d2 = jnp.sum(
        jnp.square(jnp.maximum(lo[None] - points[:, None], 0.0))
        + jnp.square(jnp.maximum(points[:, None] - hi[None], 0.0)),
        axis=-1,
    )
    neg_d2, cand = jax.lax.top_k(-d2, k)  # [Q, k]
    cand_X = X_geo_all[cand]  # [Q, k, m, d]

    flat_X = cand_X.reshape(Q * k, m, -1)
    flat_x = jnp.repeat(points, k, axis=0)
    xi = map_physical_coordinates(el, flat_X, flat_x).reshape(Q, k, -1)
    viol = reference_domain_distance(el, xi)  # [Q, k]

    # pick candidate minimizing (violation, aabb distance)
    score = viol * 1e6 + jnp.sqrt(-neg_d2 + 1e-300)
    best = jnp.argmin(score, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, best.reshape(Q, *([1] * (a.ndim - 1))), axis=1
    ).squeeze(1)
    xi_best = take(xi)
    elem_best = jnp.take_along_axis(cand, best[:, None], axis=1)[:, 0]
    viol_best = take(viol)
    # clamp reference coords for robust extrapolation-by-closest-element
    xi_best = jnp.where(
        (viol_best > tol)[:, None], _clamp_to_reference(el, xi_best), xi_best
    )
    return ClosestElementResult(
        element_indices=elem_best.astype(jnp.int32),
        reference_coords=xi_best,
        domain_distance=viol_best,
    )


def interpolate_at_points(
    mesh: Mesh, u, points, solution_dim: int = 1, num_candidates: int = 8
):
    """Interpolate a FE function at arbitrary physical points.

    Parity: interpolate.rs:161 (+ SpatiallyIndexed extrapolation semantics:
    outside points evaluate at the clamped reference coords of the closest
    element).  ``u``: [num_nodes * s] global dofs -> [Q, s].
    """
    res = find_closest_element(mesh, points, num_candidates)
    return _interpolate_located(mesh, u, res, solution_dim), res


def _interpolate_located(mesh: Mesh, u, located: ClosestElementResult, s: int):
    el = mesh.element
    cells = jnp.asarray(mesh.cells)
    phi = el.phi(located.reference_coords)  # [Q, n]
    nodes = cells[located.element_indices]  # [Q, n]
    u2 = jnp.asarray(u).reshape(-1, s)
    return jnp.einsum("qn,qns->qs", phi, u2[nodes])


def interpolate_gradient_at_points(
    mesh: Mesh, u, points, solution_dim: int = 1, num_candidates: int = 8
):
    """Interpolate ∇u at arbitrary points (interpolate.rs:214) -> [Q, d, s]."""
    el = mesh.element
    res = find_closest_element(mesh, points, num_candidates)
    cells = jnp.asarray(mesh.cells)
    m = el.geometry.num_nodes
    Xg = jnp.asarray(mesh.cell_points()[:, :m, :])[res.element_indices]
    dphi = el.dphi(res.reference_coords)  # [Q, n, d]
    gdphi = el.geometry.dphi(res.reference_coords)  # [Q, m, d]
    J = jnp.einsum("qmi,qmd->qid", Xg, gdphi)
    Jinv = jnp.linalg.inv(J)
    gp = jnp.einsum("qnk,qki->qni", dphi, Jinv)
    u2 = jnp.asarray(u).reshape(-1, solution_dim)
    nodes = cells[res.element_indices]
    return jnp.einsum("qni,qns->qis", gp, u2[nodes]), res


@dataclass(frozen=True)
class FixedInterpolator:
    """Precompiled interpolation operator for a fixed set of sample points.

    Parity: fixed_interpolator.rs:13 — stores per-point node indices, basis
    values and (optionally) physical basis gradients; application is a
    gather + contraction, ideal for repeated embedding/visualization
    queries on TPU.
    """

    nodes: jnp.ndarray  # [Q, n]
    phi: jnp.ndarray  # [Q, n]
    grad_phi: Optional[jnp.ndarray]  # [Q, n, d] or None

    @staticmethod
    def from_space_and_points(
        mesh: Mesh, points, with_gradients: bool = False, num_candidates: int = 8
    ) -> "FixedInterpolator":
        el = mesh.element
        res = find_closest_element(mesh, points, num_candidates)
        cells = jnp.asarray(mesh.cells)
        phi = el.phi(res.reference_coords)
        grad = None
        if with_gradients:
            m = el.geometry.num_nodes
            Xg = jnp.asarray(mesh.cell_points()[:, :m, :])[res.element_indices]
            dphi = el.dphi(res.reference_coords)
            gdphi = el.geometry.dphi(res.reference_coords)
            J = jnp.einsum("qmi,qmd->qid", Xg, gdphi)
            gp = jnp.einsum("qnk,qki->qni", dphi, jnp.linalg.inv(J))
            grad = gp
        return FixedInterpolator(nodes=cells[res.element_indices], phi=phi, grad_phi=grad)

    def interpolate(self, u, solution_dim: int = 1):
        u2 = jnp.asarray(u).reshape(-1, solution_dim)
        return jnp.einsum("qn,qns->qs", self.phi, u2[self.nodes])

    def interpolate_gradient(self, u, solution_dim: int = 1):
        if self.grad_phi is None:
            raise ValueError("built without gradients")
        u2 = jnp.asarray(u).reshape(-1, solution_dim)
        return jnp.einsum("qni,qns->qis", self.grad_phi, u2[self.nodes])
