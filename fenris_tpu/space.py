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
import functools

from .config import MATMUL_PRECISION

# f32 einsums must not route through bf16 MXU passes (see config.py)
_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)
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
    "GridIndex",
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
        r = _einsum("bm,bmd->bd", phi, X_geo) - x
        J = _einsum("bmi,bmd->bid", X_geo, dphi)  # J[i, j] = dT_i/dxi_j
        # closed-form small-matrix inverse (jnp.linalg.solve lowers to a
        # looping LU on TPU — pathologically slow under batching)
        from .assembly.local import inv_and_det

        Jinv, _ = inv_and_det(J)
        dxi = _einsum("bij,bj->bi", Jinv, r)
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


@dataclass(frozen=True)
class GridIndex:
    """Uniform-grid spatial acceleration structure over element AABBs.

    The TPU-native replacement for the reference's R*-tree
    (``SpatiallyIndexed``/``RTreeAccelerationStructure``,
    spatially_indexed.rs:89): built once on the host by rasterizing every
    element's (inflated) AABB into grid cells, stored as a **padded dense
    candidate table** ``[num_grid_cells, K]`` so lookups under jit are a
    single gather — no pointer chasing, no data-dependent control flow.
    """

    origin: np.ndarray  # [d]
    inv_cell: np.ndarray  # [d] 1 / cell size
    dims: np.ndarray  # [d] int
    table: np.ndarray  # [num_cells, K] int32 element ids, -1 padded
    mesh: Mesh

    @staticmethod
    def build(mesh: Mesh, avg_elements_per_cell: float = 2.0) -> "GridIndex":
        aabbs = _element_aabbs(mesh)
        d = mesh.dim
        lo_g = aabbs.lo.min(axis=0)
        hi_g = aabbs.hi.max(axis=0)
        extent = np.maximum(hi_g - lo_g, 1e-300)
        # target number of cells ~ E / avg_elements_per_cell, distributed
        # proportionally to the domain aspect ratio
        E = mesh.num_cells
        target_cells = max(1, int(E / avg_elements_per_cell))
        scale = (target_cells / np.prod(extent / extent.max())) ** (1.0 / d)
        dims = np.maximum(1, np.floor(extent / extent.max() * scale).astype(np.int64))
        cell = extent / dims
        inflate = 1e-9 * extent.max()
        lo_idx = np.clip(
            np.floor((aabbs.lo - inflate - lo_g) / cell).astype(np.int64), 0, dims - 1
        )
        hi_idx = np.clip(
            np.floor((aabbs.hi + inflate - lo_g) / cell).astype(np.int64), 0, dims - 1
        )
        # rasterize (elements span few cells on quasi-uniform meshes)
        spans = hi_idx - lo_idx + 1
        counts = np.prod(spans, axis=1)
        total = int(counts.sum())
        elem_ids = np.repeat(np.arange(E, dtype=np.int64), counts)
        # enumerate covered cells per element, vectorized by offset ranks
        offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
        rank = np.arange(total) - np.repeat(offs, counts)
        cell_coords = np.empty((total, d), dtype=np.int64)
        stride = np.ones((E, d), dtype=np.int64)
        for ax in range(d - 2, -1, -1):
            stride[:, ax] = stride[:, ax + 1] * spans[:, ax + 1]
        stride_r = np.repeat(stride, counts, axis=0)
        lo_r = np.repeat(lo_idx, counts, axis=0)
        span_r = np.repeat(spans, counts, axis=0)
        rem = rank
        for ax in range(d):
            q = rem // stride_r[:, ax]
            cell_coords[:, ax] = lo_r[:, ax] + q % span_r[:, ax]
            rem = rem % stride_r[:, ax]
        lin = np.zeros(total, dtype=np.int64)
        mul = 1
        for ax in range(d - 1, -1, -1):
            lin += cell_coords[:, ax] * mul
            mul *= dims[ax]
        order = np.argsort(lin, kind="stable")
        lin_s, elem_s = lin[order], elem_ids[order]
        ncells = int(np.prod(dims))
        starts = np.searchsorted(lin_s, np.arange(ncells + 1))
        percell = np.diff(starts)
        K = max(1, int(percell.max()))
        table = np.full((ncells, K), -1, dtype=np.int32)
        pos = np.arange(total) - np.repeat(starts[:-1], percell)
        table[lin_s, pos] = elem_s
        return GridIndex(
            origin=lo_g, inv_cell=1.0 / cell, dims=dims, table=table, mesh=mesh
        )

    def candidates(self, points):
        """Padded candidate element ids per query point: [Q, K], -1 pads."""
        pts = jnp.asarray(points)
        dims = jnp.asarray(self.dims)
        idx = jnp.floor(
            (pts - jnp.asarray(self.origin)) * jnp.asarray(self.inv_cell)
        ).astype(jnp.int32)
        idx = jnp.clip(idx, 0, dims - 1)
        d = pts.shape[-1]
        lin = jnp.zeros(pts.shape[0], dtype=jnp.int32)
        mul = 1
        for ax in range(d - 1, -1, -1):
            lin = lin + idx[:, ax] * mul
            mul = mul * int(self.dims[ax])
        return jnp.asarray(self.table)[lin]


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


def _select_among_candidates(mesh: Mesh, points, cand, cand_dist, tol: float):
    """Newton-invert the geometry map on candidate sets and pick the best.

    ``cand``: [Q, k] element ids (-1 pads); ``cand_dist``: [Q, k] tie-break
    distances (e.g. AABB distances; pads should carry +inf).
    """
    el = mesh.element
    Q, k = cand.shape
    m = el.geometry.num_nodes
    X_geo_all = jnp.asarray(mesh.cell_points()[:, :m, :])
    safe_cand = jnp.maximum(cand, 0)
    cand_X = X_geo_all[safe_cand]  # [Q, k, m, d]
    flat_X = cand_X.reshape(Q * k, m, -1)
    flat_x = jnp.repeat(points, k, axis=0)
    xi = map_physical_coordinates(el, flat_X, flat_x).reshape(Q, k, -1)
    viol = reference_domain_distance(el, xi)  # [Q, k]
    pad = cand < 0
    viol = jnp.where(pad, jnp.inf, viol)
    score = viol * 1e6 + jnp.where(pad, jnp.inf, cand_dist)
    best = jnp.argmin(score, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, best.reshape(Q, *([1] * (a.ndim - 1))), axis=1
    ).squeeze(1)
    xi_best = take(xi)
    elem_best = jnp.take_along_axis(safe_cand, best[:, None], axis=1)[:, 0]
    viol_best = take(viol)
    xi_best = jnp.where(
        (viol_best > tol)[:, None], _clamp_to_reference(el, xi_best), xi_best
    )
    return ClosestElementResult(
        element_indices=elem_best.astype(jnp.int32),
        reference_coords=xi_best,
        domain_distance=viol_best,
    )


def find_closest_element(
    mesh: Mesh,
    points,
    num_candidates: int = 8,
    tol: float = 1e-10,
    index: Optional[GridIndex] = None,
) -> ClosestElementResult:
    """Locate the element containing (or closest to) each query point.

    Strategy (replacing the reference's R*-tree pruned NN iteration,
    spatially_indexed.rs:116): obtain a candidate set per query — either
    the top-k nearest element AABBs (brute force, exact, O(Q·E)) or a
    :class:`GridIndex` cell lookup (O(Q·K), for large meshes) — then
    Newton-invert the geometry map on all candidates in a batch and select
    the candidate whose reference coordinates violate the reference domain
    least (ties → smaller AABB distance).  Deterministic and fully
    vectorized; exact for interior points whenever the true containing
    element is among the candidates.
    """
    points = jnp.asarray(points)
    if index is not None:
        cand = index.candidates(points)  # [Q, K], -1 pads
        # tie-break by distance to candidate AABB centers
        aabbs = _element_aabbs(mesh)
        centers = jnp.asarray((aabbs.lo + aabbs.hi) / 2.0)
        safe = jnp.maximum(cand, 0)
        dist = jnp.linalg.norm(centers[safe] - points[:, None, :], axis=-1)
        return _select_among_candidates(mesh, points, cand, dist, tol)

    el = mesh.element
    k = min(num_candidates, mesh.num_cells)
    aabbs = _element_aabbs(mesh)
    lo = jnp.asarray(aabbs.lo)
    hi = jnp.asarray(aabbs.hi)
    d2 = jnp.sum(
        jnp.square(jnp.maximum(lo[None] - points[:, None], 0.0))
        + jnp.square(jnp.maximum(points[:, None] - hi[None], 0.0)),
        axis=-1,
    )
    neg_d2, cand = jax.lax.top_k(-d2, k)  # [Q, k]
    return _select_among_candidates(
        mesh, points, cand, jnp.sqrt(-neg_d2 + 1e-300), tol
    )


def interpolate_at_points(
    mesh: Mesh, u, points, solution_dim: int = 1, num_candidates: int = 8,
    index: Optional[GridIndex] = None,
):
    """Interpolate a FE function at arbitrary physical points.

    Parity: interpolate.rs:161 (+ SpatiallyIndexed extrapolation semantics:
    outside points evaluate at the clamped reference coords of the closest
    element).  ``u``: [num_nodes * s] global dofs -> [Q, s].
    """
    res = find_closest_element(mesh, points, num_candidates, index=index)
    return _interpolate_located(mesh, u, res, solution_dim), res


def _interpolate_located(mesh: Mesh, u, located: ClosestElementResult, s: int):
    el = mesh.element
    cells = jnp.asarray(mesh.cells)
    phi = el.phi(located.reference_coords)  # [Q, n]
    nodes = cells[located.element_indices]  # [Q, n]
    u2 = jnp.asarray(u).reshape(-1, s)
    return _einsum("qn,qns->qs", phi, u2[nodes])


def interpolate_gradient_at_points(
    mesh: Mesh, u, points, solution_dim: int = 1, num_candidates: int = 8,
    index: Optional[GridIndex] = None,
):
    """Interpolate ∇u at arbitrary points (interpolate.rs:214) -> [Q, d, s]."""
    el = mesh.element
    res = find_closest_element(mesh, points, num_candidates, index=index)
    cells = jnp.asarray(mesh.cells)
    m = el.geometry.num_nodes
    Xg = jnp.asarray(mesh.cell_points()[:, :m, :])[res.element_indices]
    dphi = el.dphi(res.reference_coords)  # [Q, n, d]
    gdphi = el.geometry.dphi(res.reference_coords)  # [Q, m, d]
    J = _einsum("qmi,qmd->qid", Xg, gdphi)
    from .assembly.local import inv_and_det

    Jinv, _ = inv_and_det(J)
    gp = _einsum("qnk,qki->qni", dphi, Jinv)
    u2 = jnp.asarray(u).reshape(-1, solution_dim)
    nodes = cells[res.element_indices]
    return _einsum("qni,qns->qis", gp, u2[nodes]), res


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
        mesh: Mesh, points, with_gradients: bool = False, num_candidates: int = 8,
        index: Optional[GridIndex] = None,
    ) -> "FixedInterpolator":
        el = mesh.element
        res = find_closest_element(mesh, points, num_candidates, index=index)
        cells = jnp.asarray(mesh.cells)
        phi = el.phi(res.reference_coords)
        grad = None
        if with_gradients:
            m = el.geometry.num_nodes
            Xg = jnp.asarray(mesh.cell_points()[:, :m, :])[res.element_indices]
            dphi = el.dphi(res.reference_coords)
            gdphi = el.geometry.dphi(res.reference_coords)
            J = _einsum("qmi,qmd->qid", Xg, gdphi)
            from .assembly.local import inv_and_det as _iad

            gp = _einsum("qnk,qki->qni", dphi, _iad(J)[0])
            grad = gp
        return FixedInterpolator(nodes=cells[res.element_indices], phi=phi, grad_phi=grad)

    def interpolate(self, u, solution_dim: int = 1):
        u2 = jnp.asarray(u).reshape(-1, solution_dim)
        return _einsum("qn,qns->qs", self.phi, u2[self.nodes])

    def interpolate_gradient(self, u, solution_dim: int = 1):
        if self.grad_phi is None:
            raise ValueError("built without gradients")
        u2 = jnp.asarray(u).reshape(-1, solution_dim)
        return _einsum("qni,qns->qis", self.grad_phi, u2[self.nodes])
