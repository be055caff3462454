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
    "project_physical_coordinates",
    "project_reference_domain",
    "closest_point_in_element",
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


def _domain_distance(domain: str, xi):
    if domain in ("segment", "quad", "hex"):
        return jnp.maximum(jnp.max(jnp.abs(xi), axis=-1) - 1.0, 0.0)
    if domain in ("tri", "tet"):
        d = xi.shape[-1]
        bound = 2.0 - d  # x + y (+ z) <= 2 - d
        viol = jnp.maximum(jnp.max(-1.0 - xi, axis=-1), jnp.sum(xi, axis=-1) - bound)
        return jnp.maximum(viol, 0.0)
    raise ValueError(f"unknown domain {domain}")


def reference_domain_distance(el: ReferenceElement, xi):
    """How far outside the reference domain ξ lies (0 = inside).

    Uses the max violation of the domain's defining inequalities; useful
    both for membership tests (<= tol) and for ranking candidate elements.
    """
    return _domain_distance(el.domain, xi)


def project_reference_domain(el: ReferenceElement, xi):
    """Exact Euclidean projection of ξ onto the reference domain.

    Box domains clip coordinatewise; simplex domains map to the unit
    corner simplex ``{y >= 0, Σy <= 1}`` (an affine similarity, so
    projections transfer) and apply the exact sort-based simplex
    projection.  Batched and jittable.
    """
    if el.domain in ("segment", "quad", "hex"):
        return jnp.clip(xi, -1.0, 1.0)
    if el.domain in ("tri", "tet"):
        d = xi.shape[-1]
        y = (xi + 1.0) / 2.0  # {y >= 0, sum y <= 1}
        z = jnp.maximum(y, 0.0)
        free_ok = jnp.sum(z, axis=-1) <= 1.0
        # otherwise project onto the face Σy = 1 with y >= 0 (sorted
        # threshold construction; exact for the Euclidean metric)
        u = -jnp.sort(-y, axis=-1)  # descending
        css = jnp.cumsum(u, axis=-1) - 1.0
        j = jnp.arange(1, d + 1, dtype=xi.dtype)
        rho = jnp.sum(u - css / j > 0, axis=-1)
        rho = jnp.maximum(rho, 1)
        tau = jnp.take_along_axis(css, rho[..., None] - 1, axis=-1)[..., 0]
        tau = tau / rho.astype(xi.dtype)
        w = jnp.maximum(y - tau[..., None], 0.0)
        y_proj = jnp.where(free_ok[..., None], z, w)
        return 2.0 * y_proj - 1.0
    raise ValueError(f"unknown domain {el.domain}")


def project_physical_coordinates(
    el: ReferenceElement, X_geo, x, num_iterations: int = 24
):
    """Normal-equations Gauss-Newton projection (element.rs:396).

    Solves min_ξ ||T(ξ) - x||² *unconstrained* (like the reference, this
    will happily return ξ outside the reference domain — see
    :func:`closest_point_in_element` for the constrained query).  Works
    for non-square geometry maps (surface elements embedded in higher
    dimension): the Newton step solves JᵀJ dξ = Jᵀ r.
    """
    from .assembly.local import inv_and_det

    dtype = X_geo.dtype

    def body(_, xi):
        phi, dphi = _geometry_phi_dphi(el, xi)  # [B, m], [B, m, dr]
        r = _einsum("bm,bmd->bd", phi, X_geo) - x  # [B, ds]
        J = _einsum("bmi,bmd->bid", X_geo, dphi)  # [B, ds, dr]
        JtJ = _einsum("bid,bie->bde", J, J)
        Jtr = _einsum("bid,bi->bd", J, r)
        inv, _ = inv_and_det(JtJ)
        return xi - _einsum("bde,be->bd", inv, Jtr)

    xi0 = jnp.zeros((x.shape[0], el.ref_dim), dtype)
    return jax.lax.fori_loop(0, num_iterations, body, xi0)


def _domain_vertices(domain: str) -> np.ndarray:
    if domain == "segment":
        return np.array([[-1.0], [1.0]])
    if domain == "quad":
        return np.array([[-1.0, -1], [1, -1], [1, 1], [-1, 1]])
    if domain == "hex":
        v = [[x, y, z] for z in (-1.0, 1.0) for y in (-1.0, 1.0) for x in (-1.0, 1.0)]
        return np.asarray(v)
    if domain == "tri":
        return np.array([[-1.0, -1], [1, -1], [-1, 1]])
    if domain == "tet":
        return np.array([[-1.0, -1, -1], [1, -1, -1], [-1, 1, -1], [-1, -1, 1]])
    raise ValueError(domain)


def _domain_faces(domain: str):
    """All proper boundary faces of a reference domain as affine charts.

    Returns ``(vertices [nv, d], charts)`` where each chart is
    ``(c [d], B [d, k], subdomain)`` parametrizing a k-face as
    ``ξ(s) = c + B s`` with ``s`` ranging over ``subdomain``'s reference
    domain.  Used by :func:`closest_point_in_element` to enumerate
    candidate minimizers, mirroring the reference's per-face closest-point
    recursion (triangle.rs:450, tetrahedron.rs:616).
    """
    V = _domain_vertices(domain)
    charts = []

    def edge(i, j):
        c = (V[i] + V[j]) / 2.0
        B = ((V[j] - V[i]) / 2.0)[:, None]
        charts.append((c, B, "segment"))

    def tri_face(i, j, k):
        # affine chart over the [-1,1]-based reference triangle
        # {s >= -1, s0 + s1 <= 0}: ξ(s) = V_i + (1+s0)/2 (V_j - V_i)
        # + (1+s1)/2 (V_k - V_i); s = (-1,-1) ↦ V_i, (1,-1) ↦ V_j, (-1,1) ↦ V_k
        b0 = (V[j] - V[i]) / 2.0
        b1 = (V[k] - V[i]) / 2.0
        charts.append((V[i] + b0 + b1, np.stack([b0, b1], axis=1), "tri"))

    def quad_face(i, j, k, l):
        # planar square: ξ(s) = c + s0 t0 + s1 t1 with corners i,j,k,l CCW
        c = (V[i] + V[j] + V[k] + V[l]) / 4.0
        t0 = (V[j] - V[i]) / 2.0
        t1 = (V[l] - V[i]) / 2.0
        charts.append((c, np.stack([t0, t1], axis=1), "quad"))

    if domain == "segment":
        pass
    elif domain == "quad":
        for i, j in ((0, 1), (1, 2), (2, 3), (3, 0)):
            edge(i, j)
    elif domain == "tri":
        for i, j in ((0, 1), (1, 2), (2, 0)):
            edge(i, j)
    elif domain == "tet":
        for i, j in ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)):
            edge(i, j)
        for f in ((0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2)):
            tri_face(*f)
    elif domain == "hex":
        # vertex order: x fastest, then y, then z (see _domain_vertices)
        edges = (
            (0, 1), (2, 3), (4, 5), (6, 7),  # x-dir
            (0, 2), (1, 3), (4, 6), (5, 7),  # y-dir
            (0, 4), (1, 5), (2, 6), (3, 7),  # z-dir
        )
        for i, j in edges:
            edge(i, j)
        faces = (
            (0, 1, 3, 2), (4, 5, 7, 6),  # z = -1, +1
            (0, 1, 5, 4), (2, 3, 7, 6),  # y = -1, +1
            (0, 2, 6, 4), (1, 3, 7, 5),  # x = -1, +1
        )
        for f in faces:
            quad_face(*f)
    else:
        raise ValueError(domain)
    return V, charts


def closest_point_in_element(
    el: ReferenceElement,
    X_geo,
    x,
    num_iterations: int = 24,
    tol: float = 1e-10,
    charts: bool = True,
):
    """Constrained closest-point query (``ClosestPointInElement``,
    element.rs:462 + per-element impls, triangle.rs:450/536,
    tetrahedron.rs:616).

    Returns ``(xi, inside, distance)``: the reference coordinates of the
    closest point of the element (exactly the inverse-mapped point when
    ``x`` lies inside), whether the point is inside, and the physical
    distance ``||T(xi) - x||``.

    TPU-native design: the reference's per-element face recursion becomes
    a **batched candidate enumeration** — the interior stationary point
    plus an unconstrained Gauss–Newton solve on every boundary face/edge
    chart plus all vertices, all batched over queries with static shapes;
    infeasible face candidates are discarded and the feasible candidate of
    minimum physical distance wins.  Exact for affine elements (the
    constrained minimizer is a stationary point of some face restriction);
    standard local convergence for multilinear/curved geometry.

    ``charts=False`` skips the (~25x more expensive) boundary enumeration:
    interior queries are answered exactly, outside queries return
    ``inf`` distance — callers that only need insideness (or re-run
    outside queries themselves) use this as the fast pre-pass.
    """
    from .assembly.local import inv_and_det

    dtype = X_geo.dtype
    B_ = x.shape[0]
    # Interior: unconstrained Newton inversion decides insideness
    xi_n = map_physical_coordinates(el, X_geo, x, num_iterations)
    viol = reference_domain_distance(el, xi_n)
    inside = viol <= tol

    def phys_dist(xi):
        phi, _ = _geometry_phi_dphi(el, xi)
        return jnp.linalg.norm(_einsum("bm,bmd->bd", phi, X_geo) - x, axis=-1)

    cand_xi = [xi_n]
    cand_dist = [jnp.where(inside, 0.0, jnp.inf)]  # interior only if feasible

    if not charts:
        return xi_n, inside, cand_dist[0]

    V, chart_list = _domain_faces(el.domain)
    # vertices: zero-dimensional candidates
    for v in V:
        xi_v = jnp.broadcast_to(jnp.asarray(v, dtype), (B_, len(v)))
        cand_xi.append(xi_v)
        cand_dist.append(phys_dist(xi_v))
    # k-faces: Gauss-Newton in the face chart, feasibility-checked
    for c, Bm, subdomain in chart_list:
        c_j = jnp.asarray(c, dtype)
        B_j = jnp.asarray(Bm, dtype)
        k = Bm.shape[1]

        def body(_, s, c_j=c_j, B_j=B_j):
            xi = c_j + s @ B_j.T
            phi, dphi = _geometry_phi_dphi(el, xi)
            r = _einsum("bm,bmd->bd", phi, X_geo) - x
            J = _einsum("bmi,bmd->bid", X_geo, dphi)  # [B, ds, d]
            Js = _einsum("bid,dk->bik", J, B_j)  # [B, ds, k]
            JtJ = _einsum("bik,bil->bkl", Js, Js)
            Jtr = _einsum("bik,bi->bk", Js, r)
            inv, _ = inv_and_det(JtJ)
            return s - _einsum("bkl,bl->bk", inv, Jtr)

        s = jax.lax.fori_loop(0, num_iterations, body, jnp.zeros((B_, k), dtype))
        feasible = _domain_distance(subdomain, s) <= tol
        xi_f = c_j + s @ B_j.T
        cand_xi.append(xi_f)
        cand_dist.append(jnp.where(feasible, phys_dist(xi_f), jnp.inf))

    dists = jnp.stack(cand_dist, axis=1)  # [B, ncand]
    xis = jnp.stack(cand_xi, axis=1)  # [B, ncand, d]
    best = jnp.argmin(dists, axis=1)
    xi_best = jnp.take_along_axis(xis, best[:, None, None], axis=1)[:, 0]
    xi = jnp.where(inside[:, None], xi_n, xi_best)
    dist = jnp.where(inside, 0.0, jnp.take_along_axis(dists, best[:, None], axis=1)[:, 0])
    return xi, inside, dist


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
        # Safety: a query landing in an *empty* cell must not silently fall
        # back to element 0 — fill every empty cell with the candidates of
        # its nearest non-empty cell (multi-source BFS dilation over the
        # grid).  Far-outside queries then resolve through the closest
        # boundary cell's elements, matching the R*-tree's
        # closest-element semantics (spatially_indexed.rs:116).
        if (percell == 0).any() and (percell > 0).any():
            src = np.where(percell > 0, np.arange(ncells, dtype=np.int64), -1)
            grid = src.reshape(tuple(dims))
            while (grid < 0).any():
                new = grid.copy()
                for ax in range(d):
                    for shift in (1, -1):
                        shifted = np.roll(grid, shift, axis=ax)
                        edge = [slice(None)] * d
                        edge[ax] = 0 if shift == 1 else -1
                        shifted[tuple(edge)] = -1
                        new = np.where((new < 0) & (shifted >= 0), shifted, new)
                if np.array_equal(new, grid):
                    break  # disconnected slabs handled; never infinite-loop
                grid = new
            src = grid.reshape(-1)
            empty = percell == 0
            table[empty] = table[np.maximum(src[empty], 0)]
        return GridIndex(
            origin=lo_g, inv_cell=1.0 / cell, dims=dims, table=table, mesh=mesh
        )

    def _cells_of(self, points):
        pts = jnp.asarray(points)
        dims = jnp.asarray(self.dims)
        idx = jnp.floor(
            (pts - jnp.asarray(self.origin)) * jnp.asarray(self.inv_cell)
        ).astype(jnp.int32)
        return jnp.clip(idx, 0, dims - 1)

    def _linearize(self, idx):
        d = idx.shape[-1]
        lin = jnp.zeros(idx.shape[0], dtype=jnp.int32)
        mul = 1
        for ax in range(d - 1, -1, -1):
            lin = lin + idx[:, ax] * mul
            mul = mul * int(self.dims[ax])
        return lin

    def candidates(self, points, ring: bool = False):
        """Padded candidate element ids per query point, -1 pads.

        ``ring=False``: the landing cell's table, ``[Q, K]``.
        ``ring=True``: the 3^d neighborhood's tables concatenated,
        ``[Q, 3^d K]`` (duplicates possible — harmless for argmin
        selection).  Because rasterization covers every cell an element's
        AABB overlaps, the ring set provably contains **all** elements
        whose AABB intersects the gathered region (see
        :meth:`guarantee_radius`).
        """
        idx = self._cells_of(points)
        table = jnp.asarray(self.table)
        if not ring:
            return table[self._linearize(idx)]
        d = idx.shape[-1]
        dims = jnp.asarray(self.dims)
        offsets = np.stack(
            np.meshgrid(*([np.array([-1, 0, 1])] * d), indexing="ij"), -1
        ).reshape(-1, d)
        parts = []
        for off in offsets:
            nb = jnp.clip(idx + jnp.asarray(off, jnp.int32), 0, dims - 1)
            parts.append(table[self._linearize(nb)])
        return jnp.concatenate(parts, axis=1)

    def guarantee_radius(self, points) -> np.ndarray:
        """Per-query provable search radius of the ring gather.

        Any element that is *not* among ``candidates(points, ring=True)``
        has its AABB disjoint from the gathered 3^d cell region, hence its
        distance to the query exceeds the distance from the query to the
        region's exterior.  Faces of the region lying on the grid border
        contribute +inf (the grid covers every element's AABB, so nothing
        exists beyond it).  A closest-element result with distance <=
        this radius is therefore provably optimal.
        """
        p = np.asarray(points, dtype=np.float64)
        cell = 1.0 / np.asarray(self.inv_cell)
        c = np.floor((p - self.origin) * self.inv_cell).astype(np.int64)
        c = np.clip(c, 0, np.asarray(self.dims) - 1)
        lo_cell = c - 1
        hi_cell = c + 2
        lo_b = self.origin + lo_cell * cell
        hi_b = self.origin + hi_cell * cell
        dist_lo = np.where(lo_cell <= 0, np.inf, p - lo_b)
        dist_hi = np.where(hi_cell >= np.asarray(self.dims), np.inf, hi_b - p)
        return np.minimum(dist_lo, dist_hi).min(axis=1)


class ClosestElementResult(NamedTuple):
    element_indices: jnp.ndarray  # [Q] int32
    reference_coords: jnp.ndarray  # [Q, d]
    domain_distance: jnp.ndarray  # [Q] physical distance to element, 0 = inside


@dataclass(frozen=True)
class _Aabbs:
    lo: np.ndarray  # [E, d]
    hi: np.ndarray  # [E, d]


def _element_aabbs(mesh: Mesh) -> _Aabbs:
    X = mesh.cell_points()
    return _Aabbs(lo=X.min(axis=1), hi=X.max(axis=1))


def _select_among_candidates(mesh: Mesh, points, cand, cand_dist, tol: float):
    """Closest-point query on candidate sets; pick the nearest element.

    ``cand``: [Q, k] element ids (-1 pads); ``cand_dist``: [Q, k] tie-break
    distances (e.g. AABB distances; pads should carry +inf).  Every
    candidate runs the constrained :func:`closest_point_in_element`; the
    winner is the element with the smallest **physical** distance (the
    reference's ``FindClosestElement`` semantics, space/mod.rs:217 +
    spatially_indexed.rs:116), with ``cand_dist`` only breaking exact ties.
    """
    el = mesh.element
    Q, k = cand.shape
    m = el.geometry.num_nodes
    X_geo_all = jnp.asarray(mesh.cell_points()[:, :m, :])
    safe_cand = jnp.maximum(cand, 0)
    cand_X = X_geo_all[safe_cand]  # [Q, k, m, d]
    flat_X = cand_X.reshape(Q * k, m, -1)
    flat_x = jnp.repeat(points, k, axis=0)
    # Cheap pre-pass (one Newton inversion): answers every query that lies
    # *inside* some candidate exactly; only the remaining queries pay the
    # ~25x boundary-chart enumeration (concrete inputs only — under
    # tracing the full pass runs unconditionally).
    concrete = not any(
        isinstance(l, jax.core.Tracer)
        for l in jax.tree_util.tree_leaves((points, cand, cand_dist))
    )
    if concrete:
        xi, inside, dist = closest_point_in_element(
            el, flat_X, flat_x, tol=tol, charts=False
        )
        covered = np.asarray(
            (inside.reshape(Q, k) & np.asarray(cand >= 0)).any(axis=1)
        )
        if not covered.all():
            idx_o = np.flatnonzero(~covered)
            sel = jnp.asarray(np.repeat(idx_o * k, k) + np.tile(np.arange(k), len(idx_o)))
            xi_o, inside_o, dist_o = closest_point_in_element(
                el, flat_X[sel], flat_x[sel], tol=tol
            )
            xi = xi.at[sel].set(xi_o)
            inside = inside.at[sel].set(inside_o)
            dist = dist.at[sel].set(dist_o)
    else:
        xi, inside, dist = closest_point_in_element(el, flat_X, flat_x, tol=tol)
    xi = xi.reshape(Q, k, -1)
    dist = dist.reshape(Q, k)
    inside = inside.reshape(Q, k)
    pad = cand < 0
    dist = jnp.where(pad, jnp.inf, jnp.where(inside, 0.0, dist))
    eps_tie = jnp.asarray(1e-12, dist.dtype)
    score = dist + eps_tie * jnp.where(pad, jnp.inf, cand_dist)
    best = jnp.argmin(score, axis=1)
    take = lambda a: jnp.take_along_axis(
        a, best.reshape(Q, *([1] * (a.ndim - 1))), axis=1
    ).squeeze(1)
    return ClosestElementResult(
        element_indices=jnp.take_along_axis(safe_cand, best[:, None], axis=1)[
            :, 0
        ].astype(jnp.int32),
        reference_coords=take(xi),
        domain_distance=take(dist),
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
    the top-k nearest element AABBs (brute force, O(Q·E)) or a
    :class:`GridIndex` ring lookup (O(Q·K), for large meshes) — then run
    the constrained :func:`closest_point_in_element` on all candidates in
    a batch and select the element of minimum physical distance.  On
    concrete inputs results are **certified** via AABB lower bounds (and
    the grid's guarantee radius): provably-suboptimal queries re-run with
    a wider candidate set, so no silent wrong answers.  Under tracing the
    same pipeline runs without the host-side certification pass.
    """
    points = jnp.asarray(points)
    if index is not None:
        # Ring gather + AABB-distance top-k pre-selection, then the exact
        # closest-point pass on the k survivors.  On concrete inputs the
        # result is *certified*: a query is provably optimal when its
        # distance is within the ring's guarantee radius AND no discarded
        # candidate's AABB lower bound beats it; the (typically few)
        # uncertified queries re-run through the brute-force oracle.
        cand = index.candidates(points, ring=True)  # [Q, R*K], -1 pads
        aabbs = _element_aabbs(mesh)
        lo = jnp.asarray(aabbs.lo)
        hi = jnp.asarray(aabbs.hi)
        safe = jnp.maximum(cand, 0)
        d2 = jnp.sum(
            jnp.square(jnp.maximum(lo[safe] - points[:, None], 0.0))
            + jnp.square(jnp.maximum(points[:, None] - hi[safe], 0.0)),
            axis=-1,
        )
        d2 = jnp.where(cand < 0, jnp.inf, d2)
        # Dedup per query: an element rasterized into several ring cells
        # appears multiple times and would crowd out distinct candidates in
        # the top-k (and near-always fail the `dropped` certification).
        # Sort by element id, mark repeat runs (duplicates share one AABB
        # distance, so keeping the first is exact); top_k ignores order.
        order = jnp.argsort(cand, axis=1)
        cand_s = jnp.take_along_axis(cand, order, axis=1)
        d2_s = jnp.take_along_axis(d2, order, axis=1)
        dup = jnp.concatenate(
            [jnp.zeros_like(cand_s[:, :1], bool), cand_s[:, 1:] == cand_s[:, :-1]],
            axis=1,
        )
        cand = jnp.where(dup, -1, cand_s)
        d2 = jnp.where(dup, jnp.inf, d2_s)
        k = min(num_candidates, cand.shape[1])
        kk = min(k + 1, cand.shape[1])
        neg_d2, sel = jax.lax.top_k(-d2, kk)
        cand_k = jnp.take_along_axis(cand, sel[:, :k], axis=1)
        cand_dist = jnp.sqrt(jnp.maximum(-neg_d2[:, :k], 0.0))
        res = _select_among_candidates(mesh, points, cand_k, cand_dist, tol)
        leaves = jax.tree_util.tree_leaves((points, cand))
        if any(isinstance(l, jax.core.Tracer) for l in leaves):
            return res  # traced: best-effort (no host fallback possible)
        D = np.asarray(res.domain_distance)
        guard = index.guarantee_radius(np.asarray(points))
        dropped = (
            np.sqrt(np.maximum(np.asarray(-neg_d2[:, k]), 0.0))
            if kk > k
            else np.full(len(D), np.inf)
        )
        unsafe = ~((D <= guard) & (D <= dropped))
        if unsafe.any():
            idx_u = np.flatnonzero(unsafe)
            sub = find_closest_element(
                mesh, points[jnp.asarray(idx_u)], num_candidates=num_candidates, tol=tol
            )
            res = _merge_results(res, sub, idx_u)
        return res

    # brute force: top-k by exact AABB distance over all elements
    k = min(num_candidates, mesh.num_cells)
    aabbs = _element_aabbs(mesh)
    lo = jnp.asarray(aabbs.lo)
    hi = jnp.asarray(aabbs.hi)
    d2 = jnp.sum(
        jnp.square(jnp.maximum(lo[None] - points[:, None], 0.0))
        + jnp.square(jnp.maximum(points[:, None] - hi[None], 0.0)),
        axis=-1,
    )
    kk = min(k + 1, mesh.num_cells)
    neg_d2, cand = jax.lax.top_k(-d2, kk)  # [Q, kk]
    res = _select_among_candidates(
        mesh, points, cand[:, :k], jnp.sqrt(-neg_d2[:, :k] + 1e-300), tol
    )
    leaves = jax.tree_util.tree_leaves((points,))
    if kk == k or any(isinstance(l, jax.core.Tracer) for l in leaves):
        return res  # k covers all elements, or traced (best-effort)
    # certify the top-k truncation: a dropped element's AABB distance is a
    # lower bound on its true distance, so D <= dropped-dist is provably
    # optimal; re-run the rare violators with more candidates.
    D = np.asarray(res.domain_distance)
    dropped = np.sqrt(np.maximum(np.asarray(-neg_d2[:, k]), 0.0))
    unsafe = np.flatnonzero(D > dropped)
    if len(unsafe):
        sub = find_closest_element(
            mesh,
            points[jnp.asarray(unsafe)],
            num_candidates=min(4 * k, mesh.num_cells),
            tol=tol,
        )
        res = _merge_results(res, sub, unsafe)
    return res


def _merge_results(
    res: ClosestElementResult, sub: ClosestElementResult, idx: np.ndarray
) -> ClosestElementResult:
    ei = np.asarray(res.element_indices).copy()
    rc = np.asarray(res.reference_coords).copy()
    dd = np.asarray(res.domain_distance).copy()
    ei[idx] = np.asarray(sub.element_indices)
    rc[idx] = np.asarray(sub.reference_coords)
    dd[idx] = np.asarray(sub.domain_distance)
    return ClosestElementResult(
        element_indices=jnp.asarray(ei),
        reference_coords=jnp.asarray(rc),
        domain_distance=jnp.asarray(dd),
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
