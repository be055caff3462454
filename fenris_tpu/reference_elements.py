"""Reference finite elements: nodes, Lagrange bases, topology.

TPU-first design: an element type is **static metadata** (reference node
positions, exact Lagrange coefficient matrices, topology tables).  Basis
values/gradients are *tabulated* at quadrature points once on the host
(float64, exact rational coefficient matrices) and enter jitted computations
as constants; assembly then reduces to batched dense contractions over
element blocks (MXU-friendly), never per-element dynamic dispatch.

Parity notes (reference = fenris, a Rust FEM library; see /root/reference):

* Reference domains are the [-1, 1]-based domains documented in
  fenris-quadrature/src/lib.rs:21-67 (segment [-1,1]; triangle with corners
  (-1,-1),(1,-1),(-1,1); quad [-1,1]^2; tet with corners (-1,-1,-1),
  (1,-1,-1),(-1,1,-1),(-1,-1,1); hex [-1,1]^3).
* Node orderings match the reference's concrete elements
  (src/element/{triangle,quadrilateral,tetrahedron,hexahedron,segment}.rs).
* Like the reference, higher-order elements use the **lowest-order
  (subparametric) geometry map**: e.g. Tet10's jacobian is Tet4's
  (src/element/tetrahedron.rs:233), Hex27 uses the trilinear Hex8 map
  (src/element/hexahedron.rs:324-333).  This is exposed via
  :attr:`ReferenceElement.geometry`.

Instead of hand-transcribing each basis polynomial, bases are constructed
*exactly* by inverting the generalized Vandermonde matrix of the element's
polynomial space at its nodes in rational arithmetic.  The spanned space and
node set determine the Lagrange basis uniquely, so the resulting functions
are identical to the reference's hand-derived ones (up to one correctly
rounded float per coefficient).
"""

from __future__ import annotations

import itertools
from dataclasses import dataclass, field
from fractions import Fraction
from functools import lru_cache
from typing import Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "ReferenceElement",
    "element",
    "ELEMENTS",
]


# ---------------------------------------------------------------------------
# Polynomial spaces (exponent tuples)
# ---------------------------------------------------------------------------


def _p_space(dim: int, degree: int) -> Tuple[Tuple[int, ...], ...]:
    """Total-degree (simplex) polynomial space P_k."""
    exps = [
        e
        for e in itertools.product(range(degree + 1), repeat=dim)
        if sum(e) <= degree
    ]
    return tuple(sorted(exps, key=lambda e: (sum(e), e)))


def _q_space(dim: int, degree: int) -> Tuple[Tuple[int, ...], ...]:
    """Tensor (box) polynomial space Q_k."""
    exps = list(itertools.product(range(degree + 1), repeat=dim))
    return tuple(sorted(exps, key=lambda e: (sum(e), e)))


# 8-node quad serendipity space
_SERENDIPITY_QUAD8 = tuple(
    sorted(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 0), (0, 2), (2, 1), (1, 2)],
        key=lambda e: (sum(e), e),
    )
)

# 20-node hex serendipity space: Q2 monomials with at most one exponent
# equal to 2, plus x^2yz / xy^2z / xyz^2.
_SERENDIPITY_HEX20 = tuple(
    sorted(
        [
            (0, 0, 0),
            (1, 0, 0), (0, 1, 0), (0, 0, 1),
            (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
            (2, 0, 0), (0, 2, 0), (0, 0, 2),
            (2, 1, 0), (2, 0, 1), (1, 2, 0), (0, 2, 1), (1, 0, 2), (0, 1, 2),
            (2, 1, 1), (1, 2, 1), (1, 1, 2),
        ],
        key=lambda e: (sum(e), e),
    )
)


def _lagrange_coeffs(
    nodes: Sequence[Sequence[Fraction]], exps: Sequence[Tuple[int, ...]]
) -> np.ndarray:
    """Exact Lagrange coefficients: phi_j(x) = sum_k C[k, j] * x**exps[k].

    Solves V C = I in rational arithmetic where V[i, k] = m_k(node_i).
    """
    n = len(nodes)
    assert len(exps) == n, "polynomial space dim must equal node count"
    # Build Vandermonde in Fractions
    V = [[_fprod(node, exp) for exp in exps] for node in nodes]
    # Gauss-Jordan inverse in exact rational arithmetic
    aug = [row[:] + [Fraction(int(i == j)) for j in range(n)] for i, row in enumerate(V)]
    for col in range(n):
        # partial pivot (exact: any nonzero works; pick largest magnitude)
        piv = max(range(col, n), key=lambda r: abs(aug[r][col]))
        if aug[piv][col] == 0:
            raise ValueError("singular Vandermonde: nodes are not unisolvent")
        aug[col], aug[piv] = aug[piv], aug[col]
        inv = Fraction(1, 1) / aug[col][col]
        aug[col] = [v * inv for v in aug[col]]
        for r in range(n):
            if r != col and aug[r][col] != 0:
                f = aug[r][col]
                aug[r] = [a - f * b for a, b in zip(aug[r], aug[col])]
    Vinv = np.array([[float(aug[i][n + j]) for j in range(n)] for i in range(n)])
    # phi(x) = m(x) @ Vinv^T?  V C = I with V[i,k]=m_k(node_i) -> C = V^{-1}
    # phi_j(node_i) = sum_k m_k(node_i) C[k, j] = (V C)[i, j] = delta_ij.  OK.
    return Vinv  # C[k, j]


def _fprod(node: Sequence[Fraction], exp: Tuple[int, ...]) -> Fraction:
    out = Fraction(1, 1)
    for x, e in zip(node, exp):
        out *= Fraction(x) ** e
    return out


# ---------------------------------------------------------------------------
# Element dataclass
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class ReferenceElement:
    """Static description of a reference finite element."""

    name: str
    domain: str  # 'segment' | 'tri' | 'quad' | 'tet' | 'hex'
    ref_dim: int
    nodes_rational: Tuple[Tuple[Fraction, ...], ...]
    exponents: Tuple[Tuple[int, ...], ...]
    num_vertices: int  # leading corner-vertex count
    degree: int  # polynomial degree (for canonical quadrature selection)
    # Corner-vertex topology:
    edges: Tuple[Tuple[int, int], ...] = ()
    # 3D: faces as corner-vertex tuples, outward-oriented (reference parity:
    # src/connectivity.rs:532-543 for Tet4, :616-633 for Hex8).
    faces: Tuple[Tuple[int, ...], ...] = ()
    geometry_name: Optional[str] = None  # subparametric geometry element

    # --- derived, cached ---------------------------------------------------

    @property
    def num_nodes(self) -> int:
        return len(self.nodes_rational)

    @property
    def nodes(self) -> np.ndarray:
        return _nodes_float(self)

    @property
    def coeffs(self) -> np.ndarray:
        """C[k, j] with phi_j(x) = sum_k C[k, j] x**exponents[k]."""
        return _coeffs_cached(self)

    @property
    def geometry(self) -> "ReferenceElement":
        """Element used for the geometry map (lowest-order, may be self)."""
        if self.geometry_name is None or self.geometry_name == self.name:
            return self
        return ELEMENTS[self.geometry_name]

    # --- evaluation (host-side tabulation, float64) -------------------------

    def monomials(self, points: np.ndarray) -> np.ndarray:
        """m[q, k] = prod_d points[q, d] ** exponents[k, d]."""
        pts = np.asarray(points, dtype=np.float64).reshape(-1, self.ref_dim)
        exps = np.asarray(self.exponents)  # [n, d]
        return np.prod(pts[:, None, :] ** exps[None, :, :], axis=-1)

    def monomial_gradients(self, points: np.ndarray) -> np.ndarray:
        """dm[q, k, d] = d/dx_d m_k(points[q])."""
        pts = np.asarray(points, dtype=np.float64).reshape(-1, self.ref_dim)
        exps = np.asarray(self.exponents)  # [n, d]
        q, n, d = pts.shape[0], exps.shape[0], self.ref_dim
        out = np.empty((q, n, d))
        for ax in range(d):
            e = exps.copy()
            coef = e[:, ax].astype(np.float64)
            e[:, ax] = np.maximum(e[:, ax] - 1, 0)
            out[:, :, ax] = coef[None, :] * np.prod(
                pts[:, None, :] ** e[None, :, :], axis=-1
            )
        return out

    def tabulate(self, points: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Tabulate basis values and reference gradients.

        Returns ``(phi[q, n], dphi[q, n, d])`` as float64 numpy arrays.
        """
        m = self.monomials(points)
        dm = self.monomial_gradients(points)
        phi = m @ self.coeffs
        dphi = np.einsum("qkd,kn->qnd", dm, self.coeffs)
        return phi, dphi

    # --- jax-traceable evaluation (for inverse mapping etc.) ---------------

    def phi(self, xi):
        """Basis values at traced points ``xi[..., d]`` -> ``[..., n]``."""
        import jax.numpy as jnp

        exps = np.asarray(self.exponents)
        m = jnp.prod(xi[..., None, :] ** exps[None, :, :], axis=-1)
        return m @ jnp.asarray(self.coeffs, dtype=m.dtype)

    def dphi(self, xi):
        """Reference-basis gradients at traced points -> ``[..., n, d]``."""
        import jax.numpy as jnp

        exps = np.asarray(self.exponents)
        cols = []
        for ax in range(self.ref_dim):
            e = exps.copy()
            coef = e[:, ax].astype(np.float64)
            e[:, ax] = np.maximum(e[:, ax] - 1, 0)
            dm = coef * jnp.prod(xi[..., None, :] ** e[None, :, :], axis=-1)
            cols.append(dm @ jnp.asarray(self.coeffs, dtype=dm.dtype))
        return jnp.stack(cols, axis=-1)

    # --- topology -----------------------------------------------------------

    def face_element(self) -> Optional["ReferenceElement"]:
        """Element type of this element's boundary faces (None for 1D/0D)."""
        return _face_element(self)

    def face_nodes(self) -> Tuple[Tuple[int, ...], ...]:
        """Local node indices of each boundary face.

        Node ordering within a face follows the face element's own reference
        node ordering; corner orientation is outward (3D) / CCW boundary (2D),
        matching the reference's ``Connectivity::get_face_connectivity``.
        """
        return _face_nodes(self)

    def __hash__(self):
        return hash(self.name)

    def __eq__(self, other):
        return isinstance(other, ReferenceElement) and other.name == self.name


@lru_cache(maxsize=None)
def _nodes_float_by_name(name: str) -> np.ndarray:
    el = ELEMENTS[name]
    return np.array([[float(x) for x in node] for node in el.nodes_rational])


def _nodes_float(el: ReferenceElement) -> np.ndarray:
    return _nodes_float_by_name(el.name)


@lru_cache(maxsize=None)
def _coeffs_by_name(name: str) -> np.ndarray:
    el = ELEMENTS[name]
    return _lagrange_coeffs(el.nodes_rational, el.exponents)


def _coeffs_cached(el: ReferenceElement) -> np.ndarray:
    return _coeffs_by_name(el.name)


# ---------------------------------------------------------------------------
# Concrete elements
# ---------------------------------------------------------------------------

F = Fraction
_1 = F(1)
_0 = F(0)
_T = F(1, 3)  # one third


def _fr(*vals) -> Tuple[Fraction, ...]:
    return tuple(F(v) for v in vals)


ELEMENTS: dict[str, ReferenceElement] = {}


def _register(el: ReferenceElement) -> ReferenceElement:
    ELEMENTS[el.name] = el
    return el


# -- segments ----------------------------------------------------------------

SEG2 = _register(
    ReferenceElement(
        name="seg2",
        domain="segment",
        ref_dim=1,
        nodes_rational=(_fr(-1), _fr(1)),
        exponents=_p_space(1, 1),
        num_vertices=2,
        degree=1,
    )
)

SEG3 = _register(
    ReferenceElement(
        name="seg3",
        domain="segment",
        ref_dim=1,
        # Matches fenris Segment3d2Connectivity face extraction order
        # (begin, midpoint, end would be [v0, m, v1]); fenris stores
        # [begin, end, midpoint]?  Face extraction for Tri6 produces
        # [v_i, v_{i+3}, v_{i+1}] = (begin, mid, end); we therefore use
        # node order (begin, mid, end)?  No: connectivity lists corner
        # vertices first by convention everywhere else.  We use
        # (-1, 1, 0): corners first, midpoint last.
        nodes_rational=(_fr(-1), _fr(1), _fr(0)),
        exponents=_p_space(1, 2),
        num_vertices=2,
        degree=2,
    )
)

# -- triangles ----------------------------------------------------------------

TRI3 = _register(
    ReferenceElement(
        name="tri3",
        domain="tri",
        ref_dim=2,
        nodes_rational=(_fr(-1, -1), _fr(1, -1), _fr(-1, 1)),
        exponents=_p_space(2, 1),
        num_vertices=3,
        degree=1,
        edges=((0, 1), (1, 2), (2, 0)),
    )
)

TRI6 = _register(
    ReferenceElement(
        name="tri6",
        domain="tri",
        ref_dim=2,
        # corners + edge midpoints 01, 12, 20 (src/element/triangle.rs:188-197)
        nodes_rational=(
            _fr(-1, -1),
            _fr(1, -1),
            _fr(-1, 1),
            _fr(0, -1),
            _fr(0, 0),
            _fr(-1, 0),
        ),
        exponents=_p_space(2, 2),
        num_vertices=3,
        degree=2,
        edges=((0, 1), (1, 2), (2, 0)),
        geometry_name="tri3",
    )
)

# -- quadrilaterals ------------------------------------------------------------

QUAD4 = _register(
    ReferenceElement(
        name="quad4",
        domain="quad",
        ref_dim=2,
        nodes_rational=(_fr(-1, -1), _fr(1, -1), _fr(1, 1), _fr(-1, 1)),
        exponents=_q_space(2, 1),
        num_vertices=4,
        degree=1,
        edges=((0, 1), (1, 2), (2, 3), (3, 0)),
    )
)

QUAD8 = _register(
    ReferenceElement(
        name="quad8",
        domain="quad",
        ref_dim=2,
        # corners + edge midpoints 01, 12, 23, 30
        nodes_rational=(
            _fr(-1, -1),
            _fr(1, -1),
            _fr(1, 1),
            _fr(-1, 1),
            _fr(0, -1),
            _fr(1, 0),
            _fr(0, 1),
            _fr(-1, 0),
        ),
        exponents=_SERENDIPITY_QUAD8,
        num_vertices=4,
        degree=2,
        edges=((0, 1), (1, 2), (2, 3), (3, 0)),
        geometry_name="quad4",
    )
)

QUAD9 = _register(
    ReferenceElement(
        name="quad9",
        domain="quad",
        ref_dim=2,
        # corners + edge midpoints 01, 12, 23, 30 + center
        # (src/element/quadrilateral.rs:210-223)
        nodes_rational=(
            _fr(-1, -1),
            _fr(1, -1),
            _fr(1, 1),
            _fr(-1, 1),
            _fr(0, -1),
            _fr(1, 0),
            _fr(0, 1),
            _fr(-1, 0),
            _fr(0, 0),
        ),
        exponents=_q_space(2, 2),
        num_vertices=4,
        degree=2,
        edges=((0, 1), (1, 2), (2, 3), (3, 0)),
        geometry_name="quad4",
    )
)

# -- tetrahedra ----------------------------------------------------------------

_TET_FACES = ((0, 2, 1), (0, 1, 3), (1, 2, 3), (0, 3, 2))
_TET_EDGES_10 = ((0, 1), (1, 2), (0, 2), (0, 3), (2, 3), (1, 3))

TET4 = _register(
    ReferenceElement(
        name="tet4",
        domain="tet",
        ref_dim=3,
        nodes_rational=(
            _fr(-1, -1, -1),
            _fr(1, -1, -1),
            _fr(-1, 1, -1),
            _fr(-1, -1, 1),
        ),
        exponents=_p_space(3, 1),
        num_vertices=4,
        degree=1,
        edges=_TET_EDGES_10,
        faces=_TET_FACES,
    )
)


def _mid(a, b):
    return tuple((x + y) / 2 for x, y in zip(a, b))


_tet_v = TET4.nodes_rational
TET10 = _register(
    ReferenceElement(
        name="tet10",
        domain="tet",
        ref_dim=3,
        # corners + edge midpoints 01, 12, 02, 03, 23, 13
        # (src/element/tetrahedron.rs:151-165; mesh_convert.rs:76-81)
        nodes_rational=tuple(_tet_v)
        + tuple(
            _mid(_tet_v[a], _tet_v[b])
            for a, b in ((0, 1), (1, 2), (0, 2), (0, 3), (2, 3), (1, 3))
        ),
        exponents=_p_space(3, 2),
        num_vertices=4,
        degree=2,
        edges=_TET_EDGES_10,
        faces=_TET_FACES,
        geometry_name="tet4",
    )
)


def _third(a, b, t):
    """Point a + t*(b-a) with t rational."""
    return tuple(x + t * (y - x) for x, y in zip(a, b))


# Tet20: corners, 2 points per edge in order e01 e02 e03 e12 e13 e23
# (each edge: 1/3 then 2/3 from first vertex), then face centroids
# f012, f013, f023, f123 (src/element/tetrahedron.rs:303-339).
_TET20_EDGE_ORDER = ((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3))
_TET20_FACES = ((0, 1, 2), (0, 1, 3), (0, 2, 3), (1, 2, 3))


def _centroid(*pts):
    n = len(pts)
    return tuple(sum(c) / n for c in zip(*pts))


TET20 = _register(
    ReferenceElement(
        name="tet20",
        domain="tet",
        ref_dim=3,
        nodes_rational=tuple(_tet_v)
        + tuple(
            _third(_tet_v[a], _tet_v[b], t)
            for a, b in _TET20_EDGE_ORDER
            for t in (F(1, 3), F(2, 3))
        )
        + tuple(_centroid(*(_tet_v[i] for i in f)) for f in _TET20_FACES),
        exponents=_p_space(3, 3),
        num_vertices=4,
        degree=3,
        edges=_TET_EDGES_10,
        faces=_TET_FACES,
        geometry_name="tet4",
    )
)

# -- hexahedra -------------------------------------------------------------------

_HEX_FACES = (
    (3, 2, 1, 0),
    (0, 1, 5, 4),
    (1, 2, 6, 5),
    (2, 3, 7, 6),
    (4, 7, 3, 0),
    (5, 6, 7, 4),
)
_HEX_EDGES = (
    (0, 1),
    (0, 3),
    (0, 4),
    (1, 2),
    (1, 5),
    (2, 3),
    (2, 6),
    (3, 7),
    (4, 5),
    (4, 7),
    (5, 6),
    (6, 7),
)

_hex_v = (
    _fr(-1, -1, -1),
    _fr(1, -1, -1),
    _fr(1, 1, -1),
    _fr(-1, 1, -1),
    _fr(-1, -1, 1),
    _fr(1, -1, 1),
    _fr(1, 1, 1),
    _fr(-1, 1, 1),
)

HEX8 = _register(
    ReferenceElement(
        name="hex8",
        domain="hex",
        ref_dim=3,
        nodes_rational=_hex_v,
        exponents=_q_space(3, 1),
        num_vertices=8,
        degree=1,
        edges=_HEX_EDGES,
        faces=_HEX_FACES,
    )
)

_hex_edge_mids = tuple(_mid(_hex_v[a], _hex_v[b]) for a, b in _HEX_EDGES)
# Face centers in the order used by mesh_convert.rs:146-151 /
# element/hexahedron.rs:202-207: z-, y-, x-, x+, y+, z+
_hex_face_centers = (
    _fr(0, 0, -1),
    _fr(0, -1, 0),
    _fr(-1, 0, 0),
    _fr(1, 0, 0),
    _fr(0, 1, 0),
    _fr(0, 0, 1),
)

HEX20 = _register(
    ReferenceElement(
        name="hex20",
        domain="hex",
        ref_dim=3,
        nodes_rational=_hex_v + _hex_edge_mids,
        exponents=_SERENDIPITY_HEX20,
        num_vertices=8,
        degree=2,
        edges=_HEX_EDGES,
        faces=_HEX_FACES,
        geometry_name="hex8",
    )
)

HEX27 = _register(
    ReferenceElement(
        name="hex27",
        domain="hex",
        ref_dim=3,
        nodes_rational=_hex_v + _hex_edge_mids + _hex_face_centers + (_fr(0, 0, 0),),
        exponents=_q_space(3, 2),
        num_vertices=8,
        degree=2,
        edges=_HEX_EDGES,
        faces=_HEX_FACES,
        geometry_name="hex8",
    )
)


def element(name: str) -> ReferenceElement:
    """Look up an element type by name (e.g. ``"tet10"``)."""
    try:
        return ELEMENTS[name]
    except KeyError:
        raise KeyError(
            f"unknown element type {name!r}; available: {sorted(ELEMENTS)}"
        ) from None


# ---------------------------------------------------------------------------
# Face topology (derived)
# ---------------------------------------------------------------------------

_FACE_ELEMENT_BY_DOMAIN_DEGREE = {
    ("tri", 1): "seg2",
    ("tri", 2): "seg3",
    ("tri", 3): None,  # tri has no cubic segment registered; handled below
    ("quad", 1): "seg2",
    ("quad", 2): "seg3",
    ("tet", 1): "tri3",
    ("tet", 2): "tri6",
    ("tet", 3): None,  # tet20 faces are tri10; not in reference either
    ("hex", 1): "quad4",
    ("hex", 2): None,  # resolved per-element below (quad8 vs quad9)
}


@lru_cache(maxsize=None)
def _face_element_name(name: str) -> Optional[str]:
    el = ELEMENTS[name]
    if el.ref_dim <= 1:
        return None
    if name == "hex20":
        return "quad8"
    if name == "hex27":
        return "quad9"
    if name == "tet20":
        return None  # 10-node cubic triangle face not supported (parity: fenris Tet20 FaceConnectivity is Tri3d3 corners-only? it defines faces only for linear use)
    return _FACE_ELEMENT_BY_DOMAIN_DEGREE.get((el.domain, el.degree))


def _face_element(el: ReferenceElement) -> Optional[ReferenceElement]:
    fname = _face_element_name(el.name)
    return ELEMENTS[fname] if fname else None


def _corner_faces(el: ReferenceElement) -> Tuple[Tuple[int, ...], ...]:
    """Faces as corner-vertex tuples (2D: boundary edges)."""
    if el.ref_dim == 2:
        return el.edges
    return el.faces


@lru_cache(maxsize=None)
def _face_nodes_by_name(name: str) -> Tuple[Tuple[int, ...], ...]:
    el = ELEMENTS[name]
    fel = el.face_element()
    if fel is None:
        # Fall back to corner-only faces using the linear face element.
        return _corner_faces(el)
    out = []
    for corners in _corner_faces(el):
        # Geometry map of the face: linear/bilinear interpolation of the
        # cell's corner reference coordinates over the face element's
        # *corner* nodes.
        cell_corners = np.array(
            [[float(x) for x in el.nodes_rational[c]] for c in corners]
        )  # [fv, cell_dim]
        flin = ELEMENTS[{"segment": "seg2", "tri": "tri3", "quad": "quad4"}[fel.domain]]
        phi, _ = flin.tabulate(fel.nodes)  # [fn, fv]
        face_pts_in_cell = phi @ cell_corners  # [fn, cell_dim]
        # Match each mapped face node to a cell node
        nodes = el.nodes
        idx = []
        for p in face_pts_in_cell:
            dist = np.abs(nodes - p[None, :]).max(axis=1)
            j = int(np.argmin(dist))
            if dist[j] > 1e-12:
                raise AssertionError(
                    f"face node {p} of {name} not found among element nodes"
                )
            idx.append(j)
        out.append(tuple(idx))
    return tuple(out)


def _face_nodes(el: ReferenceElement) -> Tuple[Tuple[int, ...], ...]:
    return _face_nodes_by_name(el.name)
