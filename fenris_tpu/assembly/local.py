"""Local (element-level) assembly as batched TPU kernels.

Parity: src/assembly/local/elliptic.rs (energy :551, vector :457, matrix
:361), mass.rs (:191), source.rs (:217) and the quadrature tables
(quadrature_table.rs).

TPU-first design: instead of the reference's per-element loop with scratch
buffers (assembly/buffers.rs), every quantity is computed for an entire
**block of elements at once**:

* basis values/gradients are tabulated on the host once per (element type,
  rule) and enter the jitted kernel as constants (``Tabulation``);
* jacobians are one einsum ``[E, m, d] x [q, m, d] -> [E, q, d, d]``;
* inverses/determinants use closed forms for d = 1, 2, 3 (batched, no LU);
* operator evaluations (g, contraction tensor) are ``vmap``-ed pointwise
  functions (autodiff by default, see :mod:`..operators`);
* the quadrature reduction is an einsum that XLA maps onto the MXU.

The per-quadrature-point loop of elliptic.rs:398-434 therefore becomes a
handful of large batched contractions; the graph-coloring machinery the
reference needs for parallel scatter is unnecessary because the global
stage (:mod:`.global_`) uses deterministic ``segment_sum``.

dtype follows the inputs (f64 in parity mode, f32/bf16 in TPU speed mode).
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..reference_elements import ReferenceElement

__all__ = [
    "Tabulation",
    "tabulate",
    "jacobians",
    "inv_and_det",
    "physical_gradients",
    "assemble_element_elliptic_matrices",
    "assemble_element_elliptic_vectors",
    "compute_element_elliptic_energy",
    "assemble_element_mass_matrices",
    "assemble_element_source_vectors",
]

from ..config import MATMUL_PRECISION

# f32 einsums must not route through bf16 MXU passes (see config.py)
_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)


@dataclass(frozen=True)
class Tabulation:
    """Host-tabulated basis data for one (element type, quadrature rule).

    All arrays are float64 numpy; they are cast to the computation dtype when
    baked into a jitted kernel.
    """

    element: ReferenceElement
    weights: np.ndarray  # [q]
    points: np.ndarray  # [q, d]
    phi: np.ndarray  # [q, n]
    dphi: np.ndarray  # [q, n, d]
    geo_phi: np.ndarray  # [q, m]
    geo_dphi: np.ndarray  # [q, m, d]

    @property
    def num_points(self) -> int:
        return len(self.weights)


def tabulate(element: ReferenceElement, rule) -> Tabulation:
    """Tabulate basis + geometry-basis values at a rule's points."""
    w = np.asarray(rule.weights, dtype=np.float64)
    pts = np.asarray(rule.points, dtype=np.float64).reshape(len(w), element.ref_dim)
    phi, dphi = element.tabulate(pts)
    geo = element.geometry
    if geo is element:
        gphi, gdphi = phi, dphi
    else:
        gphi, gdphi = geo.tabulate(pts)
    return Tabulation(element, w, pts, phi, dphi, gphi, gdphi)


# ---------------------------------------------------------------------------
# Geometry kernels
# ---------------------------------------------------------------------------


def jacobians(X_geo, geo_dphi):
    """Reference jacobians J[e, q, i, j] = sum_m X[e, m, i] dphi_geo[q, m, j].

    ``X_geo``: [E, m, d_space]; ``geo_dphi``: [q, m, d_ref].
    """
    return _einsum("emi,qmj->eqij", X_geo, geo_dphi)


def _det2(J):
    return J[..., 0, 0] * J[..., 1, 1] - J[..., 0, 1] * J[..., 1, 0]


def _det3(J):
    return (
        J[..., 0, 0] * (J[..., 1, 1] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 1])
        - J[..., 0, 1] * (J[..., 1, 0] * J[..., 2, 2] - J[..., 1, 2] * J[..., 2, 0])
        + J[..., 0, 2] * (J[..., 1, 0] * J[..., 2, 1] - J[..., 1, 1] * J[..., 2, 0])
    )


def inv_and_det(J):
    """Closed-form batched inverse + determinant for d in {1, 2, 3}."""
    d = J.shape[-1]
    if d == 1:
        det = J[..., 0, 0]
        inv = (1.0 / det)[..., None, None]
        return inv, det
    if d == 2:
        det = _det2(J)
        inv = (
            jnp.stack(
                [
                    jnp.stack([J[..., 1, 1], -J[..., 0, 1]], axis=-1),
                    jnp.stack([-J[..., 1, 0], J[..., 0, 0]], axis=-1),
                ],
                axis=-2,
            )
            / det[..., None, None]
        )
        return inv, det
    if d == 3:
        det = _det3(J)
        # adjugate
        a = J
        cof = jnp.stack(
            [
                jnp.stack(
                    [
                        a[..., 1, 1] * a[..., 2, 2] - a[..., 1, 2] * a[..., 2, 1],
                        a[..., 0, 2] * a[..., 2, 1] - a[..., 0, 1] * a[..., 2, 2],
                        a[..., 0, 1] * a[..., 1, 2] - a[..., 0, 2] * a[..., 1, 1],
                    ],
                    axis=-1,
                ),
                jnp.stack(
                    [
                        a[..., 1, 2] * a[..., 2, 0] - a[..., 1, 0] * a[..., 2, 2],
                        a[..., 0, 0] * a[..., 2, 2] - a[..., 0, 2] * a[..., 2, 0],
                        a[..., 0, 2] * a[..., 1, 0] - a[..., 0, 0] * a[..., 1, 2],
                    ],
                    axis=-1,
                ),
                jnp.stack(
                    [
                        a[..., 1, 0] * a[..., 2, 1] - a[..., 1, 1] * a[..., 2, 0],
                        a[..., 0, 1] * a[..., 2, 0] - a[..., 0, 0] * a[..., 2, 1],
                        a[..., 0, 0] * a[..., 1, 1] - a[..., 0, 1] * a[..., 1, 0],
                    ],
                    axis=-1,
                ),
            ],
            axis=-2,
        )
        inv = cof / det[..., None, None]
        return inv, det
    raise ValueError(f"unsupported dimension {d}")


def physical_gradients(dphi, Jinv):
    """Physical gradients ∇_x φ = J^{-T} ∇_ξ φ.

    ``dphi``: [q, n, d]; ``Jinv``: [E, q, d, d] -> [E, q, n, d].
    """
    return _einsum("qnk,eqki->eqni", dphi, Jinv)


def _wdet(tab: Tabulation, detJ, dtype):
    w = jnp.asarray(tab.weights, dtype=dtype)
    return w[None, :] * jnp.abs(detJ)


def _gradients_and_ugrad(X_geo, u_el, tab: Tabulation):
    dtype = X_geo.dtype
    gdphi = jnp.asarray(tab.geo_dphi, dtype=dtype)
    dphi = jnp.asarray(tab.dphi, dtype=dtype)
    J = jacobians(X_geo, gdphi)
    Jinv, detJ = inv_and_det(J)
    gp = physical_gradients(dphi, Jinv)  # [E, q, n, d]
    if u_el is None:
        G = None
    else:
        # G[e, q, d, s] = sum_n gp[e, q, n, d] u_el[e, n, s]
        G = _einsum("eqnd,ens->eqds", gp, u_el)
    return gp, G, detJ


def _vmap2(fn, params, E: int, q: int):
    """Map ``fn(G, params)`` over the two leading [E, q] axes of G.

    Parameter-leaf convention (keyed on explicit shape matches, so a wrong
    layout fails loudly inside the operator instead of silently broadcasting
    over the wrong axis):

    * scalar / 0-d -> broadcast everywhere;
    * leading dim == E -> per-element (axis 0 at the element level), and if
      the next dim == q additionally per-quadrature-point;
    * leading dim == q (and != E) -> per-quadrature-point, uniform over
      elements (the reference's ``UniformQuadratureTable`` data payload);
    * anything else -> broadcast as a constant.

    When E == q the per-element interpretation wins (documented ambiguity;
    disambiguate by adding an explicit q axis).
    """
    def leaf_axes(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return None, None
        if x.shape[0] == E:
            inner = 0 if (x.ndim >= 2 and x.shape[1] == q) else None
            return 0, inner
        if x.shape[0] == q:
            return None, 0
        return None, None

    if params is None:
        outer_ax = inner_ax = None
    else:
        axes = jax.tree_util.tree_map(leaf_axes, params)
        is_pair = lambda t: isinstance(t, tuple) and len(t) == 2 and all(
            a is None or a == 0 for a in t
        )
        outer_ax = jax.tree_util.tree_map(lambda t: t[0], axes, is_leaf=is_pair)
        inner_ax = jax.tree_util.tree_map(lambda t: t[1], axes, is_leaf=is_pair)
    inner = jax.vmap(fn, in_axes=(0, inner_ax))
    outer = jax.vmap(inner, in_axes=(0, outer_ax))
    return outer


def compute_element_elliptic_energy(X_geo, u_el, op, params, tab: Tabulation):
    """Total elliptic energy  sum_e ∫_e ψ(∇u)  (elliptic.rs:551).

    Returns per-element energies ``[E]`` (sum for the global scalar).
    """
    _, G, detJ = _gradients_and_ugrad(X_geo, u_el, tab)
    psi = _vmap2(
        lambda Gp, p: op.energy(Gp, p), params, X_geo.shape[0], tab.num_points
    )(G, params)  # [E, q]
    wdet = _wdet(tab, detJ, X_geo.dtype)
    return _einsum("eq,eq->e", wdet, psi)


def assemble_element_elliptic_vectors(X_geo, u_el, op, params, tab: Tabulation):
    """Element vectors f[e, n*s] with f_I = ∫ g(∇u)^T ∇φ_I (elliptic.rs:457).

    Dof layout is node-major: dof = s * node + component (matching the
    reference's reshape semantics and BC indexing).
    """
    gp, G, detJ = _gradients_and_ugrad(X_geo, u_el, tab)
    gvals = _vmap2(
        lambda Gp, p: op.g(Gp, p), params, X_geo.shape[0], tab.num_points
    )(G, params)  # [E, q, d, s]
    wdet = _wdet(tab, detJ, X_geo.dtype)
    f = _einsum("eq,eqds,eqnd->ens", wdet, gvals, gp)
    E, n = f.shape[0], f.shape[1]
    return f.reshape(E, n * op.solution_dim)


def assemble_element_elliptic_matrices(
    X_geo, u_el, op, params, tab: Tabulation, *, chunk: int | None = None,
    layout: str = "auto",
):
    """Element matrices A[e, n*s, n*s] (elliptic.rs:361).

    A[(I,i),(J,j)] = ∫ ∇φ_I,k D[k,i,m,j](∇u) ∇φ_J,m with D the contraction
    tensor; weight = quadrature weight × |det J| (elliptic.rs:423).

    ``chunk`` bounds device memory: XLA:TPU tiles the two minor axes of the
    6-D contraction intermediates (``D[E,q,d,s,d,s]``) to (8, 128) lanes —
    a ~50x padding blowup that exceeds HBM above ~10^5 3-D elements.
    With ``chunk`` set, elements are processed in ``lax.map`` batches of
    that size; per-chunk outputs are stacked and sliced (never accumulated
    with overlapping read-modify-writes — see the chunked-sweep miscompile
    note in CLAUDE.md). Per-element math is unchanged, so results match
    the unchunked path to reduction-order roundoff.

    ``layout`` selects the contraction strategy: ``"mxu"`` reassociates the
    quadrature reduction around the constant reference-gradient table so
    the dominant contraction is one large ``[E*s*s, q*d*d] @ [q*d*d, n*n]``
    matmul (see :func:`_elliptic_matrices_mxu`); ``"einsum"`` is the
    direct batched-einsum formulation; ``"auto"`` picks ``mxu`` on TPU.
    Both compute the same integrals (equal to reduction-order roundoff).
    """
    if chunk and X_geo.shape[0] > chunk:
        return _chunked_elliptic_matrices(
            X_geo, u_el, op, params, tab, chunk, layout
        )
    if (
        getattr(op, "constant_contraction", False)
        and _affine_geometry(tab)
        and not _has_per_point_params(params, X_geo.shape[0], tab.num_points)
    ):
        # linear operator on affine elements: the quadrature sum hoists
        # into a constant projector (same integrals, K = d² matmuls)
        return _elliptic_matrices_affine_const(X_geo, u_el, op, params, tab, "e")
    if layout == "auto":
        layout = "mxu" if jax.default_backend() == "tpu" else "einsum"
    if layout == "mxu":
        return _elliptic_matrices_mxu(X_geo, u_el, op, params, tab)
    gp, G, detJ = _gradients_and_ugrad(X_geo, u_el, tab)
    s = op.solution_dim
    if G is None:
        E, q = gp.shape[0], gp.shape[1]
        d = gp.shape[-1]
        G = jnp.zeros((E, q, d, s), dtype=gp.dtype)
    D = _vmap2(
        lambda Gp, p: op.contraction(Gp, p), params, X_geo.shape[0], tab.num_points
    )(G, params)
    # D: [E, q, d, s, d, s]
    wdet = _wdet(tab, detJ, X_geo.dtype)
    # Two-step contraction: the tiny m-contraction first, then one
    # MXU-shaped batched matmul contracting (q, k) — equivalent to the
    # fused 4-operand einsum to machine precision and never slower.
    T = _einsum("eqkimj,eqpm->eqkipj", D, gp)
    A = _einsum("eq,eqnk,eqkipj->enipj", wdet, gp, T)
    E, n = A.shape[0], A.shape[1]
    A = A.reshape(E, n * s, n * s)
    if op.symmetric:
        A = 0.5 * (A + jnp.swapaxes(A, 1, 2))
    return A


def _params_to_qe(params, E: int, q: int):
    """Reshape parameter leaves to the trailing ``(q, E)`` batch convention.

    Mirrors the :func:`_vmap2` leaf classification (per-element, per-
    element-per-point, per-point, constant) but produces leaves whose
    trailing axes are ``(q, E)`` (or just ``E`` for per-element leaves),
    as consumed by :func:`..local_em._pointwise_map` with batch shape
    ``(q, E)``.  When E == q the per-element interpretation wins (same
    documented ambiguity as _vmap2).
    """
    if params is None:
        return None

    def conv(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return x
        if x.shape[0] == E:
            if x.ndim >= 2 and x.shape[1] == q:
                # [E, q, ...] -> [..., q, E]
                out = jnp.moveaxis(x, (0, 1), (-1, -2))
                return out
            # [E, ...] -> [..., E]
            return jnp.moveaxis(x, 0, -1)
        if x.shape[0] == q:
            # [q, ...] -> [..., q, E] (broadcast over elements)
            out = jnp.moveaxis(x, 0, -1)[..., None]
            return jnp.broadcast_to(out, out.shape[:-1] + (E,))
        return x

    return jax.tree_util.tree_map(conv, params)


def assemble_element_elliptic_matrices_em(X_geo, u_el, op, params, tab: Tabulation):
    """Element matrices in **element-minor** layout ``A[n*s, n*s, E]``.

    Same integrals as :func:`assemble_element_elliptic_matrices` (MXU
    reassociation), but the element axis stays minor end-to-end: the
    per-(i, j) matmuls emit ``[n², E]`` (M = n², N = E lanes) and the
    final block interleave permutes only major axes.  This is the TPU
    fast form — the ``[E, ns, ns]`` layout lane-pads ns -> 128 on its
    minor axis (2.3x write amplification at hex20) and needs a
    minor-axis transpose to produce; element-minor writes the model's
    4·(ns)² bytes almost exactly (ns -> 64 sublane pad only) and is the
    orientation the block-DIA scatter consumes anyway
    (sparse/block_dia._scatter_dia_impl transposes to (s, s, e, n, n)).
    """
    if (
        getattr(op, "constant_contraction", False)
        and _affine_geometry(tab)
        and not _has_per_point_params(params, X_geo.shape[0], tab.num_points)
    ):
        return _elliptic_matrices_affine_const(X_geo, u_el, op, params, tab, "em")
    return _elliptic_matrices_mxu(X_geo, u_el, op, params, tab, out_layout="em")


def assemble_element_elliptic_matrices_pairs(
    X_geo, u_el, op, params, tab: Tabulation, pallas=False
):
    """Element matrices in **component-pair layout** ``[s², n², E]``.

    Same values as :func:`assemble_element_elliptic_matrices_em` reordered:
    entry ``[i·s + j, a·n + b, e]`` is element ``e``'s matrix entry
    ``((a, i), (b, j))``.  This is the fastest TPU form — the layout the
    per-(i, j) projector matmuls produce natively, so its tail is one pure
    axis-0 concat (any dof-interleaved layout pays an extra ~(ns)²·E
    sublane shuffle at ~25% of HBM peak; measured hex20 round 5: 2.2 vs
    6.5 vs 9.4 ms at 22k elements for pairs/rows/em).  The block-DIA row
    expansion consumes it directly
    (:func:`~fenris_tpu.sparse.block_dia.expand_rows_pairs_masked`).

    ``pallas=True``/``"auto"`` dispatches the fused Mosaic kernel
    (:mod:`~fenris_tpu.ops.stiffness_kernel`) for the
    constant-contraction f32 TPU case (opt-in: with ``[E, m, d]`` input
    the kernel's gain is spent on the per-call element-minor transpose —
    callers holding element-minor geometry should call it directly).
    ``False`` (default) is the XLA formulation, identical values to f32
    roundoff.
    """
    if pallas in ("auto", True):
        from ..ops.stiffness_kernel import (
            stiffness_pairs_pallas,
            supports_stiffness_pallas,
        )

        if pallas is True or supports_stiffness_pallas(
            op, params, tab, X_geo.shape[0], X_geo.dtype
        ):
            return stiffness_pairs_pallas(X_geo, op, params, tab)
    if (
        getattr(op, "constant_contraction", False)
        and _affine_geometry(tab)
        and not _has_per_point_params(params, X_geo.shape[0], tab.num_points)
    ):
        return _elliptic_matrices_affine_const(X_geo, u_el, op, params, tab, "pairs")
    return _elliptic_matrices_mxu(X_geo, u_el, op, params, tab, out_layout="pairs")


def _elliptic_matrices_mxu(X_geo, u_el, op, params, tab: Tabulation, out_layout: str = "e"):
    """MXU-shaped element-matrix assembly.

    Same integrals as the einsum path, reassociated for the TPU (measured
    ~50x over the direct batched einsums at hex20, which spend their time
    on (8,128)-tiled ``[3, 3]``-minor intermediates):

    * every small-tensor quantity lives in **(q, E)-trailing layout**
      ([E]-lane vectors with the quadrature axis on sublanes), so the
      pointwise contraction-tensor algebra is full-lane VPU work;
    * the reference-gradient contraction is hoisted around the *constant*
      tabulated ``dphi``:  with  Ft[a,i,b,j] = wdet · Jinv[a,k] D[k,i,m,j]
      Jinv[b,m]  and the host-precomputed
      W[(a,b,q),(n,p)] = dphi[q,n,a]·dphi[q,p,b],

          A[e,(n,i),(p,j)] = Σ_{abq} Ft[(a,b,q),(i,j)][E] · W[(a,b,q),(n,p)]

      — per (i, j) one ``[d·d·q, E]ᵀ @ [d·d·q, n²]`` matmul whose operands
      are consumed **in the layout they are produced** (K-major stacks, E
      on lanes): no relayout of the O(E·q·d⁴) intermediate, and the element
      axis rides in M so the MXU runs at high utilization for every element
      type.  ~2.6x more flops than the optimal association, repaid ~50x in
      achieved FLOP/s.
    """
    E = X_geo.shape[0]
    q = tab.num_points
    dtype = X_geo.dtype
    s = op.solution_dim
    gdphi = jnp.asarray(tab.geo_dphi, dtype=dtype)
    d = tab.geo_dphi.shape[2]
    m = tab.geo_dphi.shape[1]
    n = tab.dphi.shape[1]
    # jacobian entries as [q, E] vectors: J[i][j] = sum_m X[e,m,i] gd[q,m,j].
    # Unrolled outer-product accumulation, NOT an einsum: a tiny-contraction
    # (K = m) einsum with an element batch axis lowers to E batched
    # micro-matmuls whose (8, 128) tile padding is ~50x — measured 65 ms of
    # the 73 ms hex20 assembly (round 5) against ~1 ms for the same math as
    # full-lane VPU work.
    from .local_em import _inv_det, _pointwise_map

    X_em = jnp.transpose(X_geo, (1, 2, 0))  # [m, d, E]
    Jl = [
        [
            sum(gdphi[:, mm, j][:, None] * X_em[mm, i][None, :] for mm in range(m))
            for j in range(d)
        ]
        for i in range(d)
    ]
    Jinv, det = _inv_det(Jl, d)  # lists of [q, E]
    w = jnp.asarray(tab.weights, dtype=dtype)
    wdet = w[:, None] * jnp.abs(det)  # [q, E]
    dphi = np.asarray(tab.dphi)  # [q, n, d] host constants
    const_D = getattr(op, "constant_contraction", False) and not _has_per_point_params(
        params, E, q
    )
    if u_el is None or const_D:
        # const_D: the contraction is independent of ∇u — G is never read
        G_qe = jnp.zeros((d, s, q, E), dtype=dtype)
    else:
        u_em = jnp.transpose(u_el, (1, 2, 0))  # [n, s, E]
        dphi_dev = jnp.asarray(dphi, dtype=dtype)
        # gp[nn][k] = sum_a dphi[q, nn, a] * Jinv[a][k]   ([q, E])
        gp = [
            [
                sum(dphi_dev[:, nn, a][:, None] * Jinv[a][k] for a in range(d))
                for k in range(d)
            ]
            for nn in range(n)
        ]
        G_qe = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(gp[nn][k] * u_em[nn, ss] for nn in range(n))
                        for ss in range(s)
                    ],
                    0,
                )
                for k in range(d)
            ],
            0,
        )  # [d, s, q, E]
    # constant projector W[(a,b,q),(n,p)] in the K-major order the stacks
    # below produce (host f64, cast once)
    Wc_np = np.einsum("qna,qpb->abqnp", dphi, dphi).reshape(d * d * q, n * n)
    Wc = jnp.asarray(Wc_np, dtype=dtype)
    # the quadrature weight folds into the copy of Jinv used by the OUTER
    # contraction only (lhs is bilinear in Jinv)
    Jmw = [[Jinv[a][k] * wdet for k in range(d)] for a in range(d)]
    if const_D and not _has_per_element_params(params, E):
        # D is independent of ∇u, position AND element: evaluate once,
        # unbatched — the C entries below become scalars (constant-folded
        # by XLA) instead of [E] vectors, removing the [d,s,d,s,E] stack
        # and its 81 slice reads from the element sweep entirely
        D = op.contraction(jnp.zeros((d, s), dtype=dtype), params)
    elif const_D:
        # per-element params: evaluate once per element at G = 0
        # ([d, s, d, s, E]) and never materialize the [d, s, d, s, q, E]
        # stack — ~2/3 of the non-matmul HBM traffic of this path at
        # hex20 (round-4 profile)
        from .local_em import params_to_element_minor

        params_em = params_to_element_minor(params, E)
        D = _pointwise_map(
            lambda Gp, p: op.contraction(Gp, p), params_em, 1, (E,)
        )(jnp.zeros((d, s, E), dtype=dtype), params_em)  # [d, s, d, s, E]
    else:
        params_qe = _params_to_qe(params, E, q)
        D = _pointwise_map(
            lambda Gp, p: op.contraction(Gp, p), params_qe, 2, (q, E)
        )(G_qe, params_qe)  # [d, s, d, s, q, E]

    def lhs_pair(i, j):
        # lhs[a,b] = wdet · Jinv[a,k] C[k,m] Jinv[b,m] with
        # C = 0.5·(D[k,i,m,j] + D[m,j,k,i]) for symmetric operators (the
        # Ft-pair average of _ft_pieces_to_matrices, reassociated inside
        # the contraction — identical values), C = D[:, i, :, j] otherwise.
        # Unrolled d³-term loops over [q, E] (or [E]) vectors — see the
        # jacobian note above for why these must not be einsums.
        if op.symmetric:
            C = [
                [0.5 * (D[k, i, mm, j] + D[mm, j, k, i]) for mm in range(d)]
                for k in range(d)
            ]
        else:
            C = [[D[k, i, mm, j] for mm in range(d)] for k in range(d)]
        # t[k][b] = Σ_m C[k][m] Jinv[b][m]  ([q, E]; C is [E] when const_D)
        t = [
            [sum(C[k][mm] * Jinv[b][mm] for mm in range(d)) for b in range(d)]
            for k in range(d)
        ]
        rows = [
            sum(Jmw[a][k] * t[k][b] for k in range(d))
            for a in range(d)
            for b in range(d)
        ]
        return jnp.stack(rows, 0).reshape(d * d * q, E)

    if out_layout == "pairs":
        # component-pair-major layout [s², n, n, E]: block (i·s + j) holds
        # the (row-node, col-node) matrix of component pair (i, j).  Its
        # tail is a PURE axis-0 concat of the per-pair matmul outputs —
        # the cheapest possible tail (no interleave, no transpose; any
        # dof-interleaved layout costs an extra ~(ns)²·E sublane shuffle
        # XLA:TPU runs at ~25% of HBM peak, and a row *gather* that would
        # avoid that shuffle FAULTS the TPU worker when fused with this
        # producer chain — repro'd round 5 with the perm as argument and
        # behind an optimization_barrier; do not reintroduce it).
        # Mirrored (i > j) blocks reuse the upper pair's lhs against a
        # column-transposed projector copy (piece(j,i)[p,n] read as
        # [n,p]), so all s² blocks materialize without [n, n, E]
        # transposes.  The block-DIA row expansion consumes this form
        # directly (sparse/block_dia.expand_rows_pairs_masked).
        WcT = jnp.asarray(
            Wc_np[:, (np.arange(n * n).reshape(n, n).T).ravel()], dtype=dtype
        )
        lhs_cache = {}
        blocks = []
        for i in range(s):
            for j in range(s):
                if op.symmetric:
                    if i <= j:
                        lhs = lhs_cache.setdefault((i, j), lhs_pair(i, j))
                        P = _einsum("ke,kn->ne", lhs, Wc)
                    else:
                        P = _einsum("ke,kn->ne", lhs_cache[(j, i)], WcT)
                else:
                    P = _einsum("ke,kn->ne", lhs_pair(i, j), Wc)
                blocks.append(P.reshape(1, n * n, E))
        # flat (a, b) columns: splitting them to [s², n, n, E] is a
        # sublane relayout XLA charges ~half the matmul time for
        return jnp.concatenate(blocks, 0)
    if out_layout == "em":
        # element-minor interleaved [(n i), (p j), E]: per pair out
        # [n², E] — M = n², N = E on the MXU — then the (node, component)
        # interleave via nested concats.  Prefer the "rows" layout above
        # where the consumer allows: the interleave is a sublane-strided
        # shuffle XLA:TPU runs at ~25% of HBM peak.
        pieces = {}
        for i in range(s):
            for j in range(s):
                if op.symmetric and j < i:
                    continue
                P = _einsum("ke,kn->ne", lhs_pair(i, j), Wc)
                pieces[(i, j)] = P.reshape(n, n, E)
        rows_i = []
        for i in range(s):
            blocks = []
            for j in range(s):
                if (i, j) in pieces:
                    P = pieces[(i, j)]
                else:
                    # major symmetry of the elliptic integrand: the (j, i)
                    # block is the (i, j) block transposed (lhs C is the
                    # Ft-pair average)
                    P = jnp.transpose(pieces[(j, i)], (1, 0, 2))
                blocks.append(P[:, :, None, :])
            rows_i.append(
                jnp.concatenate(blocks, 2).reshape(n, n * s, E)[:, None]
            )
        return jnp.concatenate(rows_i, 1).reshape(n * s, n * s, E)
    pieces = [[None] * s for _ in range(s)]
    for i in range(s):
        for j in range(s):
            if op.symmetric and j < i:
                continue
            lhs = lhs_pair(i, j)
            pieces[i][j] = _einsum("ke,kn->en", lhs, Wc).reshape(E, n, n)
    return _pieces_to_matrices(pieces, op, s, n, E, out_layout)


def _has_per_element_params(params, E: int) -> bool:
    """True if any parameter leaf carries a leading per-element axis."""
    if params is None:
        return False
    return any(
        hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == E
        for x in jax.tree_util.tree_leaves(params)
    )


def _ft_pieces_to_matrices(ft, W2h, op, s, d, n, E, out_layout, dtype):
    """One-shot MXU tail for the affine path: a SINGLE
    ``[s²d², E]ᵀ @ [s²d², (ns)²]`` matmul against a block-diagonal
    projector whose columns bake in the (node, component) interleave.

    ``ft[a][i][b][j]``: [E] vectors; ``W2h``: host ``[d, d, n, n]``
    quadrature-summed reference projector.  K rows stack in (i, j, a, b)
    order; projector column (n, i', p, j') is δ_ii' δ_jj' W2h[a, b, n, p],
    so the matmul output IS the interleaved element matrix — no
    stack/mirror/transpose tail (which cost ~6x the matmul itself and
    dominated the round-4 kernel: 6.3 -> 0.7 ms at 70k tet10 on v5e).
    The s² zero-block structure adds s× MXU flops, but with K = s²d² = 81
    the kernel is bound by the output store, not the MXU.

    For symmetric operators each row carries the Ft-pair average
    0.5·(ft[a][i][b][j] + ft[b][j][a][i]) (major symmetry of the second
    derivative), so A is symmetric to MXU reduction-order roundoff.
    """
    rows = []
    for i in range(s):
        for j in range(s):
            for a in range(d):
                for b in range(d):
                    if op.symmetric:
                        rows.append(0.5 * (ft[a][i][b][j] + ft[b][j][a][i]))
                    else:
                        rows.append(ft[a][i][b][j])
    lhs = jnp.stack(rows, 0)  # [s²d², E]
    W4 = jnp.asarray(_interleaved_projector(W2h, s, out_layout), dtype)
    ns = n * s
    if out_layout == "pairs":
        # cols ordered (i, j, n, p): the [s²n², E] output IS the pairs
        # layout after a free leading-dim split
        return _einsum("ke,kn->ne", lhs, W4).reshape(s * s, n * n, E)
    if out_layout == "em":
        return _einsum("ke,kn->ne", lhs, W4).reshape(ns, ns, E)
    return _einsum("ke,kn->en", lhs, W4).reshape(E, ns, ns)


def _interleaved_projector(W2h, s: int, layout: str) -> np.ndarray:
    """Host ``[s²d², #cols]`` block-diagonal interleaved projector from the
    ``[d, d, n, n]`` reference projector; columns are ordered (n, i, p, j)
    for the interleaved "em" layout ((ns)² of them) or (i, j, n, p) for the
    component-pair "pairs" layout.  Content-cached: built at trace time
    only, but eager callers shouldn't rebuild it per element batch."""
    key = (W2h.tobytes(), W2h.shape, s, layout)
    hit = _interleaved_projector_cache.get(key)
    if hit is not None:
        return hit
    d, _, n, _ = W2h.shape
    if layout == "pairs":
        W4 = np.zeros((s, s, d, d, s, s, n, n), W2h.dtype)
        for i in range(s):
            for j in range(s):
                W4[i, j, :, :, i, j, :, :] = W2h
    else:
        W4 = np.zeros((s, s, d, d, n, s, n, s), W2h.dtype)
        for i in range(s):
            for j in range(s):
                W4[i, j, :, :, :, i, :, j] = W2h
    W4 = np.ascontiguousarray(W4.reshape(s * s * d * d, s * s * n * n))
    _interleaved_projector_cache[key] = W4
    return W4


_interleaved_projector_cache: dict = {}


def _pieces_to_matrices(pieces, op, s, n, E, out_layout):
    """Interleave per-(i, j) blocks into element matrices.

    ``pieces[i][j]``: ``[n, n, E]`` (em) or ``[E, n, n]``.  For symmetric
    operators only ``i <= j`` is populated; the diagonal blocks are
    re-symmetrized exactly (their lhs is (a, b)-symmetric by construction,
    so this only cancels summation-order roundoff) and the lower triangle
    mirrors the upper.
    """
    em = out_layout == "em"
    tp = (lambda P: jnp.transpose(P, (1, 0, 2))) if em else (
        lambda P: jnp.transpose(P, (0, 2, 1))
    )
    if op.symmetric:
        sym = [[None] * s for _ in range(s)]
        for i in range(s):
            sym[i][i] = 0.5 * (pieces[i][i] + tp(pieces[i][i]))
            for j in range(i + 1, s):
                sym[i][j] = pieces[i][j]
                sym[j][i] = tp(pieces[i][j])
        pieces = sym
    if em:
        A2 = jnp.stack([jnp.stack(row, 0) for row in pieces], 0)  # [s, s, n, n, E]
        # interleave to [(n i), (p j), E]: major-axis permute only
        return jnp.transpose(A2, (2, 0, 3, 1, 4)).reshape(n * s, n * s, E)
    A2 = jnp.stack([jnp.stack(row, 0) for row in pieces], 0)  # [s, s, E, n, n]
    return jnp.transpose(A2, (2, 3, 0, 4, 1)).reshape(E, n * s, n * s)


def _affine_geometry(tab: Tabulation) -> bool:
    """True when the geometry map's gradients are quadrature-point
    independent — i.e. the reference→physical map is affine for every
    element (simplex corner geometry: Tri3/6, Tet4/10/20 with the
    subparametric corner map)."""
    gd = np.asarray(tab.geo_dphi)
    return bool(np.all(np.abs(gd - gd[:1]) < 1e-12))


def _has_per_point_params(params, E: int, q: int) -> bool:
    """True if any parameter leaf carries a per-quadrature-point axis
    (``[E, q, ...]`` or leading ``[q, ...]`` — the :func:`_vmap2`
    classification; per-element wins the E == q ambiguity).

    When ``E == q`` a leading-``E`` leaf is *ambiguous* (a per-point
    ``[q, ...]`` leaf is indistinguishable from a per-element one): return
    True with a warning so the constant-contraction fast paths — which
    would silently bake in the per-element interpretation — stay off and
    the general path (whose per-element resolution is documented) runs
    instead (advisor r4)."""
    if params is None:
        return False
    found = False
    for x in jax.tree_util.tree_leaves(params):
        if not hasattr(x, "ndim") or x.ndim == 0:
            continue
        if x.shape[0] == E:
            if x.ndim >= 2 and x.shape[1] == q:
                found = True
            elif E == q:
                import warnings

                warnings.warn(
                    f"parameter leaf with leading axis {E} is ambiguous "
                    f"(num_cells == num_quadrature_points == {E}): it is "
                    "interpreted as per-element; the constant-contraction "
                    "fast path is disabled for this call",
                    stacklevel=3,
                )
                found = True
        elif x.shape[0] == q:
            found = True
    return found


def _elliptic_matrices_affine_const(X_geo, u_el, op, params, tab: Tabulation, out_layout: str):
    """Element matrices for **affine elements with a constant contraction**.

    When the geometry map is affine (J, and hence J⁻¹ and det J, are the
    same at every quadrature point — all simplex elements here, whose
    geometry is the corner map) *and* the operator's contraction tensor D
    is independent of ∇u (Laplace, linear elasticity), the quadrature sum
    hoists entirely into a constant projector:

        A[e,(n,i),(p,j)] = Ft0[a,i,b,j][e] · W2[(a,b),(n,p)],
        Ft0 = |det J| · J⁻¹[a,k] D[k,i,m,j] J⁻¹[b,m],
        W2[(a,b),(n,p)] = Σ_q w_q dphi[q,n,a] dphi[q,p,b]

    — same integrals as the general MXU path (exactly: the hoist commutes
    with the sum), at K = d² per (i, j) matmul instead of d²·q, which
    turns the kernel memory-bound (the reference's serial hot loop
    re-evaluates the full per-qp chain, elliptic.rs:361-434).  The
    element matrices no longer depend on u, so ``u_el`` is ignored.
    """
    from .local_em import _inv_det, _pointwise_map, params_to_element_minor

    E = X_geo.shape[0]
    dtype = X_geo.dtype
    s = op.solution_dim
    gd0 = np.asarray(tab.geo_dphi[0])  # [m, d] (q-independent)
    d = gd0.shape[1]
    n = tab.dphi.shape[1]
    # unrolled outer-product jacobian — see the tiny-contraction einsum
    # note in _elliptic_matrices_mxu
    X_em = jnp.transpose(X_geo, (1, 2, 0))  # [m, d, E]
    mgeo = X_geo.shape[1]
    gd0d = jnp.asarray(gd0, dtype=dtype)
    Jl = [
        [
            sum(gd0d[mm, j] * X_em[mm, i] for mm in range(mgeo))
            for j in range(d)
        ]
        for i in range(d)
    ]
    Jinv, det = _inv_det(Jl, d)  # lists of [E]
    adet = jnp.abs(det)
    if not _has_per_element_params(params, E):
        # element-independent contraction: unbatched scalar entries,
        # constant-folded by XLA (no [d,s,d,s,E] stack / slice reads)
        D = op.contraction(jnp.zeros((d, s), dtype=dtype), params)
    else:
        params_em = params_to_element_minor(params, E)
        D = _pointwise_map(
            lambda Gp, p: op.contraction(Gp, p), params_em, 1, (E,)
        )(jnp.zeros((d, s, E), dtype=dtype), params_em)  # [d, s, d, s, E]
    tmp = [
        [
            [
                [
                    sum(D[k, i, m, j] * Jinv[b][m] for m in range(d))
                    for j in range(s)
                ]
                for b in range(d)
            ]
            for i in range(s)
        ]
        for k in range(d)
    ]
    ft = [
        [
            [
                [
                    adet * sum(Jinv[a][k] * tmp[k][i][b][j] for k in range(d))
                    for j in range(s)
                ]
                for b in range(d)
            ]
            for i in range(s)
        ]
        for a in range(d)
    ]
    w = np.asarray(tab.weights)
    dphi = np.asarray(tab.dphi)
    W2h = np.einsum("q,qna,qpb->abnp", w, dphi, dphi)  # [d, d, n, n] host
    return _ft_pieces_to_matrices(ft, W2h, op, s, d, n, E, out_layout, dtype)


def _chunked_elliptic_matrices(
    X_geo, u_el, op, params, tab: Tabulation, chunk: int, layout: str = "auto"
):
    """Bounded-memory element-matrix assembly: ``lax.map`` over chunks.

    Per-element parameter leaves (leading dim == E, the :func:`_vmap2`
    convention) are split with the geometry; everything else rides in as
    a closure constant.  The padded tail repeats element 0 so jacobians
    stay invertible (padded outputs are sliced off).
    """
    E = X_geo.shape[0]
    nc = -(-E // chunk)
    pad = nc * chunk - E

    def split(x):
        x = jnp.asarray(x)
        if pad:
            fill = jnp.broadcast_to(x[:1], (pad,) + x.shape[1:])
            x = jnp.concatenate([x, fill], 0)
        return x.reshape((nc, chunk) + x.shape[1:])

    leaves, treedef = jax.tree_util.tree_flatten(params)
    mapped = [hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == E for x in leaves]
    # A constant (unmapped) leaf whose leading dim happens to equal ``chunk``
    # would be reclassified as per-element inside the chunked call (where
    # E_inner == chunk, the _vmap2 convention) — a silent semantic change vs
    # the unchunked path.  Fail loudly instead.
    for x, m_ in zip(leaves, mapped):
        if not m_ and hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == chunk:
            raise ValueError(
                f"chunk={chunk} collides with a constant parameter leaf of "
                f"shape {x.shape}: inside a chunk (E == chunk) _vmap2 would "
                "reclassify the leaf as per-element. Pick a different chunk "
                "size or give the leaf an explicit leading axis."
            )
    mleaves = tuple(split(x) for x, m_ in zip(leaves, mapped) if m_)

    def body(args):
        if u_el is None:
            Xb, *pl = args
            ub = None
        else:
            Xb, ub, *pl = args
        it = iter(pl)
        merged = [next(it) if m_ else x for x, m_ in zip(leaves, mapped)]
        pb = jax.tree_util.tree_unflatten(treedef, merged)
        return assemble_element_elliptic_matrices(Xb, ub, op, pb, tab, layout=layout)

    mapped_args = (split(X_geo),) + (
        () if u_el is None else (split(u_el),)
    ) + mleaves
    A = jax.lax.map(body, mapped_args)
    return A.reshape((nc * chunk,) + A.shape[2:])[:E]


def assemble_element_mass_matrices(X_geo, density, solution_dim: int, tab: Tabulation):
    """Element mass matrices M[(I,i),(J,j)] = ∫ ρ φ_I φ_J δ_ij (mass.rs:191).

    ``density``: scalar or ``[E, q]`` per-quadrature-point values (the
    reference's ``Density<T>`` quadrature data).
    """
    dtype = X_geo.dtype
    gdphi = jnp.asarray(tab.geo_dphi, dtype=dtype)
    phi = jnp.asarray(tab.phi, dtype=dtype)
    J = jacobians(X_geo, gdphi)
    _, detJ = inv_and_det(J)
    wdet = _wdet(tab, detJ, dtype)
    rho = jnp.asarray(density, dtype=dtype)
    if rho.ndim == 1 and rho.shape[0] == X_geo.shape[0]:
        rho = rho[:, None]  # per-element density broadcast over points
    scale = wdet * rho
    Mn = _einsum("eq,qn,qm->enm", scale, phi, phi)  # [E, n, n]
    if solution_dim == 1:
        return Mn
    s = solution_dim
    eye = jnp.eye(s, dtype=dtype)
    E, n = Mn.shape[0], Mn.shape[1]
    return _einsum("enm,ij->enimj", Mn, eye).reshape(E, n * s, n * s)


def assemble_element_source_vectors(
    X_geo, source: Callable, params, solution_dim: int, tab: Tabulation
):
    """Element source vectors b[e, (I,i)] = ∫ f(x)_i φ_I (source.rs:217).

    ``source(x[d_space], params) -> [s]`` is evaluated at physical quadrature
    points mapped through the (subparametric) geometry basis, matching the
    reference where ``map_reference_coords`` delegates to the corner element.
    """
    dtype = X_geo.dtype
    gphi = jnp.asarray(tab.geo_phi, dtype=dtype)
    gdphi = jnp.asarray(tab.geo_dphi, dtype=dtype)
    phi = jnp.asarray(tab.phi, dtype=dtype)
    J = jacobians(X_geo, gdphi)
    _, detJ = inv_and_det(J)
    wdet = _wdet(tab, detJ, dtype)
    x = _einsum("qm,emd->eqd", gphi, X_geo)  # [E, q, d_space]
    fvals = _vmap2(
        lambda xp, p: jnp.atleast_1d(source(xp, p)), params, X_geo.shape[0], tab.num_points
    )(x, params)
    # fvals: [E, q, s]
    b = _einsum("eq,eqs,qn->ens", wdet, fvals, phi)
    E, n = b.shape[0], b.shape[1]
    return b.reshape(E, n * solution_dim)


def assemble_element_surface_source_vectors(
    X_geo, source: Callable, params, solution_dim: int, tab: Tabulation
):
    """Surface (traction / Neumann) load vectors b[e, (I,i)] = ∫_Γ t(x)_i φ_I.

    Like :func:`assemble_element_source_vectors` but for surface elements
    embedded in a higher-dimensional space (non-square jacobians): the
    weight uses the generalized volume form sqrt(det(JᵀJ)).  ``X_geo``:
    [E, m, D] face geometry nodes (e.g. from ``mesh.boundary_mesh()``).
    """
    from ..integrate import volume_form

    dtype = X_geo.dtype
    gphi = jnp.asarray(tab.geo_phi, dtype=dtype)
    gdphi = jnp.asarray(tab.geo_dphi, dtype=dtype)
    phi = jnp.asarray(tab.phi, dtype=dtype)
    w = jnp.asarray(tab.weights, dtype=dtype)
    J = jacobians(X_geo, gdphi)
    wvol = w[None, :] * volume_form(J)
    x = _einsum("qm,emd->eqd", gphi, X_geo)
    fvals = _vmap2(
        lambda xp, p: jnp.atleast_1d(source(xp, p)), params, X_geo.shape[0], tab.num_points
    )(x, params)
    b = _einsum("eq,eqs,qn->ens", wvol, fvals, phi)
    E, n = b.shape[0], b.shape[1]
    return b.reshape(E, n * solution_dim)
