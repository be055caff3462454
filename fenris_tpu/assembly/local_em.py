"""Element-minor local assembly: lane-perfect element sweeps.

Parity: same math as :mod:`.local` (elliptic.rs:361/457/551) in a different
data layout.  The standard batched kernels put the element axis first
(``[E, q, d, d]`` intermediates); XLA:TPU then pads the tiny trailing
``d``/``n`` axes to 128-lane tiles, wasting ~40x of both VPU lanes and HBM
traffic.  This module instead keeps the **element axis minor** (``[..., E]``)
and unrolls the small node/component dimensions into Python loops over
``[E]``-shaped vectors, so every device op is full-lane elementwise VPU
work — the unstructured analog of the grid-minor layout in
:mod:`fenris_tpu.structured`.  The quadrature loop is a ``lax.scan`` so the
per-point body is traced and compiled once (q-fold smaller programs; the
per-point basis tables ride in as scanned inputs).

Operators/materials plug in unchanged: their pointwise ``g``/``energy``/
``contraction`` functions are ``vmap``-ed over the trailing element axis
(closed-form small-matrix algebra stays elementwise under ``vmap``).

Layouts:
  * ``X_em``: ``[m, d, E]`` geometry node coordinates
  * ``u_em``: ``[n, s, E]`` local solution dofs
  * outputs: ``[n, s, E]`` (vector/diag), ``[E]`` (energy)

Only volumetric (square-jacobian) elements with d in {1, 2, 3}: this is the
speed path used by the banded matrix-free solvers; surface assembly stays on
the general layout.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from .local import Tabulation

__all__ = [
    "elliptic_vector_qp",
    "elliptic_vector_tangent_qp",
    "assemble_element_elliptic_vectors_em",
    "assemble_element_elliptic_tangent_vectors_em",
    "compute_element_elliptic_energy_em",
    "elliptic_matrix_diagonal_em",
    "params_to_element_minor",
]


def params_to_element_minor(params, E: int):
    """Move a leading per-element axis of each leaf to the end.

    Converts standard-layout per-element params (``[E, ...]``, as accepted
    by :mod:`.local`) to this module's element-minor convention; leaves
    without a leading ``E`` axis (scalars, constants, already-1-D ``[E]``)
    pass through unchanged.
    """
    if params is None:
        return None
    return jax.tree_util.tree_map(
        lambda x: jnp.moveaxis(x, 0, -1)
        if (hasattr(x, "ndim") and x.ndim >= 2 and x.shape[0] == E)
        else x,
        params,
    )


def _params_levels(params, batch_shape):
    """Per-leaf count of trailing dims matching the element batch shape.

    Element-minor convention: a leaf whose trailing dims equal the last
    ``k`` dims of ``batch_shape`` is per-element over those axes — e.g.
    ``[E]`` scalars or ``[c, E]`` vectors on the XLA sweep (batch ``(E,)``),
    or ``[8, 128]`` tiles inside the fused Pallas kernels (batch
    ``(8, 128)``).  Anything else broadcasts as a constant.
    Per-quadrature-point payloads are not supported on this path — an
    ``[E, q]`` standard-layout leaf reaches the operator unmapped and
    fails loudly with a shape error (transpose per-element leaves to
    element-minor instead).
    """
    nb = len(batch_shape)

    def k_of(x):
        if not hasattr(x, "ndim") or x.ndim == 0:
            return 0
        k = 0
        while (
            k < min(x.ndim, nb) and x.shape[x.ndim - 1 - k] == batch_shape[nb - 1 - k]
        ):
            k += 1
        return k

    if params is None:
        return None
    return jax.tree_util.tree_map(k_of, params)


def _level_axes(klev, nbatch, i):
    """in_axes tree for vmap level ``i`` (``i = nbatch - 1`` is outermost):
    a leaf with ``k`` matching trailing dims maps at the ``k`` outermost
    levels and broadcasts below."""
    if klev is None:
        return None
    return jax.tree_util.tree_map(lambda k: -1 if k >= nbatch - i else None, klev)


def _pointwise_map(fn, params, nbatch, batch_shape):
    """vmap ``fn(G, params)`` over ``nbatch`` trailing batch axes of G."""
    klev = _params_levels(params, batch_shape)
    out = fn
    for i in range(nbatch):
        out = jax.vmap(out, in_axes=(-1, _level_axes(klev, nbatch, i)), out_axes=-1)
    return out


def _pointwise_map2(fn, params, nbatch, batch_shape):
    """Like :func:`_pointwise_map` for two-point functions ``fn(G, dG, params)``."""
    klev = _params_levels(params, batch_shape)
    out = fn
    for i in range(nbatch):
        out = jax.vmap(
            out, in_axes=(-1, -1, _level_axes(klev, nbatch, i)), out_axes=-1
        )
    return out


def _inv_det(J, d):
    """Closed-form inverse/determinant of a d x d matrix of [E] vectors."""
    if d == 1:
        det = J[0][0]
        return [[1.0 / det]], det
    if d == 2:
        det = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        r = 1.0 / det
        return [[J[1][1] * r, -J[0][1] * r], [-J[1][0] * r, J[0][0] * r]], det
    if d == 3:
        c00 = J[1][1] * J[2][2] - J[1][2] * J[2][1]
        c01 = J[0][2] * J[2][1] - J[0][1] * J[2][2]
        c02 = J[0][1] * J[1][2] - J[0][2] * J[1][1]
        c10 = J[1][2] * J[2][0] - J[1][0] * J[2][2]
        c11 = J[0][0] * J[2][2] - J[0][2] * J[2][0]
        c12 = J[0][2] * J[1][0] - J[0][0] * J[1][2]
        c20 = J[1][0] * J[2][1] - J[1][1] * J[2][0]
        c21 = J[0][1] * J[2][0] - J[0][0] * J[2][1]
        c22 = J[0][0] * J[1][1] - J[0][1] * J[1][0]
        det = J[0][0] * c00 + J[0][1] * c10 + J[0][2] * c20
        r = 1.0 / det
        return [
            [c00 * r, c01 * r, c02 * r],
            [c10 * r, c11 * r, c12 * r],
            [c20 * r, c21 * r, c22 * r],
        ], det
    raise ValueError(f"unsupported dimension {d}")


def _qp_geometry(X, gd_q, dphi_q, w_q, d, m, n):
    """Jacobian, physical basis gradients and weight at one quadrature point.

    ``X``: list [m][d] of [E] vectors; ``gd_q``: [m, d] scalars (traced);
    ``dphi_q``: [n, d]; ``w_q``: scalar.  Returns (gp list [n][d] of [E]
    vectors, wdet [E]).
    """
    J = [
        [sum(gd_q[mm, j] * X[mm][i] for mm in range(m)) for j in range(d)]
        for i in range(d)
    ]
    Jinv, det = _inv_det(J, d)
    # gp[n][i] = sum_k dphi[n, k] * Jinv[k][i]   (J^{-T} grad)
    gp = [
        [sum(dphi_q[nn, k] * Jinv[k][i] for k in range(d)) for i in range(d)]
        for nn in range(n)
    ]
    wdet = w_q * jnp.abs(det)
    return gp, wdet


def _u_grad(gp, u_em, n, d, s):
    """G[dd][ss] = sum_n gp[n][dd] * u[n][ss] as a [d, s, E] array."""
    G = [
        [sum(gp[nn][dd] * u_em[nn, ss] for nn in range(n)) for ss in range(s)]
        for dd in range(d)
    ]
    return jnp.stack([jnp.stack(row, 0) for row in G], 0)


def _shapes(X_em, tab: Tabulation, op):
    m, d = X_em.shape[0], X_em.shape[1]
    if tab.geo_dphi.shape[2] != d:
        raise ValueError("element-minor assembly requires square jacobians")
    return m, d, tab.dphi.shape[1], op.solution_dim


def _nbatch(X_em):
    return X_em.ndim - 2


def _cast_float_params(params, dtype):
    """Cast floating param leaves to the computation dtype.

    ``jax.vmap`` canonicalizes Python-float leaves to *strong*-typed arrays
    (f64 under x64), which would promote the whole f32 element sweep — the
    f32-banded-model-under-x64 case used by ``solve_mixed``.  Integer /
    bool leaves pass through.
    """

    def cast(x):
        if isinstance(x, (bool, int)) or (
            hasattr(x, "dtype") and not jnp.issubdtype(x.dtype, jnp.floating)
        ):
            return x
        return jnp.asarray(x, dtype)

    return jax.tree_util.tree_map(cast, params)


def _scan_qp(qp_fn, tab: Tabulation, init, dtype, tables=None):
    """Accumulate ``qp_fn(carry, gd_q, dphi_q, w_q)`` over quadrature points.

    The per-point body is traced once (lax.scan); the basis tables enter as
    scanned inputs so program size is independent of the rule length.
    ``tables`` overrides the host tabulation with Pallas kernel refs —
    required inside kernels, which cannot capture array constants
    (:mod:`..ops.em_sweep` passes the tables as kernel inputs).
    """
    if tables is not None:
        # inside Pallas kernels: Mosaic lowers neither scanned inputs nor
        # value-level dynamic_slice.  ``tables`` are kernel *refs*; read
        # each point's row with a dynamic pl.ds ref read inside a
        # fori_loop so the body is traced/compiled once (full unrolling
        # blows up Mosaic compile time).
        import jax.experimental.pallas as pl

        gd_ref, dp_ref, w_ref = tables
        q = gd_ref.shape[0]

        def body(i, carry):
            gd = gd_ref[pl.ds(i, 1)][0]
            dp = dp_ref[pl.ds(i, 1)][0]
            w = w_ref[pl.ds(i, 1)][0, 0]
            return qp_fn(carry, gd, dp, w)

        return jax.lax.fori_loop(0, q, body, init)
    xs = (
        jnp.asarray(tab.geo_dphi, dtype),
        jnp.asarray(tab.dphi, dtype),
        jnp.asarray(tab.weights, dtype),
    )

    def body(carry, x):
        return qp_fn(carry, *x), None

    out, _ = jax.lax.scan(body, init, xs)
    return out


def elliptic_vector_qp(X_em, u_em, op, params, gd_q, dphi_q, w_q):
    """One quadrature point's weighted element-vector contribution.

    Pure function of (geometry, dofs, basis rows) — shared by the scanned
    XLA sweep and the fused Pallas kernel (:mod:`..ops.em_sweep`), whose
    tangent sweep differentiates it with ``jax.jvp`` per point.
    Returns ``[n, s, *batch]``.
    """
    m, d = X_em.shape[0], X_em.shape[1]
    n, s = u_em.shape[0], u_em.shape[1]
    X = [[X_em[mm, dd] for dd in range(d)] for mm in range(m)]
    gfun = _pointwise_map(
        lambda GG, p: op.g(GG, p), params, _nbatch(X_em), X_em.shape[2:]
    )
    gp, wdet = _qp_geometry(X, gd_q, dphi_q, w_q, d, m, n)
    Gq = _u_grad(gp, u_em, n, d, s)
    gv = gfun(Gq, params)  # [d, s, *batch]
    contrib = jnp.stack(
        [
            jnp.stack(
                [sum(gp[nn][dd] * gv[dd, ss] for dd in range(d)) for ss in range(s)],
                0,
            )
            for nn in range(n)
        ],
        0,
    )
    return wdet[None, None] * contrib


def elliptic_vector_tangent_qp(X_em, u_em, v_em, op, params, gd_q, dphi_q, w_q):
    """One quadrature point's weighted element Hessian-action contribution.

    The directional derivative of :func:`elliptic_vector_qp` in ``v`` —
    computed with the operator's closed-form :meth:`g_tangent` instead of
    tracing ``jax.jvp``, so the live set stays small enough for fused
    VMEM-resident kernels (:mod:`..ops.em_sweep`; VERDICT r1 route (b)).
    Returns ``[n, s, *batch]``.
    """
    m, d = X_em.shape[0], X_em.shape[1]
    n, s = u_em.shape[0], u_em.shape[1]
    X = [[X_em[mm, dd] for dd in range(d)] for mm in range(m)]
    gtfun = _pointwise_map2(
        lambda GG, dGG, p: op.g_tangent(GG, dGG, p),
        params,
        _nbatch(X_em),
        X_em.shape[2:],
    )
    gp, wdet = _qp_geometry(X, gd_q, dphi_q, w_q, d, m, n)
    Gq = _u_grad(gp, u_em, n, d, s)
    dGq = _u_grad(gp, v_em, n, d, s)
    dgv = gtfun(Gq, dGq, params)  # [d, s, *batch]
    contrib = jnp.stack(
        [
            jnp.stack(
                [sum(gp[nn][dd] * dgv[dd, ss] for dd in range(d)) for ss in range(s)],
                0,
            )
            for nn in range(n)
        ],
        0,
    )
    return wdet[None, None] * contrib


def assemble_element_elliptic_tangent_vectors_em(
    X_em, u_em, v_em, op, params, tab: Tabulation, tables=None
):
    """Element Hessian-action vectors ``(∂f_el/∂u)[v]`` in ``[n, s, E]`` layout.

    The tangent counterpart of
    :func:`assemble_element_elliptic_vectors_em`: one matrix-free Hessian
    application per call (the CG workhorse, elliptic.rs:361's role) with
    the material's closed-form tangent stress — no primal force
    computation, roughly half the sweep cost of ``jax.jvp`` over the
    vector sweep.  Exactness vs the traced jvp is pinned by tests.
    """

    params = _cast_float_params(params, X_em.dtype)

    def qp(carry, gd_q, dphi_q, w_q):
        return carry + elliptic_vector_tangent_qp(
            X_em, u_em, v_em, op, params, gd_q, dphi_q, w_q
        )

    init = u_em * jnp.zeros((), X_em.dtype)
    return _scan_qp(qp, tab, init, X_em.dtype, tables)


def assemble_element_elliptic_vectors_em(X_em, u_em, op, params, tab: Tabulation, tables=None):
    """Element vectors in element-minor layout: ``[n, s, E]``.

    Same quantity as :func:`..local.assemble_element_elliptic_vectors`
    (elliptic.rs:457) reshaped; exactness is pinned by tests.
    """

    params = _cast_float_params(params, X_em.dtype)

    def qp(carry, gd_q, dphi_q, w_q):
        return carry + elliptic_vector_qp(X_em, u_em, op, params, gd_q, dphi_q, w_q)

    # init derived from u_em (not fresh zeros) so the scan carry inherits
    # device-varying axes under shard_map
    init = u_em * jnp.zeros((), X_em.dtype)
    return _scan_qp(qp, tab, init, X_em.dtype, tables)


def compute_element_elliptic_energy_em(X_em, u_em, op, params, tab: Tabulation):
    """Per-element energies ``[E]`` (elliptic.rs:551)."""
    params = _cast_float_params(params, X_em.dtype)
    m, d, n, s = _shapes(X_em, tab, op)
    X = [[X_em[mm, dd] for dd in range(d)] for mm in range(m)]
    efun = _pointwise_map(
        lambda GG, p: op.energy(GG, p), params, _nbatch(X_em), X_em.shape[2:]
    )

    def qp(carry, gd_q, dphi_q, w_q):
        gp, wdet = _qp_geometry(X, gd_q, dphi_q, w_q, d, m, n)
        Gq = _u_grad(gp, u_em, n, d, s)
        return carry + wdet * efun(Gq, params)

    init = X_em[0, 0] * jnp.zeros((), X_em.dtype)
    return _scan_qp(qp, tab, init, X_em.dtype)


def elliptic_matrix_diagonal_em(X_em, u_em, op, params, tab: Tabulation):
    """Diagonal of the element matrices, ``[n, s, E]`` (elliptic.rs:361).

    diag[(n,i)] = ∫ gp[n,k] D[k,i,m,i] gp[n,m]; only the s diagonal slices
    of the contraction tensor are contracted.
    """
    params = _cast_float_params(params, X_em.dtype)
    m, d, n, s = _shapes(X_em, tab, op)
    X = [[X_em[mm, dd] for dd in range(d)] for mm in range(m)]
    dfun = _pointwise_map(
        lambda GG, p: op.contraction(GG, p), params, _nbatch(X_em), X_em.shape[2:]
    )

    def qp(carry, gd_q, dphi_q, w_q):
        gp, wdet = _qp_geometry(X, gd_q, dphi_q, w_q, d, m, n)
        Gq = _u_grad(gp, u_em, n, d, s)
        D = dfun(Gq, params)  # [d, s, d, s, E]
        contrib = jnp.stack(
            [
                jnp.stack(
                    [
                        sum(
                            gp[nn][k] * D[k, i, mm, i] * gp[nn][mm]
                            for k in range(d)
                            for mm in range(d)
                        )
                        for i in range(s)
                    ],
                    0,
                )
                for nn in range(n)
            ],
            0,
        )
        return carry + wdet[None, None] * contrib

    init = u_em * jnp.zeros((), X_em.dtype)
    return _scan_qp(qp, tab, init, X_em.dtype)
