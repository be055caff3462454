"""Fused Pallas element-stiffness kernel (component-pair layout).

One kernel per element block: geometry jacobians, inversion, the
contraction-weighted lhs stacks AND the projector block matmuls all run
VMEM-resident, writing the final ``[s², n, n, E]`` pairs layout once.
This removes the XLA path's only remaining costs beyond the MXU matmuls —
the unfused VPU geometry chain round-tripping HBM and the separate piece
materialization (measured hex20: 2.2 ms XLA pairs vs ~1.2 ms here at 22k
elements).

Scope (the constant-contraction production case, matching the reference's
linear-operator hot loop src/assembly/local/elliptic.rs:361-434):

* the operator's contraction tensor D is independent of ∇u and position
  (Laplace, linear elasticity) and of the element (scalar/global params);
* f32, TPU.  The general nonlinear tangent path stays on the XLA pairs
  formulation (its D depends on ∇u per quadrature point).

Layout contracts (all tile-aligned for Mosaic — no sublane-strided
writes, the round-5 landmine class):

* ``xf [m·d, E_pad]``   element-minor geometry, row (mm, i);
* ``gdw [q_pad, m·d+1]`` per-qp reference gradients (col (mm, j)) and
  quadrature weight (last col); padding rows REPEAT row 0's gradients
  (keeps det invertible) with ZERO weight (kills their lhs rows exactly);
* ``cf [P·d², 1]``      contraction scalars per upper pair, row
  (pu, k, m) = 0.5·(D[k,i,m,j] + D[m,j,k,i]) for pair pu = (i, j);
* ``wc [d²·q_pad, n²]`` the reference projector, zero rows at padded qp
  positions; the mirrored i > j blocks are written as an in-VMEM node
  transpose of the upper block's dot result (no second projector, no
  second dot — 2/3 of the former off-diagonal MXU flops);
* out ``[s², n², E_pad]`` — block (i·s + j) is the (row-node, col-node)
  component-pair matrix, flattened (a, b).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax._src.config import enable_x64  # context manager (jax 0.9: not re-exported)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..assembly.local_em import _inv_det

__all__ = ["stiffness_pairs_pallas", "supports_stiffness_pallas"]

def _block_e(s: int, n: int) -> int:
    """Elements per grid step: largest lane multiple whose double-buffered
    output block fits a ~8 MB VMEM budget (the 512-lane hex20 block OOMs
    the 16 MB scoped VMEM)."""
    b = int(8e6 // (s * s * n * n * 4 * 2)) // 128 * 128
    return max(128, min(1024, b))


def _pad8(x: int) -> int:
    return -(-x // 8) * 8


def supports_stiffness_pallas(op, params, tab, E: int, dtype) -> bool:
    """The fused kernel covers the constant-contraction f32 TPU case."""
    from ..assembly.local import _has_per_element_params, _has_per_point_params

    return (
        jax.default_backend() == "tpu"
        and dtype == jnp.float32
        and getattr(op, "constant_contraction", False)
        and not _has_per_point_params(params, E, tab.num_points)
        and not _has_per_element_params(params, E)
        and tab.geo_dphi.shape[2] in (2, 3)
        and E >= 2 * _block_e(op.solution_dim, tab.dphi.shape[1])
    )


def _kernel(xf_ref, gdw_ref, cf_ref, wc_ref, o_ref, scr_ref, *, m, d, s, n, q_pad, pairs):
    md = m * d
    # geometry rows as [1, B] vectors
    X = [
        [xf_ref[pl.ds(mm * d + i, 1), :] for i in range(d)] for mm in range(m)
    ]
    # J[i][j] [q_pad, B] = sum_m gd[:, (mm, j)] (x) X[mm][i]
    Jl = [
        [
            sum(gdw_ref[:, pl.ds(mm * d + j, 1)] * X[mm][i] for mm in range(m))
            for j in range(d)
        ]
        for i in range(d)
    ]
    Jinv, det = _inv_det(Jl, d)
    wdet = gdw_ref[:, pl.ds(md, 1)] * jnp.abs(det)  # [q_pad, B] (0 rows padded)
    Jmw = [[Jinv[a][k] * wdet for k in range(d)] for a in range(d)]
    wc = wc_ref[:, :]
    for pu, (i, j) in enumerate(pairs):
        # C as true SMEM scalars (a [1,1] VMEM read broadcast to the
        # [q_pad, B] vregs is rejected by Mosaic)
        C = [
            [cf_ref[(pu * d + k) * d + mm] for mm in range(d)]
            for k in range(d)
        ]
        t = [
            [sum(C[k][mm] * Jinv[b][mm] for mm in range(d)) for b in range(d)]
            for k in range(d)
        ]
        # lhs assembled in a VMEM scratch (a value-level concatenate costs
        # a relayout; slice writes into scratch are free)
        for a in range(d):
            for b in range(d):
                scr_ref[pl.ds((a * d + b) * q_pad, q_pad), :] = sum(
                    Jmw[a][k] * t[k][b] for k in range(d)
                )
        lhsv = scr_ref[:, :]
        P = lax.dot_general(
            wc,
            lhsv,
            (((0,), (0,)), ((), ())),
            precision=lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        )  # [n*n, B]
        o_ref[i * s + j, :, :] = P
        if i != j:
            # the mirror block is the node-transpose of P: a VMEM sublane
            # permutation of the flat (a, b) rows — replacing the former
            # column-permuted second dot removed 1/3 of the kernel's MXU
            # flops (hex20: 11.5 -> 16.9 Mel/s, bit-exact; round 5)
            B = P.shape[1]
            o_ref[j * s + i, :, :] = (
                P.reshape(n, n, B).swapaxes(0, 1).reshape(n * n, B)
            )


@functools.lru_cache(maxsize=None)
def _build_call(m, d, s, n, q, q_pad, E_pad, sym: bool, interpret: bool = False):
    pairs = tuple(
        (i, j) for i in range(s) for j in range(i if sym else 0, s) if (not sym) or i <= j
    )
    kern = functools.partial(
        _kernel, m=m, d=d, s=s, n=n, q_pad=q_pad, pairs=pairs
    )
    B = _block_e(s, n)
    grid = (pl.cdiv(E_pad, B),)
    K_pad = d * d * q_pad
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((m * d, B), lambda e: (0, e)),
            pl.BlockSpec((q_pad, m * d + 1), lambda e: (0, 0)),
            pl.BlockSpec(memory_space=pltpu.MemorySpace.SMEM),
            pl.BlockSpec((K_pad, n * n), lambda e: (0, 0)),
        ],
        out_specs=pl.BlockSpec((s * s, n * n, B), lambda e: (0, 0, e)),
        out_shape=jax.ShapeDtypeStruct((s * s, n * n, E_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((K_pad, B), jnp.float32)],
        interpret=interpret,
    )


def stiffness_pairs_pallas(X_geo, op, params, tab, *, interpret: bool = False):
    """Constant-contraction element matrices, pairs layout ``[s², n², E]``.

    Values match the XLA pairs path
    (:func:`~fenris_tpu.assembly.local.assemble_element_elliptic_matrices_pairs`)
    to f32 roundoff; dispatched by it under ``supports_stiffness_pallas``.

    ``X_geo`` may be the standard ``[E, m, d]`` geometry or the kernel's
    native **element-minor flat** form ``[m·d, E]`` (row (mm, i)) — a
    per-call ``[E, m·d] -> [m·d, E]`` transpose is a minor-dim transpose
    XLA:TPU amplifies ~40x (CLAUDE.md; measured 1.6 ms of the 2.7 ms
    hex20 kernel), so steady-state callers should pre-transpose once.
    """
    d = tab.geo_dphi.shape[2]
    n = tab.dphi.shape[1]
    q = tab.num_points
    s = op.solution_dim
    if X_geo.ndim == 2:
        m = X_geo.shape[0] // d
        E = X_geo.shape[1]
        Xf = X_geo.astype(jnp.float32)
    else:
        E, m = X_geo.shape[0], X_geo.shape[1]
        Xf = jnp.transpose(X_geo.astype(jnp.float32), (1, 2, 0)).reshape(m * d, E)
    q_pad = _pad8(q)
    B = _block_e(s, n)
    # ragged final block: Pallas masks the out-of-range lanes (garbage in
    # those lanes stays lane-confined — every op is lane-wise and the dot
    # contracts K only)
    E_pad = E

    # host constants -> kernel inputs (Mosaic cannot capture array consts)
    gd = np.asarray(tab.geo_dphi, np.float32)  # [q, m, d]
    w = np.asarray(tab.weights, np.float32)
    gdw = np.zeros((q_pad, m * d + 1), np.float32)
    gdw[:q, : m * d] = gd.reshape(q, m * d)
    gdw[q:, : m * d] = gd[0].reshape(1, m * d)  # repeat row 0: det stays finite
    gdw[:q, m * d] = w  # zero weight on padded rows kills their lhs exactly
    dphi = np.asarray(tab.dphi, np.float64)  # [q, n, d]
    wc_np = np.zeros((d * d * q_pad, n * n), np.float32)
    full = np.einsum("qna,qpb->abqnp", dphi, dphi).reshape(d * d, q, n * n)
    wc_np.reshape(d * d, q_pad, n * n)[:, :q] = full

    # contraction scalars per upper pair (traced-safe: D may be a tracer)
    sym = bool(op.symmetric)
    D = op.contraction(jnp.zeros((d, s), jnp.float32), params)
    pairs = [(i, j) for i in range(s) for j in range(s) if (not sym) or i <= j]
    crows = []
    for (i, j) in pairs:
        for k in range(d):
            for mm in range(d):
                if sym:
                    crows.append(0.5 * (D[k, i, mm, j] + D[mm, j, k, i]))
                else:
                    crows.append(D[k, i, mm, j])
    cf = jnp.stack(crows).astype(jnp.float32)  # [P*d*d] SMEM scalars

    call = _build_call(m, d, s, n, q, q_pad, E_pad, sym, interpret)
    # int64 induction vars under x64 hit Mosaic's lowering recursion
    # (CLAUDE.md): trace the call with x64 disabled
    with enable_x64(False):
        out = call(Xf, jnp.asarray(gdw), cf, jnp.asarray(wc_np))
    return out  # [s², n², E] — flat (a, b): splitting (n, n) is a sublane relayout
