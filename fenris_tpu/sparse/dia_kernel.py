"""Fused Pallas band-sweep SpMV for block-DIA operators.

Parity target: the CSR SpMV inside the reference's CG loop
(fenris-sparse/src/cg.rs:373-450), at TPU HBM streaming bandwidth.

:func:`~.block_dia.block_dia_matvec` expresses y = A x as D*s*s separate
full-lane FMAs; XLA:TPU schedules them as many passes that re-read/
re-write the y accumulators, reaching only ~13% of HBM peak (measured
v5e, 1M dofs; XLA reformulations — one fused multiply-reduce, unrolled-d
— are 4x *worse*).  The fix is one Pallas kernel that keeps the whole
accumulation in VMEM:

* **pack** (once per assembled operator): permute ``bands [D*s*s, N]``
  into an output-component-major stack ``[s*s*Dp, Npad]`` where row
  ``(i*s + j)*Dp + d`` holds band ``(d*s + i)*s + j`` (``Dp`` = D rounded
  up to 8 sublanes, ``Npad`` = N rounded up to the lane-chunk size) —
  one device copy, amortized over all CG iterations of the Newton step;
* **shift** (per matvec, XLA): the D statically-shifted reads of x
  become ``Xs [s*Dp, Npad]`` via `lax.slice` of the zero-padded x — pure
  streaming copies (~1/3 of the bands traffic);
* **sweep** (per matvec, Pallas): grid over lane chunks; each step loads
  the ``[s*s*Dp, CN]`` bands block and the matching ``[s*Dp, CN]`` Xs
  block into VMEM and reduces all ``s*Dp`` products per output component
  in one pass — y is written exactly once.

Everything is tile-aligned by construction (rows are multiples of 8,
lanes multiples of 128) — non-aligned shapes MISCOMPILE on this Mosaic
toolchain (see ops/structured_stencil.py's round-1 postmortem).

Bit-consistency: the kernel sums the D*s*s products per output lane in a
fixed order, and zero pad rows contribute exact zeros, so results match
:func:`block_dia_matvec` to f32 summation-order roundoff.

Round 5 adds the **windowed** variant (:class:`PackedDiaW`,
:func:`packed_dia_matvec_wm`): the staged shift array above is ~45% of
the matvec's HBM traffic, so the production kernel instead DMAs one
halo window of x per lane chunk (``make_async_copy`` from an ANY-space
input) and builds the shifted X block in VMEM — 0.50 ms vs 1.73 ms at
1M dofs, 7.7 ms vs 19.8 ms at 10M (v5e).  The staged kernel remains the
f64/interpret parity path and the fallback when the halo window exceeds
the VMEM cap.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import numpy as np
import jax.numpy as jnp
from jax._src.config import enable_x64  # context manager (jax 0.9: not re-exported)
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_dia import BlockDiaMatrix, block_dia_matvec
from .block_ell import block_ell_matvec

__all__ = [
    "PackedDia",
    "PackedDiaW",
    "pack_block_dia",
    "pack_block_dia_windowed",
    "packed_dia_matvec",
    "packed_dia_matvec_cm",
    "packed_dia_matvec_wm",
    "block_dia_operator",
]


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


class PackedDia(NamedTuple):
    """Kernel-layout view of a :class:`BlockDiaMatrix` (no remainder)."""

    bands_k: jnp.ndarray  # [s*s*Dp, Npad], row (i*s + j)*Dp + d
    offsets: Tuple[int, ...]
    num_nodes: int
    solution_dim: int
    lanes: int  # CN: lane-chunk size (Npad % CN == 0)

    @property
    def dp(self) -> int:
        return self.bands_k.shape[0] // self.solution_dim**2


def _pick_lanes(s: int, dp: int, num_nodes: int) -> int:
    """Lane-chunk size: largest multiple of 128 within the VMEM budget.

    Per grid step the kernel holds (s*s*Dp + s*Dp + 8) rows x CN lanes of
    f32, double-buffered by the pipeline; target ~24 MB so the 64 MB
    scoped limit keeps ample headroom.
    """
    rows = s * s * dp + s * dp + 8
    cn = (24 * 2**20 // (rows * 4 * 2)) // 128 * 128
    cn = max(128, min(8192, cn))
    return min(cn, _round_up(num_nodes, 128))


def pack_block_dia(m: BlockDiaMatrix, lanes: Optional[int] = None) -> PackedDia:
    """Repack bands into the kernel layout (one device copy).

    The relayout is ONE fused row-gather + zero-pad program, so peak HBM
    is input + output (~7.2 GB at 10M dofs) — the transpose-then-pad
    formulation materialized two extra band-sized intermediates and OOM'd
    the 16 GB chip during the 10M-dof assembled solve (round 5).

    The remainder (block-ELL spill) is not packed; callers add
    ``block_ell_matvec(m.remainder, v)`` separately (see
    :func:`block_dia_operator`).
    """
    s, N, D = m.solution_dim, m.num_nodes, m.num_diagonals
    dp = _round_up(max(D, 1), 8)
    cn = int(lanes) if lanes is not None else _pick_lanes(s, dp, N)
    npad = _round_up(N, cn)
    src = np.zeros(s * s * dp, np.int32)
    keep = np.zeros(s * s * dp, bool)
    for i in range(s):
        for j in range(s):
            for d_ in range(D):
                src[(i * s + j) * dp + d_] = (d_ * s + i) * s + j
                keep[(i * s + j) * dp + d_] = True
    bands_k = _pack_impl(
        m.bands, jnp.asarray(src), jnp.asarray(keep), int(npad)
    )
    return PackedDia(
        bands_k=bands_k,
        offsets=m.offsets,
        num_nodes=N,
        solution_dim=s,
        lanes=cn,
    )


@functools.partial(jax.jit, static_argnames=("npad",))
def _pack_impl(bands, src, keep, npad: int):
    out = jnp.where(keep[:, None], bands[src], jnp.zeros((), bands.dtype))
    return jnp.pad(out, ((0, 0), (0, npad - bands.shape[1])))


def _sweep_kernel(s: int, dp: int, b_ref, x_ref, o_ref):
    X = x_ref[:]  # [s*Dp, CN]
    rows = [None] * o_ref.shape[0]
    for i in range(s):
        Bi = b_ref[i * s * dp : (i + 1) * s * dp, :]
        rows[i] = jnp.sum(Bi * X, axis=0, keepdims=True)
    for r in range(s, o_ref.shape[0]):
        rows[r] = jnp.zeros((1, X.shape[1]), o_ref.dtype)
    o_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _sweep_call(bands_k, xs, meta, interpret=False):
    s, dp, cn, npad = meta
    kernel = functools.partial(_sweep_kernel, s, dp)
    # trace with 32-bit weak literals on the compiled f32 path (i64
    # literals fail Mosaic legalization — see ops/structured_stencil.py);
    # f64 runs interpret-only (CPU parity tests) and must keep x64 on
    import contextlib

    ctx = (
        enable_x64(False)
        if bands_k.dtype == jnp.float32
        else contextlib.nullcontext()
    )
    with ctx:
        out = pl.pallas_call(
            kernel,
            grid=(npad // cn,),
            in_specs=[
                pl.BlockSpec((s * s * dp, cn), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((s * dp, cn), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((8, cn), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, npad), bands_k.dtype),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 * 1024 * 1024
            ),
            interpret=interpret,
        )(bands_k, xs)
    return out


def packed_dia_matvec_cm(p: PackedDia, x2, *, interpret: bool = False):
    """Component-major ``y2 [s, N] = A x2 [s, N]`` via the band sweep.

    This is THE fast entry: every stage (pad, the D lane shifts, the
    kernel, the output slice) stays in ``[rows, N]`` layout with the node
    axis minor.  The node-major wrapper :func:`packed_dia_matvec` costs
    two ``[N, s] <-> [s, N]`` transposes whose minor-dim-s tiling is ~42x
    read/write-amplified on TPU — measured to dominate the whole matvec
    (23.9 ms vs 1.7 ms at 1M dofs, v5e) — so CG loops must run
    component-major and convert only at solve entry/exit.
    """
    s, N = p.solution_dim, p.num_nodes
    dp = p.dp
    npad = p.bands_k.shape[1]
    offsets = p.offsets
    D = len(offsets)
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    cols = jnp.pad(x2.astype(p.bands_k.dtype), ((0, 0), (lo, hi)))
    shifted = [
        jax.lax.slice_in_dim(cols, lo + o, lo + o + N, axis=1) for o in offsets
    ]
    X = jnp.stack(shifted, axis=1)  # [s, D, N]
    X = jnp.pad(X, ((0, 0), (0, dp - D), (0, npad - N))).reshape(s * dp, npad)
    out = _sweep_call(p.bands_k, X, (s, dp, p.lanes, npad), interpret=interpret)
    return out[:s, :N].astype(x2.dtype)


def packed_dia_matvec(p: PackedDia, v, *, interpret: bool = False):
    """Node-major y = A x through the fused band-sweep kernel (no
    remainder).  Convenience wrapper — the two layout transposes here are
    the TPU slow path; iterate via :func:`packed_dia_matvec_cm`."""
    s, N = p.solution_dim, p.num_nodes
    out = packed_dia_matvec_cm(p, v.reshape(N, s).T, interpret=interpret)
    return out.T.reshape(-1)


class PackedDiaW(NamedTuple):
    """Windowed-kernel layout of a :class:`BlockDiaMatrix` (no remainder).

    Row order is ``i*dps + d*s + j`` with ``dps = round_up(D*s, 8)`` —
    the per-output-component blocks are 8-aligned and the per-diagonal
    x rows land as contiguous ``[s, CN]`` groups, which is what lets the
    kernel build the shifted X block in VMEM from one halo window
    instead of a staged HBM array (see :func:`packed_dia_matvec_wm`).
    """

    bands_k: jnp.ndarray  # [s*dps, Npad]
    offsets: Tuple[int, ...]
    num_nodes: int
    solution_dim: int
    lanes: int  # CN
    lo: int  # left halo = max(0, -min(offsets))
    wn: int  # VMEM window width (>= CN + lo + hi, 128-multiple)

    @property
    def dps(self) -> int:
        return self.bands_k.shape[0] // self.solution_dim

    @property
    def lpad(self) -> int:
        npad = _round_up(self.num_nodes, self.lanes)
        return (npad // self.lanes - 1) * self.lanes + self.wn


# VMEM budget for the halo window [8, Wn] f32; beyond it (pathological
# bandwidth after reordering) the staged kernel takes over
_WINDOW_LANES_CAP = 512 * 1024


def _pick_lanes_w(s: int, dps: int, num_nodes: int, halo: int = 0) -> int:
    """Lane-chunk size for the windowed sweep.

    Baseline ~24 MB of double-buffered band blocks (see
    :func:`_pick_lanes`), widened toward halo/2 when the halo is large
    (big-bandwidth meshes re-read x ``wn/cn`` times; at 10M dofs the
    wider chunk measured 8.28 -> 7.58 ms), capped by the VMEM budget.
    """
    rows = s * dps + dps + 16
    cn = (24 * 2**20 // (rows * 4 * 2)) // 128 * 128
    cn = max(cn, _round_up(halo // 2, 128))
    # full-kernel VMEM cap: bands double-buffer + X2 + the halo window
    cap = (80 * 10**6 - 8 * 4 * halo) // ((s * dps * 2 + dps + 8) * 4)
    cn = min(cn, max(128, cap // 128 * 128))
    cn = max(128, min(31744, cn))
    return min(cn, _round_up(num_nodes, 128))


def pack_block_dia_windowed(
    m: BlockDiaMatrix, lanes: Optional[int] = None
) -> Optional[PackedDiaW]:
    """Repack bands into the windowed-kernel layout, or ``None`` when the
    halo window would not fit VMEM (bandwidth too large for the node
    count).  One fused row-gather + zero-pad device program, like
    :func:`pack_block_dia`.
    """
    D, s, N = m.num_diagonals, m.solution_dim, m.num_nodes
    if D == 0 or s > 8:  # x rides in one 8-sublane tile
        return None
    offsets = tuple(int(o) for o in m.offsets)
    dps = _round_up(D * s, 8)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    cn = int(lanes) if lanes is not None else _pick_lanes_w(s, dps, N, lo + hi)
    wn = _round_up(cn + lo + hi, 128)
    if wn > _WINDOW_LANES_CAP:
        return None
    npad = _round_up(N, cn)
    src = np.zeros(s * dps, np.int32)
    keep = np.zeros(s * dps, bool)
    for i in range(s):
        for d in range(D):
            for j in range(s):
                src[i * dps + d * s + j] = (d * s + i) * s + j
                keep[i * dps + d * s + j] = True
    bands_k = _pack_impl(m.bands, jnp.asarray(src), jnp.asarray(keep), int(npad))
    return PackedDiaW(bands_k, offsets, N, s, cn, lo, wn)


def _sweep_kernel_w(
    b_ref, xw_hbm, o_ref, w_scr, x2_scr, sem, *, s, dps, cn, lo, offs, wn
):
    step = pl.program_id(0)
    # halo window DMA: x rows [xrows, wn] starting at lane step*cn (the
    # source is HBM-resident via memory_space=ANY; lane offsets are
    # 128-aligned because cn is)
    dma = pltpu.make_async_copy(
        xw_hbm.at[:, pl.ds(step * cn, wn)], w_scr, sem
    )
    dma.start()
    dma.wait()
    D = len(offs)
    # build X2 [dps, cn]: rows (d*s + j) = x[j, c + offs[d]]; the d*s row
    # offsets are NOT 8-aligned — Mosaic handles the sublane-offset slice
    # writes (measured fine at s=3, round 5)
    for d in range(D):
        x2_scr[pl.ds(d * s, s), :] = w_scr[pl.ds(0, s), pl.ds(lo + offs[d], cn)]
    if dps > D * s:
        # zero the alignment-pad rows once: their band rows are zero, but
        # uninitialized scratch could hold NaN bit patterns (0*NaN = NaN)
        x2_scr[pl.ds(D * s, dps - D * s), :] = jnp.zeros(
            (dps - D * s, cn), x2_scr.dtype
        )
    X = x2_scr[:, :]
    rows = [None] * o_ref.shape[0]
    for i in range(s):
        Bi = b_ref[i * dps : (i + 1) * dps, :]
        rows[i] = jnp.sum(Bi * X, axis=0, keepdims=True)
    for r in range(s, o_ref.shape[0]):
        rows[r] = jnp.zeros((1, cn), o_ref.dtype)
    o_ref[:] = jnp.concatenate(rows, axis=0)


@functools.partial(jax.jit, static_argnames=("meta", "interpret"))
def _sweep_call_w(bands_k, x_pad, meta, interpret=False):
    s, dps, cn, lo, offs, wn, npad, xrows = meta
    kernel = functools.partial(
        _sweep_kernel_w, s=s, dps=dps, cn=cn, lo=lo, offs=offs, wn=wn
    )
    # 32-bit weak literals on the compiled f32 path (i64 literals fail
    # Mosaic legalization); f64 runs interpret-only and must keep x64 on
    import contextlib

    ctx = (
        enable_x64(False)
        if bands_k.dtype == jnp.float32
        else contextlib.nullcontext()
    )
    with ctx:
        out = pl.pallas_call(
            kernel,
            grid=(npad // cn,),
            in_specs=[
                pl.BlockSpec((s * dps, cn), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((8, cn), lambda i: (0, i), memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((8, npad), bands_k.dtype),
            scratch_shapes=[
                pltpu.VMEM((xrows, wn), bands_k.dtype),
                pltpu.VMEM((dps, cn), bands_k.dtype),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        )(bands_k, x_pad)
    return out


_X_ROWS = 8  # HBM source rows for the window DMA (full f32 sublane tile)


def packed_dia_matvec_wm(p: PackedDiaW, x2, *, interpret: bool = False):
    """Component-major ``y2 [s, N] = A x2 [s, N]`` via the windowed sweep.

    Unlike :func:`packed_dia_matvec_cm` there is NO staged ``[s*Dp, Npad]``
    shift array: each grid step DMAs one halo window of x into VMEM and
    builds the shifted block in-place.  At 1M dofs (hex8 box, D=27) that
    staging was ~45% of the matvec's HBM traffic — measured 1.83 ms
    staged vs 0.55 ms windowed (~88% of v5e HBM peak band streaming).
    """
    s, N = p.solution_dim, p.num_nodes
    npad = _round_up(N, p.lanes)
    xp = jnp.pad(
        x2.astype(p.bands_k.dtype),
        ((0, _X_ROWS - x2.shape[0]), (p.lo, p.lpad - p.lo - N)),
    )
    out = _sweep_call_w(
        p.bands_k,
        xp,
        (s, p.dps, p.lanes, p.lo, p.offsets, p.wn, npad, _X_ROWS),
        interpret=interpret,
    )
    return out[:s, :N].astype(x2.dtype)


def _pallas_applicable(m: BlockDiaMatrix) -> bool:
    if jax.default_backend() != "tpu":
        return False
    if jnp.result_type(m.bands.dtype) != jnp.float32:
        return False
    s, D = m.solution_dim, m.num_diagonals
    rows = s * s * _round_up(max(D, 1), 8)
    # beyond ~4096 band rows the per-chunk VMEM blocks get too thin for
    # the sweep to stream (and the ordering is bad enough that block-DIA
    # itself is the wrong layout)
    return rows <= 4096 and m.num_nodes >= 1024


def block_dia_operator(m: BlockDiaMatrix, *, pallas="auto", lanes=None, layout: str = "dof"):
    """Return a ``matvec`` closure for ``m``, kernel-accelerated on TPU.

    ``pallas="auto"`` picks the fused band-sweep kernel when the backend
    is TPU, the bands are f32, and the diagonal count fits the VMEM
    budget; otherwise (CPU parity mode, f64, tiny or pathological
    operators) it falls back to the XLA matvec.  The pack copy runs once
    here, amortized over every CG iteration that applies the operator.

    ``layout="dof"`` (default): node-major flat vectors ``[s*N]``
    (``dof = s*node + comp``) — two layout transposes per apply on the
    kernel path.  ``layout="component"``: ``[s, N]`` arrays end-to-end —
    the fast form; CG is shape-agnostic, so solvers should run
    component-major and convert at entry/exit only (measured 402 GB/s
    effective vs 28 GB/s node-major at 1M dofs, v5e).
    """
    from .block_dia import block_dia_matvec_cm

    use = _pallas_applicable(m) if pallas == "auto" else bool(pallas)
    cm = layout == "component"
    if layout not in ("dof", "component"):
        raise ValueError(f"unknown layout {layout!r}")
    if not use:
        return (lambda x2: block_dia_matvec_cm(m, x2)) if cm else (
            lambda v: block_dia_matvec(m, v)
        )
    # prefer the staging-free windowed sweep (~3.3x the staged kernel at
    # 1M dofs); falls back when the halo window would not fit VMEM
    packedw = pack_block_dia_windowed(m, lanes)
    packed = pack_block_dia(m, lanes) if packedw is None else None
    rem = m.remainder

    def apply_cm(x2):
        if packedw is not None:
            return packed_dia_matvec_wm(packedw, x2)
        return packed_dia_matvec_cm(packed, x2)

    if cm:
        from .block_ell import block_ell_matvec_cm

        def matvec_cm(x2):
            y2 = apply_cm(x2)
            if rem is not None:
                y2 = y2 + block_ell_matvec_cm(rem, x2)
            return y2

        return matvec_cm

    def matvec(v):
        s, N = m.solution_dim, m.num_nodes
        y = apply_cm(v.reshape(N, s).T).T.reshape(-1)
        if rem is not None:
            y = y + block_ell_matvec(rem, v)
        return y

    return matvec
