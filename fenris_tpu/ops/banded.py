"""Banded MXU gather/scatter for unstructured element data.

The TPU-native replacement for the reference's per-element indexed access:
``gather_global_to_local`` (src/assembly/global.rs:742) on the read side and
``add_local_to_global`` (src/assembly/global.rs:770) plus the whole
fenris-paradis coloring machinery on the write side.

Design
------
XLA:TPU executes irregular gathers/scatters at only a few million indices
per second (scalar dynamic-slice loops), which caps matrix-free unstructured
FEM at ~1M elements/s.  This module removes all device-side irregular
indexing:

1. After a bandwidth-reducing node ordering (reverse Cuthill-McKee,
   :mod:`fenris_tpu.mesh.reorder`), every element's nodes lie within a
   contiguous node window of width ~= the RCM bandwidth.
2. Nodes are partitioned into contiguous *owned ranges* of ``r_nodes``;
   each element is assigned to the range owning its smallest node.  All
   elements of one range read/write inside the window
   ``[k*r_nodes, k*r_nodes + W)`` with ``W = r_nodes + bandwidth`` — a
   static slice per grid step.
3. Within a window, a gather row (element-node pair) with local node index
   ``l = 128*a + b`` is materialized by two dense one-hot contractions:
   a *block-level selection matmul* on the MXU (one-hot over ``a``) and a
   *lane-level one-hot reduction* on the VPU (one-hot over ``b``).
   Scatter-add is the exact transpose (VPU spread + MXU matmul), followed
   by a cheap shifted-add combine of the overlapping window halos.

The device therefore executes only dense, statically-shaped tile work; the
index structure is compiled into small ``int32`` side tables on the host.

Exactness
---------
Selection matmuls split the f32 data operand into three bf16 components
(8 mantissa bits each; ``hi + mid + lo == value`` exactly) and multiply by
an exactly-representable 0/1 bf16 one-hot, so every product is exact and
the gather equals ``u[cells]`` bit-for-bit.  Scatter sums are deterministic
f32 accumulations (fixed MXU reduction order), matching the determinism
guarantee of ``segment_sum`` (though not its exact summation order).

Autodiff
--------
``gather``/``scatter_add`` are registered through ``jax.custom_derivatives
.linear_call`` with each other as transposes, so ``jvp`` (Newton-Krylov
Hessian actions) and ``grad`` both flow through the Pallas kernels.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.custom_derivatives import linear_call

__all__ = [
    "BandedPlan",
    "make_banded_plan",
    "gather",
    "scatter_add",
    "gather_blocked",
    "scatter_add_blocked",
]


@dataclass(frozen=True)
class BandedPlan:
    """Host-compiled index structure for banded gather/scatter.

    Row layout: block ``k`` owns rows ``[k*rows, (k+1)*rows)`` of the
    flattened row axis; row ``r < counts[k] * n`` is element
    ``perm[starts[k] + r // n]``, local node ``r % n``.
    """

    num_nodes: int
    s: int  # components per node
    n: int  # nodes per element
    num_elements: int  # real (unpadded) element count
    k_blocks: int  # number of owned node ranges (grid dim 0)
    rows: int  # padded rows per block (multiple of rowt and of n)
    rowt: int  # row-tile lanes (grid dim 1 tile)
    wa: int  # window width in 128-node blocks
    ra: int  # owned range width in 128-node blocks
    na_pad: int  # padded global length in 128-node blocks
    elements_per_block: int  # rows // n
    perm: np.ndarray  # [E] element permutation (sorted by owner)
    counts: np.ndarray  # [k_blocks] real elements per block
    a_loc: jnp.ndarray  # [1, k_blocks*rows] int32: local node // 128
    b_loc: jnp.ndarray  # [1, k_blocks*rows] int32: local node % 128
    valid_rows: jnp.ndarray  # [1, k_blocks*rows] f32 row mask
    nodes_padded: jnp.ndarray  # [k_blocks*rows] int32 global node (fallback)

    @property
    def n_rowt(self) -> int:
        return self.rows // self.rowt

    @property
    def padded_elements(self) -> int:
        return self.k_blocks * self.elements_per_block

    def pad_elements(self, arr: np.ndarray) -> np.ndarray:
        """Permute + pad a per-element host array to the padded row layout.

        Padding elements replicate the block's first real element (or the
        global first element for empty blocks) so downstream element math
        stays finite; their contributions are masked by ``valid_rows``.
        """
        arr = np.asarray(arr)
        out = np.empty((self.padded_elements,) + arr.shape[1:], arr.dtype)
        starts = np.concatenate([[0], np.cumsum(self.counts)])
        bp = self.elements_per_block
        for k in range(self.k_blocks):
            c = int(self.counts[k])
            seg = self.perm[starts[k] : starts[k] + c]
            out[k * bp : k * bp + c] = arr[seg]
            filler = arr[seg[0]] if c else arr[self.perm[0]]
            out[k * bp + c : (k + 1) * bp] = filler
        return out

    def valid_elements(self) -> np.ndarray:
        """[padded_elements] 1.0/0.0 mask of real (non-padding) elements."""
        bp = self.elements_per_block
        v = np.zeros((self.k_blocks, bp), np.float64)
        for k in range(self.k_blocks):
            v[k, : int(self.counts[k])] = 1.0
        return v.reshape(-1)


def make_banded_plan(
    cells: np.ndarray,
    num_nodes: int,
    s: int,
    r_nodes: int = 4096,
    rowt: int = 2048,
    max_wa: int = 2048,
) -> BandedPlan:
    """Build a :class:`BandedPlan` for ``cells`` [E, n] (node indices).

    ``r_nodes`` is the owned node range per block (multiple of 128);
    ``rowt`` the kernel row tile.  Raises ``ValueError`` if the mesh
    bandwidth makes the window exceed ``max_wa`` 128-node blocks (reorder
    the mesh with RCM first).
    """
    cells = np.asarray(cells)
    E, n = cells.shape
    if r_nodes % 1024:
        # ra = r_nodes/128 must be a multiple of 8: window DMA offsets
        # (k*ra) slice the sublane dim of the blocked layout.
        raise ValueError("r_nodes must be a multiple of 1024")
    cmin = cells.min(axis=1)
    owner = cmin // r_nodes
    k_blocks = max(int(owner.max()) + 1, 1) if E else 1
    perm = np.argsort(owner, kind="stable")
    cells_s = cells[perm]
    owner_s = owner[perm]
    counts = np.bincount(owner_s, minlength=k_blocks)
    bmax = max(int(counts.max()), 1)
    # rows per block: multiple of rowt; elements_per_block = rows // n
    bp = -(-(bmax * n) // rowt) * rowt // n
    while (bp * n) % rowt:
        bp += 1  # grow until rows is a common multiple of rowt and n
    rows = bp * n
    rel = cells_s - (owner_s * r_nodes)[:, None]
    w = int(rel.max()) + 1 if E else 1
    wa = -(-w // 128)
    wa = -(-wa // 8) * 8  # window DMA slices the sublane dim: align to 8
    if wa > max_wa:
        raise ValueError(
            f"banded window needs {wa} blocks (> {max_wa}); mesh bandwidth "
            "too large — apply reverse Cuthill-McKee reordering first"
        )
    ra = r_nodes // 128

    a_loc = np.zeros((k_blocks, rows), np.int32)
    b_loc = np.zeros((k_blocks, rows), np.int32)
    valid = np.zeros((k_blocks, rows), np.float32)
    nodes_pad = np.zeros((k_blocks, rows), np.int64)
    starts = np.concatenate([[0], np.cumsum(counts)])
    for k in range(k_blocks):
        loc = rel[starts[k] : starts[k + 1]].reshape(-1)
        a_loc[k, : loc.size] = loc // 128
        b_loc[k, : loc.size] = loc % 128
        valid[k, : loc.size] = 1.0
        nodes_pad[k, : loc.size] = cells_s[starts[k] : starts[k + 1]].reshape(-1)
    na_pad = (k_blocks - 1) * ra + wa  # last window must fit
    na_pad = max(na_pad, -(-num_nodes // 128))

    return BandedPlan(
        num_nodes=num_nodes,
        s=s,
        n=n,
        num_elements=E,
        k_blocks=k_blocks,
        rows=rows,
        rowt=rowt,
        wa=wa,
        ra=ra,
        na_pad=na_pad,
        elements_per_block=bp,
        perm=perm,
        counts=counts,
        a_loc=jnp.asarray(a_loc.reshape(1, -1)),
        b_loc=jnp.asarray(b_loc.reshape(1, -1)),
        valid_rows=jnp.asarray(valid.reshape(1, -1)),
        nodes_padded=jnp.asarray(nodes_pad.reshape(-1)),
    )


# -- layout helpers -----------------------------------------------------------


def _to_blocked(plan: BandedPlan, u):
    """[N, s] -> blocked layout [na_pad, s*128]: row a holds nodes 128a..+128."""
    n_tot = plan.na_pad * 128
    up = jnp.pad(u, ((0, n_tot - plan.num_nodes), (0, 0)))
    return up.reshape(plan.na_pad, 128, plan.s).transpose(0, 2, 1).reshape(
        plan.na_pad, plan.s * 128
    )


def _from_blocked(plan: BandedPlan, ub):
    """Blocked layout [na_pad, s*128] -> [N, s]."""
    full = ub.reshape(plan.na_pad, plan.s, 128).transpose(0, 2, 1)
    return full.reshape(plan.na_pad * 128, plan.s)[: plan.num_nodes]


def _rows_to_elements(plan: BandedPlan, rows_sm):
    """Kernel row layout [s, K*rows] -> element layout [E_pad, n, s]."""
    k, bp, n, s = plan.k_blocks, plan.elements_per_block, plan.n, plan.s
    return rows_sm.reshape(s, k * bp, n).transpose(1, 2, 0)

def _elements_to_rows(plan: BandedPlan, f_el):
    """Element layout [E_pad, n, s] -> kernel row layout [s, K*rows]."""
    k, bp, n, s = plan.k_blocks, plan.elements_per_block, plan.n, plan.s
    return f_el.transpose(2, 0, 1).reshape(s, k * bp * n)


def _split3_bf16(x):
    """Exact 3-way bf16 split: hi + mid + lo == x for normal f32 inputs."""
    hi = x.astype(jnp.bfloat16)
    r1 = x - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


# -- Pallas kernels -----------------------------------------------------------


def _gather_kernel(plan: BandedPlan, a_ref, b_ref, u_hbm, out_ref, win, sem):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    k = pl.program_id(0)
    j = pl.program_id(1)
    s, wa, rowt = plan.s, plan.wa, plan.rowt

    @pl.when(j == 0)
    def _():
        dma = pltpu.make_async_copy(
            u_hbm.at[pl.ds(k * plan.ra, wa), :], win, sem
        )
        dma.start()
        dma.wait()

    a = a_ref[0]
    oh_a = (
        jax.lax.broadcasted_iota(jnp.int32, (wa, rowt), 0) == a[None, :]
    ).astype(jnp.bfloat16)
    dn = (((0,), (0,)), ((), ()))  # [wa, s*128] x [wa, rowt] -> [s*128, rowt]
    hi, mid, lo = _split3_bf16(win[:])
    y = jax.lax.dot_general(hi, oh_a, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(mid, oh_a, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(lo, oh_a, dn, preferred_element_type=jnp.float32)
    oh_b = (
        jax.lax.broadcasted_iota(jnp.int32, (128, rowt), 0) == b_ref[0][None, :]
    ).astype(jnp.float32)
    out_ref[:] = jnp.sum(y.reshape(s, 128, rowt) * oh_b[None], axis=1)


def _gather_blocked_tpu(plan: BandedPlan, a_loc, b_loc, ub):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    from jax._src.config import enable_x64

    s, rowt, n_rowt = plan.s, plan.rowt, plan.n_rowt
    # trace with 32-bit default dtypes even under jax_enable_x64: weak
    # Python ints in the index maps otherwise become i64, which Mosaic
    # fails to legalize (see ops/structured_stencil.py)
    with enable_x64(False):
        out = pl.pallas_call(
            partial(_gather_kernel, plan),
            grid=(plan.k_blocks, n_rowt),
            in_specs=[
                pl.BlockSpec((1, rowt), lambda k, j: (0, k * n_rowt + j)),
                pl.BlockSpec((1, rowt), lambda k, j: (0, k * n_rowt + j)),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec((s, rowt), lambda k, j: (0, k * n_rowt + j)),
            out_shape=jax.ShapeDtypeStruct((s, plan.k_blocks * plan.rows), jnp.float32),
            scratch_shapes=[
                pltpu.VMEM((plan.wa, s * 128), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )(a_loc, b_loc, ub)
    return _rows_to_elements(plan, out)


def _scatter_kernel(plan: BandedPlan, f_ref, b_ref, a_ref, v_ref, out_ref, acc, zbuf):
    import jax.experimental.pallas as pl

    j = pl.program_id(1)
    s, wa, rowt = plan.s, plan.wa, plan.rowt

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros((wa, s * 128), jnp.float32)

    oh_b = (
        jax.lax.broadcasted_iota(jnp.int32, (128, rowt), 0) == b_ref[0][None, :]
    ).astype(jnp.float32)
    f = f_ref[:] * v_ref[0][None, :]  # zero padding rows
    # spread: zbuf[c*128 + b, r] = f[c, r] * oh_b[b, r]
    for c in range(s):
        zbuf[c * 128 : (c + 1) * 128, :] = f[c][None, :] * oh_b
    a = a_ref[0]
    oh_a = (
        jax.lax.broadcasted_iota(jnp.int32, (wa, rowt), 0) == a[None, :]
    ).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))  # [wa, rowt] x [s*128, rowt] -> [wa, s*128]
    hi, mid, lo = _split3_bf16(zbuf[:])
    y = jax.lax.dot_general(oh_a, hi, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(oh_a, mid, dn, preferred_element_type=jnp.float32)
    y += jax.lax.dot_general(oh_a, lo, dn, preferred_element_type=jnp.float32)
    acc[:] += y

    @pl.when(j == plan.n_rowt - 1)
    def _():
        out_ref[0] = acc[:]


def _scatter_blocked_tpu(plan: BandedPlan, a_loc, b_loc, valid_rows, f_el):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from jax._src.config import enable_x64

    s, rowt, n_rowt, wa, ra = plan.s, plan.rowt, plan.n_rowt, plan.wa, plan.ra
    rows_sm = _elements_to_rows(plan, f_el.astype(jnp.float32))
    # 32-bit trace under jax_enable_x64 — see _gather_blocked_tpu
    with enable_x64(False):
        buf = pl.pallas_call(
            partial(_scatter_kernel, plan),
            grid=(plan.k_blocks, n_rowt),
            in_specs=[
                pl.BlockSpec((s, rowt), lambda k, j: (0, k * n_rowt + j)),
                pl.BlockSpec((1, rowt), lambda k, j: (0, k * n_rowt + j)),
                pl.BlockSpec((1, rowt), lambda k, j: (0, k * n_rowt + j)),
                pl.BlockSpec((1, rowt), lambda k, j: (0, k * n_rowt + j)),
            ],
            out_specs=pl.BlockSpec((1, wa, s * 128), lambda k, j: (k, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(
                (plan.k_blocks, wa, s * 128), jnp.float32
            ),
            scratch_shapes=[
                pltpu.VMEM((wa, s * 128), jnp.float32),
                pltpu.VMEM((s * 128, rowt), jnp.float32),
            ],
        )(rows_sm, b_loc, a_loc, valid_rows)
    # halo combine: window k covers block-rows [k*ra, k*ra + wa)
    depth = -(-wa // ra)
    bufp = jnp.pad(buf, ((0, 0), (0, depth * ra - wa), (0, 0)))
    bufp = bufp.reshape(plan.k_blocks, depth, ra, s * 128)
    out = jnp.zeros((plan.na_pad + depth * ra, s * 128), jnp.float32)
    for d in range(depth):
        shifted = bufp[:, d].reshape(plan.k_blocks * ra, s * 128)
        out = out.at[d * ra : d * ra + plan.k_blocks * ra].add(shifted)
    return out[: plan.na_pad]


# -- XLA fallback (CPU / non-TPU backends) ------------------------------------


def _unblock(plan: BandedPlan, ub):
    """Blocked [na_pad, s*128] -> padded node rows [na_pad*128, s]."""
    return ub.reshape(plan.na_pad, plan.s, 128).transpose(0, 2, 1).reshape(-1, plan.s)


def _gather_blocked_xla(plan: BandedPlan, valid_rows, nodes_padded, ub):
    rows = _unblock(plan, ub)[nodes_padded] * valid_rows.reshape(-1)[:, None]
    return _rows_to_elements(plan, rows.T)


def _scatter_blocked_xla(plan: BandedPlan, valid_rows, nodes_padded, f_el):
    rows = _elements_to_rows(plan, f_el).T  # [K*rows, s]
    rows = rows * valid_rows.reshape(-1)[:, None]
    un = jax.ops.segment_sum(
        rows, nodes_padded, num_segments=plan.na_pad * 128
    ).astype(f_el.dtype)
    return un.reshape(plan.na_pad, 128, plan.s).transpose(0, 2, 1).reshape(
        plan.na_pad, plan.s * 128
    )


# -- public API with linear_call autodiff -------------------------------------
#
# The plan's device arrays flow through ``linear_call`` residual args (not
# closures: closure-captured device arrays take XLA:TPU's pathological
# constant-gather path, see CLAUDE.md).  Static metadata rides in the
# closure, which is shape-only and safe.


def _use_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _plan_arrays(plan: BandedPlan, arrays, dtype):
    if arrays is None:
        arrays = (plan.a_loc, plan.b_loc, plan.valid_rows, plan.nodes_padded)
    a, b, valid, nodes = arrays
    return (a, b, valid.astype(dtype), nodes)


def gather_blocked(plan: BandedPlan, ub, *, arrays=None):
    """Gather from blocked node layout [na_pad, s*128] to rows [E_pad, n, s].

    The sharded-execution entry point: ``arrays`` overrides the plan's
    index tables (e.g. per-device shards with window-local indices);
    ``ub`` may be a device-local window slice of the global blocked array.
    Linear; transpose is :func:`scatter_add_blocked`.
    """

    def fwd(res, ub):
        a_loc, b_loc, valid, nodes = res
        if _use_tpu() and ub.dtype == jnp.float32:
            out = _gather_blocked_tpu(plan, a_loc, b_loc, ub)
            vr = valid.reshape(plan.padded_elements, plan.n, 1)
            return out * vr
        return _gather_blocked_xla(plan, valid, nodes, ub)

    def trans(res, f_el):
        a_loc, b_loc, valid, nodes = res
        if _use_tpu() and f_el.dtype == jnp.float32:
            return _scatter_blocked_tpu(plan, a_loc, b_loc, valid, f_el)
        return _scatter_blocked_xla(plan, valid, nodes, f_el)

    return linear_call(fwd, trans, _plan_arrays(plan, arrays, ub.dtype), ub)


def scatter_add_blocked(plan: BandedPlan, f_el, *, arrays=None):
    """Scatter-add rows [E_pad, n, s] into the blocked layout [na_pad, s*128].

    Linear; transpose is :func:`gather_blocked`.
    """

    def fwd(res, f_el):
        a_loc, b_loc, valid, nodes = res
        if _use_tpu() and f_el.dtype == jnp.float32:
            return _scatter_blocked_tpu(plan, a_loc, b_loc, valid, f_el)
        return _scatter_blocked_xla(plan, valid, nodes, f_el)

    def trans(res, ub):
        a_loc, b_loc, valid, nodes = res
        if _use_tpu() and ub.dtype == jnp.float32:
            out = _gather_blocked_tpu(plan, a_loc, b_loc, ub)
            vr = valid.reshape(plan.padded_elements, plan.n, 1)
            return out * vr
        return _gather_blocked_xla(plan, valid, nodes, ub)

    return linear_call(fwd, trans, _plan_arrays(plan, arrays, f_el.dtype), f_el)


def gather(plan: BandedPlan, u):
    """Gather node data ``u`` [N, s] into padded element rows [E_pad, n, s].

    Padding rows are zero.  Bit-exact equal to ``u[cells_permuted]`` on the
    valid rows.  Linear in ``u``; transpose is :func:`scatter_add`.
    """
    return gather_blocked(plan, _to_blocked(plan, u))


def scatter_add(plan: BandedPlan, f_el):
    """Scatter-add padded element rows [E_pad, n, s] to node data [N, s].

    Deterministic f32 accumulation; padding rows are masked out.  Linear in
    ``f_el``; transpose is :func:`gather`.
    """
    return _from_blocked(plan, scatter_add_blocked(plan, f_el))
