"""Block-DIA sparse matrices: the zero-gather TPU SpMV.

Parity target: the CSR SpMV inside the reference's CG loop
(fenris-sparse/src/cg.rs:373-450), at TPU streaming bandwidth.

FEM stiffness matrices on meshes with locality-preserving node orderings
(structured grids node-major, unstructured meshes after reverse
Cuthill-McKee) concentrate their node-block entries on a small set of
*block diagonals*: the column-node minus row-node offsets take few
distinct values (a uniform hex mesh has exactly 27).  Storing the operator
as **block diagonals in node-minor layout** makes the matvec a pure
streaming sweep:

* ``offsets [D]`` — static Python ints, the node-index deltas;
* ``bands [D*s*s, N]`` — for diagonal ``d`` with offset ``o``, row
  ``(d*s + i)*s + j`` holds ``A[s*n + i, s*(n + o) + j]`` at lane ``n``
  (zero where the entry is structurally absent);
* ``y_i[n] += bands[(d,i,j)][n] * x_j[n + o]`` — the shifted read of
  ``x`` is a **static slice** of a padded copy, not a gather.

Every device op is a full-lane fused multiply-add over ``[N]`` vectors;
the sweep is bound by reading ``bands`` once (vs the gather-per-nnz CSR
formulation, ~500x slower on XLA:TPU, and the gather-per-block ELL
formulation, ~100x slower).  Deltas outside the selected diagonal set
(irregular meshes) spill into a small block-ELL remainder, so the layout
is exact for arbitrary matrices and fast exactly when the ordering is
good — the same precondition as the banded element kernels
(:mod:`..ops.banded`).
"""

from __future__ import annotations

import functools
from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MATMUL_PRECISION
from .block_ell import BlockEllMatrix, block_ell_matvec

_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)

__all__ = [
    "BlockDiaMatrix",
    "BlockDiaAssemblyPlan",
    "BandExpandPlan",
    "block_dia_from_csr",
    "block_dia_assembly_plan",
    "band_expand_plan",
    "assemble_block_dia",
    "block_dia_matvec",
]


class BlockDiaMatrix(NamedTuple):
    offsets: Tuple[int, ...]  # D static node-index deltas (sorted)
    bands: jnp.ndarray  # [D*s*s, N], row (d,i,j) = (d*s + i)*s + j
    num_nodes: int
    solution_dim: int
    remainder: Optional[BlockEllMatrix]  # entries off the selected diagonals

    @property
    def shape(self):
        n = self.num_nodes * self.solution_dim
        return (n, n)

    @property
    def num_diagonals(self) -> int:
        return len(self.offsets)

    def __matmul__(self, v):
        return block_dia_matvec(self, v)


def _node_adjacency(pattern):
    """Node-level (neighbors, value-position) tables from a dof CsrPattern.

    Returns ``nk_n, nk_k`` (the valid (node, slot) pairs), ``nbr [M]``
    neighbor node ids, ``pos [M, s, s]`` positions into the values array,
    and ``K`` (max neighbors/node).  Shared logic with
    :func:`..sparse.block_ell.block_ell_from_csr`.
    """
    s = int(pattern.solution_dim)
    N = pattern.num_rows // s
    row_ptr = np.asarray(pattern.row_ptr, dtype=np.int64)
    row0 = row_ptr[np.arange(N) * s]
    row0_end = row_ptr[np.arange(N) * s + 1]
    counts = (row0_end - row0) // s
    K = int(counts.max()) if N else 0
    cols = np.asarray(pattern.col_indices, dtype=np.int64)
    valid_k = np.arange(K)[None, :] < counts[:, None]
    nk_n, nk_k = np.nonzero(valid_k)
    nbr = cols[row0[nk_n] + nk_k * s] // s
    c_idx = np.arange(s)
    base = row_ptr[(nk_n[:, None] * s + c_idx)[..., None]]  # [M, s, 1]
    pos = base + (nk_k[:, None, None] * s + c_idx[None, None, :])
    return N, s, K, nk_n, nbr, pos


def block_dia_from_csr(
    pattern, values, *, max_diagonals: Optional[int] = None, min_count: int = 1
) -> BlockDiaMatrix:
    """Convert assembled CSR values into block-DIA (+ ELL remainder).

    ``pattern``/``values`` as in
    :func:`..sparse.block_ell.block_ell_from_csr`.  Diagonals are chosen by
    entry count: every node-offset occurring on at least ``min_count`` rows
    becomes a band, keeping at most ``max_diagonals`` (most-populated
    first); everything else spills to a block-ELL remainder.  The host
    builds one gather map per layout section, so re-assembled values
    convert with a single device gather each.
    """
    N, s, K, nk_n, nbr, pos = _node_adjacency(pattern)
    delta = nbr - nk_n
    offs, counts = np.unique(delta, return_counts=True)
    keep = counts >= min_count
    if max_diagonals is not None and keep.sum() > max_diagonals:
        order = np.argsort(counts)[::-1]
        kept = np.zeros(len(offs), bool)
        kept[order[:max_diagonals]] = True
        keep &= kept
    offsets = offs[keep]
    D = len(offsets)
    slot = np.searchsorted(offsets, delta)
    on_dia = (slot < D) & (offsets[np.minimum(slot, D - 1)] == delta)

    nnz = len(np.asarray(pattern.col_indices))
    # band gather map: [D, s, s, N] -> values position (nnz = zero pad)
    idx = np.full((D, s, s, N), nnz, dtype=np.int64)
    dn, dslot = nk_n[on_dia], slot[on_dia]
    idx[dslot[:, None, None], np.arange(s)[None, :, None],
        np.arange(s)[None, None, :], dn[:, None, None]] = pos[on_dia]
    idx_nm = np.ascontiguousarray(idx).reshape(D * s * s, N)
    bands = _gather_values(values, jnp.asarray(idx_nm.reshape(-1)), (D * s * s, N))

    remainder = None
    n_off = int((~on_dia).sum())
    if n_off:
        rn, rnbr, rpos = nk_n[~on_dia], nbr[~on_dia], pos[~on_dia]
        rcounts = np.bincount(rn, minlength=N)
        Kr = int(rcounts.max())
        rk = np.arange(n_off) - np.concatenate([[0], np.cumsum(rcounts)])[rn]
        rneighbors = np.full((N, Kr), N, dtype=np.int32)
        rneighbors[rn, rk] = rnbr
        ridx = np.full((N, Kr, s, s), nnz, dtype=np.int64)
        ridx[rn, rk] = rpos
        ridx_nm = np.ascontiguousarray(ridx.transpose(1, 2, 3, 0)).reshape(
            Kr * s * s, N
        )
        rblocks = _gather_values(
            values, jnp.asarray(ridx_nm.reshape(-1)), (Kr * s * s, N)
        )
        remainder = BlockEllMatrix(
            neighbors=jnp.asarray(np.ascontiguousarray(rneighbors.T)),
            blocks=rblocks,
            num_nodes=N,
            solution_dim=s,
        )
    return BlockDiaMatrix(
        offsets=tuple(int(o) for o in offsets),
        bands=bands,
        num_nodes=N,
        solution_dim=s,
        remainder=remainder,
    )


@partial(jax.jit, static_argnames=("shape",))
def _gather_values(values, idx, shape):
    padded = jnp.concatenate([values, jnp.zeros(1, values.dtype)])
    return padded[idx].reshape(shape)


class BlockDiaAssemblyPlan(NamedTuple):
    """Host-compiled map from element-matrix entries to block-DIA slots.

    Built once per (mesh, diagonal selection) from the cells alone — no
    CSR pattern / symbolic assembly required (the reference's two-phase
    CSR assembly, global.rs:65/133, is bypassed entirely): entry
    ``(e, a, i, b, j)`` of an element matrix lands at flat slot
    ``base[e, a, b] + (i*s + j)*N`` of the ``[(D + Kr)*s*s, N]``
    node-minor band stack (band region first, block-ELL remainder region
    after), so numeric assembly is ONE deterministic ``segment_sum``
    straight into the SpMV layout.
    """

    offsets: Tuple[int, ...]  # D kept node-index deltas (sorted)
    num_nodes: int
    solution_dim: int
    base: jnp.ndarray  # [E, n, n] int32/int64 flat slot base
    rem_neighbors: Optional[jnp.ndarray]  # [Kr, N] int32 (padded with N)
    rem_k: int  # remainder ELL width (0 = exact DIA)
    fill: float  # fraction of band-region slots structurally populated

    @property
    def num_diagonals(self) -> int:
        return len(self.offsets)


def block_dia_assembly_plan(
    cells,
    num_nodes: int,
    solution_dim: int,
    *,
    max_diagonals: Optional[int] = None,
    min_fill: float = 0.0,
    host_base: bool = False,
) -> BlockDiaAssemblyPlan:
    """Build a direct element→block-DIA assembly plan from mesh cells.

    Diagonal selection: every node-index delta occurring between element
    node pairs becomes a band, except deltas whose *node population*
    (distinct row nodes carrying that delta) is below ``min_fill * N`` —
    a band's SpMV traffic is ``s*s*N`` regardless of population, so
    sparse deltas are cheaper in the gather-based block-ELL remainder
    (measured crossover on v5e is ~2% fill; pass e.g. ``min_fill=0.05``
    for irregular meshes).  ``max_diagonals`` additionally caps the band
    count (most-populated deltas win).  ``min_fill=0`` keeps every delta:
    exact DIA, no remainder.  The zero offset (node diagonal) is always
    kept, so Jacobi diagonals read straight off the band stack.
    """
    cells = np.asarray(cells, dtype=np.int64)
    E, n = cells.shape
    s = int(solution_dim)
    N = int(num_nodes)
    na = np.repeat(cells, n, axis=1).reshape(E, n, n)  # na[e,a,b] = cells[e,a]
    nb = np.tile(cells, (1, n)).reshape(E, n, n)  # nb[e,a,b] = cells[e,b]
    delta = (nb - na).reshape(-1)
    na_flat = na.reshape(-1)
    # population = distinct row nodes per delta (multiple elements hitting
    # the same (row, col) must not inflate the fill estimate)
    pair_key = delta * (2 * N + 1) + na_flat  # injective: |delta| < N
    uniq_pairs = np.unique(pair_key)
    u_delta = uniq_pairs // (2 * N + 1)
    # floor division of negative keys: python-style floor matches encode
    offs, pop = np.unique(u_delta, return_counts=True)
    keep = (pop >= min_fill * N) | (offs == 0)
    if max_diagonals is not None and keep.sum() > max_diagonals:
        # the zero offset (Jacobi diagonal) always occupies one of the
        # max_diagonals slots, so the cap is exact (advisor r3)
        order = np.argsort(pop)[::-1]
        order = order[offs[order] != 0]
        kept = np.zeros(len(offs), bool)
        kept[order[: max(max_diagonals - 1, 0)]] = True
        kept[offs == 0] = True
        keep &= kept
    offsets = offs[keep]
    D = len(offsets)
    slot = np.searchsorted(offsets, delta)
    on_dia = (slot < D) & (offsets[np.minimum(slot, D - 1)] == delta)
    sssN = s * s * N
    base = np.where(on_dia, slot * sssN, 0) + na_flat

    rem_neighbors = None
    kr = 0
    n_off = int((~on_dia).sum())
    if n_off:
        off_keys = pair_key[~on_dia]
        uk, inv = np.unique(off_keys, return_inverse=True)
        u_na = ((uk % (2 * N + 1)) + (2 * N + 1)) % (2 * N + 1)
        u_nb = (uk - u_na) // (2 * N + 1) + u_na  # delta + na
        # k = rank of the pair within its row-node group; uk sorts by
        # (delta, na), so re-sort unique pairs by na to rank
        order = np.argsort(u_na, kind="stable")
        rank_sorted = np.arange(len(uk)) - np.searchsorted(
            u_na[order], u_na[order]
        )
        k_of_u = np.empty(len(uk), np.int64)
        k_of_u[order] = rank_sorted
        kr = int(k_of_u.max()) + 1
        rem_neighbors = np.full((kr, N), N, np.int32)
        rem_neighbors[k_of_u[order], u_na[order]] = u_nb[order]
        base[~on_dia] = (D + k_of_u[inv]) * sssN + na_flat[~on_dia]

    total = (D + kr) * sssN
    idt = np.int32 if total + 1 < 2**31 else np.int64
    fill = len(uniq_pairs[np.isin(u_delta, offsets)]) / max(D * N, 1)
    return BlockDiaAssemblyPlan(
        offsets=tuple(int(o) for o in offsets),
        num_nodes=N,
        solution_dim=s,
        # host_base keeps the [E, n, n] slot table host-resident (847 MB
        # HBM at 3.3M hex8) for callers whose fast path never reads it
        # (the streamed expand assembly); jit arg conversion uploads it on
        # the rare slow/flat-scatter use
        base=(
            base.reshape(E, n, n).astype(idt)
            if host_base
            else jnp.asarray(base.reshape(E, n, n).astype(idt))
        ),
        rem_neighbors=None if kr == 0 else jnp.asarray(rem_neighbors),
        rem_k=kr,
        fill=float(fill),
    )


class BandExpandPlan(NamedTuple):
    """Class-static MXU expansion plan for band assembly.

    The flat per-entry ``segment_sum`` (:func:`_scatter_dia_impl`) is bound
    by XLA:TPU's per-scattered-value ceiling (~90M values/s — 1.6 s for the
    576 entries/element of 250k hex8).  This plan reformulates assembly so
    the scatter moves *rows*, not scalars: elements are grouped on the host
    into **slot-signature classes** (elements whose node-index deltas map
    to identical band slots for every local (a, b) pair — a uniform box hex
    mesh has exactly one class; RCM'd meshes have few).  Within a class the
    band-row index of every element-matrix entry is static, so each
    (element, local-node a) row of ``n*s*s`` values expands to its
    ``D*s*s``-wide band-row layout by ONE constant 0/1 matmul (MXU; exact —
    the map is injective per (a, b), no accumulation), and numeric assembly
    becomes a single ``segment_sum`` of ``[E*n, D*s*s]`` rows keyed by
    ``cells[e, a]``.  Elements outside the chosen classes (or with
    remainder entries) fall back to the flat scatter on their subset.
    """

    M: jnp.ndarray  # [C, n, n*s*s, D*s*s] 0/1 expansion operators
    class_mask: jnp.ndarray  # [C, E] f32 membership of fast-path elements
    cols: jnp.ndarray  # [E, n] int32 target nodes (cells)
    slow_idx: Optional[jnp.ndarray]  # [Ef] elements for the flat path
    coverage: float  # fraction of elements on the fast path
    num_classes: int


def band_expand_plan(
    cells,
    plan: BlockDiaAssemblyPlan,
    *,
    max_classes: int = 4,
    min_coverage: float = 0.5,
) -> Optional[BandExpandPlan]:
    """Build a :class:`BandExpandPlan` for ``cells`` against ``plan``.

    Returns ``None`` when fewer than ``min_coverage`` of the elements fall
    into the ``max_classes`` most common slot signatures (irregular meshes
    where the class-static expansion would not pay for itself).
    """
    cells = np.asarray(cells, dtype=np.int64)
    E, n = cells.shape
    s, D = plan.solution_dim, plan.num_diagonals
    if D * s * s > 1024:
        # expansion cost/memory scale with the band-row count; at this many
        # diagonals the ordering is not locality-preserving and block-DIA
        # itself is the wrong layout
        return None
    offsets = np.asarray(plan.offsets, dtype=np.int64)
    delta = cells[:, None, :] - cells[:, :, None]  # [E, a, b] = col - row node
    slot = np.searchsorted(offsets, delta)
    on = (slot < D) & (offsets[np.minimum(slot, D - 1)] == delta)
    slot_m = np.where(on, slot, D).reshape(E, n * n).astype(np.int32)
    ok = on.reshape(E, n * n).all(axis=1)
    if not ok.any():
        return None
    rows = np.ascontiguousarray(slot_m[ok])
    key = rows.view(np.dtype((np.void, rows.dtype.itemsize * rows.shape[1])))
    key = key.reshape(-1)
    uniq, first, inv, counts = np.unique(
        key, return_index=True, return_inverse=True, return_counts=True
    )
    order = np.argsort(counts)[::-1][:max_classes]
    coverage = counts[order].sum() / E
    if coverage < min_coverage:
        return None
    C = len(order)
    rank_of = np.full(len(uniq), -1, np.int64)
    rank_of[order] = np.arange(C)
    cls = np.full(E, -1, np.int64)
    cls[ok] = rank_of[inv]

    ii, bb, jj = np.meshgrid(
        np.arange(s), np.arange(n), np.arange(s), indexing="ij"
    )
    # M payload order: comp = (i, j, b) per row-node a — reshaped to
    # (a, (i, j), b, R) by expand_rows_pairs_masked to consume the
    # component-pair assembler output [(i, j), a, b, E]
    # (assembly/local.assemble_element_elliptic_matrices_pairs)
    comp = ((ii * s + jj) * n + bb).ravel()
    M = np.zeros((C, n, n * s * s, D * s * s), np.float32)
    for ci, u in enumerate(order):
        sl = rows[first[u]].reshape(n, n)
        for a in range(n):
            r = (sl[a][bb] * s + ii) * s + jj  # band row (d*s + i)*s + j
            M[ci, a, comp, r.ravel()] = 1.0
    class_mask = (cls[None, :] == np.arange(C)[:, None]).astype(np.float32)
    slow = np.flatnonzero(cls < 0)
    return BandExpandPlan(
        M=jnp.asarray(M),
        class_mask=jnp.asarray(class_mask),
        cols=jnp.asarray(cells.astype(np.int32)),
        slow_idx=jnp.asarray(slow.astype(np.int64)) if len(slow) else None,
        coverage=float(coverage),
        num_classes=C,
    )


def expand_rows_pairs_masked(vals, cb, mb, Md):
    """Class-masked band-row expansion (shared kernel).

    ``vals [s*s, n*n, e]``: element-matrix values in the component-pair
    layout ((i, j), (a, b), e) — exactly the output of
    ``assemble_element_elliptic_matrices_pairs`` (the native layout of
    the per-pair projector matmuls; no reshuffle between assembly and
    scatter).  ``cb [e, n]``: row node per (element, a).  ``mb [C, e]``:
    class membership.  ``Md [C, n, s*n*s, R]``: 0/1 class expansion
    operators (value dtype; payload order (i, j, b)).
    Returns ``(rows [n*e, R], ids [n*e])`` ready for one row
    ``segment_sum`` — consumed both by :func:`_expand_scatter_impl` and,
    per chunk, by the streaming fused assemble+scatter in
    :meth:`fenris_tpu.elasticity.HyperelasticModel.assemble_hessian_block_dia`
    (which never materializes the full ``[E, n*s, n*s]`` buffer)."""
    R = Md.shape[-1]
    ss = vals.shape[0]
    n = Md.shape[1]
    vals4 = vals.reshape(ss, n, n, vals.shape[-1])
    exp = None
    for c in range(Md.shape[0]):
        vc = vals4 * mb[c][None, None, None, :]
        M4 = Md[c].reshape(n, ss, n, R)  # (a, (i, j), b, R)
        # exact: 0/1 operator, injective per (a, b) — no accumulation
        e = _einsum("pabe,apbr->aer", vc, M4)
        exp = e if exp is None else exp + e
    rows = exp.reshape(-1, R)  # a-major rows
    ids = jnp.transpose(cb).reshape(-1)
    return rows, ids


@partial(jax.jit, static_argnames=("s", "N", "num_chunks"))
def _expand_scatter_impl(A_el, cols, class_mask, M, s: int, N: int, num_chunks: int):
    """Fast band assembly: class-static expansion + ONE row segment_sum.

    Returns the band region as ``[N, D*s*s]`` (node-major rows; the caller
    transposes once).  ``num_chunks`` bounds the [chunk*n, D*s*s] expanded
    transient.
    """
    E, nd = A_el.shape[0], A_el.shape[1]
    n = nd // s
    R = M.shape[-1]
    Md = M.astype(A_el.dtype)

    def chunk_rows(Ab, cb, mb):
        A5 = Ab.reshape(-1, n, s, n, s)
        # vals[(i, j), (a, b), e] (component-pair layout, flat)
        vals = jnp.transpose(A5, (2, 4, 1, 3, 0)).reshape(s * s, n * n, -1)
        return expand_rows_pairs_masked(vals, cb, mb, Md)

    if num_chunks <= 1:
        rows, ids = chunk_rows(A_el, cols, class_mask)
        return jax.ops.segment_sum(rows, ids, num_segments=N)
    chunk = -(-E // num_chunks)
    pad = chunk * num_chunks - E
    A_p = jnp.pad(A_el, ((0, pad), (0, 0), (0, 0)))
    c_p = jnp.pad(cols, ((0, pad), (0, 0)), constant_values=N)
    m_p = jnp.pad(class_mask, ((0, 0), (0, pad)))
    A_c = A_p.reshape(num_chunks, chunk, nd, nd)
    c_c = c_p.reshape(num_chunks, chunk, cols.shape[1])
    m_c = jnp.moveaxis(m_p.reshape(-1, num_chunks, chunk), 1, 0)

    def body(acc, xs):
        Ab, cb, mb = xs
        rows, ids = chunk_rows(Ab, cb, mb)
        return acc + jax.ops.segment_sum(rows, ids, num_segments=N + 1), None

    out, _ = jax.lax.scan(
        body, jnp.zeros((N + 1, R), A_el.dtype), (A_c, c_c, m_c)
    )
    return out[:N]


def assemble_block_dia(
    plan: BlockDiaAssemblyPlan,
    element_matrices,
    num_chunks: int = 1,
    expand: Optional[BandExpandPlan] = None,
) -> BlockDiaMatrix:
    """Numeric assembly: element matrices [E, n*s, n*s] → BlockDiaMatrix.

    Default path: one deterministic ``segment_sum`` of every entry into the
    node-minor band stack (the TPU replacement for CSR numeric assembly +
    layout conversion); matches ``block_dia_from_csr(pattern,
    assemble_csr(...))`` to summation-order roundoff.  ``num_chunks``
    bounds the transient index/value arrays.

    With ``expand`` (a :class:`BandExpandPlan`), fast-path elements are
    assembled by the class-static MXU expansion + ONE row-vector
    ``segment_sum`` (~row-rate instead of value-rate scatter); only
    out-of-class elements go through the flat per-entry scatter.
    """
    s, N, D, kr = plan.solution_dim, plan.num_nodes, plan.num_diagonals, plan.rem_k
    total = (D + kr) * s * s * N
    if expand is not None:
        bandsT = _expand_scatter_impl(
            element_matrices,
            expand.cols,
            expand.class_mask,
            expand.M,
            s,
            N,
            int(num_chunks),
        )
        bands = jnp.transpose(bandsT)
        rem_blocks = (
            jnp.zeros((kr * s * s, N), element_matrices.dtype) if kr else None
        )
        if expand.slow_idx is not None:
            A_f = element_matrices[expand.slow_idx]
            base_f = plan.base[expand.slow_idx]
            flat = _scatter_dia_impl(A_f, base_f, total, s, N, 1)
            bands = bands + flat[: D * s * s * N].reshape(D * s * s, N)
            if kr:
                rem_blocks = flat[D * s * s * N :].reshape(kr * s * s, N)
        remainder = None
        if kr:
            remainder = BlockEllMatrix(
                neighbors=plan.rem_neighbors,
                blocks=rem_blocks,
                num_nodes=N,
                solution_dim=s,
            )
        return BlockDiaMatrix(
            offsets=plan.offsets,
            bands=bands,
            num_nodes=N,
            solution_dim=s,
            remainder=remainder,
        )
    flat = _scatter_dia_impl(
        element_matrices, plan.base, total, s, N, int(num_chunks)
    )
    bands = flat[: D * s * s * N].reshape(D * s * s, N)
    remainder = None
    if kr:
        remainder = BlockEllMatrix(
            neighbors=plan.rem_neighbors,
            blocks=flat[D * s * s * N :].reshape(kr * s * s, N),
            num_nodes=N,
            solution_dim=s,
        )
    return BlockDiaMatrix(
        offsets=plan.offsets,
        bands=bands,
        num_nodes=N,
        solution_dim=s,
        remainder=remainder,
    )


@partial(jax.jit, static_argnames=("total", "s", "N", "num_chunks"))
def _scatter_dia_impl(A_el, base, total: int, s: int, N: int, num_chunks: int):
    E, nd = A_el.shape[0], A_el.shape[1]
    n = nd // s
    # (i, j)-major layout: the synthesized index/value intermediates are
    # [s*s, chunk*n*n] with the huge axis minor (lanes) — an (e,..,s,s)-
    # minor layout would tile the tiny trailing dims to (4,128) lanes, a
    # ~57x padding blowup that exceeds HBM outright (observed 32GB at
    # 250k hex8).
    ij = (jnp.arange(s * s, dtype=base.dtype) * jnp.asarray(N, base.dtype))[:, None]

    def chunk_vals(Ab, bb):
        v = jnp.transpose(Ab.reshape(-1, n, s, n, s), (2, 4, 0, 1, 3))
        idx = ij + bb.reshape(1, -1)
        return v.reshape(-1), idx.reshape(-1)

    if num_chunks <= 1:
        v, idx = chunk_vals(A_el, base)
        return jax.ops.segment_sum(v, idx, num_segments=total)
    chunk = -(-E // num_chunks)
    pad = chunk * num_chunks - E
    A_p = jnp.pad(A_el, ((0, pad), (0, 0), (0, 0)))
    b_p = jnp.pad(base, ((0, pad), (0, 0), (0, 0)), constant_values=total)
    A_c = A_p.reshape(num_chunks, chunk, nd, nd)
    b_c = b_p.reshape(num_chunks, chunk, n, n)

    def body(acc, xs):
        Ab, bb = xs
        v, idx = chunk_vals(Ab, bb)
        return acc + jax.ops.segment_sum(v, idx, num_segments=total + 1), None

    out, _ = jax.lax.scan(body, jnp.zeros(total + 1, A_el.dtype), (A_c, b_c))
    return out[:total]


def block_dia_matvec_cm(m: BlockDiaMatrix, x2):
    """Component-major matvec: ``x2 [s, N] -> y2 [s, N]``.

    Identical FMAs and summation order as :func:`block_dia_matvec`, with
    the vector in component-major layout: the per-band shifted reads are
    pure lane slices of ``[s, N]`` rows instead of column views of an
    ``[N, s]`` array (whose minor dim tiles to 128 lanes — the ~42x
    amplification that made node-major shifts dominate the band-sweep
    step on TPU; see sparse/dia_kernel.py).
    """
    from .block_ell import block_ell_matvec_cm

    s, N = m.solution_dim, m.num_nodes
    offsets = m.offsets
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    xp = jnp.pad(x2, ((0, 0), (lo, hi)))
    y = [jnp.zeros(N, x2.dtype) for _ in range(s)]
    for d, o in enumerate(offsets):
        for j in range(s):
            xs = jax.lax.slice_in_dim(xp[j], lo + o, lo + o + N)
            for i in range(s):
                y[i] = y[i] + m.bands[(d * s + i) * s + j] * xs
    out = jnp.stack(y, axis=0)
    if m.remainder is not None:
        out = out + block_ell_matvec_cm(m.remainder, x2)
    return out


def block_dia_matvec(m: BlockDiaMatrix, v):
    """y = A x as D*s*s full-lane FMAs over statically shifted x slices."""
    s, N = m.solution_dim, m.num_nodes
    offsets = m.offsets
    lo = max(0, -min(offsets)) if offsets else 0
    hi = max(0, max(offsets)) if offsets else 0
    xb = v.reshape(N, s)
    xp = jnp.pad(xb, ((lo, hi), (0, 0)))
    xcols = [xp[:, j] for j in range(s)]
    y = [jnp.zeros(N, v.dtype) for _ in range(s)]
    for d, o in enumerate(offsets):
        for j in range(s):
            xs = jax.lax.slice_in_dim(xcols[j], lo + o, lo + o + N)
            for i in range(s):
                y[i] = y[i] + m.bands[(d * s + i) * s + j] * xs
    out = jnp.stack(y, axis=1).reshape(-1)
    if m.remainder is not None:
        out = out + block_ell_matvec(m.remainder, v)
    return out
