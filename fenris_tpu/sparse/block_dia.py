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

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .block_ell import BlockEllMatrix, block_ell_matvec

__all__ = [
    "BlockDiaMatrix",
    "block_dia_from_csr",
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
