"""Block-ELL sparse matrices: the TPU bandwidth-path SpMV.

Parity target: fenris-sparse's CSR SpMV inside CG (cg.rs:373-450).  The
plain CSR formulation (gather + segment-sum over nnz scalars,
:func:`..sparse.spmv`) performs one irregular index per scalar value —
the worst possible shape for the TPU memory system.  This module stores
the same operator as **node-block ELL**: for a dof layout with
``solution_dim = s`` (node-major), row blocks are nodes, and

* ``neighbors [N, K] int32`` — the (padded) node adjacency,
* ``blocks [N, K, s, s]`` — the corresponding dense s×s coupling blocks.

The matvec gathers ``K`` *rows* of ``x.reshape(N, s)`` per node (s
contiguous scalars per index → s-fold fewer indices than CSR) and
contracts with one batched einsum, which XLA fuses into a single
bandwidth-bound sweep over the block values.  Padding rows carry index
``N`` into an appended zero row, keeping the kernel branch-free.

FEM stiffness matrices have near-uniform row counts (interior hex8 node:
27 neighbors), so ELL padding waste is small; the layout is exactly the
"padded rows + segment_sum"-free design SURVEY §7 calls for.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import MATMUL_PRECISION

__all__ = ["BlockEllMatrix", "block_ell_from_csr"]


class BlockEllMatrix(NamedTuple):
    neighbors: jnp.ndarray  # [N, K] int32, padded with N
    blocks: jnp.ndarray  # [N, K, s, s]
    num_nodes: int
    solution_dim: int

    @property
    def shape(self):
        n = self.num_nodes * self.solution_dim
        return (n, n)

    def __matmul__(self, v):
        return block_ell_matvec(self, v)


def block_ell_from_csr(pattern, values) -> BlockEllMatrix:
    """Convert assembled CSR values into block-ELL.

    ``pattern`` is an assembly :class:`~..assembly.global_.CsrPattern`
    (node-major dof layout, sorted columns — both guaranteed by the
    builder); ``values`` the matching [nnz] device array.  The host builds
    a one-time index map ``[N, K, s, s] -> nnz`` (pads point at a zero
    slot appended to the values), so re-assembled values convert with a
    single device gather.
    """
    s = int(pattern.solution_dim)
    N = pattern.num_rows // s
    row_ptr = np.asarray(pattern.row_ptr, dtype=np.int64)
    # node n's neighbor count: component-0 dof row has s entries per
    # neighbor node (contiguous, sorted)
    row0 = row_ptr[np.arange(N) * s]
    row0_end = row_ptr[np.arange(N) * s + 1]
    counts = (row0_end - row0) // s
    K = int(counts.max())
    cols = np.asarray(pattern.col_indices, dtype=np.int64)
    neighbors = np.full((N, K), N, dtype=np.int32)
    # gather indices: entry (n, k, c, cc) lives at row_ptr[s n + c] + k s + cc
    nnz = len(cols)
    idx = np.full((N, K, s, s), nnz, dtype=np.int64)
    valid_k = np.arange(K)[None, :] < counts[:, None]  # [N, K]
    nk_n, nk_k = np.nonzero(valid_k)
    neighbors[nk_n, nk_k] = cols[row0[nk_n] + nk_k * s] // s
    c_idx = np.arange(s)
    base = row_ptr[(nk_n[:, None] * s + c_idx)[..., None]]  # [M, s, 1]
    pos = base + (nk_k[:, None, None] * s + c_idx[None, None, :])
    idx[nk_n, nk_k] = pos
    idx_j = jnp.asarray(idx.reshape(-1))
    blocks = _gather_blocks(values, idx_j, N, K, s)
    return BlockEllMatrix(
        neighbors=jnp.asarray(neighbors),
        blocks=blocks,
        num_nodes=N,
        solution_dim=s,
    )


@partial(jax.jit, static_argnames=("N", "K", "s"))
def _gather_blocks(values, idx, N: int, K: int, s: int):
    padded = jnp.concatenate([values, jnp.zeros(1, values.dtype)])
    return padded[idx].reshape(N, K, s, s)


def block_ell_matvec(m: BlockEllMatrix, v):
    """y = A x with one row-gather + one batched block contraction."""
    s = m.solution_dim
    xb = v.reshape(m.num_nodes, s)
    x_pad = jnp.concatenate([xb, jnp.zeros((1, s), xb.dtype)])
    xg = x_pad[m.neighbors]  # [N, K, s]
    y = jnp.einsum("nkij,nkj->ni", m.blocks, xg, precision=MATMUL_PRECISION)
    return y.reshape(-1)
