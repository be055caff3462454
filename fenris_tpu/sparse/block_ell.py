"""Block-ELL sparse matrices: the TPU bandwidth-path SpMV.

Parity target: fenris-sparse's CSR SpMV inside CG (cg.rs:373-450).  The
plain CSR formulation (gather + segment-sum over nnz scalars,
:func:`..sparse.spmv`) performs one irregular index per scalar value —
the worst possible shape for the TPU memory system.  This module stores
the same operator as **node-block ELL in node-minor layout**: for a dof
layout with ``solution_dim = s`` (node-major), row blocks are nodes, and

* ``neighbors [K, N] int32`` — the (padded) node adjacency,
* ``blocks [K*s*s, N]`` — the dense s×s coupling blocks, flattened so the
  node axis is minor.

Node-minor is load-bearing on TPU: the natural ``[N, K, s, s]`` layout
tiles its two minor axes to (8, 128) lanes — a ~50x padding blowup that
exceeds HBM outright above ~10^5 nodes (observed: a 1.33GB logical blocks
array demanding a 19GB padded allocation on a 16GB v5e).  With the node
axis minor, every row ``blocks[(k,i,j), :]`` is a full-lane ``[N]``
vector, padding is only ``K*s*s`` → the next multiple of 8 sublanes, and
the matvec unrolls the tiny (k, i, j) loops into full-lane fused
multiply-adds — one bandwidth-bound sweep over the block values (the
same element-minor principle as :mod:`..assembly.local_em`).

The matvec gathers ``K`` neighbor values per component of ``x`` (s*K
1-D full-lane gathers, s-fold fewer indices than CSR).  Padding slots
carry index ``N`` into an appended zero row, keeping the kernel
branch-free.

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

__all__ = ["BlockEllMatrix", "block_ell_from_csr"]


class BlockEllMatrix(NamedTuple):
    neighbors: jnp.ndarray  # [K, N] int32, padded with N
    blocks: jnp.ndarray  # [K*s*s, N], row (k,i,j) = (k*s + i)*s + j
    num_nodes: int
    solution_dim: int

    @property
    def shape(self):
        n = self.num_nodes * self.solution_dim
        return (n, n)

    def __matmul__(self, v):
        return block_ell_matvec(self, v)


def block_ell_from_csr(pattern, values) -> BlockEllMatrix:
    """Convert assembled CSR values into node-minor block-ELL.

    ``pattern`` is an assembly :class:`~..assembly.global_.CsrPattern`
    (node-major dof layout, sorted columns — both guaranteed by the
    builder); ``values`` the matching [nnz] device array.  The host builds
    a one-time index map ``[K*s*s, N] -> nnz`` (pads point at a zero
    slot appended to the values), so re-assembled values convert with a
    single device gather straight into the node-minor layout.
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
    # node-minor: [N, K, s, s] -> [K*s*s, N]
    idx_nm = np.ascontiguousarray(idx.transpose(1, 2, 3, 0)).reshape(K * s * s, N)
    blocks = _gather_blocks(values, jnp.asarray(idx_nm.reshape(-1)), N, K, s)
    return BlockEllMatrix(
        neighbors=jnp.asarray(np.ascontiguousarray(neighbors.T)),
        blocks=blocks,
        num_nodes=N,
        solution_dim=s,
    )


@partial(jax.jit, static_argnames=("N", "K", "s"))
def _gather_blocks(values, idx, N: int, K: int, s: int):
    padded = jnp.concatenate([values, jnp.zeros(1, values.dtype)])
    return padded[idx].reshape(K * s * s, N)


def block_ell_matvec_cm(m: BlockEllMatrix, x2):
    """Component-major matvec: ``x2 [s, N] -> y2 [s, N]``.

    Same FMAs as :func:`block_ell_matvec` but with the vector kept in
    component-major layout — no ``[N, s]`` views whose minor dim tiles to
    128 lanes (the ~42x-padded transpose that dominated the node-major
    band-sweep step; see sparse/dia_kernel.py).
    """
    s, N, K = m.solution_dim, m.num_nodes, m.neighbors.shape[0]
    x_pad = jnp.pad(x2, ((0, 0), (0, 1)))  # index N -> zero slot
    y = [jnp.zeros(N, x2.dtype) for _ in range(s)]
    for k in range(K):
        nb = m.neighbors[k]  # [N]
        for j in range(s):
            xg = jnp.take(x_pad[j], nb, axis=0)
            for i in range(s):
                y[i] = y[i] + m.blocks[(k * s + i) * s + j] * xg
    return jnp.stack(y, axis=0)


def block_ell_matvec(m: BlockEllMatrix, v):
    """y = A x: s*K full-lane gathers + unrolled full-lane multiply-adds.

    The (k, i, j) loops are unrolled at trace time over [N]-shaped
    vectors (K*s*s fused multiply-adds), so every device op runs at full
    lane occupancy and the sweep is bound by reading ``blocks`` once.
    """
    s, N, K = m.solution_dim, m.num_nodes, m.neighbors.shape[0]
    xb = v.reshape(N, s)
    x_pad = jnp.concatenate([xb, jnp.zeros((1, s), xb.dtype)])
    xcols = [x_pad[:, j] for j in range(s)]  # [N+1] each
    y = [jnp.zeros(N, v.dtype) for _ in range(s)]
    for k in range(K):
        nb = m.neighbors[k]  # [N]
        for j in range(s):
            xg = jnp.take(xcols[j], nb, axis=0)  # [N] full-lane gather
            for i in range(s):
                y[i] = y[i] + m.blocks[(k * s + i) * s + j] * xg
    return jnp.stack(y, axis=1).reshape(-1)
