"""Sparse linear algebra: CSR matrices, SpMV, and iterative solvers.

Parity: fenris-sparse — matrix-free ``LinearOperator`` (cg.rs:15),
preconditioned Conjugate Gradient with pluggable stopping criteria and a
failure taxonomy (cg.rs:196-450), parallel CSR row access (sparse.rs).

TPU-first design: a CSR matrix is a NamedTuple of device arrays; SpMV is a
gather + segment-sum over a row-expansion.  A linear operator is simply a
callable ``v -> A v``, and the *fast* path on TPU is deliberately
matrix-free: the assembled SpMV performs ~1 flop per irregular index,
which no TPU formulation makes competitive (even the banded one-hot trick
of :mod:`..ops.banded` costs O(window) flops per index — amortizable over
an element's quadrature work, not over a single multiply).  Composing the
local assembly kernels per CG iteration is both faster and lighter than
materializing the matrix; CSR exists for interoperability, direct
inspection, and parity with fenris-sparse.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from .cg import CgResult, conjugate_gradient

__all__ = ["CsrMatrix", "spmv", "conjugate_gradient", "CgResult", "to_dense", "from_pattern"]


class CsrMatrix(NamedTuple):
    """CSR sparse matrix as device arrays.

    ``row_ptr``: [nrows + 1] int32/int64; ``col_indices``: [nnz] int32;
    ``values``: [nnz]; plus static shape metadata.
    """

    row_ptr: jnp.ndarray
    col_indices: jnp.ndarray
    values: jnp.ndarray
    shape: tuple

    @property
    def nnz(self) -> int:
        return self.col_indices.shape[0]

    def __matmul__(self, v):
        return spmv(self, v)

    def diagonal(self):
        """Structural diagonal values (0 where absent)."""
        n = self.shape[0]
        rows = _rows_of_nnz(self)
        on_diag = self.col_indices == rows
        return jax.ops.segment_sum(
            jnp.where(on_diag, self.values, 0.0), rows, num_segments=n
        )


def from_pattern(pattern, values) -> CsrMatrix:
    """Build a CsrMatrix from an assembly :class:`~..assembly.global_.CsrPattern`."""
    return CsrMatrix(
        row_ptr=jnp.asarray(pattern.row_ptr),
        col_indices=jnp.asarray(pattern.col_indices),
        values=values,
        shape=(pattern.num_rows, pattern.num_cols),
    )


def _rows_of_nnz(m: CsrMatrix):
    """Row index of every stored entry, derived from row_ptr on device."""
    n = m.shape[0]
    # rows[k] = number of row starts <= k  - 1
    return (
        jnp.searchsorted(m.row_ptr[1:], jnp.arange(m.nnz), side="right")
    ).astype(jnp.int32)


# Scalar-CSR SpMV (one irregular index per nnz) has crashed the XLA:TPU
# worker at 81M nnz in three consecutive rounds ("TPU worker process
# crashed", leaving the device wedged for up to tens of minutes).  Until
# the faulting program is root-caused, the TPU path refuses above this
# size instead of killing the worker; the block layouts (block-DIA via
# sparse/dia_kernel, block-ELL) are the production SpMV forms anyway.
TPU_SCALAR_SPMV_MAX_NNZ = 2**25


def spmv(m: CsrMatrix, v):
    """CSR sparse matrix-vector product via gather + segment-sum.

    Deterministic and fusion-friendly; for the peak-bandwidth paths see
    :func:`fenris_tpu.sparse.dia_kernel.block_dia_operator` (fused Pallas
    band sweep) and :mod:`fenris_tpu.sparse.block_ell`.

    On TPU, sizes above :data:`TPU_SCALAR_SPMV_MAX_NNZ` raise instead of
    dispatching: the scalar-CSR program reproducibly crashes the TPU
    worker process at ~81M nnz (observed rounds 2-4), and a crashed
    worker poisons every subsequent device call in the process.
    """
    if jax.default_backend() == "tpu" and m.nnz > TPU_SCALAR_SPMV_MAX_NNZ:
        raise NotImplementedError(
            f"scalar-CSR spmv at {m.nnz} nnz exceeds the TPU safety cap "
            f"({TPU_SCALAR_SPMV_MAX_NNZ}): this program class crashes the "
            "TPU worker at large sizes; convert the operator with "
            "block_dia_from_csr / block_ell_from_csr instead"
        )
    rows = _rows_of_nnz(m)
    prod = m.values * v[m.col_indices]
    return jax.ops.segment_sum(prod, rows, num_segments=m.shape[0])


def to_dense(m: CsrMatrix):
    rows = _rows_of_nnz(m)
    out = jnp.zeros(m.shape, dtype=m.values.dtype)
    return out.at[rows, m.col_indices].add(m.values)
