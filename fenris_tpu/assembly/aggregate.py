"""Aggregate (multi-block / heterogeneous) assembly.

Parity: src/assembly/local.rs combinators — ``AggregateElementAssembler``
(:152, concatenating assemblers over one global dof space, e.g. multi-body
or mixed-element meshes) and ``MapElementNodes`` (:302, node-index offsets).

TPU-first: a heterogeneous mesh is a **dict of homogeneous blocks** (static
shapes per element type — no retrace explosions); the aggregate symbolic
phase is one unique-pass over the concatenated dof-pair streams of all
blocks, producing per-block scatter maps into a single shared CSR values
array.  Numeric assembly is then one segment-sum per block into the same
values buffer.  (The reference's ``TransformElement*`` combinators
(:283-300) are plain function composition in this functional API.)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .global_ import CsrPattern, element_dof_indices

__all__ = ["AggregatePattern", "aggregate_csr_pattern", "assemble_aggregate_csr", "assemble_aggregate_vector"]


@dataclass(frozen=True)
class AggregatePattern:
    """Shared CSR pattern plus per-block scatter maps."""

    pattern: CsrPattern
    block_scatter: Tuple[np.ndarray, ...]  # per block: [E_b, nd_b, nd_b]


def aggregate_csr_pattern(
    cell_blocks: Sequence[np.ndarray], num_nodes: int, solution_dim: int = 1
) -> AggregatePattern:
    """Symbolic assembly over several homogeneous element blocks.

    ``cell_blocks``: list of [E_b, n_b] int arrays indexing one shared
    global node space (apply offsets beforehand for multi-body setups).
    """
    s = int(solution_dim)
    N = int(num_nodes) * s
    keys_list = []
    sizes = []
    for cells in cell_blocks:
        dofs = element_dof_indices(cells, s)
        E, nd = dofs.shape
        rows = np.repeat(dofs, nd, axis=1).reshape(-1)
        cols = np.tile(dofs, (1, nd)).reshape(-1)
        keys_list.append(rows * np.int64(N) + cols)
        sizes.append((E, nd))
    all_keys = np.concatenate(keys_list)
    uniq_keys, inverse = np.unique(all_keys, return_inverse=True)
    col_indices = (uniq_keys % N).astype(np.int32)
    uniq_rows = (uniq_keys // N).astype(np.int64)
    row_ptr = np.searchsorted(uniq_rows, np.arange(N + 1, dtype=np.int64))
    diag_keys = np.arange(N, dtype=np.int64) * N + np.arange(N, dtype=np.int64)
    dpos = np.searchsorted(uniq_keys, diag_keys)
    valid = (dpos < len(uniq_keys)) & (np.take(uniq_keys, dpos, mode="clip") == diag_keys)
    diag_positions = np.where(valid, dpos, -1).astype(np.int64)

    scatters = []
    off = 0
    inv32 = inverse.astype(np.int32)
    for E, nd in sizes:
        cnt = E * nd * nd
        scatters.append(inv32[off : off + cnt].reshape(E, nd, nd))
        off += cnt

    pattern = CsrPattern(
        num_rows=N,
        num_cols=N,
        row_ptr=row_ptr,
        col_indices=col_indices,
        scatter_indices=scatters[0] if scatters else np.zeros((0, 0, 0), np.int32),
        rows_of_nnz=uniq_rows.astype(np.int32),
        diag_positions=diag_positions,
        solution_dim=s,
    )
    return AggregatePattern(pattern=pattern, block_scatter=tuple(scatters))


def assemble_aggregate_csr(element_matrix_blocks, agg: AggregatePattern):
    """Numeric aggregate assembly: sum of per-block segment-sum scatters."""
    nnz = agg.pattern.nnz
    values = jnp.zeros(nnz, dtype=element_matrix_blocks[0].dtype)
    for mats, scatter in zip(element_matrix_blocks, agg.block_scatter):
        values = values + jax.ops.segment_sum(
            mats.reshape(-1), jnp.asarray(scatter.reshape(-1)), num_segments=nnz
        )
    return values


def assemble_aggregate_vector(element_vector_blocks, dof_blocks, num_dofs: int):
    """Aggregate vector assembly across blocks sharing one dof space."""
    out = jnp.zeros(num_dofs, dtype=element_vector_blocks[0].dtype)
    for vecs, dofs in zip(element_vector_blocks, dof_blocks):
        out = out + jax.ops.segment_sum(
            vecs.reshape(-1), jnp.asarray(np.asarray(dofs).reshape(-1)), num_segments=num_dofs
        )
    return out
