"""Quadrature tables: per-element rules and per-quadrature-point data.

Parity: src/assembly/local/quadrature_table.rs — ``UniformQuadratureTable``
(:213, same rule for all elements), ``GeneralQuadratureTable`` (:57,
per-element rules + per-point ``Data`` payloads), ``CompactQuadratureTable``
(:312, rule dedup).

TPU-first realization: *data* payloads are parameter pytrees with leading
``[E, q]`` dimensions that broadcast through the vmapped operator calls
(assembly/local.py), and *per-element rules* are *groups* of elements
sharing a rule — each group is a homogeneous block with static shapes
(jit-friendly), assembled separately and scattered back into element
order.  A ``CompactQuadratureTable`` is then just a
``GeneralQuadratureTable`` whose groups were produced by rule dedup —
the grouping *is* the dedup (:func:`compact_quadrature_table`).

This is the mechanism by which spatially-varying data enters assembly in
the reference (density in mass.rs:20, material parameters per point): the
``data`` pytree is forwarded as the operator/material ``params``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from ..reference_elements import ReferenceElement
from . import local as L
from .local import Tabulation, tabulate

__all__ = [
    "UniformQuadratureTable",
    "GeneralQuadratureTable",
    "compact_quadrature_table",
]


@dataclass(frozen=True)
class UniformQuadratureTable:
    """One rule (+ optional broadcastable data) for every element.

    ``data`` is a params pytree forwarded to the operator: scalars
    broadcast, ``[E]`` leaves are per-element, ``[E, q]`` per point
    (quadrature_table.rs:213 + the elliptic/mass/source assemblers'
    ``with_quadrature_table`` builders).
    """

    tab: Tabulation
    data: Any = None

    @staticmethod
    def from_rule(element: ReferenceElement, rule, data: Any = None):
        return UniformQuadratureTable(tab=tabulate(element, rule), data=data)

    # -- assembler entry points (local.rs consumers) -----------------------

    def assemble_elliptic_matrices(self, X_geo, u_el, op):
        return L.assemble_element_elliptic_matrices(
            X_geo, u_el, op, self.data, self.tab
        )

    def assemble_elliptic_vectors(self, X_geo, u_el, op):
        return L.assemble_element_elliptic_vectors(
            X_geo, u_el, op, self.data, self.tab
        )

    def elliptic_energies(self, X_geo, u_el, op):
        return L.compute_element_elliptic_energy(X_geo, u_el, op, self.data, self.tab)

    def assemble_mass_matrices(self, X_geo, solution_dim: int):
        """Mass with the table's data as density (mass.rs:20 ``Density``)."""
        rho = 1.0 if self.data is None else self.data
        return L.assemble_element_mass_matrices(X_geo, rho, solution_dim, self.tab)

    def assemble_source_vectors(self, X_geo, source: Callable, solution_dim: int):
        return L.assemble_element_source_vectors(
            X_geo, source, self.data, solution_dim, self.tab
        )


@dataclass(frozen=True)
class GeneralQuadratureTable:
    """Per-element rules as homogeneous groups (quadrature_table.rs:57).

    ``groups``: list of ``(element_indices[int64 array], tab, data)`` —
    every element appears in exactly one group; ``data`` pytree leaves have
    leading dims ``[len(indices), q]`` (or broadcast).  Each group
    assembles as a static-shape block; results scatter back to global
    element order.
    """

    groups: Tuple[Tuple[np.ndarray, Tabulation, Any], ...]

    @staticmethod
    def from_rules(
        element: ReferenceElement,
        rules: Sequence,
        element_rule_ids: np.ndarray,
        data_per_rule: Optional[Sequence[Any]] = None,
    ) -> "GeneralQuadratureTable":
        """Group elements by their rule id (the compact/dedup constructor)."""
        element_rule_ids = np.asarray(element_rule_ids)
        groups = []
        for rid, rule in enumerate(rules):
            idx = np.flatnonzero(element_rule_ids == rid)
            if len(idx) == 0:
                continue
            data = data_per_rule[rid] if data_per_rule is not None else None
            groups.append((idx, tabulate(element, rule), data))
        return GeneralQuadratureTable(groups=tuple(groups))

    def num_elements(self) -> int:
        return sum(len(idx) for idx, _, _ in self.groups)

    # -- grouped assembly --------------------------------------------------

    def _grouped(self, X_geo, u_el, kernel):
        """Run ``kernel(Xg, ug, tab, data)`` per group; scatter to element
        order.  ``u_el`` may be None (matrix assembly of linear ops)."""
        E = self.num_elements()
        out = None
        for idx, tab, data in self.groups:
            idx_j = jnp.asarray(idx)
            Xg = X_geo[idx_j]
            ug = None if u_el is None else u_el[idx_j]
            block = kernel(Xg, ug, tab, data)
            if out is None:
                out = jnp.zeros((E,) + block.shape[1:], block.dtype)
            out = out.at[idx_j].set(block)
        return out

    def assemble_elliptic_matrices(self, X_geo, u_el, op):
        return self._grouped(
            X_geo,
            u_el,
            lambda Xg, ug, tab, data: L.assemble_element_elliptic_matrices(
                Xg, ug, op, data, tab
            ),
        )

    def assemble_elliptic_vectors(self, X_geo, u_el, op):
        return self._grouped(
            X_geo,
            u_el,
            lambda Xg, ug, tab, data: L.assemble_element_elliptic_vectors(
                Xg, ug, op, data, tab
            ),
        )

    def elliptic_energies(self, X_geo, u_el, op):
        return self._grouped(
            X_geo,
            u_el,
            lambda Xg, ug, tab, data: L.compute_element_elliptic_energy(
                Xg, ug, op, data, tab
            ),
        )

    def assemble_mass_matrices(self, X_geo, solution_dim: int):
        return self._grouped(
            X_geo,
            None,
            lambda Xg, ug, tab, data: L.assemble_element_mass_matrices(
                Xg, 1.0 if data is None else data, solution_dim, tab
            ),
        )

    def assemble_source_vectors(self, X_geo, source: Callable, solution_dim: int):
        return self._grouped(
            X_geo,
            None,
            lambda Xg, ug, tab, data: L.assemble_element_source_vectors(
                Xg, source, data, solution_dim, tab
            ),
        )


def compact_quadrature_table(
    element: ReferenceElement,
    rules_per_element: Sequence,
    data_per_element: Optional[Sequence[Any]] = None,
) -> GeneralQuadratureTable:
    """Deduplicate per-element rules into shared groups
    (``CompactQuadratureTable``, quadrature_table.rs:312).

    Identical rules (bit-equal weights + points) share one tabulation;
    per-element ``data`` payloads are stacked per group with leading dim
    ``[group_size, ...]`` so they flow through as per-element params.
    """
    keys = {}
    ids = np.empty(len(rules_per_element), dtype=np.int64)
    rules: List[Any] = []
    for e, rule in enumerate(rules_per_element):
        key = (
            np.asarray(rule.weights, dtype=np.float64).tobytes(),
            np.asarray(rule.points, dtype=np.float64).tobytes(),
        )
        if key not in keys:
            keys[key] = len(rules)
            rules.append(rule)
        ids[e] = keys[key]
    groups = []
    for rid, rule in enumerate(rules):
        idx = np.flatnonzero(ids == rid)
        data = None
        if data_per_element is not None:
            import jax

            data = jax.tree_util.tree_map(
                lambda *leaves: jnp.stack([jnp.asarray(l) for l in leaves]),
                *(data_per_element[int(e)] for e in idx),
            )
        groups.append((idx, tabulate(element, rule), data))
    return GeneralQuadratureTable(groups=tuple(groups))
