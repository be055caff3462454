"""Quadrature tables: per-element rules and per-quadrature-point data.

Parity: src/assembly/local/quadrature_table.rs — ``UniformQuadratureTable``
(:213, same rule for all elements), ``GeneralQuadratureTable`` (:57,
per-element rules + per-point ``Data`` payloads), ``CompactQuadratureTable``
(:312, rule dedup).

TPU-first realization: *data* payloads are parameter pytrees with leading
``[E, q]`` dimensions that broadcast through the vmapped operator calls
(assembly/local.py), and *per-element rules* are *groups* of elements
sharing a rule — each group is a homogeneous block with static shapes
(jit-friendly), assembled separately and aggregated via
:mod:`.aggregate`.  A ``CompactQuadratureTable`` is then just a
``GeneralQuadratureTable`` whose groups were produced by rule dedup —
the grouping *is* the dedup.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Optional, Sequence, Tuple

import numpy as np

from ..reference_elements import ReferenceElement
from .local import Tabulation, tabulate

__all__ = ["UniformQuadratureTable", "GeneralQuadratureTable"]


@dataclass(frozen=True)
class UniformQuadratureTable:
    """One rule (+ optional broadcastable data) for every element."""

    tab: Tabulation
    data: Any = None

    @staticmethod
    def from_rule(element: ReferenceElement, rule, data: Any = None):
        return UniformQuadratureTable(tab=tabulate(element, rule), data=data)


@dataclass(frozen=True)
class GeneralQuadratureTable:
    """Per-element rules as homogeneous groups.

    ``groups``: list of ``(element_indices[int64 array], tab, data)`` —
    every element appears in exactly one group; ``data`` pytree leaves have
    leading dims ``[len(indices), q]`` (or broadcast).
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
