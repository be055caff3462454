"""Witherden–Vincent symmetric quadrature rules ("polyquad" tables).

Published tables from

    Witherden & Vincent, "On the identification of symmetric quadrature
    rules for finite element methods", Comput. Math. Appl. 69 (2015),

packed into ``_polyquad_data.npz`` by ``tools/gen_polyquad_data.py``.

Selection semantics match the reference (fenris-quadrature/src/polyquad.rs:
28-93): the returned rule is the rule with the *fewest points* among all
tabulated rules whose strength is at least the requested strength.
"""

from __future__ import annotations

from functools import lru_cache
from importlib import resources

import numpy as np

__all__ = ["available_strengths", "rule", "max_strength", "NoRuleAvailable"]

_DOMAINS = ("tri", "quad", "tet", "hex", "pri", "pyr")


class NoRuleAvailable(Exception):
    """No tabulated rule with sufficient strength exists for the domain."""


@lru_cache(maxsize=1)
def _data():
    with resources.files(__package__).joinpath("_polyquad_data.npz").open("rb") as f:
        npz = np.load(f)
        return {k: npz[k].copy() for k in npz.files}


@lru_cache(maxsize=None)
def _index(domain: str) -> np.ndarray:
    if domain not in _DOMAINS:
        raise ValueError(f"unknown polyquad domain {domain!r}")
    return _data()[f"{domain}/index"]  # [m, 2] (strength, npoints)


def available_strengths(domain: str):
    """Sorted list of tabulated strengths for a domain."""
    return [int(s) for s in _index(domain)[:, 0]]


def max_strength(domain: str) -> int:
    return int(_index(domain)[:, 0].max())


def rule(domain: str, strength: int):
    """Minimum-point tabulated rule with strength >= requested."""
    from . import Rule

    idx = _index(domain)
    eligible = idx[idx[:, 0] >= strength]
    if len(eligible) == 0:
        raise NoRuleAvailable(
            f"no polyquad rule of strength >= {strength} for domain {domain!r} "
            f"(max tabulated strength: {max_strength(domain)})"
        )
    # fewest points; ties broken by lowest strength
    order = np.lexsort((eligible[:, 0], eligible[:, 1]))
    s, n = (int(v) for v in eligible[order[0]])
    key = f"{domain}/{s}-{n}"
    d = _data()
    return Rule(d[key + "/weights"].copy(), d[key + "/points"].copy())
