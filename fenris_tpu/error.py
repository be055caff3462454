"""A-posteriori error estimation against analytic solutions.

Parity: src/error.rs — element-wise and global L² and H¹-seminorm errors by
high-order quadrature: ``estimate_element_L2_error_squared`` (:117),
``estimate_element_H1_seminorm_error_squared`` (:153), ``estimate_L2_error``
(:313), ``estimate_H1_seminorm_error`` (:358).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .assembly.local import Tabulation
from .integrate import integrate_over_elements

__all__ = [
    "estimate_element_L2_error_squared",
    "estimate_element_H1_seminorm_error_squared",
    "estimate_L2_error",
    "estimate_H1_seminorm_error",
]


def estimate_element_L2_error_squared(X_geo, u_el, u_exact: Callable, tab: Tabulation):
    """Per-element ∫ |u_h - u|² with ``u_exact(x) -> [s]`` (error.rs:117)."""

    def f(x, u, G):
        diff = u - jnp.atleast_1d(u_exact(x))
        return jnp.sum(diff * diff)

    return integrate_over_elements(X_geo, u_el, f, tab, needs_gradient=False)


def estimate_element_H1_seminorm_error_squared(
    X_geo, u_el, u_exact_grad: Callable, tab: Tabulation
):
    """Per-element ∫ |∇u_h - ∇u|²_F with ``u_exact_grad(x) -> [d, s]`` (error.rs:153)."""

    def f(x, u, G):
        diff = G - jnp.asarray(u_exact_grad(x)).reshape(G.shape)
        return jnp.sum(diff * diff)

    return integrate_over_elements(X_geo, u_el, f, tab, needs_gradient=True)


def estimate_L2_error(X_geo, u_el, u_exact: Callable, tab: Tabulation):
    """Global L² error (error.rs:313)."""
    return jnp.sqrt(
        jnp.sum(estimate_element_L2_error_squared(X_geo, u_el, u_exact, tab))
    )


def estimate_H1_seminorm_error(X_geo, u_el, u_exact_grad: Callable, tab: Tabulation):
    """Global H¹ seminorm error (error.rs:358)."""
    return jnp.sqrt(
        jnp.sum(
            estimate_element_H1_seminorm_error_squared(X_geo, u_el, u_exact_grad, tab)
        )
    )
