"""A-posteriori error estimation against analytic solutions.

Parity: src/error.rs — element-wise and global L² and H¹-seminorm errors by
high-order quadrature: ``estimate_element_L2_error_squared`` (:117),
``estimate_element_H1_seminorm_error_squared`` (:153), ``estimate_L2_error``
(:313), ``estimate_H1_seminorm_error`` (:358).
"""

from __future__ import annotations

from typing import Callable

import jax.numpy as jnp
import functools

from .config import MATMUL_PRECISION

# f32 einsums must not route through bf16 MXU passes (see config.py)
_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)

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


def _fields_at_quadrature(X_geo, u_el, tab: Tabulation, with_grad: bool):
    """Physical points, u_h, ∇u_h and w·|detJ| at all (element, qp) pairs."""
    from .assembly.local import inv_and_det, jacobians, physical_gradients
    from .integrate import volume_form

    dtype = X_geo.dtype
    gphi = jnp.asarray(tab.geo_phi, dtype=dtype)
    gdphi = jnp.asarray(tab.geo_dphi, dtype=dtype)
    phi = jnp.asarray(tab.phi, dtype=dtype)
    dphi = jnp.asarray(tab.dphi, dtype=dtype)
    w = jnp.asarray(tab.weights, dtype=dtype)
    J = jacobians(X_geo, gdphi)
    vol = volume_form(J)
    x = _einsum("qm,emd->eqd", gphi, X_geo)
    u = _einsum("qn,ens->eqs", phi, u_el)
    G = None
    if with_grad:
        Jinv, _ = inv_and_det(J)
        gp = physical_gradients(dphi, Jinv)
        G = _einsum("eqnd,ens->eqds", gp, u_el)
    return x, u, G, w[None, :] * vol


def estimate_L2_error_batched(X_geo, u_el, u_exact_batched: Callable, tab: Tabulation):
    """Global L² error with a *batched* exact-solution evaluator.

    ``u_exact_batched(points[M, d]) -> [M, s]`` — e.g. interpolation of a
    fine-mesh FE solution (the reference's ``SpaceInterpolationFn`` in
    tests/convergence_tests/error_estimation.rs:137).
    """
    x, u, _, wv = _fields_at_quadrature(X_geo, u_el, tab, with_grad=False)
    E, q, d = x.shape
    ue = jnp.asarray(u_exact_batched(x.reshape(E * q, d))).reshape(E, q, -1)
    diff2 = jnp.sum((u - ue) ** 2, axis=-1)
    return jnp.sqrt(jnp.sum(wv * diff2))


def estimate_H1_seminorm_error_batched(
    X_geo, u_el, u_exact_grad_batched: Callable, tab: Tabulation
):
    """Global H¹-seminorm error with a batched gradient evaluator.

    ``u_exact_grad_batched(points[M, d]) -> [M, d, s]``.
    """
    x, u, G, wv = _fields_at_quadrature(X_geo, u_el, tab, with_grad=True)
    E, q, d = x.shape
    ge = jnp.asarray(u_exact_grad_batched(x.reshape(E * q, d))).reshape(G.shape)
    diff2 = jnp.sum((G - ge) ** 2, axis=(-1, -2))
    return jnp.sqrt(jnp.sum(wv * diff2))


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
