"""Quadrature-driven integration of functions over finite element spaces.

Parity: src/integrate.rs — ``volume_form`` (:20: the generalized volume
factor sqrt(det(JᵀJ)), which reduces to |det J| for square jacobians),
``integrate_over_element`` (:596) and the global
``ElementIntegralAssembler`` (:708).

TPU-first: a single batched kernel evaluates the integrand at all
(element, quadrature point) pairs at once.  The integrand is a pointwise
callable ``f(x, u, grad_u) -> scalar/array`` (the dependency-typed
``FnFunction`` machinery of integrate.rs:97-144 collapses to "just close
over what you need" in Python).
"""

from __future__ import annotations

from typing import Callable, Optional

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .assembly.local import Tabulation, inv_and_det, jacobians, physical_gradients

__all__ = ["volume_form", "integrate_over_elements", "integrate"]

from .config import MATMUL_PRECISION

# f32 einsums must not route through bf16 MXU passes (see config.py)
_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)


def volume_form(J):
    """Generalized volume factor sqrt(det(JᵀJ)) (integrate.rs:20).

    Supports non-square jacobians (surface/curve elements embedded in a
    higher-dimensional space); for square J it equals |det J|.
    """
    di, dj = J.shape[-2], J.shape[-1]
    if di == dj:
        _, det = inv_and_det(J)
        return jnp.abs(det)
    JtJ = _einsum("...ki,...kj->...ij", J, J)
    _, det = inv_and_det(JtJ)
    return jnp.sqrt(det)


def integrate_over_elements(
    X_geo,
    u_el,
    f: Callable,
    tab: Tabulation,
    needs_gradient: bool = True,
):
    """Per-element integrals of ``f(x, u, grad_u)`` (integrate.rs:596).

    ``X_geo``: [E, m, D] geometry node coords; ``u_el``: [E, n, s] local
    solution dofs or None.  ``f(x[D], u[s] | None, G[D, s] | None)`` is a
    pointwise function returning a scalar (or any fixed-shape array);
    returns the [E, ...] per-element integrals.

    For volumetric (square-jacobian) spaces gradients use J^{-T}; for
    surface elements pass ``needs_gradient=False`` (gradient of the
    embedded solution is not defined without the tangent projector).
    """
    dtype = X_geo.dtype
    gphi = jnp.asarray(tab.geo_phi, dtype=dtype)
    gdphi = jnp.asarray(tab.geo_dphi, dtype=dtype)
    phi = jnp.asarray(tab.phi, dtype=dtype)
    dphi = jnp.asarray(tab.dphi, dtype=dtype)
    w = jnp.asarray(tab.weights, dtype=dtype)

    J = jacobians(X_geo, gdphi)
    vol = volume_form(J)  # [E, q]
    x = _einsum("qm,emd->eqd", gphi, X_geo)

    u = G = None
    if u_el is not None:
        u = _einsum("qn,ens->eqs", phi, u_el)
        if needs_gradient:
            Jinv, _ = inv_and_det(J)
            gp = physical_gradients(dphi, Jinv)
            G = _einsum("eqnd,ens->eqds", gp, u_el)

    def fp(xq, uq, Gq):
        return f(xq, uq, Gq)

    fv = jax.vmap(jax.vmap(fp))(
        x,
        u if u is not None else jnp.zeros(x.shape[:2] + (0,), dtype),
        G if G is not None else jnp.zeros(x.shape[:2] + (0, 0), dtype),
    )
    # weighted reduction over quadrature points; fv may have trailing dims
    wv = w[None, :] * vol
    extra = fv.ndim - 2
    wexp = wv.reshape(wv.shape + (1,) * extra)
    return jnp.sum(wexp * fv, axis=1)


def integrate(X_geo, u_el, f, tab: Tabulation, needs_gradient: bool = True):
    """Global integral: sum of :func:`integrate_over_elements`."""
    return jnp.sum(integrate_over_elements(X_geo, u_el, f, tab, needs_gradient), axis=0)
