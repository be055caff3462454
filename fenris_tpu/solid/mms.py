"""Manufactured solutions for nonlinear elasticity (method of manufactured
solutions).

The reference ships MMS acceptance suites for the *linear* Poisson problem
(tests/convergence_tests/poisson_mms_common.rs:173); this module extends the
same methodology to the hyperelastic operator so large-scale nonlinear
solves carry a verifiable accuracy chain: pick a smooth displacement field
``u_exact``, derive the body force ``f = -Div P(F(u_exact))`` by automatic
differentiation of the material's first Piola-Kirchhoff stress, solve with
that load, and measure the quadrature L2 error against ``u_exact`` — which
must converge at the element order (O(h^2) in L2 for hex8).

Conventions match :mod:`fenris_tpu.solid`: ``u_grad[i, j] = d u_j / d x_i``
(so ``F = I + u_grad^T``), ``P = stress_du(u_grad)``; the strong form of the
energy minimization residual is ``-(Div P)_i = -sum_j dP_ij/dx_j = f_i``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["manufactured_body_force", "sine_bubble_displacement"]


def manufactured_body_force(material, params, u_exact):
    """Body force for which ``u_exact`` solves the hyperelastic problem.

    Args:
        material: a :class:`~fenris_tpu.solid.HyperelasticMaterial`.
        params: material parameter pytree.
        u_exact: smooth displacement field ``u(x: [3]) -> [3]``
            (jax-traceable).

    Returns:
        ``body_force(x, p) -> [3]`` computing ``-Div P`` at ``x`` via nested
        forward-mode autodiff — pass it as the ``body_force`` of a
        :class:`~fenris_tpu.structured.StructuredHyperelasticModel` or
        :class:`~fenris_tpu.elasticity.HyperelasticModel`.  With Dirichlet
        conditions set from ``u_exact`` on the whole boundary, the discrete
        solution converges to ``u_exact`` at the element order.
    """

    def P(x):
        # u_grad[i, j] = d u_j / d x_i  (jacfwd gives J[i, j] = d u_i / d x_j)
        u_grad = jnp.swapaxes(jax.jacfwd(u_exact)(x), -1, -2)
        return material.stress_du(u_grad, params)

    def body_force(x, p=None):
        dP = jax.jacfwd(P)(x)  # [i, j, k] = d P_ij / d x_k
        return -jnp.einsum("ijj->i", dP, precision="highest")

    return body_force


def sine_bubble_displacement(extent=1.0, amplitude=(0.03, -0.02, 0.04)):
    """Smooth displacement vanishing on the boundary of ``[0, extent]^3``.

    ``u_i(x) = a_i * sin(pi x/L) sin(pi y/L) sin(pi z/L)`` — zero on every
    face of the box, so a model clamping the full boundary (homogeneous
    Dirichlet) is consistent with it.  Distinct per-component amplitudes
    break symmetry so all stress components are exercised.
    """
    a = jnp.asarray(amplitude)

    def u_exact(x):
        return a * jnp.prod(jnp.sin(jnp.pi * x / extent))

    return u_exact
