"""PDE operator abstraction (elliptic operators, energies, contractions).

Parity: src/assembly/operators.rs — ``Operator`` (:9), ``EllipticOperator``
g(∇u) (:20), ``EllipticContraction`` (:60), ``EllipticEnergy`` (:223) and
``LaplaceOperator`` (operators/laplace.rs:14).

TPU-first design: an operator is a set of **pure pointwise functions** of the
solution gradient ``G = ∇u`` (shape ``[d, s]``: geometry dim × solution dim)
and a parameter pytree.  Derivatives default to JAX autodiff — ``g = ∂ψ/∂G``
and the contraction tensor ``∂g/∂G`` via ``jacfwd`` — replacing the
reference's hand-derived operator/contraction pairs; closed forms can
override them when profitable.  Assembly ``vmap``s these over (element,
quadrature point) blocks, so everything lowers to batched dense algebra on
the MXU.

The contraction tensor convention follows the reference
(operators.rs:49-58): ``C(G, a, b)[i, j] = a_k (∂g_ki/∂G_mj) b_m``.  We
materialize ``D[k, i, m, j] = ∂g_ki/∂G_mj`` once per quadrature point and
contract with all basis-gradient pairs in one einsum — the batched
equivalent of ``accumulate_contractions_into`` (operators.rs:146).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp

__all__ = ["EllipticOperator", "LaplaceOperator", "operator_from_energy"]


class EllipticOperator:
    """Base class for elliptic operators ``-div g(∇u) = f``.

    Subclasses must set :attr:`solution_dim` and implement at least one of
    :meth:`energy` or :meth:`g`.  All methods are pointwise (single
    quadrature point); batching is done by the assembler with ``vmap``.
    """

    solution_dim: int = 1
    #: whether C(G, a, b) == C(G, b, a)^T for all inputs; lets the matrix
    #: assembler symmetrize instead of computing both triangles.
    symmetric: bool = False
    #: whether the contraction tensor D = ∂g/∂G is independent of G (linear
    #: operators: Laplace, linear elasticity).  Lets the matrix assembler
    #: evaluate D once at G = 0 and — on affine elements — hoist the entire
    #: quadrature sum into a constant projector (see
    #: ``assembly.local._elliptic_matrices_affine_const``).
    constant_contraction: bool = False

    def energy(self, G, params):
        """Energy density ψ(G) (scalar). Optional."""
        raise NotImplementedError(f"{type(self).__name__} has no energy")

    def g(self, G, params):
        """The operator g(G) with shape ``[d, s]``; defaults to ∂ψ/∂G."""
        return jax.grad(lambda Gm: self.energy(Gm, params))(G)

    def contraction(self, G, params):
        """Contraction tensor ``D[k, i, m, j] = ∂g_ki/∂G_mj`` at one point.

        Defaults to forward-mode autodiff of :meth:`g`; shape ``[d, s, d, s]``.
        """
        # jacfwd over G: result[k, i, m, j] = d g[k,i] / d G[m,j]
        return jax.jacfwd(lambda Gm: self.g(Gm, params))(G)

    def g_tangent(self, G, dG, params):
        """Directional tangent ``dg[k, i] = D[k, i, m, j] dG[m, j]`` at one point.

        The Hessian-action workhorse (the directional form of
        ``EllipticContraction``, operators.rs:49-58) *without* materializing
        the ``[d, s, d, s]`` tensor — what keeps fused Hessian-action
        kernels' live set VMEM-resident (:mod:`..ops.em_sweep`).  Defaults
        to forward-mode autodiff of :meth:`g`; closed-form overrides
        (:class:`~fenris_tpu.solid.MaterialEllipticOperator`) cut the op
        count roughly in half by skipping the primal value.
        """
        return jax.jvp(lambda Gm: self.g(Gm, params), (G,), (dG,))[1]

    def has_energy(self) -> bool:
        try:
            self.energy(jnp.zeros((1, self.solution_dim)), None)
            return True
        except NotImplementedError:
            return False
        except Exception:
            return True


class LaplaceOperator(EllipticOperator):
    """g(∇u) = ∇u; ψ = |∇u|²/2 (operators/laplace.rs:14).

    Assembles the standard SPD stiffness matrix ∫ ∇φ_I · ∇φ_J.
    """

    solution_dim = 1
    symmetric = True
    constant_contraction = True

    def energy(self, G, params):
        return 0.5 * jnp.sum(G * G)

    def g(self, G, params):
        return G

    def contraction(self, G, params):
        d = G.shape[0]
        eye = jnp.eye(d, dtype=G.dtype)
        return eye[:, None, :, None]  # delta_km delta_ij with s = 1

    def g_tangent(self, G, dG, params):
        return dG


@dataclass
class operator_from_energy(EllipticOperator):
    """Wrap a plain energy-density callable ``psi(G, params)`` as an operator."""

    psi: Callable[[Any, Any], Any]
    solution_dim: int = 1
    symmetric: bool = True

    def __post_init__(self):
        # dataclass on a subclass: nothing else to do
        pass

    def energy(self, G, params):
        return self.psi(G, params)
