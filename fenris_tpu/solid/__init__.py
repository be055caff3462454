"""Solid mechanics: hyperelastic materials and their elliptic operators.

Parity: fenris-solid — ``HyperelasticMaterial`` (lib.rs:59) with the
``_du`` small-strain-accurate forms (lib.rs:43-58), materials
(materials.rs: LinearElastic :68, NeoHookean :232 with log1p-stable
``log_det_F`` from logdet.rs:17, StVK :375), parameter types
(``LameParameters``/``YoungPoisson`` :9-43), ``MaterialEllipticOperator``
(lib.rs:412) and ``GravitySource`` (gravity_source.rs:23).

TPU-first: materials are pure pointwise functions of the displacement
gradient (with pytree parameters), differentiated by JAX autodiff for
custom materials; the shipped materials carry **closed-form stress and
contraction tensors** matching the reference's hand-derived expressions so
the assembled Hessians are identical and fast.  Everything is vmapped over
(element, quadrature point) blocks by the assembler.

Conventions (lib.rs:20-41): the elliptic solution gradient is ``G = ∇u``
with shape [d, s] = [d, d]; the deformation gradient is ``F = I + Gᵀ``;
the elliptic operator is ``g(G) = P(F)ᵀ``.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, NamedTuple

import functools

import jax
import jax.numpy as jnp

from ..assembly.local import inv_and_det as _inv_and_det
from ..operators import EllipticOperator

__all__ = [
    "LameParameters",
    "lame_from_young_poisson",
    "LinearElasticMaterial",
    "NeoHookeanMaterial",
    "StVKMaterial",
    "MaterialEllipticOperator",
    "GravitySource",
    "log_det_F",
    "deformation_gradient",
]

from ..config import MATMUL_PRECISION

# f32 einsums must not route through bf16 MXU passes (see config.py)
_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)


class LameParameters(NamedTuple):
    """Lamé parameters (materials.rs:9); a jax pytree."""

    mu: Any
    lam: Any


def lame_from_young_poisson(young, poisson) -> LameParameters:
    """Young's modulus / Poisson ratio -> Lamé (materials.rs:31-43)."""
    mu = 0.5 * young / (1.0 + poisson)
    lam = 2.0 * mu * poisson / (1.0 - 2.0 * poisson)
    return LameParameters(mu=mu, lam=lam)


def deformation_gradient(u_grad):
    """F = I + (∇u)ᵀ (lib.rs:20-29)."""
    d = u_grad.shape[-1]
    return jnp.eye(d, dtype=u_grad.dtype) + jnp.swapaxes(u_grad, -1, -2)


def log_det_F(du_dX):
    """log(det(I + du_dX)) computed stably via log1p (logdet.rs:17).

    Expands det(I + U) = 1 + γ symbolically so small strains do not lose
    precision to the +1 (libCEED technique).  Returns -inf for non-positive
    J (the energy then evaluates to +inf, usable as a line-search barrier).
    """
    d = du_dX.shape[-1]
    U = du_dX
    if d == 1:
        gamma = U[..., 0, 0]
    elif d == 2:
        gamma = (
            U[..., 0, 0] * U[..., 1, 1]
            + U[..., 0, 0]
            + U[..., 1, 1]
            - U[..., 0, 1] * U[..., 1, 0]
        )
    elif d == 3:
        a, b, c = U[..., 0, 0], U[..., 0, 1], U[..., 0, 2]
        dd, e, f = U[..., 1, 0], U[..., 1, 1], U[..., 1, 2]
        g, h, i = U[..., 2, 0], U[..., 2, 1], U[..., 2, 2]
        # det(I + U) = 1 + tr(U) + (2x2 principal minors) + det(U)
        gamma = (
            (a + e + i)
            + (a * e - b * dd + a * i - c * g + e * i - f * h)
            + (
                a * (e * i - f * h)
                - b * (dd * i - f * g)
                + c * (dd * h - e * g)
            )
        )
    else:
        raise ValueError("physical dimension must be 1, 2 or 3")
    from ..utils import log1p_accurate

    # XLA:TPU's hardware log1p has ~1e-4 absolute error; use the accurate
    # software version (exact for f64, ~2 ulp for f32 on TPU).
    return jnp.where(
        gamma > -1.0, log1p_accurate(jnp.maximum(gamma, -1.0 + 1e-300)), -jnp.inf
    )


class HyperelasticMaterial:
    """Base class. Implement ``energy_density_du``; derivatives default to AD.

    All methods take ``u_grad = ∇u`` ([d, d]) and a parameter pytree; the
    ``F``-based entry points are provided for API parity (lib.rs:59-203).
    """

    #: stress is linear in ∇u (the contraction tensor is a constant);
    #: see EllipticOperator.constant_contraction
    linear_stress: bool = False

    def energy_density_du(self, u_grad, params):
        raise NotImplementedError

    def stress_du(self, u_grad, params):
        """First Piola-Kirchhoff stress P(F) as a function of ∇u.

        Default: P = ∂ψ/∂F via autodiff (ψ as a function of F through ∇u:
        ∂ψ/∂(∇u) = (∂ψ/∂F : ∂F/∂∇u) = Pᵀ, so P = (∂ψ/∂∇u)ᵀ).
        """
        dpsi = jax.grad(lambda G: self.energy_density_du(G, params))(u_grad)
        return jnp.swapaxes(dpsi, -1, -2)

    def stress_contraction_tensor_du(self, u_grad, params):
        """A[i, k, j, m] = ∂P_ik/∂F_jm at F(∇u); default autodiff."""
        d = u_grad.shape[-1]

        def P_of_F(F):
            return self.stress_du(jnp.swapaxes(F, -1, -2) - jnp.eye(d, dtype=F.dtype), params)

        F = deformation_gradient(u_grad)
        # jacfwd gives J[i, k, j, m] = dP_ik / dF_jm
        return jax.jacfwd(P_of_F)(F)

    def stress_tangent_du(self, u_grad, du_grad, params):
        """Directional stress tangent dP = (∂P/∂F)[dF] at F(∇u), dF = (d/dX)δu.

        The tangent-stress form of ``accumulate_stress_contractions_du_into``
        (lib.rs:496) — a single ``[d, d]`` matrix instead of the rank-4
        tensor, which is what Newton-Krylov Hessian actions and fused
        Hessian kernels consume.  Defaults to forward-mode autodiff of
        :meth:`stress_du`; materials override with closed forms.
        """
        return jax.jvp(
            lambda G: self.stress_du(G, params), (u_grad,), (du_grad,)
        )[1]

    # F-based parity wrappers ------------------------------------------------

    def energy_density(self, F, params):
        d = F.shape[-1]
        return self.energy_density_du(jnp.swapaxes(F, -1, -2) - jnp.eye(d, dtype=F.dtype), params)

    def stress(self, F, params):
        d = F.shape[-1]
        return self.stress_du(jnp.swapaxes(F, -1, -2) - jnp.eye(d, dtype=F.dtype), params)

    def stress_contraction(self, F, a, b, params):
        """C_P(F, a, b)[i, j] = a_k (∂P_ik/∂F_jm) b_m (lib.rs:143)."""
        d = F.shape[-1]
        A = self.stress_contraction_tensor_du(
            jnp.swapaxes(F, -1, -2) - jnp.eye(d, dtype=F.dtype), params
        )
        return _einsum("k,ikjm,m->ij", a, A, b)


class LinearElasticMaterial(HyperelasticMaterial):
    """ψ = μ ε:ε + λ/2 tr²(ε), ε = sym(F) - I (materials.rs:68)."""

    linear_stress = True

    def energy_density_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        du_dX = jnp.swapaxes(u_grad, -1, -2)
        eps = 0.5 * (du_dX + jnp.swapaxes(du_dX, -1, -2))
        return mu * jnp.sum(eps * eps) + 0.5 * lam * jnp.trace(eps) ** 2

    def stress_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        d = u_grad.shape[-1]
        du_dX = jnp.swapaxes(u_grad, -1, -2)
        eps = 0.5 * (du_dX + jnp.swapaxes(du_dX, -1, -2))
        return 2.0 * mu * eps + lam * jnp.trace(eps) * jnp.eye(d, dtype=u_grad.dtype)

    def stress_contraction_tensor_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        d = u_grad.shape[-1]
        delta = jnp.eye(d, dtype=u_grad.dtype)
        # C(a,b) = μ[(a·b)I + b aᵀ] + λ a bᵀ  =>
        # a_k A[i,k,j,m] b_m = μ(a·b)δ_ij + μ b_i a_j + λ a_i b_j:
        #   μ δ_km δ_ij + μ δ_im δ_jk + λ δ_ik δ_jm
        A = (
            mu * _einsum("km,ij->ikjm", delta, delta)
            + mu * _einsum("im,jk->ikjm", delta, delta)
            + lam * _einsum("ik,jm->ikjm", delta, delta)
        )
        return A

    def stress_tangent_du(self, u_grad, du_grad, params):
        # dP = 2μ dε + λ tr(dε) I — independent of u
        mu, lam = params.mu, params.lam
        d = u_grad.shape[-1]
        ddu = jnp.swapaxes(du_grad, -1, -2)
        deps = 0.5 * (ddu + jnp.swapaxes(ddu, -1, -2))
        tr = jnp.trace(deps, axis1=-2, axis2=-1)
        return 2.0 * mu * deps + lam * tr[..., None, None] * jnp.eye(d, dtype=u_grad.dtype)


class NeoHookeanMaterial(HyperelasticMaterial):
    """ψ = μ/2 (I_C - d) - μ log J + λ/2 log²J (materials.rs:125-232).

    Uses the numerically stable small-strain form
    ψ = μ tr(E_lin-ish) - μ log1p(γ) + ... (materials.rs:246-259).
    """

    def energy_density_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        du_dX = jnp.swapaxes(u_grad, -1, -2)
        logJ = log_det_F(du_dX)
        tr_E = jnp.trace(du_dX) + 0.5 * jnp.sum(du_dX * du_dX)
        return jnp.where(
            jnp.isfinite(logJ),
            mu * tr_E - mu * logJ + 0.5 * lam * logJ**2,
            jnp.inf,
        )

    def stress_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        F = deformation_gradient(u_grad)
        logJ = log_det_F(jnp.swapaxes(u_grad, -1, -2))
        # closed-form small-matrix inverse: jnp.linalg.inv lowers to a
        # looping LU on TPU and is ~1000x slower under vmap
        Finv, _ = _inv_and_det(F)
        FinvT = jnp.swapaxes(Finv, -1, -2)
        return (-mu + lam * logJ) * FinvT + mu * F

    def stress_contraction_tensor_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        d = u_grad.shape[-1]
        F = deformation_gradient(u_grad)
        logJ = log_det_F(jnp.swapaxes(u_grad, -1, -2))
        Finv, _ = _inv_and_det(F)
        FinvT = jnp.swapaxes(Finv, -1, -2)
        alpha = -mu + lam * logJ
        delta = jnp.eye(d, dtype=u_grad.dtype)
        # C(a,b) = λ (F̂a)(F̂b)ᵀ - α (F̂b)(F̂a)ᵀ + μ(a·b)I, F̂ = F^{-T}
        # => A[i,k,j,m] = λ F̂_ik F̂_jm - α F̂_im F̂_jk + μ δ_km δ_ij
        return (
            lam * _einsum("ik,jm->ikjm", FinvT, FinvT)
            - alpha * _einsum("im,jk->ikjm", FinvT, FinvT)
            + mu * _einsum("km,ij->ikjm", delta, delta)
        )

    def stress_tangent_du(self, u_grad, du_grad, params):
        """Closed-form tangent via cofactor/inverse identities.

        dP = μ dF + λ tr(F⁻¹dF) F⁻ᵀ − α F⁻ᵀ dFᵀ F⁻ᵀ,  α = −μ + λ log J
        (d(F⁻ᵀ) = −(F⁻¹ dF F⁻¹)ᵀ, d log J = tr(F⁻¹ dF)).  ~60 flops/point
        vs ~160 for the traced jvp (which also rebuilds the primal P) —
        and, critically, a VMEM-sized live set inside fused kernels
        (see ops/structured_stencil.py's plane-tile specialization).
        """
        mu, lam = params.mu, params.lam
        F = deformation_gradient(u_grad)
        dF = jnp.swapaxes(du_grad, -1, -2)
        logJ = log_det_F(jnp.swapaxes(u_grad, -1, -2))
        Finv, _ = _inv_and_det(F)
        FinvT = jnp.swapaxes(Finv, -1, -2)
        alpha = -mu + lam * logJ
        dlogJ = _einsum("...ij,...ji->...", Finv, dF)
        dFinvT = -_einsum(
            "...ik,...lk,...lj->...ij", FinvT, dF, FinvT
        )  # −F⁻ᵀ dFᵀ F⁻ᵀ
        return (
            mu * dF
            + (lam * dlogJ)[..., None, None] * FinvT
            + alpha[..., None, None] * dFinvT
        )


class StVKMaterial(HyperelasticMaterial):
    """Saint Venant-Kirchhoff: ψ = μ E:E + λ/2 tr²E, E = (FᵀF - I)/2 (materials.rs:375)."""

    def energy_density_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        F = deformation_gradient(u_grad)
        d = F.shape[-1]
        E = 0.5 * (_einsum("...ki,...kj->...ij", F, F) - jnp.eye(d, dtype=F.dtype))
        return mu * jnp.sum(E * E) + 0.5 * lam * jnp.trace(E) ** 2

    def stress_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        F = deformation_gradient(u_grad)
        d = F.shape[-1]
        E = 0.5 * (_einsum("...ki,...kj->...ij", F, F) - jnp.eye(d, dtype=F.dtype))
        return _einsum("...ik,...kj->...ij", F, 2.0 * mu * E + lam * jnp.trace(E) * jnp.eye(d, dtype=F.dtype))

    def stress_contraction_tensor_du(self, u_grad, params):
        mu, lam = params.mu, params.lam
        d = u_grad.shape[-1]
        F = deformation_gradient(u_grad)
        E = 0.5 * (_einsum("...ki,...kj->...ij", F, F) - jnp.eye(d, dtype=F.dtype))
        delta = jnp.eye(d, dtype=u_grad.dtype)
        FFt = _einsum("...ik,...jk->...ij", F, F)
        trE = jnp.trace(E)
        # C(a,b) = [2μ aᵀEb + λ trE (a·b)] I + μ (Fb)(Fa)ᵀ + λ (Fa)(Fb)ᵀ
        #          + μ (a·b) FFᵀ
        return (
            2.0 * mu * _einsum("km,ij->ikjm", E, delta)
            + lam * trE * _einsum("km,ij->ikjm", delta, delta)
            + mu * _einsum("im,jk->ikjm", F, F)
            + lam * _einsum("ik,jm->ikjm", F, F)
            + mu * _einsum("km,ij->ikjm", delta, FFt)
        )

    def stress_tangent_du(self, u_grad, du_grad, params):
        # P = F S, S = 2μE + λ trE I  ⇒  dP = dF S + F dS,
        # dE = sym(Fᵀ dF), dS = 2μ dE + λ tr(dE) I
        mu, lam = params.mu, params.lam
        d = u_grad.shape[-1]
        F = deformation_gradient(u_grad)
        dF = jnp.swapaxes(du_grad, -1, -2)
        eye = jnp.eye(d, dtype=u_grad.dtype)
        E = 0.5 * (_einsum("...ki,...kj->...ij", F, F) - eye)
        FtdF = _einsum("...ki,...kj->...ij", F, dF)
        dE = 0.5 * (FtdF + jnp.swapaxes(FtdF, -1, -2))
        trE = jnp.trace(E, axis1=-2, axis2=-1)
        trdE = jnp.trace(dE, axis1=-2, axis2=-1)
        S = 2.0 * mu * E + lam * trE[..., None, None] * eye
        dS = 2.0 * mu * dE + lam * trdE[..., None, None] * eye
        return _einsum("...ik,...kj->...ij", dF, S) + _einsum(
            "...ik,...kj->...ij", F, dS
        )


@dataclass
class MaterialEllipticOperator(EllipticOperator):
    """Adapt a hyperelastic material to the elliptic operator interface.

    Parity: fenris-solid/src/lib.rs:412-509 — energy = ψ, g(∇u) = P(F)ᵀ,
    contraction = stress contraction.  The Hessian contraction tensor
    D[k,i,m,j] = ∂g_ki/∂G_mj equals ∂P_ik/∂F_jm = A[i,k,j,m].
    """

    material: HyperelasticMaterial
    dim: int = 3
    symmetric: bool = True

    def __post_init__(self):
        self.solution_dim = self.dim
        self.constant_contraction = bool(
            getattr(self.material, "linear_stress", False)
        )

    def energy(self, G, params):
        return self.material.energy_density_du(G, params)

    def g(self, G, params):
        return jnp.swapaxes(self.material.stress_du(G, params), -1, -2)

    def contraction(self, G, params):
        A = self.material.stress_contraction_tensor_du(G, params)
        # D[k,i,m,j] = A[i,k,j,m]
        return jnp.transpose(A, (1, 0, 3, 2))

    def g_tangent(self, G, dG, params):
        # dg = dPᵀ: D[k,i,m,j] dG[m,j] = (∂P/∂F)[dF]ᵀ with dF = dGᵀ
        return jnp.swapaxes(
            self.material.stress_tangent_du(G, dG, params), -1, -2
        )


@dataclass
class GravitySource:
    """Body-force source f(x) = ρ g (gravity_source.rs:23).

    ``g_vector`` is the gravitational acceleration; density may vary via
    the params pytree.
    """

    g_vector: Any
    density: float = 1.0

    def __call__(self, x, params):
        rho = params if params is not None else self.density
        return rho * jnp.asarray(self.g_vector, dtype=x.dtype)
