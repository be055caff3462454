"""Material model tests.

Mirrors fenris-solid/tests/unit_tests/materials.rs: for every material and
dimension, stress must equal the FD derivative of the energy and the
contraction tensor the FD derivative of the stress; closed forms must agree
with autodiff; MaterialEllipticOperator must satisfy the elliptic FD
identities.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.optimize import approximate_gradient_fd, approximate_jacobian_fd
from fenris_tpu.solid import (
    HyperelasticMaterial,
    LameParameters,
    LinearElasticMaterial,
    MaterialEllipticOperator,
    NeoHookeanMaterial,
    StVKMaterial,
    deformation_gradient,
    lame_from_young_poisson,
    log_det_F,
)

MATERIALS = [LinearElasticMaterial(), NeoHookeanMaterial(), StVKMaterial()]
PARAMS = LameParameters(mu=384.614, lam=576.923)


def random_u_grad(rng, d, scale=0.15):
    return rng.uniform(-scale, scale, size=(d, d))


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
@pytest.mark.parametrize("d", [2, 3])
def test_stress_is_derivative_of_energy(mat, d, rng):
    G = random_u_grad(rng, d)

    def psi_flat(g):
        return float(mat.energy_density_du(jnp.asarray(g.reshape(d, d)), PARAMS))

    P = np.asarray(mat.stress_du(jnp.asarray(G), PARAMS))
    # dψ/d(∇u)_ki = P_ik  (g = Pᵀ)
    fd = approximate_gradient_fd(psi_flat, G.reshape(-1), h=1e-6).reshape(d, d)
    assert np.abs(fd - P.T).max() < 1e-4 * max(1.0, np.abs(P).max())


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
@pytest.mark.parametrize("d", [2, 3])
def test_contraction_is_derivative_of_stress(mat, d, rng):
    G = random_u_grad(rng, d)
    F = np.asarray(deformation_gradient(jnp.asarray(G)))

    def P_of_F_flat(f):
        Fm = jnp.asarray(f.reshape(d, d))
        du = jnp.swapaxes(Fm, -1, -2) - jnp.eye(d)
        return np.asarray(mat.stress_du(du, PARAMS)).reshape(-1)

    A = np.asarray(mat.stress_contraction_tensor_du(jnp.asarray(G), PARAMS))
    fd = approximate_jacobian_fd(P_of_F_flat, F.reshape(-1), h=1e-6)
    # fd[(i*d+k), (j*d+m)] = dP_ik/dF_jm = A[i,k,j,m]
    fd_t = fd.reshape(d, d, d, d)
    assert np.abs(A - fd_t).max() < 1e-4 * max(1.0, np.abs(A).max())


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
@pytest.mark.parametrize("d", [2, 3])
def test_closed_forms_match_autodiff(mat, d, rng):
    G = jnp.asarray(random_u_grad(rng, d))
    # autodiff through the energy only
    P_ad = jnp.swapaxes(
        jax.grad(lambda g: mat.energy_density_du(g, PARAMS))(G), -1, -2
    )
    P_cf = mat.stress_du(G, PARAMS)
    assert np.abs(np.asarray(P_ad - P_cf)).max() < 1e-10

    A_ad = HyperelasticMaterial.stress_contraction_tensor_du(mat, G, PARAMS)
    A_cf = mat.stress_contraction_tensor_du(G, PARAMS)
    assert np.abs(np.asarray(A_ad - A_cf)).max() < 1e-8


def test_log_det_F_stability():
    # tiny strains: log_det_F must not lose precision to the +1
    eps = 1e-12
    du = jnp.asarray([[eps, 0.0, 0.0], [0.0, eps, 0.0], [0.0, 0.0, eps]])
    val = float(log_det_F(du))
    # log(det(I + eps I)) = 3 log(1+eps) ~= 3 eps
    assert abs(val - 3 * eps) < 1e-18
    # inverted element -> -inf
    du_bad = jnp.asarray([[-2.0, 0, 0], [0, 0.0, 0], [0, 0, 0.0]])
    assert float(log_det_F(du_bad)) == -np.inf


def test_neo_hookean_inverted_energy_infinite():
    mat = NeoHookeanMaterial()
    du = jnp.asarray([[-2.0, 0, 0], [0, 0.0, 0], [0, 0, 0.0]])
    assert float(mat.energy_density_du(du, PARAMS)) == np.inf


def test_lame_from_young_poisson():
    p = lame_from_young_poisson(1000.0, 0.3)
    assert abs(p.mu - 0.5 * 1000 / 1.3) < 1e-10
    assert abs(p.lam - 2 * p.mu * 0.3 / 0.4) < 1e-10


def test_linear_elastic_zero_strain_zero_stress():
    mat = LinearElasticMaterial()
    G = jnp.zeros((3, 3))
    assert np.abs(np.asarray(mat.stress_du(G, PARAMS))).max() == 0.0
    assert float(mat.energy_density_du(G, PARAMS)) == 0.0


@pytest.mark.parametrize("d", [2, 3])
def test_material_elliptic_operator_fd_identities(d, rng):
    """The adapted operator satisfies g = ∂ψ/∂G, D = ∂g/∂G."""
    op = MaterialEllipticOperator(NeoHookeanMaterial(), dim=d)
    G = random_u_grad(rng, d)

    def psi(gf):
        return float(op.energy(jnp.asarray(gf.reshape(d, d)), PARAMS))

    g_val = np.asarray(op.g(jnp.asarray(G), PARAMS))
    fd_g = approximate_gradient_fd(psi, G.reshape(-1), h=1e-6).reshape(d, d)
    assert np.abs(g_val - fd_g).max() < 1e-4 * max(1.0, np.abs(g_val).max())

    def g_flat(gf):
        return np.asarray(op.g(jnp.asarray(gf.reshape(d, d)), PARAMS)).reshape(-1)

    D = np.asarray(op.contraction(jnp.asarray(G), PARAMS))
    fd_D = approximate_jacobian_fd(g_flat, G.reshape(-1), h=1e-6).reshape(d, d, d, d)
    # fd_D[k,i,m,j] = d g_ki / d G_mj; our D has the same layout
    assert np.abs(D - fd_D).max() < 1e-4 * max(1.0, np.abs(D).max())
