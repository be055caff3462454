"""Closed-form tangent stresses and the tangent element sweep.

The directional Hessian-action forms (``stress_tangent_du`` /
``EllipticOperator.g_tangent`` / the element-minor tangent sweep) must
agree with forward-mode autodiff of their primal counterparts — the same
FD/AD-identity strategy the reference uses for its hand-derived
contraction operators (fenris-solid/tests/unit_tests/materials.rs:95-142).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.assembly import local as L
from fenris_tpu.assembly import local_em as LE
from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
from fenris_tpu.operators import LaplaceOperator
from fenris_tpu.quadrature.canonical import canonical_stiffness
from fenris_tpu.solid import (
    LameParameters,
    LinearElasticMaterial,
    MaterialEllipticOperator,
    NeoHookeanMaterial,
    StVKMaterial,
)

MATERIALS = [LinearElasticMaterial(), NeoHookeanMaterial(), StVKMaterial()]
PARAMS = LameParameters(mu=384.614, lam=576.923)


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
@pytest.mark.parametrize("dim", [2, 3])
def test_stress_tangent_matches_jvp(mat, dim, rng):
    for _ in range(5):
        G = jnp.asarray(rng.uniform(-0.1, 0.1, (dim, dim)))
        dG = jnp.asarray(rng.uniform(-1.0, 1.0, (dim, dim)))
        _, want = jax.jvp(lambda g: mat.stress_du(g, PARAMS), (G,), (dG,))
        got = mat.stress_tangent_du(G, dG, PARAMS)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
def test_g_tangent_matches_contraction_tensor(mat, rng):
    op = MaterialEllipticOperator(mat, dim=3)
    G = jnp.asarray(rng.uniform(-0.1, 0.1, (3, 3)))
    dG = jnp.asarray(rng.uniform(-1.0, 1.0, (3, 3)))
    D = op.contraction(G, PARAMS)  # D[k,i,m,j] = ∂g_ki/∂G_mj
    want = jnp.einsum("kimj,mj->ki", D, dG)
    got = op.g_tangent(G, dG, PARAMS)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-12)


def test_laplace_g_tangent(rng):
    op = LaplaceOperator()
    G = jnp.asarray(rng.uniform(-1, 1, (3, 1)))
    dG = jnp.asarray(rng.uniform(-1, 1, (3, 1)))
    np.testing.assert_array_equal(np.asarray(op.g_tangent(G, dG, None)), np.asarray(dG))


@pytest.mark.parametrize("mat", MATERIALS, ids=lambda m: type(m).__name__)
def test_tangent_sweep_matches_jvp_of_vector_sweep(mat, rng):
    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    op = MaterialEllipticOperator(mat, dim=3)
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    E = mesh.num_cells
    X = jnp.asarray(np.transpose(mesh.cell_points(), (1, 2, 0)))
    u = jnp.asarray(rng.uniform(-0.01, 0.01, (8, 3, E)))
    v = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 3, E)))
    _, want = jax.jvp(
        lambda uu: LE.assemble_element_elliptic_vectors_em(X, uu, op, PARAMS, tab),
        (u,),
        (v,),
    )
    got = LE.assemble_element_elliptic_tangent_vectors_em(X, u, v, op, PARAMS, tab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


def test_tangent_sweep_per_element_params(rng):
    """Per-element ([E]-shaped) parameter leaves map correctly on the tangent path."""
    mesh = create_unit_box_uniform_hex_mesh_3d(3)
    op = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    E = mesh.num_cells
    params = LameParameters(
        mu=jnp.asarray(rng.uniform(300.0, 400.0, E)),
        lam=jnp.asarray(rng.uniform(500.0, 600.0, E)),
    )
    X = jnp.asarray(np.transpose(mesh.cell_points(), (1, 2, 0)))
    u = jnp.asarray(rng.uniform(-0.01, 0.01, (8, 3, E)))
    v = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 3, E)))
    _, want = jax.jvp(
        lambda uu: LE.assemble_element_elliptic_vectors_em(X, uu, op, params, tab),
        (u,),
        (v,),
    )
    got = LE.assemble_element_elliptic_tangent_vectors_em(X, u, v, op, params, tab)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


def test_banded_hvp_matches_unbanded(rng):
    """The banded model's tangent-sweep hvp equals the jvp-based hvp."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.reorder import reorder_mesh

    mesh, _ = reorder_mesh(create_unit_box_uniform_hex_mesh_3d(5))
    kwargs = dict(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0]),
        dirichlet_nodes=np.arange(36),
    )
    m_band = HyperelasticModel(banded=True, **kwargs)
    m_ref = HyperelasticModel(banded=False, **kwargs)
    u = jnp.asarray(rng.uniform(-0.01, 0.01, m_ref.space.num_dofs))
    v = jnp.asarray(rng.uniform(-1.0, 1.0, m_ref.space.num_dofs))
    hv_b = np.asarray(m_band.hessian_vector_product(u, v))
    hv_r = np.asarray(m_ref.hessian_vector_product(u, v))
    np.testing.assert_allclose(hv_b, hv_r, rtol=1e-9, atol=1e-10)
