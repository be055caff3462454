"""Fused element-sweep Pallas kernels vs the XLA element-minor sweep.

Interpreter-mode correctness pin (the kernel is experimental on the
current TPU toolchain — see ops/em_sweep.py docstring).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

from fenris_tpu.assembly import local as L
from fenris_tpu.assembly import local_em as LE
from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
from fenris_tpu.ops.em_sweep import em_vector_sweep, em_vector_tangent_sweep
from fenris_tpu.quadrature.canonical import canonical_stiffness
from fenris_tpu.solid import LameParameters, MaterialEllipticOperator, NeoHookeanMaterial


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


def test_em_kernels_match_xla_sweep(interpret_pallas, rng):
    mesh = create_unit_box_uniform_hex_mesh_3d(10)
    op = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    params = LameParameters(mu=384.614, lam=576.923)
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    E = mesh.num_cells  # 1000: exercises tile padding (Et = 1, pad 24)
    X = jnp.asarray(np.transpose(mesh.cell_points(), (1, 2, 0)), jnp.float32)
    u = jnp.asarray(rng.uniform(-0.001, 0.001, (8, 3, E)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 3, E)), jnp.float32)

    f_ref = np.asarray(LE.assemble_element_elliptic_vectors_em(X, u, op, params, tab))
    f_k = np.asarray(em_vector_sweep(X, u, op, params, tab))
    np.testing.assert_allclose(f_k, f_ref, rtol=0, atol=1e-7)

    # closed-form tangent kernel vs the autodiff reference tangent
    _, df_ref = jax.jvp(
        lambda uu: LE.assemble_element_elliptic_vectors_em(X, uu, op, params, tab),
        (u,),
        (v,),
    )
    df_t = np.asarray(em_vector_tangent_sweep(X, u, v, op, params, tab))
    np.testing.assert_allclose(df_t, np.asarray(df_ref), rtol=0, atol=1e-5)


def test_em_kernels_per_element_params(interpret_pallas, rng):
    """[E] param leaves ride into the kernels as tiled operands."""
    mesh = create_unit_box_uniform_hex_mesh_3d(10)
    op = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    E = mesh.num_cells
    params = LameParameters(
        mu=jnp.asarray(rng.uniform(300.0, 500.0, E), jnp.float32),
        lam=jnp.float32(576.923),
    )
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    X = jnp.asarray(np.transpose(mesh.cell_points(), (1, 2, 0)), jnp.float32)
    u = jnp.asarray(rng.uniform(-0.001, 0.001, (8, 3, E)), jnp.float32)
    v = jnp.asarray(rng.uniform(-1.0, 1.0, (8, 3, E)), jnp.float32)

    f_ref = np.asarray(LE.assemble_element_elliptic_vectors_em(X, u, op, params, tab))
    f_k = np.asarray(em_vector_sweep(X, u, op, params, tab))
    np.testing.assert_allclose(f_k, f_ref, rtol=0, atol=1e-7)

    df_ref = np.asarray(
        LE.assemble_element_elliptic_tangent_vectors_em(X, u, v, op, params, tab)
    )
    df_t = np.asarray(em_vector_tangent_sweep(X, u, v, op, params, tab))
    np.testing.assert_allclose(df_t, df_ref, rtol=0, atol=1e-5)


def test_fused_kernels_wiring_matches_banded_xla(interpret_pallas, monkeypatch, rng):
    """HyperelasticModel(fused_kernels=True) reproduces the XLA banded path.

    Exercises the elasticity.py plumbing (layout transposes, param
    passing, scatter) with the Pallas kernels in interpreter mode — the
    on-TPU supports() gate is bypassed so the fused branch runs on CPU.
    """
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh import reorder
    from fenris_tpu.ops import em_sweep

    # bypass only the TPU-backend condition of supports()
    monkeypatch.setattr(
        em_sweep,
        "supports",
        lambda p, n=None: all(
            not (hasattr(x, "ndim") and x.ndim >= 1)
            or (n is not None and x.ndim == 1 and x.shape[0] == n)
            for x in jax.tree_util.tree_leaves(p)
        ),
    )
    mesh, _ = reorder.reorder_mesh(create_unit_box_uniform_hex_mesh_3d(6))
    # per-element mu exercises the tiled param-operand path end-to-end
    mu_el = jnp.asarray(
        384.0 * (1.0 + 0.2 * np.sin(np.arange(mesh.num_cells))), jnp.float32
    )
    kw = dict(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=mu_el, lam=jnp.float32(577.0)),
        dirichlet_nodes=np.arange(49),
        dtype=jnp.float32,
        banded=True,
        banded_r_nodes=1024,
    )
    m_xla = HyperelasticModel(**kw)
    m_fused = HyperelasticModel(**kw, fused_kernels=True)
    assert m_fused._fused_active() and not m_xla._fused_active()
    u = jnp.asarray(rng.uniform(-0.01, 0.01, m_xla.space.num_dofs), jnp.float32)
    v = jnp.asarray(rng.standard_normal(m_xla.space.num_dofs), jnp.float32)
    r0, r1 = np.asarray(m_xla.residual(u)), np.asarray(m_fused.residual(u))
    np.testing.assert_allclose(r1, r0, rtol=0, atol=5e-6)
    h0 = np.asarray(m_xla.hessian_vector_product(u, v))
    h1 = np.asarray(m_fused.hessian_vector_product(u, v))
    np.testing.assert_allclose(h1, h0, rtol=0, atol=5e-4 * np.abs(h0).max())
