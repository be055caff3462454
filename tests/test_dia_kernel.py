"""Fused Pallas band-sweep SpMV vs the XLA block-DIA matvec (interpret mode).

The kernel (fenris_tpu/sparse/dia_kernel.py) is the production TPU path for
the assembled-operator CG loop (reference loop: fenris-sparse/src/cg.rs:373);
these tests pin its semantics against :func:`block_dia_matvec` on CPU via
``interpret=True`` (the real-TPU agreement + throughput is driven by
bench.py / tools/exp_spmv.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from fenris_tpu.sparse.block_dia import block_dia_matvec
from fenris_tpu.sparse.dia_kernel import (
    block_dia_operator,
    pack_block_dia,
    packed_dia_matvec,
)


def _elasticity_dia(rng, res=4, **plan_kw):
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(res)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
    )
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    return model, model.assemble_hessian_block_dia(u, **plan_kw)


def test_packed_matvec_matches_xla(rng):
    """27-diagonal s=3 elasticity Hessian: kernel == XLA matvec (f64)."""
    model, m = _elasticity_dia(rng)
    assert m.remainder is None
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    p = pack_block_dia(m)
    y = packed_dia_matvec(p, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(block_dia_matvec(m, v)), rtol=1e-12, atol=1e-12
    )


def test_packed_matvec_multistep_grid(rng):
    """Small lane chunks force a multi-step grid + lane padding."""
    model, m = _elasticity_dia(rng)
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    p = pack_block_dia(m, lanes=128)  # 125 nodes -> Npad 256, 2 grid steps
    assert p.bands_k.shape[1] % 128 == 0
    y = packed_dia_matvec(p, v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y), np.asarray(block_dia_matvec(m, v)), rtol=1e-12, atol=1e-12
    )


def test_packed_matvec_scalar_laplace(rng):
    """s=1 (Laplace) block-DIA goes through the same kernel layout."""
    from fenris_tpu import quadrature as quad
    from fenris_tpu.assembly import global_ as G
    from fenris_tpu.assembly import local as L
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.operators import LaplaceOperator
    from fenris_tpu.sparse import from_pattern, spmv
    from fenris_tpu.sparse.block_dia import block_dia_from_csr

    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    tab = L.tabulate(mesh.element, quad.hexahedron_gauss(2))
    X = jnp.asarray(mesh.cell_points())
    A_el = L.assemble_element_elliptic_matrices(X, None, LaplaceOperator(), None, tab)
    pattern = G.csr_pattern(np.asarray(mesh.cells), mesh.num_vertices, 1)
    values = G.assemble_csr(A_el, pattern)
    m = block_dia_from_csr(pattern, values)
    v = jnp.asarray(rng.standard_normal(mesh.num_vertices))
    y = packed_dia_matvec(pack_block_dia(m), v, interpret=True)
    np.testing.assert_allclose(
        np.asarray(y),
        np.asarray(spmv(from_pattern(pattern, values), v)),
        rtol=1e-12,
        atol=1e-12,
    )


def test_operator_dispatch_and_remainder(rng):
    """block_dia_operator: CPU auto-falls back to XLA; the kernel path adds
    the block-ELL remainder exactly."""
    model, m = _elasticity_dia(rng, res=3, max_diagonals=7)
    assert m.remainder is not None
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    ref = block_dia_matvec(m, v)

    # auto on CPU -> XLA fallback, bitwise identical
    mv = block_dia_operator(m)
    np.testing.assert_array_equal(np.asarray(mv(v)), np.asarray(ref))

    # kernel path (interpret) with remainder composition
    from fenris_tpu.sparse.block_ell import block_ell_matvec

    y = packed_dia_matvec(pack_block_dia(m), v, interpret=True)
    y = y + block_ell_matvec(m.remainder, v)
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref), rtol=1e-12, atol=1e-12)


def test_packed_matvec_under_jit_and_f32(rng):
    """The kernel call is jittable and f32-exact to summation roundoff."""
    model, m = _elasticity_dia(rng)
    m32 = m._replace(bands=m.bands.astype(jnp.float32))
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs), jnp.float32)
    p = pack_block_dia(m32)

    @jax.jit
    def f(bands_k, v):
        return packed_dia_matvec(p._replace(bands_k=bands_k), v, interpret=True)

    y = f(p.bands_k, v)
    ref = np.asarray(block_dia_matvec(m32, v))
    # 243-term f32 sums in a different association order: ~200*eps_f32
    np.testing.assert_allclose(np.asarray(y), ref, rtol=5e-5, atol=5e-4)
