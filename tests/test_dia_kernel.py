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


def test_component_major_matvec_matches(rng):
    """Component-major entry (the TPU fast form): XLA cm, kernel cm, and
    the layout="component" operator all agree with the node-major matvec."""
    from fenris_tpu.sparse.block_dia import block_dia_matvec_cm
    from fenris_tpu.sparse.dia_kernel import packed_dia_matvec_cm

    model, m = _elasticity_dia(rng)
    N, s = m.num_nodes, m.solution_dim
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    x2 = v.reshape(N, s).T
    ref = np.asarray(block_dia_matvec(m, v)).reshape(N, s).T

    np.testing.assert_allclose(
        np.asarray(block_dia_matvec_cm(m, x2)), ref, rtol=1e-12, atol=1e-12
    )
    y2 = packed_dia_matvec_cm(pack_block_dia(m), x2, interpret=True)
    np.testing.assert_allclose(np.asarray(y2), ref, rtol=1e-12, atol=1e-12)
    mv = block_dia_operator(m, layout="component")  # CPU -> XLA cm fallback
    np.testing.assert_allclose(np.asarray(mv(x2)), ref, rtol=1e-12, atol=1e-12)


def test_component_major_remainder(rng):
    """Component-major composition includes the block-ELL spill exactly."""
    from fenris_tpu.sparse.block_dia import block_dia_matvec_cm

    model, m = _elasticity_dia(rng, res=3, max_diagonals=7)
    assert m.remainder is not None
    N, s = m.num_nodes, m.solution_dim
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    ref = np.asarray(block_dia_matvec(m, v)).reshape(N, s).T
    y2 = block_dia_matvec_cm(m, v.reshape(N, s).T)
    np.testing.assert_allclose(np.asarray(y2), ref, rtol=1e-12, atol=1e-12)


def test_assembled_operator_component_layout(rng):
    """assembled_hessian_operator(layout="component") == node-major hvp,
    including the Dirichlet identity rows; a CG solve through the cm form
    returns the same solution."""
    from fenris_tpu.sparse.cg import conjugate_gradient

    model, _ = _elasticity_dia(rng)
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    hvp, inv_diag = model.assembled_hessian_operator(u)
    hvp2, inv_diag2 = model.assembled_hessian_operator(u, layout="component")
    N = model.mesh.num_vertices
    s = model.mesh.dim
    np.testing.assert_allclose(
        np.asarray(inv_diag2), np.asarray(inv_diag).reshape(N, s).T, rtol=0, atol=0
    )
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    ref = np.asarray(hvp(v)).reshape(N, s).T
    np.testing.assert_allclose(
        np.asarray(hvp2(v.reshape(N, s).T)), ref, rtol=1e-12, atol=1e-12
    )

    f = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    f = jnp.where(model.free_mask, f, 0.0)
    x_nm = conjugate_gradient(
        hvp, f, preconditioner=lambda r: inv_diag * r, rel_tolerance=1e-10,
        max_iter=500,
    )
    x_cm = conjugate_gradient(
        hvp2, f.reshape(N, s).T, preconditioner=lambda r: inv_diag2 * r,
        rel_tolerance=1e-10, max_iter=500,
    )
    np.testing.assert_allclose(
        np.asarray(x_cm.x.T.reshape(-1)), np.asarray(x_nm.x), rtol=1e-7, atol=1e-9
    )


def test_windowed_matvec_matches_xla(rng):
    """Windowed (staging-free) sweep == XLA matvec, incl. multi-step grid
    with halo windows crossing chunk boundaries."""
    from fenris_tpu.sparse.dia_kernel import (
        pack_block_dia_windowed,
        packed_dia_matvec_wm,
    )

    model, m = _elasticity_dia(rng)
    N, s = m.num_nodes, m.solution_dim
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    ref = np.asarray(block_dia_matvec(m, v)).reshape(N, s).T
    for lanes in (None, 128):  # single-step and multi-step grids
        p = pack_block_dia_windowed(m, lanes=lanes)
        assert p is not None
        assert p.dps % 8 == 0 and p.bands_k.shape[0] == s * p.dps
        y2 = packed_dia_matvec_wm(p, v.reshape(N, s).T, interpret=True)
        np.testing.assert_allclose(np.asarray(y2), ref, rtol=1e-12, atol=1e-12)


def test_windowed_matvec_scalar_and_gate(rng):
    """s=1 windowed layout; the VMEM-window gate returns None when the
    bandwidth is pathologically large for the node count."""
    from fenris_tpu.sparse.block_dia import BlockDiaMatrix
    from fenris_tpu.sparse.dia_kernel import (
        _WINDOW_LANES_CAP,
        pack_block_dia_windowed,
        packed_dia_matvec_wm,
    )

    N = 500
    offsets = (-19, -5, -1, 0, 1, 5, 19)
    bands = jnp.asarray(rng.standard_normal((len(offsets), N)))
    m = BlockDiaMatrix(offsets, bands, N, 1, None)
    v = jnp.asarray(rng.standard_normal(N))
    ref = np.asarray(block_dia_matvec(m, v))
    p = pack_block_dia_windowed(m, lanes=128)
    y = packed_dia_matvec_wm(p, v.reshape(1, N), interpret=True)
    np.testing.assert_allclose(np.asarray(y)[0], ref, rtol=1e-12, atol=1e-12)

    huge = BlockDiaMatrix(
        (-(_WINDOW_LANES_CAP + 256), 0, _WINDOW_LANES_CAP + 256),
        jnp.zeros((3, N)),
        N,
        1,
        None,
    )
    assert pack_block_dia_windowed(huge, lanes=128) is None
