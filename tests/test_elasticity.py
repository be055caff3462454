"""Nonlinear hyperelasticity end-to-end tests (SURVEY §3.3 path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.elasticity import HyperelasticModel
from fenris_tpu.mesh import procedural
from fenris_tpu.optimize import NEWTON_CONVERGED, approximate_gradient_fd
from fenris_tpu.solid import LameParameters, LinearElasticMaterial, NeoHookeanMaterial

PARAMS = LameParameters(mu=384.614, lam=576.923)


def _cantilever_model(material, res=2, body=-9.81):
    mesh = procedural.create_rectangular_uniform_hex_mesh(1.0, 2, 1, 1, res)
    # clamp the x = 0 face
    fixed = np.flatnonzero(np.abs(mesh.points[:, 0]) < 1e-12)
    return HyperelasticModel(
        mesh=mesh,
        material=material,
        params=PARAMS,
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, body], dtype=x.dtype),
    )


def test_residual_is_gradient_of_energy(rng):
    model = _cantilever_model(NeoHookeanMaterial(), res=1)
    n = model.space.num_dofs
    u = rng.uniform(-0.01, 0.01, size=n) * np.asarray(model.free_mask)

    def energy_of(uf):
        return float(model.energy(jnp.asarray(uf)))

    r = np.asarray(model.residual(jnp.asarray(u)))
    fd = approximate_gradient_fd(energy_of, u, h=1e-6) * np.asarray(model.free_mask)
    assert np.abs(r - fd).max() < 1e-4 * max(1.0, np.abs(r).max())


def test_hessian_vector_product_matches_assembled(rng):
    model = _cantilever_model(NeoHookeanMaterial(), res=1)
    n = model.space.num_dofs
    u = jnp.asarray(rng.uniform(-0.01, 0.01, size=n)) * model.free_mask
    v = jnp.asarray(rng.standard_normal(n)) * model.free_mask
    hv = np.asarray(model.hessian_vector_product(u, v))
    # assembled CSR Hessian
    from fenris_tpu.sparse import from_pattern, spmv

    vals = model.assemble_hessian_csr(u)
    A = from_pattern(model.space.pattern, vals)
    hv_csr = np.asarray(spmv(A, v))
    free = np.asarray(model.free_mask)
    assert np.abs((hv - hv_csr)[free]).max() < 1e-8 * max(1.0, np.abs(hv).max())


def test_linear_elastic_cantilever_matches_direct_solve():
    model = _cantilever_model(LinearElasticMaterial(), res=2)
    res = model.solve(tolerance=1e-9, cg_rel_tolerance=1e-10)
    assert int(res.status) == NEWTON_CONVERGED
    # linear problem: Newton converges in ~1 iteration
    assert int(res.iterations) <= 2
    # compare against dense direct solve of the assembled system
    from fenris_tpu.sparse import from_pattern, to_dense

    u0 = jnp.zeros(model.space.num_dofs)
    A = np.asarray(to_dense(from_pattern(model.space.pattern, model.assemble_hessian_csr(u0))))
    b = np.asarray(jnp.where(model.free_mask, model._f_ext, 0.0))
    u_direct = np.linalg.solve(A, b)
    err = np.abs(np.asarray(res.x) - u_direct).max() / np.abs(u_direct).max()
    assert err < 1e-6
    # gravity pulls the tip down
    tip = np.argmax(model.mesh.points[:, 0])
    assert u_direct[3 * tip + 2] < 0.0


def test_neo_hookean_newton_converges():
    model = _cantilever_model(NeoHookeanMaterial(), res=2, body=-30.0)
    res = model.solve(tolerance=1e-8, max_newton_iterations=40)
    assert int(res.status) == NEWTON_CONVERGED
    assert float(res.residual_norm) <= 1e-8
    u = np.asarray(res.x)
    # all dirichlet dofs stay zero
    assert np.abs(u[~np.asarray(model.free_mask)]).max() == 0.0
    # finite energy, deformed state
    assert np.isfinite(float(model.energy(res.x)))
    assert np.abs(u).max() > 1e-4


def test_solve_is_jittable():
    model = _cantilever_model(NeoHookeanMaterial(), res=1)
    solve = jax.jit(lambda: model.solve(tolerance=1e-6).x)
    u = np.asarray(solve())
    assert np.isfinite(u).all()


def test_preconditioner_cache_key_pins_object():
    """Identity-keyed Newton cache entries must pin the preconditioner:
    a bare id() key could be silently reused by a new object after GC,
    resurrecting a stale closure-converted solve."""
    model = _cantilever_model(NeoHookeanMaterial(), res=1)
    inv_diag = 1.0 / model.hessian_diagonal(jnp.zeros(model.space.num_dofs))
    prec = lambda v: inv_diag * v
    res1 = model.solve(preconditioner=prec, tolerance=1e-9)
    pins = getattr(model, "_newton_cache_pins")
    assert any(p is prec for p in pins)
    pid = id(prec)
    del prec  # the pin must keep the id from being recycled
    assert any(id(p) == pid for p in pins)
    assert int(res1.status) == NEWTON_CONVERGED


def test_solve_mixed_unstructured_reaches_f64_accuracy():
    """HyperelasticModel.solve_mixed: f32 inner CG + f64 outer residual
    converges to f64 accuracy and matches the all-f64 direct solve — on
    both the standard and the banded inner path (the latter also pins the
    f32-sweep-under-x64 dtype purity fixed in assembly/local_em.py:
    vmap promotes Python-float param leaves to strong f64 without the
    _cast_float_params guard)."""
    from fenris_tpu.mesh.reorder import reorder_mesh

    mesh, _ = reorder_mesh(procedural.create_unit_box_uniform_hex_mesh_3d(4))
    fixed = np.flatnonzero(mesh.points[:, 0] < 1e-12)
    kw = dict(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -4.0], dtype=x.dtype),
    )
    r64 = HyperelasticModel(dtype=jnp.float64, **kw).solve(tolerance=1e-12)
    assert int(r64.status) == NEWTON_CONVERGED
    for banded in (False, True):
        m32 = HyperelasticModel(dtype=jnp.float32, banded=banded, **kw)
        res = m32.solve_mixed(tolerance=1e-11)
        assert int(res.status) == NEWTON_CONVERGED, f"banded={banded}"
        assert res.x.dtype == jnp.float64
        rel = float(jnp.linalg.norm(res.x - r64.x) / jnp.linalg.norm(r64.x))
        assert rel < 1e-9, f"banded={banded}: {rel}"
    # f64 models must refuse the mixed path (inner CG is the f32 path)
    with pytest.raises(ValueError):
        HyperelasticModel(dtype=jnp.float64, **kw).solve_mixed()


def test_assembled_hessian_operator_matches_matrix_free(rng):
    """Block-DIA assembled hvp + Jacobi diag == matrix-free counterparts."""
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d

    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=np.arange(25),
    )
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    hvp, inv_diag = model.assembled_hessian_operator(u)
    np.testing.assert_allclose(
        np.asarray(hvp(v)),
        np.asarray(model.hessian_vector_product(u, v)),
        rtol=1e-11,
        atol=1e-11,
    )
    np.testing.assert_allclose(
        np.asarray(1.0 / inv_diag),
        np.asarray(model.hessian_diagonal(u)),
        rtol=1e-12,
    )


def test_solve_assembled_agrees_with_matrix_free():
    """solve(assembled=True) converges to the same solution."""
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d

    mesh = create_unit_box_uniform_hex_mesh_3d(4)
    fixed = np.nonzero(np.asarray(mesh.points)[:, 2] < 1e-12)[0]
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0]),
    )
    r_mf = model.solve(tolerance=1e-9)
    r_as = model.solve(tolerance=1e-9, assembled=True)
    assert float(r_as.residual_norm) <= 1e-9
    np.testing.assert_allclose(
        np.asarray(r_as.x), np.asarray(r_mf.x), rtol=0, atol=1e-8
    )


def test_chunked_model_trace_then_eager_no_tracer_leak():
    """closure_convert-tracing a chunked residual must not poison the cache.

    Regression: ``_chunked()`` built its cache with jnp ops, so a first
    call under a trace (exactly what ``mixed_precision_newton`` does via
    ``jax.closure_convert(residual64, u0)``) cached tracers; the next
    *eager* residual call raised UnexpectedTracerError.  Hit at res=99 in
    tools/solve_assembled.py (any auto-chunked model + solve_mixed).
    """
    model = _cantilever_model(NeoHookeanMaterial(), res=2)
    model.chunk_size = 7  # force the chunked sweep, odd size to exercise pad
    model._chunk_cache = None
    u0 = jnp.zeros(model.space.num_dofs)
    res_fn, consts = jax.closure_convert(model.residual, u0)  # traces first
    eager = model.residual(u0 + 0.001 * model.free_mask)  # then eager
    jitted = res_fn(u0 + 0.001 * model.free_mask, *consts)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(jitted), atol=1e-12)
    # unchunked oracle
    model2 = _cantilever_model(NeoHookeanMaterial(), res=2)
    oracle = model2.residual(u0 + 0.001 * model.free_mask)
    np.testing.assert_allclose(np.asarray(eager), np.asarray(oracle), atol=1e-12)


def test_external_forces_chunked_matches_unchunked():
    """Chunked body-force assembly == unchunked (round-4 HBM regression).

    The unchunked source sweep materializes [E, q, d, d] jacobians for the
    whole mesh; in f64 at 3.3M hex8 (solve_mixed's f64 twin __post_init__)
    that alone overflowed HBM.  _assemble_external_forces now rides
    _chunk_scan when chunk_size is set; values must be identical up to
    summation order.
    """
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(4)
    bf = lambda x, p: jnp.stack([x[0], -2.0 * jnp.ones_like(x[0]), x[2] * x[1]])
    kw = dict(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        body_force=bf,
    )
    f0 = HyperelasticModel(**kw)._f_ext
    f1 = HyperelasticModel(chunk_size=13, **kw)._f_ext  # ragged last chunk
    np.testing.assert_allclose(np.asarray(f1), np.asarray(f0), rtol=1e-12, atol=1e-14)
