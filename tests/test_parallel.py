"""Multi-device sharded assembly tests on the virtual 8-device CPU mesh.

The parallel-vs-serial agreement check is the TPU equivalent of the
reference's CsrParAssembler-vs-CsrAssembler oracle tests
(tests/integration_tests/assembly.rs:53-143).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.elasticity import HyperelasticModel
from fenris_tpu.mesh import procedural
from fenris_tpu.optimize import NEWTON_CONVERGED
from fenris_tpu.parallel import ShardedElasticity, make_device_mesh
from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

PARAMS = LameParameters(mu=100.0, lam=200.0)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)


def _model(res=2):
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(res)
    fixed = np.flatnonzero(np.abs(mesh.points[:, 2]) < 1e-12)
    return HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -5.0], dtype=x.dtype),
    )


def test_sharded_residual_matches_single_device(rng):
    model = _model()
    sharded = ShardedElasticity(model, make_device_mesh())
    u = jnp.asarray(rng.uniform(-0.01, 0.01, size=model.space.num_dofs)) * model.free_mask
    r_serial = np.asarray(model.residual(u))
    r_sharded = np.asarray(sharded.residual(u))
    assert np.abs(r_serial - r_sharded).max() < 1e-12


def test_sharded_hvp_and_diag_match(rng):
    model = _model()
    sharded = ShardedElasticity(model, make_device_mesh())
    u = jnp.asarray(rng.uniform(-0.01, 0.01, size=model.space.num_dofs)) * model.free_mask
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    assert np.abs(
        np.asarray(model.hessian_vector_product(u, v))
        - np.asarray(sharded.hessian_vector_product(u, v))
    ).max() < 1e-12
    assert np.abs(
        np.asarray(model.hessian_diagonal(u)) - np.asarray(sharded.hessian_diagonal(u))
    ).max() < 1e-12
    assert abs(float(model.energy(u)) - float(sharded.energy(u))) < 1e-10


def test_sharded_newton_solve_matches():
    model = _model(res=2)
    sharded = ShardedElasticity(model, make_device_mesh())
    res_serial = model.solve(tolerance=1e-8)
    res_sharded = sharded.solve(tolerance=1e-8)
    assert int(res_sharded.status) == NEWTON_CONVERGED
    err = np.abs(np.asarray(res_serial.x) - np.asarray(res_sharded.x)).max()
    assert err < 1e-6


def test_sharded_step_is_jittable():
    model = _model(res=1)
    sharded = ShardedElasticity(model, make_device_mesh())
    step = jax.jit(lambda u: sharded.newton_step(u)[0])
    u = step(jnp.zeros(model.space.num_dofs))
    assert np.isfinite(np.asarray(u)).all()


def test_uneven_element_count_padding():
    # 3 cells across 8 devices exercises the padding path
    mesh = procedural.create_rectangular_uniform_hex_mesh(1.0, 3, 1, 1, 1)
    fixed = np.flatnonzero(np.abs(mesh.points[:, 0]) < 1e-12)
    model = HyperelasticModel(
        mesh=mesh, material=NeoHookeanMaterial(), params=PARAMS, dirichlet_nodes=fixed
    )
    sharded = ShardedElasticity(model, make_device_mesh())
    u = jnp.zeros(model.space.num_dofs)
    assert np.abs(
        np.asarray(model.internal_forces(u)) - np.asarray(sharded.internal_forces(u))
    ).max() < 1e-12


def test_sharded_banded_last_device_window():
    """K divisible by n_dev: the last real block lands on the last device.

    Regression for the na_ext off-by-one (window clamped by dynamic_slice)
    and for per-element parameter sharding.
    """
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.parallel import make_device_mesh
    from fenris_tpu.parallel.banded import ShardedBandedElasticity
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(19)  # 8000 nodes -> K = 8
    E = mesh.num_cells
    mu_el = np.full((E,), 384.0)
    mu_el[: E // 2] = 500.0  # per-element parameters must shard too
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=mu_el, lam=577.0),
        dirichlet_nodes=np.arange(400),
        banded=True,
        banded_r_nodes=1024,
    )
    sb = ShardedBandedElasticity(model, make_device_mesh(8))
    assert sb.Kd * 8 == sb.K_pad == model._plan.k_blocks  # exercises the edge
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    np.testing.assert_allclose(
        np.asarray(sb.residual(u)), np.asarray(model.residual(u)), rtol=0, atol=1e-12
    )
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    np.testing.assert_allclose(
        np.asarray(sb.hessian_vector_product(u, v)),
        np.asarray(model.hessian_vector_product(u, v)),
        rtol=0,
        atol=1e-10,
    )


def test_sharded_banded_matches_single_device():
    """Banded blocks sharded over 8 devices == single-device banded model."""
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.parallel import make_device_mesh
    from fenris_tpu.parallel.banded import ShardedBandedElasticity
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(10)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=np.arange(121),
        body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0]),
        banded=True,
        banded_r_nodes=1024,
    )
    sb = ShardedBandedElasticity(model, make_device_mesh(8))
    rng = np.random.default_rng(0)
    u = jnp.asarray(rng.standard_normal(model.space.num_dofs) * 0.01)
    v = jnp.asarray(rng.standard_normal(model.space.num_dofs))
    np.testing.assert_allclose(
        np.asarray(sb.residual(u)), np.asarray(model.residual(u)), rtol=0, atol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(sb.hessian_vector_product(u, v)),
        np.asarray(model.hessian_vector_product(u, v)),
        rtol=0,
        atol=1e-10,
    )
    res = sb.solve(tolerance=1e-9, max_newton_iterations=8)
    assert float(res.residual_norm) < 1e-9
