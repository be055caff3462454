"""z-slab sharded structured elasticity vs single-device agreement."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.optimize import NEWTON_CONVERGED
from fenris_tpu.parallel import make_device_mesh
from fenris_tpu.parallel.structured import StructuredShardedElasticity
from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
from fenris_tpu.structured import StructuredHyperelasticModel

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 2, reason="needs multiple (virtual) devices"
)

PARAMS = LameParameters(mu=100.0, lam=200.0)


def _model(cells=(4, 3, 5)):
    ncx, ncy, ncz = cells
    nodes = (ncz + 1) * (ncy + 1) * (ncx + 1)
    # clamp the z = 0 node plane
    mask = np.zeros(nodes * 3, dtype=bool)
    plane = (ncy + 1) * (ncx + 1)
    for node in range(plane):
        for i in range(3):
            mask[3 * node + i] = True
    return StructuredHyperelasticModel(
        cells=cells,
        spacing=0.25,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_mask=mask,
        body_force=np.array([0.0, 0.0, -4.0]),
        dtype=jnp.float64,
    )


@pytest.mark.parametrize("cells", [(4, 3, 8), (4, 3, 5)], ids=["even", "padded"])
def test_sharded_structured_matches_serial(cells, rng):
    model = _model(cells)
    sharded = StructuredShardedElasticity(model, make_device_mesh())
    u = jnp.asarray(rng.uniform(-0.01, 0.01, size=model.num_dofs)) * model.free_mask
    v = jnp.asarray(rng.standard_normal(model.num_dofs))
    assert (
        np.abs(
            np.asarray(model.internal_forces(u)) - np.asarray(sharded.internal_forces(u))
        ).max()
        < 1e-12
    )
    assert (
        np.abs(np.asarray(model.residual(u)) - np.asarray(sharded.residual(u))).max()
        < 1e-12
    )
    assert (
        np.abs(
            np.asarray(model.hessian_vector_product(u, v))
            - np.asarray(sharded.hessian_vector_product(u, v))
        ).max()
        < 1e-11
    )


def test_sharded_structured_solve():
    model = _model((4, 3, 8))
    sharded = StructuredShardedElasticity(model, make_device_mesh())
    r_serial = model.solve(tolerance=1e-8, cg_rel_tolerance=1e-8)
    r_sharded = sharded.solve(tolerance=1e-8, cg_rel_tolerance=1e-8)
    assert int(r_sharded.status) == NEWTON_CONVERGED
    assert np.abs(np.asarray(r_serial.x) - np.asarray(r_sharded.x)).max() < 1e-7


def test_sharded_newton_step_jittable():
    model = _model((4, 3, 8))
    sharded = StructuredShardedElasticity(model, make_device_mesh())
    step = jax.jit(lambda u: sharded.newton_step(u)[0])
    u1 = step(jnp.zeros(model.num_dofs, model.dtype))
    assert np.isfinite(np.asarray(u1)).all()


# -- sharded-state halo-exchange model (fenris_tpu/parallel/halo.py) ---------


from fenris_tpu.parallel.halo import StructuredHaloElasticity


@pytest.mark.parametrize(
    "cells", [(4, 3, 8), (4, 3, 5), (3, 2, 1)], ids=["even", "padded", "fewer-planes-than-devices"]
)
def test_halo_sharded_matches_serial(cells, rng):
    model = _model(cells)
    halo = StructuredHaloElasticity(model, make_device_mesh())
    u = jnp.asarray(rng.uniform(-0.01, 0.01, size=model.num_dofs)) * model.free_mask
    v = jnp.asarray(rng.standard_normal(model.num_dofs))
    ug, vg = halo.to_grid(u), halo.to_grid(v)
    assert np.abs(
        np.asarray(model.internal_forces(u))
        - np.asarray(halo.to_flat(halo.internal_forces(ug)))
    ).max() < 1e-12
    assert np.abs(
        np.asarray(model.residual(u)) - np.asarray(halo.to_flat(halo.residual(ug)))
    ).max() < 1e-12
    assert np.abs(
        np.asarray(model.hessian_vector_product(u, v))
        - np.asarray(halo.to_flat(halo.hessian_vector_product(ug, vg)))
    ).max() < 1e-11
    assert np.abs(
        np.asarray(model.hessian_diagonal(u))
        - np.asarray(halo.to_flat(halo.hessian_diagonal(ug)))
    ).max() < 1e-11


def test_halo_sharded_state_is_sharded():
    model = _model((4, 3, 8))
    halo = StructuredHaloElasticity(model, make_device_mesh())
    ug = halo.zeros()
    # the state grid must actually be split over devices (z axis)
    shards = ug.addressable_shards
    assert len(shards) == len(jax.devices())
    assert shards[0].data.shape[1] == halo.zp
    rg = halo.residual(ug)
    assert rg.sharding.is_equivalent_to(halo.sharding, ndim=4)


def test_halo_sharded_solve_matches_serial():
    model = _model((4, 3, 8))
    halo = StructuredHaloElasticity(model, make_device_mesh())
    r_serial = model.solve(tolerance=1e-8, cg_rel_tolerance=1e-8)
    r_halo = halo.solve(tolerance=1e-8, cg_rel_tolerance=1e-8)
    assert int(r_halo.status) == NEWTON_CONVERGED
    assert np.abs(
        np.asarray(r_serial.x) - np.asarray(halo.to_flat(r_halo.x))
    ).max() < 1e-7


def test_halo_newton_step_jittable():
    model = _model((4, 3, 8))
    halo = StructuredHaloElasticity(model, make_device_mesh())
    step = jax.jit(lambda ug: halo.newton_step(ug)[0])
    u1 = step(halo.zeros())
    assert np.isfinite(np.asarray(u1)).all()
