"""Pallas structured-stencil kernel vs XLA structured model (interpret mode).

The kernel is experimental on the current TPU toolchain (see its module
docstring); correctness is pinned here via Pallas interpreter mode on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental import pallas as pl

import fenris_tpu.ops.structured_stencil as SS
from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
from fenris_tpu.structured import StructuredHyperelasticModel

MU, LAM = 384.614, 576.923


@pytest.fixture
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def patched(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pl, "pallas_call", patched)


@pytest.mark.parametrize(
    "cells,KZ",
    [((5, 4, 11), 4), ((15, 7, 5), 2), ((6, 6, 6), 8)],
    ids=["tall", "wide-padded", "kz-overshoot"],
)
def test_kernel_matches_structured_model(cells, KZ, interpret_pallas, rng):
    model = StructuredHyperelasticModel(
        cells=cells,
        spacing=0.25,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=MU, lam=LAM),
        dtype=jnp.float32,
    )
    u = jnp.asarray(rng.uniform(-0.02, 0.02, size=model.num_dofs), jnp.float32)
    f_ref = np.asarray(model.internal_forces(u))
    ug = np.moveaxis(np.asarray(u).reshape(model.node_shape + (3,)), -1, 0)
    f_k = SS.neo_hookean_residual_pallas(jnp.asarray(ug), 0.25, MU, LAM, KZ=KZ)
    f_k_flat = np.moveaxis(np.asarray(f_k), 0, -1).reshape(-1)
    rel = np.abs(f_k_flat - f_ref).max() / np.abs(f_ref).max()
    assert rel < 1e-5, rel


@pytest.mark.parametrize(
    "cells,KZ",
    [((5, 4, 11), 4), ((15, 7, 5), 2), ((6, 6, 6), 8)],
    ids=["tall", "wide-padded", "kz-overshoot"],
)
def test_hvp_kernel_matches_jvp(cells, KZ, interpret_pallas, rng):
    """Closed-form tangent kernel == jax.jvp of the XLA structured model."""
    model = StructuredHyperelasticModel(
        cells=cells,
        spacing=0.25,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=MU, lam=LAM),
        dtype=jnp.float32,
    )
    u = jnp.asarray(rng.uniform(-0.02, 0.02, size=model.num_dofs), jnp.float32)
    v = jnp.asarray(rng.standard_normal(model.num_dofs), jnp.float32)
    _, hv_ref = jax.jvp(model.internal_forces, (u,), (v,))
    hv_ref = np.asarray(hv_ref)

    def to_grid(x):
        return jnp.asarray(
            np.moveaxis(np.asarray(x).reshape(model.node_shape + (3,)), -1, 0)
        )

    hv_k = SS.neo_hookean_hvp_pallas(to_grid(u), to_grid(v), 0.25, MU, LAM, KZ=KZ)
    hv_k_flat = np.moveaxis(np.asarray(hv_k), 0, -1).reshape(-1)
    rel = np.abs(hv_k_flat - hv_ref).max() / np.abs(hv_ref).max()
    assert rel < 1e-5, rel
