"""Structured stencil-path vs unstructured model agreement tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.elasticity import HyperelasticModel
from fenris_tpu.mesh import procedural
from fenris_tpu.optimize import NEWTON_CONVERGED
from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
from fenris_tpu.structured import StructuredHyperelasticModel

PARAMS = LameParameters(mu=384.614, lam=576.923)
CELLS = (3, 2, 2)
H = 0.5


def _mesh():
    return procedural.create_rectangular_uniform_hex_mesh(H, *CELLS, 1)


def _models():
    mesh = _mesh()
    fixed_nodes = np.flatnonzero(np.abs(mesh.points[:, 2]) < 1e-12)
    mask = np.zeros(mesh.num_vertices * 3, dtype=bool)
    for i in range(3):
        mask[fixed_nodes * 3 + i] = True
    body = np.array([0.0, 0.0, -3.0])
    unstructured = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_nodes=fixed_nodes,
        body_force=lambda x, p: jnp.asarray(body, dtype=x.dtype),
        dtype=jnp.float64,
    )
    structured = StructuredHyperelasticModel(
        cells=CELLS,
        spacing=H,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_mask=mask,
        body_force=body,
        dtype=jnp.float64,
    )
    return unstructured, structured


def test_node_ordering_matches():
    mesh = _mesh()
    s = StructuredHyperelasticModel(
        cells=CELLS, spacing=H, material=NeoHookeanMaterial(), params=PARAMS
    )
    assert s.num_nodes == mesh.num_vertices
    # grid reshape (z, y, x) matches the procedural mesh node order
    pts = mesh.points.reshape(s.node_shape + (3,))
    assert np.allclose(pts[0, 0, 1], [H, 0, 0])
    assert np.allclose(pts[1, 0, 0], [0, 0, H])


def test_internal_forces_match(rng):
    un, st = _models()
    u = jnp.asarray(rng.uniform(-0.02, 0.02, size=st.num_dofs))
    f_un = np.asarray(un.internal_forces(u))
    f_st = np.asarray(st.internal_forces(u))
    assert np.abs(f_un - f_st).max() < 1e-11


def test_residual_hvp_energy_diag_match(rng):
    un, st = _models()
    u = jnp.asarray(rng.uniform(-0.02, 0.02, size=st.num_dofs)) * st.free_mask
    v = jnp.asarray(rng.standard_normal(st.num_dofs))
    assert np.abs(np.asarray(un.residual(u)) - np.asarray(st.residual(u))).max() < 1e-11
    assert (
        np.abs(
            np.asarray(un.hessian_vector_product(u, v))
            - np.asarray(st.hessian_vector_product(u, v))
        ).max()
        < 1e-10
    )
    assert abs(float(un.energy(u)) - float(st.energy(u))) < 1e-10
    assert (
        np.abs(
            np.asarray(un.hessian_diagonal(u)) - np.asarray(st.hessian_diagonal(u))
        ).max()
        < 1e-10
    )


def test_structured_solve_matches_unstructured():
    un, st = _models()
    r_un = un.solve(tolerance=1e-9)
    r_st = st.solve(tolerance=1e-9, cg_rel_tolerance=1e-8)
    assert int(r_st.status) == NEWTON_CONVERGED
    assert np.abs(np.asarray(r_un.x) - np.asarray(r_st.x)).max() < 1e-6


def test_external_forces_match():
    un, st = _models()
    assert np.abs(np.asarray(un._f_ext) - np.asarray(st._f_ext)).max() < 1e-11


def test_chunked_sweeps_match_single(rng):
    """z-chunked internal forces / diagonal equal the single-sweep path."""
    kwargs = dict(
        spacing=0.3,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        body_force=np.array([0.0, 0.0, -3.0]),
        dtype=jnp.float64,
    )
    single = StructuredHyperelasticModel(cells=(4, 3, 7), z_chunk_planes=0, **kwargs)
    chunked = StructuredHyperelasticModel(cells=(4, 3, 7), z_chunk_planes=2, **kwargs)
    u = jnp.asarray(rng.uniform(-0.02, 0.02, size=single.num_dofs))
    assert (
        np.abs(
            np.asarray(single.internal_forces(u)) - np.asarray(chunked.internal_forces(u))
        ).max()
        < 1e-12
    )
    assert (
        np.abs(
            np.asarray(single.hessian_diagonal(u)) - np.asarray(chunked.hessian_diagonal(u))
        ).max()
        < 1e-12
    )
    v = jnp.asarray(rng.standard_normal(single.num_dofs))
    assert (
        np.abs(
            np.asarray(single.hessian_vector_product(u, v))
            - np.asarray(chunked.hessian_vector_product(u, v))
        ).max()
        < 1e-11
    )
    # energy (incl. a slab width that needs z padding) + grad-through
    chunked4 = StructuredHyperelasticModel(cells=(4, 3, 7), z_chunk_planes=4, **kwargs)
    e0 = float(single.energy(u))
    assert abs(float(chunked.energy(u)) - e0) < 1e-13 * max(abs(e0), 1.0)
    assert abs(float(chunked4.energy(u)) - e0) < 1e-13 * max(abs(e0), 1.0)
    g0 = np.asarray(jax.grad(single.energy)(u))
    g2 = np.asarray(jax.grad(chunked.energy)(u))
    assert np.abs(g0 - g2).max() < 1e-12


def test_solve_mixed_precision_reaches_f64_accuracy():
    """f64-outer/f32-inner Newton converges far past the f32 floor."""
    cells = (4, 4, 6)
    ncx, ncy, ncz = cells
    nodes = (ncz + 1) * (ncy + 1) * (ncx + 1)
    mask = np.zeros(nodes * 3, dtype=bool)
    mask[: (ncy + 1) * (ncx + 1) * 3] = True
    kwargs = dict(
        cells=cells,
        spacing=0.25,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_mask=mask,
        body_force=np.array([0.0, 0.0, -5.0]),
    )
    m32 = StructuredHyperelasticModel(dtype=jnp.float32, **kwargs)
    m64 = StructuredHyperelasticModel(dtype=jnp.float64, **kwargs)
    res = m32.solve_mixed(tolerance=1e-11, preconditioner="jacobi")
    assert int(res.status) == NEWTON_CONVERGED
    assert res.x.dtype == jnp.float64
    f0 = float(jnp.linalg.norm(m64.residual(jnp.zeros(m64.num_dofs))))
    rel = float(jnp.linalg.norm(m64.residual(res.x))) / f0
    assert rel < 1e-10  # far below the ~1e-6 pure-f32 floor
    # agrees with the all-f64 solve
    ref = m64.solve(tolerance=1e-12 * f0, cg_rel_tolerance=1e-10)
    assert np.abs(np.asarray(ref.x) - np.asarray(res.x)).max() < 1e-8


def test_solve_mixed_mg_accuracy_16cubed():
    """Mixed-precision + MG at the largest CPU-checkable size: the f64
    oracle residual of the returned solution must be < 1e-10 relative
    (the identical algorithm runs the 10M-dof artifact, tools/solve_10m.py)."""
    c = 16
    nodes = (c + 1) ** 3
    mask = np.zeros(nodes * 3, dtype=bool)
    mask[: (c + 1) ** 2 * 3] = True
    kwargs = dict(
        cells=(c, c, c),
        spacing=1.0 / c,
        material=NeoHookeanMaterial(),
        params=PARAMS,
        dirichlet_mask=mask,
        body_force=np.array([0.0, 0.0, -4.0]),
    )
    m32 = StructuredHyperelasticModel(dtype=jnp.float32, **kwargs)
    res = m32.solve_mixed(tolerance=1e-10, preconditioner="mg")
    assert int(res.status) == NEWTON_CONVERGED
    m64 = StructuredHyperelasticModel(dtype=jnp.float64, **kwargs)
    r0 = float(jnp.linalg.norm(m64.residual(jnp.zeros(m64.num_dofs))))
    rel = float(jnp.linalg.norm(m64.residual(res.x))) / r0
    assert rel < 1e-10, rel


def test_pallas_f64_raises_instead_of_downcasting():
    """pallas=True on an f64 model must raise loudly — the stencil kernels
    compute in f32 and a silent downcast would corrupt solve_mixed's f64
    outer residual."""
    import pytest

    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    m = StructuredHyperelasticModel(
        cells=(4, 4, 4),
        spacing=0.25,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        dtype=jnp.float64,
        pallas=True,
    )
    with pytest.raises(NotImplementedError, match="f32-only"):
        m.residual(jnp.zeros(m.num_dofs))
