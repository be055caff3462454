"""Checkpoint/resume round-trip tests."""

import numpy as np

from fenris_tpu.io.checkpoint import load_checkpoint, load_mesh, save_checkpoint
from fenris_tpu.mesh import convert, procedural


def test_checkpoint_roundtrip(tmp_path, rng):
    mesh = convert.convert_mesh(procedural.create_unit_box_uniform_tet_mesh_3d(2), "tet10")
    u = rng.standard_normal(mesh.num_vertices * 3)
    path = tmp_path / "state.npz"
    save_checkpoint(path, mesh=mesh, u=u, newton_iter=np.asarray(7))
    mesh2, state = load_checkpoint(path)
    assert mesh2.element.name == "tet10"
    assert np.array_equal(mesh2.cells, mesh.cells)
    assert np.allclose(mesh2.points, mesh.points)
    assert np.allclose(state["u"], u)
    assert int(state["newton_iter"]) == 7


def test_resume_solve_from_checkpoint(tmp_path):
    """A solve warm-started from a checkpointed solution converges instantly."""
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.optimize import NEWTON_CONVERGED
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    fixed = np.flatnonzero(np.abs(mesh.points[:, 2]) < 1e-12)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=100.0, lam=200.0),
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -5.0], dtype=x.dtype),
    )
    res = model.solve(tolerance=1e-9)
    path = tmp_path / "solve.npz"
    save_checkpoint(path, mesh=mesh, u=np.asarray(res.x))
    _, state = load_checkpoint(path)
    res2 = model.solve(u0=jnp.asarray(state["u"]), tolerance=1e-9)
    assert int(res2.status) == NEWTON_CONVERGED
    assert int(res2.iterations) == 0
