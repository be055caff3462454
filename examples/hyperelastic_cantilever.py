"""3D Neo-Hookean cantilever under gravity (the flagship nonlinear solve).

A 2x1x1 hex beam clamped at x = 0, loaded by gravity, solved with the
matrix-free Newton-Krylov stack (exact Hessian actions via jax.jvp,
Jacobi-preconditioned CG, Armijo line search) and exported to VTU.

Run:  python examples/hyperelastic_cantilever.py [resolution]
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp
import numpy as np

import fenris_tpu as ft
from fenris_tpu.elasticity import HyperelasticModel
from fenris_tpu.solid import NeoHookeanMaterial, lame_from_young_poisson


def main(resolution: int = 8, banded: bool = False) -> None:
    mesh = ft.mesh.procedural.create_rectangular_uniform_hex_mesh(
        1.0, 2, 1, 1, resolution
    )
    clamped = np.flatnonzero(np.abs(mesh.points[:, 0]) < 1e-12)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=lame_from_young_poisson(young=5e3, poisson=0.4),
        dirichlet_nodes=clamped,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -100.0], dtype=x.dtype),
        # --banded routes sweeps through the MXU one-hot gather/scatter
        # kernels + element-minor assembly (the large-mesh TPU fast path)
        banded=banded,
    )
    print(f"cells: {mesh.num_cells}, dofs: {model.space.num_dofs}")

    # f32 speed mode: target a relative residual reduction that sits above
    # the eps*kappa attainable-accuracy floor (see config.MATMUL_PRECISION);
    # for f64-grade accuracy use FENRIS_TPU_X64=1 / solve_mixed instead.
    f0 = float(jnp.linalg.norm(model.residual(jnp.zeros(model.space.num_dofs))))
    t0 = time.time()
    res = model.solve(tolerance=1e-4 * f0, max_newton_iterations=40)
    print(
        f"Newton: {int(res.iterations)} iterations, status {int(res.status)}, "
        f"residual {float(res.residual_norm):.3e}, {time.time() - t0:.1f}s"
    )
    u = np.asarray(res.x).reshape(-1, 3)
    tip = np.argmax(mesh.points[:, 0])
    print(f"tip deflection: {u[tip]}")

    deformed = mesh.transform_points(lambda p: p + u)
    out = Path("data/examples")
    (
        ft.io.FiniteElementMeshDataSetBuilder.from_mesh(deformed)
        .with_title("Neo-Hookean cantilever")
        .with_point_vector_attributes("displacement", u)
        .try_export(out / "cantilever.vtu")
    )
    print(f"wrote {out / 'cantilever.vtu'}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 8, banded="--banded" in sys.argv)
