"""2D Poisson with bilinear quadrilaterals on the unit square.

Mirror of the reference's examples/poisson2d.rs: manufactured solution
u = sin(pi x) sin(pi y), homogeneous Dirichlet boundary, Jacobi-CG solve,
VTU export of the approximate and exact solutions.

Run:  python examples/poisson2d.py [resolution] [--matrix-free]
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import jax.numpy as jnp
import numpy as np

import fenris_tpu as ft

PI = np.pi


def main(resolution: int = 50, matrix_free: bool = False) -> None:
    mesh = ft.mesh.procedural.create_unit_square_uniform_quad_mesh_2d(resolution)
    dirichlet = np.flatnonzero(np.abs(mesh.points - 0.5).max(axis=1) > 0.4999)

    # --matrix-free: CG on the banded operator action; no symbolic
    # assembly, no CSR (fem.solve_poisson_matrix_free)
    solver = ft.fem.solve_poisson_matrix_free if matrix_free else ft.fem.solve_poisson
    result = solver(
        mesh,
        rule=ft.quadrature.quadrilateral_gauss(2),
        error_rule=ft.quadrature.quadrilateral_gauss(6),
        source=lambda x, p: 2.0 * PI * PI * jnp.sin(PI * x[0]) * jnp.sin(PI * x[1]),
        u_exact=lambda x: jnp.sin(PI * x[0]) * jnp.sin(PI * x[1]),
        u_exact_grad=lambda x: PI
        * jnp.array(
            [
                jnp.cos(PI * x[0]) * jnp.sin(PI * x[1]),
                jnp.sin(PI * x[0]) * jnp.cos(PI * x[1]),
            ]
        ),
        dirichlet_nodes=dirichlet,
    )

    print(f"dofs:          {mesh.num_vertices}")
    print(f"CG iterations: {result.cg_iterations}")
    print(f"L2 error:      {result.l2_error:.6e}")
    print(f"H1 error:      {result.h1_seminorm_error:.6e}")

    out = Path("data/examples")
    u_exact = np.sin(PI * mesh.points[:, 0]) * np.sin(PI * mesh.points[:, 1])
    (
        ft.io.FiniteElementMeshDataSetBuilder.from_mesh(mesh)
        .with_title("Poisson 2D FEM")
        .with_point_scalar_attributes("u_h", np.asarray(result.u))
        .with_point_scalar_attributes("u_exact", u_exact)
        .try_export(out / "poisson2d.vtu")
    )
    print(f"wrote {out / 'poisson2d.vtu'}")


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    main(int(args[0]) if args else 50, matrix_free="--matrix-free" in sys.argv)
