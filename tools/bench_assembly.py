#!/usr/bin/env python
"""Assembly benchmarks mirroring the reference's criterion suite.

The reference defines (but publishes no numbers for) four benchmark
families over Tet4 unit-box meshes at res 5/10/20
(/root/reference/benches/assembly.rs:126-241):

  1. serial CSR numeric assembly, Poisson (Laplace) stiffness
  2. sparsity-pattern (symbolic) assembly, same meshes
  3. parallel pattern assembly (rayon + coloring)  -> here: same native
     builder (the TPU design needs no coloring; symbolic assembly is a
     host-side sort either way)
  4. pattern assembly, 3D linear elasticity (vector-valued)

This script runs the same cases on the current backend and prints one
JSON line per case.  Device numeric assembly uses the deterministic
segment-sum scatter; timings use chained device loops (see bench.py).

Usage: python tools/bench_assembly.py [--cpu]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main() -> None:
    import jax

    if "--cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from fenris_tpu.assembly import global_ as G
    from fenris_tpu.assembly import local as L
    from fenris_tpu.fem import FemSpace
    from fenris_tpu.mesh.procedural import create_rectangular_uniform_tet_mesh
    from fenris_tpu.operators import LaplaceOperator
    from fenris_tpu.quadrature.canonical import canonical_stiffness
    from fenris_tpu.solid import (
        LameParameters,
        LinearElasticMaterial,
        MaterialEllipticOperator,
    )

    def device_time(fn, *args, reps=3):
        out = fn(*args)
        jax.tree_util.tree_map(
            lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x,
            out,
        )
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
        best = np.inf
        for _i in range(reps):
            t0 = time.perf_counter()
            out = fn(*args)
            _ = np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:1]
            best = min(best, time.perf_counter() - t0)
        return best

    for res in (5, 10, 20):
        # assembly.rs:129 create_unit_box_uniform_tet_mesh_3d(res)
        mesh = create_rectangular_uniform_tet_mesh(1.0, 1, 1, 1, res)
        cells = np.asarray(mesh.cells)
        E = mesh.num_cells

        # 2/3. symbolic (pattern) assembly, scalar
        t0 = time.perf_counter()
        pat = G.csr_pattern(cells, mesh.num_vertices, 1)
        t_pat = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "case": "pattern_poisson_tet4",
                    "res": res,
                    "elements": E,
                    "nnz": pat.nnz,
                    "seconds": round(t_pat, 4),
                }
            ),
            flush=True,
        )

        # 1. numeric CSR assembly, Laplace stiffness
        space = FemSpace.create(mesh)
        object.__setattr__(space, "_pattern", pat)
        op = LaplaceOperator()
        tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
        u0 = jnp.zeros((E, mesh.element.num_nodes, 1), space.X_geo.dtype)

        def assemble(Xg):
            A_el = L.assemble_element_elliptic_matrices(Xg, u0, op, None, tab)
            return G.assemble_csr(A_el, pat)

        dt = device_time(jax.jit(assemble), space.X_geo)
        print(
            json.dumps(
                {
                    "case": "csr_numeric_poisson_tet4",
                    "res": res,
                    "elements": E,
                    "seconds": round(dt, 5),
                    "elements_per_sec": round(E / dt, 1),
                }
            ),
            flush=True,
        )

        # 4. pattern assembly, 3D linear elasticity (vector-valued)
        t0 = time.perf_counter()
        pat3 = G.csr_pattern(cells, mesh.num_vertices, 3)
        t_pat3 = time.perf_counter() - t0
        print(
            json.dumps(
                {
                    "case": "pattern_elasticity_tet4",
                    "res": res,
                    "elements": E,
                    "nnz": pat3.nnz,
                    "seconds": round(t_pat3, 4),
                }
            ),
            flush=True,
        )

        # numeric elasticity stiffness (beyond the reference's benches:
        # it only defines the pattern case for elasticity)
        mop = MaterialEllipticOperator(LinearElasticMaterial(), dim=3)
        params = LameParameters(mu=384.0, lam=577.0)
        u3 = jnp.zeros((E, mesh.element.num_nodes, 3), space.X_geo.dtype)

        def assemble3(Xg):
            A_el = L.assemble_element_elliptic_matrices(Xg, u3, mop, params, tab)
            return G.assemble_csr(A_el, pat3)

        dt = device_time(jax.jit(assemble3), space.X_geo)
        print(
            json.dumps(
                {
                    "case": "csr_numeric_elasticity_tet4",
                    "res": res,
                    "elements": E,
                    "seconds": round(dt, 5),
                    "elements_per_sec": round(E / dt, 1),
                }
            ),
            flush=True,
        )


def element_stiffness_rates() -> None:
    """BASELINE.json north-star: element stiffness assemblies/sec, Hex20/Tet10.

    Measures the batched element-matrix kernel (pre-scatter): [E, nd, nd]
    elasticity stiffness blocks per second.
    """
    import jax
    import jax.numpy as jnp

    from fenris_tpu.assembly import local as L
    from fenris_tpu.fem import FemSpace
    from fenris_tpu.mesh.convert import convert_mesh
    from fenris_tpu.mesh.procedural import (
        create_rectangular_uniform_tet_mesh,
        create_unit_box_uniform_hex_mesh_3d,
    )
    from fenris_tpu.quadrature.canonical import canonical_stiffness
    from fenris_tpu.solid import (
        LameParameters,
        LinearElasticMaterial,
        MaterialEllipticOperator,
    )

    import time as _t

    cases = [
        ("hex20", convert_mesh(create_unit_box_uniform_hex_mesh_3d(28), "hex20")),
        ("tet10", convert_mesh(
            create_rectangular_uniform_tet_mesh(1.0, 1, 1, 1, 18), "tet10"
        )),
    ]
    mop = MaterialEllipticOperator(LinearElasticMaterial(), dim=3)
    params = LameParameters(mu=384.0, lam=577.0)
    for name, mesh in cases:
        space = FemSpace.create(mesh)
        tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
        E = mesh.num_cells
        u0 = jnp.zeros((E, mesh.element.num_nodes, 3), space.X_geo.dtype)

        fn = jax.jit(
            lambda Xg, u0=u0: L.assemble_element_elliptic_matrices(
                Xg, u0, mop, params, tab
            )
        )
        out = fn(space.X_geo)
        _ = np.asarray(out).ravel()[:1]
        best = np.inf
        for _i in range(3):
            t0 = _t.perf_counter()
            out = fn(space.X_geo)
            _ = np.asarray(out).ravel()[:1]
            best = min(best, _t.perf_counter() - t0)
        print(
            json.dumps(
                {
                    "case": f"element_stiffness_{name}_elasticity",
                    "elements": E,
                    "local_matrix": f"{u0.shape[1]*3}x{u0.shape[1]*3}",
                    "seconds": round(best, 5),
                    "assemblies_per_sec": round(E / best, 1),
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
    element_stiffness_rates()
