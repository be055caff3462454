#!/usr/bin/env python
"""Large unstructured-path Newton solve on the assembled block-DIA operator.

Evidence for the round-3 assembled-operator path at scale: a ~1M-element
hex mesh driven through the fully unstructured code path (cells array +
direct element->band assembly, sparse/block_dia.py — no structured-grid
shortcuts), solved with mixed-precision Newton (f64 outer residual / f32
inner CG on the streaming band SpMV).  The final residual is re-verified
in f64 on the host-independent path, and per-iteration telemetry is
recorded.

Writes artifacts/assembled_solve_r5.json.

Usage:  python tools/solve_assembled.py [res (default 149)] [tolerance (default 1e-10)]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import os

    import jax

    if os.environ.get("FENRIS_TPU_FORCE_CPU"):
        # JAX_PLATFORMS is overridden by the axon plugin (CLAUDE.md)
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    jax.config.update("jax_enable_x64", True)  # f64 outer residual
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 149
    tol = float(sys.argv[2]) if len(sys.argv) > 2 else 1e-10
    t_start = time.perf_counter()

    def log(msg):
        print(f"[+{time.perf_counter() - t_start:.0f}s] {msg}", flush=True)

    mesh = create_unit_box_uniform_hex_mesh_3d(res)
    fixed = np.flatnonzero(np.asarray(mesh.points)[:, 2] < 1e-12)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -4.0], dtype=x.dtype),
        dtype=jnp.float32,
        # match the streaming-assembly chunk cap so _chunked() is the
        # streaming chunking (no duplicate padded copies; see
        # HyperelasticModel._dia_stream_chunks)
        chunk_size=65536,
    )
    plan = model.block_dia_plan()
    log(
        f"{mesh.num_cells} elements, {model.space.num_dofs} dofs; "
        f"plan D={plan.num_diagonals} rem_k={plan.rem_k} fill={plan.fill:.3f}"
    )

    t0 = time.perf_counter()
    result = model.solve_mixed(
        tolerance=tol,
        cg_rel_tolerance=1e-4,
        max_newton_iterations=30,
        assembled=True,
        verbose=True,
    )
    wall = time.perf_counter() - t0
    rn = float(result.residual_norm)
    log(f"solve_mixed done: {int(result.iterations)} Newton its, "
        f"residual {rn:.3e}, {wall:.0f}s")

    # independent f64 residual check: evaluate the residual at the solution
    # in f64 on a fresh f64 model (no solver state shared)
    model64 = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -4.0], dtype=x.dtype),
        dtype=jnp.float64,
        chunk_size=8192,
    )
    x64 = jnp.asarray(np.asarray(result.x), jnp.float64)
    true_r = float(jnp.linalg.norm(model64.residual(x64)))
    r0 = float(
        jnp.linalg.norm(model64.residual(jnp.zeros_like(x64)))
    )
    log(f"true f64 residual: {true_r:.3e} (r0 {r0:.3e}, rel {true_r/r0:.3e})")

    out = {
        "device": str(jax.devices()[0]),
        "elements": int(mesh.num_cells),
        "dofs": int(model.space.num_dofs),
        "diagonals": plan.num_diagonals,
        "path": "unstructured assembled block-DIA (solve_mixed(assembled=True))",
        "tolerance": tol,
        "newton_iterations": int(result.iterations),
        "status": int(result.status),
        "wall_seconds": round(wall, 1),
        "reported_residual": rn,
        "true_f64_residual": true_r,
        "initial_residual": r0,
        "true_rel_residual": true_r / r0,
        "tip_uz_min": float(np.asarray(result.x).reshape(-1, 3)[:, 2].min()),
    }
    path = Path(__file__).resolve().parent.parent / "artifacts" / "assembled_solve_r5.json"
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out), flush=True)
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
