#!/usr/bin/env python
"""Measure the fused Pallas element kernels vs the XLA element-minor sweep.

The unstructured banded path (ops/banded.py gather/scatter +
assembly/local_em.py sweeps) can run its element math either as the
scanned XLA element-minor sweep (default) or inside the fused Pallas
kernels (ops/em_sweep.py, ``HyperelasticModel(fused_kernels=True)``).
This tool measures both on the real TPU at the bench resolution and
writes artifacts/fused_kernels_r2.json.

Compile note: the fused kernels are Mosaic-compile-expensive cold
(~tens of minutes per kernel body); /tmp/jaxcache makes reruns instant.

Usage: python tools/bench_fused.py [res=63]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from bench import device_loop_time
    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    res = int(sys.argv[1]) if len(sys.argv) > 1 else 63
    mesh = create_unit_box_uniform_hex_mesh_3d(res)
    E = mesh.num_cells
    out = {"device": str(jax.devices()[0]), "elements": int(E), "paths": {}}

    for name, fused in (("xla_sweep", False), ("fused_pallas", True)):
        t_build = time.perf_counter()
        model = HyperelasticModel(
            mesh=mesh,
            material=NeoHookeanMaterial(),
            params=LameParameters(mu=384.614, lam=576.923),
            body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0], dtype=x.dtype),
            banded=True,
            fused_kernels=fused,
        )
        u0 = jnp.zeros(model.space.num_dofs, jnp.float32)
        v0 = jnp.ones(model.space.num_dofs, jnp.float32)
        if fused and not model._fused_active():
            out["paths"][name] = {"error": "fused path not active on this backend"}
            continue

        def res_step(u, model=model):
            return u + 1e-12 * model.residual(u)

        def hvp_step(v, model=model, u0=u0):
            return v + 1e-12 * model.hessian_vector_product(u0, v)

        print(f"[{name}] compiling + measuring residual", flush=True)
        dt_res = device_loop_time(res_step, u0, 4)
        print(f"[{name}] residual {dt_res*1e3:.2f} ms; hvp", flush=True)
        dt_hvp = device_loop_time(hvp_step, v0, 4)
        print(f"[{name}] hvp {dt_hvp*1e3:.2f} ms", flush=True)
        out["paths"][name] = {
            "residual_ms": round(dt_res * 1e3, 3),
            "residual_elements_per_sec": round(E / dt_res, 1),
            "hvp_ms": round(dt_hvp * 1e3, 3),
            "hvp_elements_per_sec": round(E / dt_hvp, 1),
            "build_plus_compile_s": round(time.perf_counter() - t_build, 1),
        }

    a, b = out["paths"].get("xla_sweep"), out["paths"].get("fused_pallas")
    if a and b and "hvp_ms" in a and "hvp_ms" in b:
        out["fused_speedup_hvp"] = round(a["hvp_ms"] / b["hvp_ms"], 2)
        out["fused_speedup_residual"] = round(a["residual_ms"] / b["residual_ms"], 2)

        # agreement check: fused vs XLA on the same state (f32 roundoff)
        m_x = HyperelasticModel(
            mesh=mesh, material=NeoHookeanMaterial(),
            params=LameParameters(mu=384.614, lam=576.923),
            body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0], dtype=x.dtype),
            banded=True, fused_kernels=False)
        m_f = HyperelasticModel(
            mesh=mesh, material=NeoHookeanMaterial(),
            params=LameParameters(mu=384.614, lam=576.923),
            body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0], dtype=x.dtype),
            banded=True, fused_kernels=True)
        rng = np.random.default_rng(0)
        u = jnp.asarray(
            0.01 * rng.standard_normal(m_x.space.num_dofs), jnp.float32)
        v = jnp.asarray(rng.standard_normal(m_x.space.num_dofs), jnp.float32)
        rx, rf = m_x.residual(u), m_f.residual(u)
        hx, hf = m_x.hessian_vector_product(u, v), m_f.hessian_vector_product(u, v)
        out["agreement"] = {
            "residual_rel_err": float(
                jnp.linalg.norm(rx - rf) / jnp.linalg.norm(rx)),
            "hvp_rel_err": float(jnp.linalg.norm(hx - hf) / jnp.linalg.norm(hx)),
        }

    path = Path(__file__).resolve().parent.parent / "artifacts" / "fused_kernels_r2.json"
    path.write_text(json.dumps(out, indent=1))
    print(json.dumps(out))
    print("wrote", path, flush=True)


if __name__ == "__main__":
    main()
