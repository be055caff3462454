#!/usr/bin/env python
"""KZ (z-slab depth) sweep for the structured stencil kernels.

The fused z-slab kernels recompute one shared cell plane per slab
(1/KZ compute overhead); deeper slabs amortize it but raise VMEM
pressure.  Measures residual + hvp throughput at the bench shape for a
ladder of KZ values on the real TPU.

Usage: python tools/bench_kz.py [kz ...]
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")
    import jax.numpy as jnp

    from bench import device_loop_time
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.structured import StructuredHyperelasticModel

    kzs = [int(a) for a in sys.argv[1:]] or [4, 8, 16]
    cells = (127, 101, 79)
    E = int(np.prod(cells))
    out = {"device": str(jax.devices()[0]), "elements": E, "cases": []}
    for kz in kzs:
        model = StructuredHyperelasticModel(
            cells=cells,
            spacing=1.0 / 127,
            material=NeoHookeanMaterial(),
            params=LameParameters(mu=384.614, lam=576.923),
            body_force=np.array([0.0, 0.0, -2.0]),
            pallas_kz=kz,
        )
        u0 = jnp.zeros(model.num_dofs, jnp.float32)

        def res_step(u, model=model):
            return u + 1e-12 * model.residual(u)

        def hvp_step(v, model=model, u0=u0):
            return v + 1e-12 * model.hessian_vector_product(u0, v)

        print(f"[kz={kz}] compiling/measuring", flush=True)
        try:
            dt_res = device_loop_time(res_step, u0, 10)
            dt_hvp = device_loop_time(hvp_step, jnp.ones_like(u0), 10)
        except Exception as e:
            out["cases"].append({"kz": kz, "error": f"{type(e).__name__}: {e}"})
            print(f"[kz={kz}] failed: {e}", flush=True)
            continue
        case = {
            "kz": kz,
            "residual_ms": round(dt_res * 1e3, 3),
            "residual_elements_per_sec": round(E / dt_res, 1),
            "hvp_ms": round(dt_hvp * 1e3, 3),
            "hvp_elements_per_sec": round(E / dt_hvp, 1),
        }
        print(json.dumps(case), flush=True)
        out["cases"].append(case)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
