"""Benchmark: matrix-free Neo-Hookean Hessian-action throughput on TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

Headline: elements/second of the Hessian-vector product (the Newton-Krylov
workhorse; one hvp ≡ one CG iteration's operator application) for a
~1M-element Neo-Hookean hex model on the structured stencil path.

Measurement methodology (IMPORTANT, see CLAUDE.md): on this platform
``block_until_ready`` does not wait for device execution, so timings chain
N data-dependent executions inside one jitted ``lax.fori_loop``, read back
a scalar, and subtract the empty-call round-trip.

``vs_baseline``: speedup over the *direct translation* of the reference's
design (per-element gather + scatter assembly, measured at 1.3M elements/s
on this chip in round 1) — i.e. how much the TPU-native formulation buys
over porting the reference's architecture.  The reference itself publishes
no performance numbers (BASELINE.md).
"""

from __future__ import annotations

import json
import time

import numpy as np

GATHER_PATH_ANCHOR_ELPS = 1.3e6  # measured unstructured-path hvp, round 1


def device_loop_time(step, x0, iters: int, reps: int = 3) -> float:
    import jax
    import jax.numpy as jnp

    run = jax.jit(lambda x: jax.lax.fori_loop(0, iters, lambda i, xx: step(xx), x))
    out = run(x0)
    _ = float(jnp.asarray(out).ravel()[0])  # warm + true sync
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    empty = jax.jit(lambda x: x)
    _ = float(jnp.asarray(empty(x0)).ravel()[0])
    t0 = time.perf_counter()
    _ = float(jnp.asarray(empty(x0)).ravel()[0])
    rtt = time.perf_counter() - t0
    return max((best - rtt) / iters, 1e-9)


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.structured import StructuredHyperelasticModel

    # x-extent 127 cells -> 128 node lanes (exact tile fit)
    cells = (127, 101, 79)
    E = int(np.prod(cells))
    model = StructuredHyperelasticModel(
        cells=cells,
        spacing=1.0 / 127,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
        body_force=np.array([0.0, 0.0, -2.0]),
    )
    u0 = jnp.zeros(model.num_dofs, jnp.float32)

    def hvp_step(v):
        hv = model.hessian_vector_product(u0, v)
        return v + 1e-12 * hv

    dt_hvp = device_loop_time(hvp_step, jnp.ones(model.num_dofs, jnp.float32), 10)

    def res_step(u):
        return u + 1e-12 * model.residual(u)

    dt_res = device_loop_time(res_step, u0, 10)

    # secondary: unstructured banded-kernel path (ops/banded + local_em)
    unstructured = None
    try:
        from fenris_tpu.elasticity import HyperelasticModel
        from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d

        umesh = create_unit_box_uniform_hex_mesh_3d(63)
        umodel = HyperelasticModel(
            mesh=umesh,
            material=NeoHookeanMaterial(),
            params=LameParameters(mu=384.614, lam=576.923),
            body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0]),
            banded=True,
        )
        uu0 = jnp.zeros(umodel.space.num_dofs, jnp.float32)

        # closure-captured model arrays are safe here: the banded TPU path
        # feeds them to Pallas kernels, not to XLA gathers (the CLAUDE.md
        # closure-constant slow path applies to the XLA fallback only,
        # which is unreachable on the f32 TPU measurement path)
        def u_hvp_step(v):
            return v + 1e-12 * umodel.hessian_vector_product(uu0, v)

        dt_u = device_loop_time(
            u_hvp_step, jnp.ones(umodel.space.num_dofs, jnp.float32), 4
        )
        unstructured = {
            "elements": umodel.mesh.num_cells,
            "hvp_ms": round(dt_u * 1e3, 3),
            "elements_per_sec": round(umodel.mesh.num_cells / dt_u, 1),
            "vs_gather_path": round(umodel.mesh.num_cells / dt_u / GATHER_PATH_ANCHOR_ELPS, 2),
        }
    except Exception as e:  # never let the secondary metric break the bench
        unstructured = {"error": f"{type(e).__name__}: {e}"}

    elps = E / dt_hvp
    print(
        json.dumps(
            {
                "metric": "neo_hookean_hvp_throughput_1M_elements",
                "value": round(elps, 1),
                "unit": "elements/sec",
                "vs_baseline": round(elps / GATHER_PATH_ANCHOR_ELPS, 2),
                "detail": {
                    "elements": E,
                    "dofs": model.num_dofs,
                    "hvp_ms": round(dt_hvp * 1e3, 3),
                    "residual_ms": round(dt_res * 1e3, 3),
                    "residual_elements_per_sec": round(E / dt_res, 1),
                    "unstructured_banded": unstructured,
                    "baseline": "unstructured per-element gather/scatter path (reference-design translation), 1.3M el/s on this chip",
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
