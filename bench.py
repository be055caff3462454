"""Benchmark: batched element stiffness assembly throughput on TPU.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

The headline metric (BASELINE.json) is batched Hex20 stiffness assembly
throughput.  The reference publishes no absolute numbers (its criterion
benches are compile-and-run-only, see BASELINE.md), so ``vs_baseline``
reports the achieved fraction of the MXU compute roofline divided by the
0.8 target fraction: vs_baseline >= 1.0 means the >=80%-of-roofline
target is met.

Run on the real chip (ambient JAX platform); f32.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _flops_per_element(n: int, q: int, d: int, s: int) -> float:
    """Approximate useful FLOPs per element for the elliptic stiffness kernel.

    Counts the dominant dense contractions (jacobians, physical gradients,
    contraction application, quadrature reduction) — the same arithmetic
    any implementation must perform.
    """
    nd = n * s
    jac = 2.0 * q * n * d * d  # J = X^T dphi
    inv = q * (d**3 + 2 * d * d)  # closed-form inverse + det (approx)
    gp = 2.0 * q * n * d * d  # physical gradients
    # A += w * gp @ D @ gp^T per qp: for scalar Laplace D = I -> gp gp^T
    core = 2.0 * q * nd * nd * d
    return jac + inv + gp + core


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fenris_tpu import quadrature as quad
    from fenris_tpu.assembly import local as L
    from fenris_tpu.operators import LaplaceOperator
    from fenris_tpu.reference_elements import ELEMENTS

    el = ELEMENTS["hex20"]
    rule = quad.hexahedron_gauss(3)
    tab = L.tabulate(el, rule)
    op = LaplaceOperator()

    E = 16384
    rng = np.random.default_rng(0)
    # randomly perturbed unit hexes (realistic jacobian work)
    base = el.geometry.nodes[None].repeat(E, 0)
    X = base + rng.uniform(-0.1, 0.1, size=base.shape)
    X = jnp.asarray(X, dtype=jnp.float32)
    u0 = jnp.zeros((E, el.num_nodes, 1), dtype=jnp.float32)

    fn = jax.jit(
        lambda X, u: L.assemble_element_elliptic_matrices(X, u, op, None, tab)
    )
    out = fn(X, u0)
    jax.block_until_ready(out)  # compile + warm

    iters = 30
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(X, u0)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    elements_per_sec = E / dt
    flops = _flops_per_element(el.num_nodes, tab.num_points, 3, 1) * E
    achieved_tflops = flops / dt / 1e12

    # --- secondary metric: CSR SpMV bandwidth at ~1M nnz scale -------------
    from fenris_tpu.assembly import global_ as G
    from fenris_tpu.mesh import procedural

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(48)
    pat = G.csr_pattern(mesh.cells, mesh.num_vertices, 1)
    nnz, nrows = pat.nnz, pat.num_rows
    vals = jnp.asarray(rng.standard_normal(nnz), jnp.float32)
    xvec = jnp.asarray(rng.standard_normal(nrows), jnp.float32)
    rows = jnp.asarray(pat.rows_of_nnz)
    cols = jnp.asarray(pat.col_indices)

    # NOTE: index arrays must be jit *arguments* — closure constants hit a
    # pathological XLA:TPU slow path (see fenris_tpu/sparse/cg.py).
    spmv = jax.jit(
        lambda v, r, c, x: jax.ops.segment_sum(v * x[c], r, num_segments=nrows)
    )
    y = spmv(vals, rows, cols, xvec)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(50):
        y = spmv(vals, rows, cols, xvec)
    jax.block_until_ready(y)
    dt_spmv = (time.perf_counter() - t0) / 50
    spmv_gbs = (nnz * 12 + nrows * 8) / dt_spmv / 1e9

    # f32 peak estimate per chip generation (MXU); conservative v5e figure.
    dev = jax.devices()[0]
    peak_f32_tflops = {
        "TPU v5 lite": 49.2,  # v5e: 197 bf16 TFLOPs / 4
        "TPU v5": 114.5,  # v5p: 459 bf16 / 4
        "TPU v4": 68.8,
    }.get(getattr(dev, "device_kind", ""), 49.2)
    roofline_fraction = achieved_tflops / peak_f32_tflops
    vs_baseline = roofline_fraction / 0.8

    print(
        json.dumps(
            {
                "metric": "hex20_stiffness_assembly_throughput",
                "value": round(elements_per_sec, 1),
                "unit": "elements/sec",
                "vs_baseline": round(vs_baseline, 4),
                "detail": {
                    "elements": E,
                    "sec_per_batch": dt,
                    "achieved_tflops_f32": round(achieved_tflops, 3),
                    "peak_tflops_f32": peak_f32_tflops,
                    "roofline_fraction": round(roofline_fraction, 4),
                    "spmv_gbs": round(spmv_gbs, 1),
                    "spmv_nnz": nnz,
                    "device": str(dev),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
