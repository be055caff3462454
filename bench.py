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
import os
import sys
import time

import numpy as np

GATHER_PATH_ANCHOR_ELPS = 1.3e6  # measured unstructured-path hvp, round 1


def _err(e) -> str:
    """Compact error string for the JSON line; full traceback to stderr.

    BENCH_r03 embedded a multi-paragraph traceback inside the JSON line
    and blew past the driver's tail-capture window (parsed: null) — the
    printed line must stay compact no matter what fails.
    """
    import sys
    import traceback

    traceback.print_exc(file=sys.stderr)
    return f"{type(e).__name__}: {e}"[:200]


def device_loop_time(step, x0, iters: int, reps: int = 3, operands=()) -> float:
    """Best-of-reps per-iteration time of ``step`` chained ``iters`` times.

    ``operands`` (arrays ``step`` needs beyond the carried value) are passed
    as jit *arguments* and forwarded as ``step(x, *operands)`` — embedding
    index arrays as closure constants would measure the XLA:TPU
    closure-constant gather slow path (CLAUDE.md), not the kernel.
    """
    import jax
    import jax.numpy as jnp

    run = jax.jit(
        lambda x, *ops: jax.lax.fori_loop(0, iters, lambda i, xx: step(xx, *ops), x)
    )
    out = run(x0, *operands)
    _ = float(jnp.asarray(out).ravel()[0])  # warm + true sync
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        out = run(x0, *operands)
        _ = float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    empty = jax.jit(lambda x: x)
    _ = float(jnp.asarray(empty(x0)).ravel()[0])
    rtt = np.inf
    for _ in range(3):  # the tunneled round-trip is noisy; take the min
        t0 = time.perf_counter()
        _ = float(jnp.asarray(empty(x0)).ravel()[0])
        rtt = min(rtt, time.perf_counter() - t0)
    return max((best - rtt) / iters, 1e-9)


# TPU v5e public peak figures (the chip bench.py runs on); the f32 figure
# assumes Precision.HIGHEST = 6 bf16 MXU passes per f32 multiply.
V5E_HBM_GBPS = 819.0
V5E_BF16_TFLOPS = 197.0
V5E_F32_HIGHEST_TFLOPS = V5E_BF16_TFLOPS / 6.0


def stiffness_roofline(
    name: str,
    q: int,
    n: int,
    m: int,
    s: int,
    d: int,
    rate: float,
    algo_flops: float,
):
    """Roofline fractions for the element-stiffness kernel (BASELINE.md:45).

    Two bounds are reported:

    * ``ideal``: the minimal-flop association (exploits the Kronecker
      structure of B — ``flops = 2 q n d² s² + 2 q d (n s)²``) priced at
      f32-HIGHEST MXU peak.  No MXU algorithm can reach it: those
      contractions have K = d (= 3), so they run at ~d/128 MXU
      utilization; on the VPU (~8 TFLOPS f32) they are slower still.  It
      is kept as the hardware-agnostic yardstick.
    * ``algo``: the bound of the algorithm this library actually executes
      (``algo_flops`` MXU flops/element — the projector block matmuls of
      assembly/local, which trade extra flops for full MXU utilization),
      priced at f32-HIGHEST MXU peak and floored by memory.
      ``algo_fraction`` is the number the ≥80% target is judged against;
      ``roofline_fraction`` (vs ideal) is kept for honesty about the
      algorithmic overhead.

    Both are bound below by the HBM cost of reading X and writing the
    materialized element matrices: ``bytes = 4·(3 m + (n s)²)``.
    """
    bytes_el = 4.0 * (3 * m + (n * s) ** 2)
    flops_ideal = 2.0 * q * n * d * d * s * s + 2.0 * q * d * (n * s) ** 2
    t_mem = bytes_el / (V5E_HBM_GBPS * 1e9)
    t_ideal = max(t_mem, flops_ideal / (V5E_F32_HIGHEST_TFLOPS * 1e12))
    t_algo = max(t_mem, algo_flops / (V5E_F32_HIGHEST_TFLOPS * 1e12))
    return {
        "case": name,
        "assemblies_per_sec": round(rate, 1),
        "roofline_per_sec": round(1.0 / t_ideal, 1),
        "roofline_fraction": round(rate * t_ideal, 3),
        "algo_per_sec": round(1.0 / t_algo, 1),
        "algo_fraction": round(rate * t_algo, 3),
        "bound": "memory" if t_mem >= algo_flops / (V5E_F32_HIGHEST_TFLOPS * 1e12) else "compute",
        "model_bytes_per_el": int(bytes_el),
        "model_flops_per_el": int(flops_ideal),
        "algo_flops_per_el": int(algo_flops),
    }


def bench_element_stiffness_roofline():
    """Hex20/Tet10 element stiffness rates vs the v5e roofline."""
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

    cases = [
        ("hex20", convert_mesh(create_unit_box_uniform_hex_mesh_3d(28), "hex20")),
        (
            "tet10",
            convert_mesh(create_rectangular_uniform_tet_mesh(1.0, 1, 1, 1, 18), "tet10"),
        ),
    ]
    mop = MaterialEllipticOperator(LinearElasticMaterial(), dim=3)
    params = LameParameters(mu=384.0, lam=577.0)
    out = []
    for name, mesh in cases:
        space = FemSpace.create(mesh)
        tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
        E = mesh.num_cells
        n = mesh.element.num_nodes
        u0 = jnp.zeros((E, n, 3), space.X_geo.dtype)

        # The element matrices A are the LOOP CARRY, so XLA must
        # materialize the full element-matrix buffer every iteration — a
        # scalar-reduction chain would let the store fuse away and price
        # a kernel the model's (ns)^2 write term never ran (round-3
        # tet10 "roofline_fraction" 1.17 > 1).  The measured layout is
        # the component-pair form [s*s, n, n, E] — all (ns)² values,
        # exactly the model's write bytes, and the orientation the
        # block-DIA row expansion consumes in production (any
        # dof-interleaved form costs an extra (ns)²·E sublane shuffle at
        # ~25% of HBM peak and is not on the assembled solve path).
        # The tabulated projector/basis constants ride in as jit
        # arguments via hoist_closure — embedded program constants take
        # XLA:TPU's slow constant path (CLAUDE.md; measured 1.7x at
        # tet10), which solver entry points avoid the same way.
        from fenris_tpu.ops.stiffness_kernel import (
            stiffness_pairs_pallas,
            supports_stiffness_pallas,
        )
        from fenris_tpu.utils import hoist_closure

        s = d = 3
        q = tab.num_points
        use_pallas = supports_stiffness_pallas(
            mop, params, tab, E, space.X_geo.dtype
        )
        if use_pallas:
            # the fused Mosaic kernel consumes element-minor geometry
            # (same bytes as [E, m, d]; steady-state callers pre-transpose
            # once — a per-call minor-dim transpose costs ~40x its bytes)
            m_geo = space.X_geo.shape[1]
            Xop = jnp.transpose(
                jnp.asarray(space.X_geo, jnp.float32), (1, 2, 0)
            ).reshape(m_geo * 3, E)

            def asm(Xf, tab=tab):
                return stiffness_pairs_pallas(Xf, mop, params, tab)

        else:
            Xop = space.X_geo

            def asm(Xg, u0=u0, tab=tab):
                return L.assemble_element_elliptic_matrices_pairs(
                    Xg, u0, mop, params, tab, pallas=False
                )

        # enough chained iterations that round-trip jitter (several ms over
        # the tunnel) stays well under the per-iteration signal
        if use_pallas:
            # Pallas outputs are materialized unconditionally (the store
            # cannot fuse away), so a scalar-perturbation carry is honest
            # AND avoids the full [s², n², E] loop-carry copy the previous
            # harness paid (~1.2 ms/iter at hex20 28³ — a measurement
            # artifact, not kernel or store cost).  No hoist_closure here:
            # the tabulated constants feed the Mosaic kernel (not XLA
            # gathers), where embedding them is FASTER than passing args
            # (args re-DMA the (0,0)-indexed blocks per grid step;
            # measured +0.37 ms/call at hex20 28³)
            def step(Xg):
                A = asm(Xg)
                return Xg * (1.0 + 0.0 * A[0, 0, 0])

            # memory-bound cases (tet10) swing ~20% across reps over the
            # tunneled chip; best-of-6 stabilizes the reported rate
            dt = device_loop_time(step, Xop, 16, reps=6)
        else:
            conv, consts = hoist_closure(asm, Xop)
            # XLA path: the element matrices stay the LOOP CARRY so the
            # [s², n², E] store cannot fuse into the reduction
            def step(A_em, Xg, *cs):
                return conv(Xg + 1e-30 * A_em[0, 0, 0], *cs)

            A0 = jnp.zeros((s * s, n * n, E), space.X_geo.dtype)
            dt = device_loop_time(step, A0, 16, operands=(Xop, *consts))
        if L._affine_geometry(tab):
            # affine: ONE interleaved-projector matmul, K = s²d²
            algo_flops = 2.0 * (s * s * d * d) * (s * s * n * n)
        else:
            # general: the priced algorithm is s² projector block matmuls
            # at unpadded K = d²q.  The Pallas kernel dispatches only
            # s(s+1)/2 dots (mirror blocks are VMEM node-transposes) at
            # K padded to d²·q_pad, so its attainable fraction ceiling is
            # (s²/[s(s+1)/2])·(q/q_pad) ≈ 1.27 for hex20 — a fraction
            # near or above 1.0 means the kernel beats the priced
            # algorithm, not a measurement bug (cf. the round-3 store-
            # fusion artifact, which this harness forbids).
            algo_flops = (s * s) * 2.0 * n * n * (d * d * q)
        out.append(
            stiffness_roofline(
                name,
                q,
                n,
                mesh.element.geometry.num_nodes,
                s,
                d,
                E / dt,
                algo_flops,
            )
        )
    return out


def bench_assembled_newton(res: int = 63):
    """Assembled-operator Newton economics (block-DIA, sparse/block_dia.py).

    Per-Newton-iterate cost = one direct element->band assembly; per-CG-
    iteration cost = one streaming band SpMV.  Reported against the
    matrix-free tangent sweep at the same size, with the break-even CG
    iteration count (the assembled path wins beyond it).
    """
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial

    mesh = create_unit_box_uniform_hex_mesh_3d(res)
    fixed = np.nonzero(np.asarray(mesh.points)[:, 2] < 1e-12)[0]
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.0, lam=577.0),
        dirichlet_nodes=fixed,
        body_force=lambda x, p: jnp.array([0.0, 0.0, -2.0]),
    )
    u0 = jnp.zeros(model.space.num_dofs, jnp.float32)
    plan = model.block_dia_plan()  # host-built, cached
    model.block_dia_expand_plan()  # eager too (r3: first-touch under the
    # fori_loop trace cached tracers and poisoned every later call)

    def assemble_once(u):
        m = model.assemble_hessian_block_dia(u)
        return u + 1e-20 * m.bands[0, :3].sum()

    t_asm = device_loop_time(assemble_once, u0, 2)

    # the production CG form: component-major [s, N] through the Pallas
    # band sweep (solve(assembled=True) wraps CG exactly like this); the
    # packed bands enter as jit arguments, as hoist_closure arranges in
    # the real solver (closure-constant bands would embed a ~250MB HLO
    # literal -> compiler 413s / slow-path)
    from fenris_tpu.sparse.dia_kernel import (
        pack_block_dia_windowed,
        packed_dia_matvec_wm,
    )

    m0 = model.assemble_hessian_block_dia(u0)
    packed = pack_block_dia_windowed(m0)
    N = mesh.num_vertices
    free2 = model.free_mask.reshape(N, 3).T
    x2_0 = jnp.ones((3, N), jnp.float32)

    def apply_step(x2, bands_k, free2):
        p = packed._replace(bands_k=bands_k)
        vm = jnp.where(free2, x2, 0.0)
        y = jnp.where(free2, packed_dia_matvec_wm(p, vm), x2)
        return y * 1e-6 + x2 * 0.999

    # band SpMV is ~ms-scale: chain enough iterations that the empty
    # round-trip subtraction in device_loop_time stays in the noise
    t_apply = device_loop_time(
        apply_step, x2_0, 100, operands=(packed.bands_k, free2)
    )

    def mf_step(v):
        return model.hessian_vector_product(u0, v) * 1e-6 + v * 0.999

    t_mf = device_loop_time(mf_step, jnp.ones(model.space.num_dofs, jnp.float32), 4)
    return {
        "elements": mesh.num_cells,
        "dofs": model.space.num_dofs,
        "diagonals": plan.num_diagonals,
        "assembly_ms": round(t_asm * 1e3, 1),
        "cg_iteration_ms": round(t_apply * 1e3, 3),
        "matrix_free_iteration_ms": round(t_mf * 1e3, 3),
        "speedup_per_iteration": round(t_mf / t_apply, 1),
        "break_even_cg_iterations": int(round(t_asm / max(t_mf - t_apply, 1e-9))),
    }


def bench_spmv(res: int = 69):
    """Assembled-operator SpMV GB/s: block-DIA (zero-gather) vs block-ELL
    vs scalar CSR (BASELINE.md:46; reference loop fenris-sparse/src/cg.rs:373-450).

    Effective bandwidth counts the true operator traffic (values + column
    metadata + x read + y write) regardless of layout, so the numbers
    are directly comparable.
    """
    import jax
    import jax.numpy as jnp

    from fenris_tpu.elasticity import HyperelasticModel
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d
    from fenris_tpu.solid import LameParameters, NeoHookeanMaterial
    from fenris_tpu.sparse import CsrMatrix, from_pattern, spmv
    from fenris_tpu.sparse.block_dia import BlockDiaMatrix, block_dia_from_csr
    from fenris_tpu.sparse.block_ell import BlockEllMatrix, block_ell_from_csr

    mesh = create_unit_box_uniform_hex_mesh_3d(res)
    model = HyperelasticModel(
        mesh=mesh,
        material=NeoHookeanMaterial(),
        params=LameParameters(mu=384.614, lam=576.923),
    )
    from fenris_tpu.assembly import global_ as G

    u = jnp.zeros(model.space.num_dofs, jnp.float32)
    # chunked: the unchunked 6-D contraction intermediates pad ~50x under
    # XLA:TPU minor-dim tiling and exceed HBM at this element count
    values = G.assemble_csr(
        model.assemble_hessian_matrices(u, chunk=8192), model.space.pattern
    )
    pattern = model.space.pattern
    csr = from_pattern(pattern, values)
    ell = block_ell_from_csr(pattern, values)
    dia = block_dia_from_csr(pattern, values)
    nnz = pattern.nnz
    ndofs = pattern.num_rows
    bytes_eff = 8.0 * nnz + 8.0 * ndofs  # values+colidx (4+4) + x read + y write

    v0 = jnp.ones(ndofs, jnp.float32)

    # matrix arrays enter as jit arguments (closure-constant index arrays
    # would hit the ~1000x XLA:TPU gather slow path and invalidate the GB/s)
    def csr_step(v, row_ptr, col_indices, values):
        m = CsrMatrix(row_ptr, col_indices, values, csr.shape)
        return v + 1e-12 * spmv(m, v)

    def ell_step(v, neighbors, blocks):
        m = BlockEllMatrix(neighbors, blocks, ell.num_nodes, ell.solution_dim)
        return v + 1e-12 * (m @ v)

    def dia_step(v, bands):
        m = BlockDiaMatrix(dia.offsets, bands, dia.num_nodes, dia.solution_dim, None)
        return v + 1e-12 * (m @ v)

    # DIA first (headline), CSR last: the scalar-CSR program (one irregular
    # index per nnz) has faulted the TPU worker at this size, which kills
    # every subsequent device call in the process — measure the fast
    # layouts before risking it, and report partial results on a crash.
    out = {"dofs": ndofs, "nnz": nnz}
    assert dia.remainder is None  # hex mesh node-major: all 27 offsets kept
    dt_dia = device_loop_time(dia_step, v0, 20, operands=(dia.bands,))
    out.update(
        block_dia_ms=round(dt_dia * 1e3, 3),
        block_dia_gbps=round(bytes_eff / dt_dia / 1e9, 2),
        block_dia_diagonals=dia.num_diagonals,
        hbm_fraction_dia=round(bytes_eff / dt_dia / 1e9 / V5E_HBM_GBPS, 3),
    )
    # the production CG path: fused Pallas band sweep over component-major
    # [s, N] vectors (sparse/dia_kernel.py) — node-major [N, s] views tile
    # their minor dim to 128 lanes (~42x amplified), so the kernel is only
    # fast in this layout
    from fenris_tpu.sparse.dia_kernel import (
        pack_block_dia,
        pack_block_dia_windowed,
        packed_dia_matvec_cm,
        packed_dia_matvec_wm,
    )

    x2_0 = jnp.ones((dia.solution_dim, dia.num_nodes), jnp.float32)

    # production: the staging-free windowed sweep (halo-window DMA per
    # chunk, shifted X block built in VMEM)
    packedw = pack_block_dia_windowed(dia)

    def dia_wm_step(x2, bands_k):
        p = packedw._replace(bands_k=bands_k)
        return x2 * 0.999 + 1e-12 * packed_dia_matvec_wm(p, x2)

    dt_wm = device_loop_time(dia_wm_step, x2_0, 100, operands=(packedw.bands_k,))
    # the legacy "effective" metric (8 B/nnz, cross-layout comparable)
    # exceeds physical HBM here because the windowed kernel reads each x
    # element ~wn/cn times, not once per nnz — so the HBM fraction is
    # computed from REAL streamed bytes (bands + x pad/window + y)
    bytes_real_wm = _windowed_real_bytes(packedw)
    out.update(
        dia_pallas_ms=round(dt_wm * 1e3, 3),
        dia_pallas_gbps_eff=round(bytes_eff / dt_wm / 1e9, 2),
        dia_pallas_real_gbps=round(bytes_real_wm / dt_wm / 1e9, 2),
        hbm_fraction_dia_pallas=round(
            bytes_real_wm / dt_wm / 1e9 / V5E_HBM_GBPS, 3
        ),
    )

    # the round-4 staged kernel (separate [s*Dp, Npad] shift array), kept
    # as the f64/large-bandwidth fallback
    packed = pack_block_dia(dia)

    def dia_cm_step(x2, bands_k):
        p = packed._replace(bands_k=bands_k)
        return x2 * 0.999 + 1e-12 * packed_dia_matvec_cm(p, x2)

    dt_cm = device_loop_time(dia_cm_step, x2_0, 20, operands=(packed.bands_k,))
    out.update(
        dia_staged_ms=round(dt_cm * 1e3, 3),
        dia_staged_gbps=round(bytes_eff / dt_cm / 1e9, 2),
    )
    dt_ell = device_loop_time(ell_step, v0, 10, operands=(ell.neighbors, ell.blocks))
    out.update(
        block_ell_ms=round(dt_ell * 1e3, 3),
        block_ell_gbps=round(bytes_eff / dt_ell / 1e9, 2),
        hbm_fraction_ell=round(bytes_eff / dt_ell / 1e9 / V5E_HBM_GBPS, 3),
    )
    from fenris_tpu.sparse import TPU_SCALAR_SPMV_MAX_NNZ

    if nnz > TPU_SCALAR_SPMV_MAX_NNZ:
        # the scalar-CSR program crashes the TPU worker at this size
        # (observed r2-r4) and a crashed worker wedges the device for up
        # to tens of minutes; spmv() now refuses above the cap
        out["csr"] = (
            f"guarded: scalar-CSR skipped above {TPU_SCALAR_SPMV_MAX_NNZ} nnz "
            "(crashes the TPU worker; block layouts are the production SpMV)"
        )
        return out
    try:
        dt_csr = device_loop_time(
            csr_step, v0, 6, operands=(csr.row_ptr, csr.col_indices, csr.values)
        )
        out.update(
            csr_ms=round(dt_csr * 1e3, 3),
            csr_gbps=round(bytes_eff / dt_csr / 1e9, 2),
            block_ell_vs_csr=round(dt_csr / dt_ell, 2),
        )
    except Exception as e:
        out["csr_error"] = _err(e)
    return out


def _windowed_real_bytes(p) -> float:
    """Real HBM bytes per windowed-sweep matvec: bands stream + x pad
    staging (write L_pad rows, window re-reads) + y write."""
    npad = -(-p.num_nodes // p.lanes) * p.lanes
    nsteps = npad // p.lanes
    bands = p.bands_k.shape[0] * npad * 4.0
    x_pad = 8 * p.lpad * 4.0 + p.solution_dim * p.num_nodes * 4.0  # write + read
    x_windows = nsteps * 8 * p.wn * 4.0
    y = 8 * npad * 4.0
    return bands + x_pad + x_windows + y


def bench_spmv_pallas_10m(res: int = 149):
    """10M-dof block-DIA band-sweep SpMV (BASELINE.md:46 at the 10M end).

    The bands are synthesized (random f32) — SpMV bandwidth is
    value-independent, and assembling a real 10M-dof CSR on the 1-core
    host takes minutes the bench budget doesn't have; the structured
    27-offset layout matches what assemble_hessian_block_dia produces on
    a lexicographic hex mesh at this size.
    """
    import jax
    import jax.numpy as jnp

    from fenris_tpu.sparse.block_dia import BlockDiaMatrix
    from fenris_tpu.sparse.dia_kernel import (
        pack_block_dia_windowed,
        packed_dia_matvec_wm,
    )

    nx = res + 1
    N = nx**3
    s = 3
    offs = tuple(
        sorted(a + nx * b + nx * nx * c for a in (-1, 0, 1) for b in (-1, 0, 1) for c in (-1, 0, 1))
    )
    key = jax.random.PRNGKey(0)
    bands = jax.random.normal(key, (len(offs) * s * s, N), jnp.float32)
    packed = pack_block_dia_windowed(BlockDiaMatrix(offs, bands, N, s, None))
    del bands  # keep only the packed copy (~3.6 GB at res=149)
    x2_0 = jnp.ones((s, N), jnp.float32)

    def step(x2, bands_k):
        p = packed._replace(bands_k=bands_k)
        return x2 * 0.999 + 1e-12 * packed_dia_matvec_wm(p, x2)

    dt = device_loop_time(step, x2_0, 30, operands=(packed.bands_k,))
    nnz = len(offs) * s * s * N
    bytes_eff = 8.0 * nnz + 8.0 * N * s
    bytes_real = _windowed_real_bytes(packed)
    return {
        "dofs": N * s,
        "nnz": nnz,
        "dia_pallas_ms": round(dt * 1e3, 3),
        "dia_pallas_gbps_eff": round(bytes_eff / dt / 1e9, 2),
        "dia_pallas_real_gbps": round(bytes_real / dt / 1e9, 2),
        "hbm_fraction_dia_pallas": round(bytes_real / dt / 1e9 / V5E_HBM_GBPS, 3),
    }


def main() -> None:
    import jax

    # persistent cache: Mosaic kernel compiles are ~4-9 min per (kernel,
    # shape) cold; cached runs start instantly
    jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

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

    # Compute-intensity quantification for the headline hvp: the stencil
    # kernel's HBM traffic is just u, v in + hv out (geometry is implicit,
    # params are scalars), so the memory-roofline floor is 12 B/dof — the
    # measured time sits far above it, i.e. the kernel is compute-bound.
    # The flop work model is XLA:CPU's cost analysis of the mathematically
    # equivalent grid-minor XLA formulation (pallas=False): 7261 flops per
    # element, shape-independent to 5 digits over 8^3..24^3 (the axon AOT
    # cost model under-reports and cannot be queried for this).  It is an
    # upper-bound work model — the fused closed-form-tangent kernel does
    # strictly less arithmetic — so achieved f32 FLOP/s is a lower bound.
    XLA_CPU_WORKMODEL_FLOPS_PER_EL = 7261.0
    bytes_min = 12.0 * model.num_dofs  # u,v read + hv write, f32
    hbm_frac = bytes_min / dt_hvp / 1e9 / V5E_HBM_GBPS
    flops = XLA_CPU_WORKMODEL_FLOPS_PER_EL * E
    intensity = {
        "hbm_bytes_floor": int(bytes_min),
        "hbm_fraction_floor": round(hbm_frac, 4),
        "xla_workmodel_flops_per_el": XLA_CPU_WORKMODEL_FLOPS_PER_EL,
        "achieved_gflops_lower_bound": round(flops / dt_hvp / 1e9, 1),
        # derived, not asserted: a regressed kernel whose HBM floor exceeds
        # half of peak would be reported as memory-bound
        "bound": "{} (HBM floor is {:.1%} of peak)".format(
            "compute" if hbm_frac < 0.5 else "memory", hbm_frac
        ),
    }

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
        unstructured = {"error": _err(e)}

    # ORDERING INVARIANT: bench_spmv must stay the LAST device work in this
    # process — its scalar-CSR program has faulted the TPU worker, and a
    # faulted worker poisons every subsequent device call (the except below
    # only saves the JSON output, not the device).  Add new benchmarks
    # ABOVE this block.
    try:
        assembled_detail = bench_assembled_newton()
    except Exception as e:
        assembled_detail = {"error": _err(e)}
    try:
        spmv_10m_detail = bench_spmv_pallas_10m()
    except Exception as e:
        spmv_10m_detail = {"error": _err(e)}
    try:
        roofline_detail = bench_element_stiffness_roofline()
    except Exception as e:
        roofline_detail = {"error": _err(e)}
    try:
        spmv_detail = bench_spmv()
    except Exception as e:
        spmv_detail = {"error": _err(e)}

    elps = E / dt_hvp
    full_detail = {
        "elements": E,
        "dofs": model.num_dofs,
        "hvp_ms": round(dt_hvp * 1e3, 3),
        "residual_ms": round(dt_res * 1e3, 3),
        "residual_elements_per_sec": round(E / dt_res, 1),
        "hvp_intensity": intensity,
        "unstructured_banded": unstructured,
        "assembled_newton": assembled_detail,
        "spmv": spmv_detail,
        "spmv_pallas_10m": spmv_10m_detail,
        "element_stiffness_roofline": roofline_detail,
        "baseline": "unstructured per-element gather/scatter path (reference-design translation), 1.3M el/s on this chip",
        "device": str(jax.devices()[0]),
    }
    # Full detail to stderr + artifact file; the single stdout JSON line must
    # stay COMPACT — the driver captures only a limited tail of stdout, and a
    # multi-KB line gets its head (the "metric" key) truncated away
    # (BENCH_r03/r04 both lost their headline this way).
    print(json.dumps(full_detail, indent=1), file=sys.stderr)
    try:
        os.makedirs("artifacts", exist_ok=True)
        with open("artifacts/bench_detail.json", "w") as f:
            json.dump(full_detail, f, indent=1)
    except OSError:
        pass

    def _g(d, *keys):
        for k in keys:
            d = d.get(k, {}) if isinstance(d, dict) else {}
        return d if not isinstance(d, dict) or d else None

    roof = roofline_detail if isinstance(roofline_detail, list) else []
    summary = {
        "hvp_ms": round(dt_hvp * 1e3, 3),
        "banded_elps": _g(unstructured, "elements_per_sec"),
        "asm_cg_ms": _g(assembled_detail, "cg_iteration_ms"),
        "spmv_ms_1m": _g(spmv_detail, "dia_pallas_ms"),
        "spmv_ms_10m": _g(spmv_10m_detail, "dia_pallas_ms"),
        "spmv_real_gbps_10m": _g(spmv_10m_detail, "dia_pallas_real_gbps"),
        "stiff_algo_frac": {
            r.get("case"): r.get("algo_fraction") for r in roof if isinstance(r, dict)
        }
        or None,
        "detail_file": "artifacts/bench_detail.json",
    }
    print(
        json.dumps(
            {
                "metric": "neo_hookean_hvp_throughput_1M_elements",
                "value": round(elps, 1),
                "unit": "elements/sec",
                "vs_baseline": round(elps / GATHER_PATH_ANCHOR_ELPS, 2),
                "detail": {k: v for k, v in summary.items() if v is not None},
            }
        )
    )


if __name__ == "__main__":
    main()
