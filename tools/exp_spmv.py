"""Experiment: block-DIA SpMV formulations vs HBM roofline (round 4).

Round-3 verdict: block_dia_matvec's 243 separate full-lane FMAs reach only
~12% of v5e HBM peak (the y accumulator is re-read/re-written per FMA in
whatever fusion XLA picks).  Candidates:

  v0  current per-row FMA loop (block_dia_matvec)
  v1  multiply-reduce: bands[27,3,3,N] * X_shift[27,1,3,N] summed over
      (d, j) in ONE fused reduce — X_shift rows are static slices of the
      padded component-major x, fusible into the reduce's operand.
  v2  same but reduction via dot over a reshaped axis (fallback)

Run on the real TPU:  python tools/exp_spmv.py [res]
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache")

import jax.numpy as jnp

from bench import V5E_HBM_GBPS, device_loop_time


def make_case(res: int):
    nx = ny = nz = res + 1  # node grid
    N = nx * ny * nz
    s = 3
    offs = sorted(
        a + nx * b + nx * ny * c
        for a in (-1, 0, 1)
        for b in (-1, 0, 1)
        for c in (-1, 0, 1)
    )
    D = len(offs)
    rng = np.random.default_rng(0)
    bands = jnp.asarray(rng.standard_normal((D * s * s, N)).astype(np.float32))
    v = jnp.asarray(rng.standard_normal(N * s).astype(np.float32))
    return N, s, tuple(offs), bands, v


def v0_matvec(offsets, s, N):
    from fenris_tpu.sparse.block_dia import BlockDiaMatrix, block_dia_matvec

    def f(v, bands):
        m = BlockDiaMatrix(offsets, bands, N, s, None)
        return block_dia_matvec(m, v)

    return f


def v1_multiply_reduce(offsets, s, N):
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    D = len(offsets)

    def f(v, bands):
        xT = v.reshape(N, s).T  # [s, N] component-major
        xp = jnp.pad(xT, ((0, 0), (lo, hi)))
        X = jnp.stack(
            [jax.lax.slice_in_dim(xp, lo + o, lo + o + N, axis=1) for o in offsets]
        )  # [D, s(j), N]
        b4 = bands.reshape(D, s, s, N)
        y = jnp.sum(b4 * X[:, None, :, :], axis=(0, 2))  # [s(i), N]
        return y.T.reshape(-1)

    return f


def v1b_fori(offsets, s, N):
    """Accumulate over d with a fori-style unrolled sum of [s,s,N] blocks."""
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    D = len(offsets)

    def f(v, bands):
        xT = v.reshape(N, s).T
        xp = jnp.pad(xT, ((0, 0), (lo, hi)))
        b4 = bands.reshape(D, s, s, N)
        y = jnp.zeros((s, N), v.dtype)
        for d, o in enumerate(offsets):
            w = jax.lax.slice_in_dim(xp, lo + o, lo + o + N, axis=1)  # [s, N]
            y = y + jnp.sum(b4[d] * w[None, :, :], axis=1)
        return y.T.reshape(-1)

    return f


def v2_pallas(offsets, s, N):
    """Fused Pallas band-sweep (sparse/dia_kernel.py)."""
    from fenris_tpu.sparse.block_dia import BlockDiaMatrix
    from fenris_tpu.sparse.dia_kernel import pack_block_dia, packed_dia_matvec

    def f(v, bands):
        m = BlockDiaMatrix(offsets, bands, N, s, None)
        return packed_dia_matvec(pack_block_dia(m), v)

    return f


def v2b_pallas_prepacked(offsets, s, N, bands):
    """Same kernel, pack hoisted out of the timed step (the CG regime:
    pack once per Newton assembly, matvec every iteration)."""
    from fenris_tpu.sparse.block_dia import BlockDiaMatrix
    from fenris_tpu.sparse.dia_kernel import pack_block_dia, packed_dia_matvec

    m = BlockDiaMatrix(offsets, bands, N, s, None)
    p0 = pack_block_dia(m)

    def f(v, bands_k):
        return packed_dia_matvec(p0._replace(bands_k=bands_k), v)

    return f, p0.bands_k


def main():
    res = int(sys.argv[1]) if len(sys.argv) > 1 else 69
    N, s, offsets, bands, v = make_case(res)
    D = len(offsets)
    bytes_bands = D * s * s * N * 4.0
    nnz = D * s * s * N  # dense-band accounting
    # "effective" traffic comparable to bench_spmv: values+colidx + x + y
    ndofs = N * s
    bytes_eff = 8.0 * (27 * 9 * N) + 8.0 * ndofs
    print(f"N={N} nodes, dofs={ndofs}, D={D}, bands={bytes_bands/2**30:.2f} GiB")

    ref = None
    for name, maker in [
        ("v0_current", v0_matvec),
        ("v1_mulreduce", v1_multiply_reduce),
        ("v1b_unrolled_d", v1b_fori),
    ]:
        f = maker(offsets, s, N)
        y = np.asarray(jax.jit(f)(v, bands))
        if ref is None:
            ref = y
        else:
            err = np.abs(y - ref).max() / np.abs(ref).max()
            assert err < 1e-5, (name, err)

        def step(x, bands, f=f):
            return x + 1e-12 * f(x, bands)

        dt = device_loop_time(step, v, 20, operands=(bands,))
        print(
            f"{name:16s} {dt*1e3:8.3f} ms   bands {bytes_bands/dt/1e9:7.1f} GB/s"
            f"   eff {bytes_eff/dt/1e9:7.1f} GB/s"
            f"   ({bytes_eff/dt/1e9/V5E_HBM_GBPS:5.1%} of peak)"
        )


if __name__ == "__main__":
    main()
