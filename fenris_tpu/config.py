"""Global configuration helpers for fenris-tpu.

fenris-tpu runs in two precision regimes:

* **f64** (``jax_enable_x64``): bit-accurate parity with the reference FEM
  library; used by the convergence/MMS acceptance suite (CPU or TPU, where
  f64 is emulated).
* **f32/bf16**: the TPU speed-of-light regime used for large-scale assembly
  and matrix-free solves; MXU-friendly.

Library code never hard-codes a dtype: it uses :func:`default_dtype` (which
follows the ambient x64 setting) or the dtype of its array inputs.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["default_dtype", "default_int_dtype", "enable_x64", "MATMUL_PRECISION"]

#: Precision for every FEM contraction (basis-gradient einsums, quadrature
#: reductions, material tensor algebra).  XLA:TPU's *default* f32 matmul
#: precision routes through bf16 MXU passes, which perturbs residuals by
#: ~3e-3 relative — enough to destroy CG/Newton convergence (the recursive
#: residual, the preconditioner symmetry, and the line search all rely on
#: ~1e-6-coherent arithmetic; measured: a 96^3 f32 MG-CG "converged" to a
#: reported 3.5e-6 while the true residual was 15.6).  HIGHEST = true f32
#: accumulation on TPU; a no-op on CPU and in f64 mode.  The FEM
#: contractions are tiny (n, q <= 27) and the pipeline is HBM-bound, so
#: the throughput cost is small (measured ~11% on the structured hvp).
MATMUL_PRECISION = jax.lax.Precision.HIGHEST


def enable_x64(enabled: bool = True) -> None:
    """Toggle 64-bit mode (wrapper around ``jax.config.update``)."""
    jax.config.update("jax_enable_x64", bool(enabled))


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype() -> np.dtype:
    """Floating dtype that matches the ambient x64 configuration."""
    return np.dtype(np.float64) if x64_enabled() else np.dtype(np.float32)


def default_int_dtype() -> np.dtype:
    """Index dtype used for connectivity and sparse indices.

    int32 throughout: TPU scatter/gather and VMEM tiling strongly prefer
    32-bit indices, and int32 supports meshes up to ~2.1e9 nodes / nnz
    per shard, far above single-chip HBM capacity anyway.
    """
    return np.dtype(np.int32)


def _env_flag(name: str, default: bool = False) -> bool:
    val = os.environ.get(name)
    if val is None:
        return default
    return val.lower() not in ("0", "false", "off", "")


# Opt-in x64 at import time (tests set FENRIS_TPU_X64=1 through conftest).
if _env_flag("FENRIS_TPU_X64"):
    enable_x64(True)
