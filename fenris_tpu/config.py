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

__all__ = ["default_dtype", "default_int_dtype", "enable_x64"]


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
