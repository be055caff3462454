"""Native (C++) runtime components with automatic build + numpy fallback.

The device compute path is JAX/XLA/Pallas; the *runtime around it* —
host-side symbolic assembly, the CPU-bound setup step for large meshes —
is implemented in C++ (radix-sort pattern builder, pattern.cpp) and loaded
through ctypes.  If no compiler is available the callers fall back to the
vectorized numpy implementation transparently.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sysconfig
from pathlib import Path
from typing import Optional

import numpy as np

__all__ = ["native_available", "build_pattern_native", "cuthill_mckee_native"]

_LIB_NAME = "libfenris_native.so"
_HERE = Path(__file__).parent
_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


class _PatternResult(ctypes.Structure):
    _fields_ = [
        ("nnz", ctypes.c_int64),
        ("num_rows", ctypes.c_int64),
        ("row_ptr", ctypes.POINTER(ctypes.c_int64)),
        ("col_indices", ctypes.POINTER(ctypes.c_int32)),
        ("rows_of_nnz", ctypes.POINTER(ctypes.c_int32)),
        ("scatter", ctypes.POINTER(ctypes.c_int32)),
        ("diag_positions", ctypes.POINTER(ctypes.c_int64)),
    ]


def _compile() -> Optional[Path]:
    srcs = [_HERE / "pattern.cpp", _HERE / "reorder.cpp"]
    out = _HERE / _LIB_NAME
    if out.exists() and out.stat().st_mtime >= max(s.stat().st_mtime for s in srcs):
        return out
    cxx = os.environ.get("CXX", "g++")
    cmd = [cxx, "-O3", "-shared", "-fPIC", "-std=c++17", *map(str, srcs), "-o", str(out)]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=240)
        return out
    except Exception:
        return None


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    if os.environ.get("FENRIS_TPU_NO_NATIVE"):
        return None
    path = _compile()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(str(path))
        lib.fenris_build_pattern.restype = ctypes.c_int
        lib.fenris_build_pattern.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.POINTER(_PatternResult),
        ]
        lib.fenris_free_pattern.argtypes = [ctypes.POINTER(_PatternResult)]
        lib.fenris_cuthill_mckee.restype = ctypes.c_int
        lib.fenris_cuthill_mckee.argtypes = [
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int32,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64),
        ]
        _lib = lib
    except (OSError, AttributeError):
        _lib = None
    return _lib


def native_available() -> bool:
    return _load() is not None


def build_pattern_native(cells: np.ndarray, num_nodes: int, solution_dim: int):
    """C++ CSR pattern construction; returns the same tuple layout as the
    numpy path or None if the native library is unavailable."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    E, n = cells.shape
    res = _PatternResult()
    rc = lib.fenris_build_pattern(
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(E),
        ctypes.c_int32(n),
        ctypes.c_int64(int(num_nodes)),
        ctypes.c_int32(int(solution_dim)),
        ctypes.byref(res),
    )
    if rc != 0:
        return None
    nd = n * solution_dim
    N = res.num_rows
    nnz = res.nnz
    try:
        row_ptr = np.ctypeslib.as_array(res.row_ptr, shape=(N + 1,)).copy()
        col_indices = np.ctypeslib.as_array(res.col_indices, shape=(nnz,)).copy()
        rows_of_nnz = np.ctypeslib.as_array(res.rows_of_nnz, shape=(nnz,)).copy()
        scatter = np.ctypeslib.as_array(res.scatter, shape=(E, nd, nd)).copy()
        diag = np.ctypeslib.as_array(res.diag_positions, shape=(N,)).copy()
    finally:
        lib.fenris_free_pattern(ctypes.byref(res))
    return row_ptr, col_indices, rows_of_nnz, scatter, diag


def cuthill_mckee_native(cells: np.ndarray, num_vertices: int):
    """C++ Cuthill-McKee permutation (``perm[new] = old``), or None if the
    native library is unavailable.  Bit-identical to the numpy path in
    :mod:`..mesh.reorder` (pinned by tests/test_native.py)."""
    lib = _load()
    if lib is None:
        return None
    cells = np.ascontiguousarray(cells, dtype=np.int32)
    E, n = cells.shape
    perm = np.empty(int(num_vertices), dtype=np.int64)
    rc = lib.fenris_cuthill_mckee(
        cells.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        ctypes.c_int64(E),
        ctypes.c_int32(n),
        ctypes.c_int64(int(num_vertices)),
        perm.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return perm
