"""Numerical utilities.

Parity: src/util.rs — ``rotation_svd`` (:125, SVD with proper-rotation
factors), ``apd`` (:172, analytic polar decomposition of the deformation
gradient, quaternion iteration), eigenvalue/condition-number helpers
(:409-482), MatrixMarket dumps (:387) and interpolation helpers (:676).

All decompositions are batched over leading axes and jax-traceable (used
e.g. for corotational material models and mesh-quality metrics).
"""

from __future__ import annotations

from pathlib import Path
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "log1p_accurate",
    "hoist_closure",
    "rotation_svd",
    "polar_decomposition",
    "apd",
    "sym_eigenvalues",
    "extremal_eigenvalues",
    "condition_number_sym",
    "save_matrix_market",
]


def hoist_closure(fun, *example_args):
    """Like ``jax.closure_convert``, but hoists **every** array constant.

    ``jax.closure_convert`` extracts only closed-over *tracers*; concrete
    closed-over arrays stay embedded in the jaxpr as literals.  On this
    platform that is a correctness-of-scale problem: a chunked 1M-element
    model's index/geometry tables (~0.5 GB) get serialized into the HLO and
    the remote TPU compiler rejects the request (HTTP 413) — and even when
    accepted, program constants take XLA:TPU's pathological constant-gather
    path (CLAUDE.md).  This variant traces ``fun`` once and returns
    ``(converted, consts)`` with ALL jaxpr constants — concrete arrays and
    tracers alike — hoisted to trailing arguments of ``converted``:
    ``converted(*example_args, *consts) == fun(*example_args)``.
    """
    flat_ex, in_tree = jax.tree_util.tree_flatten(example_args)

    def flat_fun(*xs):
        args = jax.tree_util.tree_unflatten(in_tree, list(xs))
        return fun(*args)

    closed, out_shape = jax.make_jaxpr(flat_fun, return_shape=True)(*flat_ex)
    out_tree = jax.tree_util.tree_structure(out_shape)
    consts = list(closed.consts)
    k = len(example_args)

    def converted(*all_args):
        args, cs = all_args[:k], all_args[k:]
        flat, tree = jax.tree_util.tree_flatten(args)
        if tree != in_tree:
            raise TypeError(f"argument structure {tree} != traced {in_tree}")
        out_flat = jax.core.eval_jaxpr(closed.jaxpr, list(cs), *flat)
        return jax.tree_util.tree_unflatten(out_tree, out_flat)

    return converted, consts


def rotation_svd(M):
    """SVD ``M = U diag(s) Vᵀ`` with ``U, V`` proper rotations (det = +1).

    Sign conventions match util.rs:125: reflections are absorbed by
    negating the last column of U/V and the last singular value (which may
    therefore be negative).
    """
    U, s, Vt = jnp.linalg.svd(M, full_matrices=True)
    V = jnp.swapaxes(Vt, -1, -2)
    detU = jnp.linalg.det(U)
    detV = jnp.linalg.det(V)
    U = U.at[..., :, -1].multiply(jnp.where(detU < 0, -1.0, 1.0)[..., None])
    V = V.at[..., :, -1].multiply(jnp.where(detV < 0, -1.0, 1.0)[..., None])
    flip = jnp.where(detU * detV < 0, -1.0, 1.0)
    s = s.at[..., -1].multiply(flip)
    return U, s, V


def polar_decomposition(F):
    """Polar decomposition ``F = R S`` with R a proper rotation (via SVD)."""
    U, s, V = rotation_svd(F)
    R = U @ jnp.swapaxes(V, -1, -2)
    S = V @ (s[..., :, None] * jnp.swapaxes(V, -1, -2))
    return R, S


def _quat_to_rot(q):
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)], -1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)], -1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)], -1),
        ],
        -2,
    )


def apd(F, num_iterations: int = 30):
    """Analytic polar decomposition rotation of a 3x3 deformation gradient.

    The quaternion fixed-point iteration of Kugelstadt et al. (2018)
    (util.rs:172): returns the rotation R of ``F = R S`` without an SVD —
    cheap, branch-free, batched; ideal for corotational elasticity on TPU.
    """
    batch = F.shape[:-2]
    q0 = jnp.broadcast_to(
        jnp.asarray([1.0, 0.0, 0.0, 0.0], F.dtype), batch + (4,)
    )

    def body(_, q):
        R = _quat_to_rot(q)
        # gradient of rotation misalignment: omega = sum_i r_i x f_i ...
        cols_R = jnp.swapaxes(R, -1, -2)  # rows as vectors
        cols_F = jnp.swapaxes(F, -1, -2)
        cross = jnp.cross(cols_R, cols_F).sum(axis=-2)
        denom = jnp.abs((cols_R * cols_F).sum(axis=(-1, -2))) + 1e-9
        omega = cross / denom[..., None]
        angle = jnp.linalg.norm(omega, axis=-1, keepdims=True)
        axis = omega / jnp.maximum(angle, 1e-30)
        half = 0.5 * angle[..., 0]
        dq = jnp.concatenate(
            [jnp.cos(half)[..., None], jnp.sin(half)[..., None] * axis], axis=-1
        )
        # quaternion product dq * q
        w1, v1 = dq[..., :1], dq[..., 1:]
        w2, v2 = q[..., :1], q[..., 1:]
        w = w1 * w2 - (v1 * v2).sum(-1, keepdims=True)
        v = w1 * v2 + w2 * v1 + jnp.cross(v1, v2)
        q_new = jnp.concatenate([w, v], axis=-1)
        return q_new / jnp.linalg.norm(q_new, axis=-1, keepdims=True)

    q = jax.lax.fori_loop(0, num_iterations, body, q0)
    return _quat_to_rot(q)


def sym_eigenvalues(A):
    """Eigenvalues of a symmetric matrix, ascending (batched)."""
    return jnp.linalg.eigvalsh(A)


def extremal_eigenvalues(A):
    """(min, max) eigenvalues of a symmetric matrix (util.rs:409)."""
    ev = jnp.linalg.eigvalsh(A)
    return ev[..., 0], ev[..., -1]


def condition_number_sym(A):
    """Spectral condition number of a symmetric matrix (util.rs:460)."""
    lo, hi = extremal_eigenvalues(A)
    return jnp.abs(hi) / jnp.abs(lo)


def save_matrix_market(path, matrix) -> None:
    """Dump a CSR or dense matrix in MatrixMarket coordinate format
    (util.rs:387)."""
    from .sparse import CsrMatrix

    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    if isinstance(matrix, CsrMatrix):
        rows = np.searchsorted(
            np.asarray(matrix.row_ptr)[1:], np.arange(matrix.nnz), side="right"
        )
        cols = np.asarray(matrix.col_indices)
        vals = np.asarray(matrix.values)
        nr, nc = matrix.shape
    else:
        m = np.asarray(matrix)
        rows, cols = np.nonzero(m)
        vals = m[rows, cols]
        nr, nc = m.shape
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real general\n")
        f.write(f"{nr} {nc} {len(vals)}\n")
        for r, c, v in zip(rows, cols, vals):
            f.write(f"{r + 1} {c + 1} {v:.17g}\n")

# -- accurate transcendentals --------------------------------------------------


@jax.custom_jvp
def log1p_accurate(x):
    """log(1 + x), accurate to f32 roundoff on TPU.

    XLA:TPU lowers ``log``/``log1p`` to a fast hardware approximation with
    ~1e-4 *absolute* error — catastrophic for the log-det term of
    Neo-Hookean energies near the identity (logdet.rs:17 relies on log1p
    precision).  This version extracts the exponent exactly via bit
    manipulation, evaluates an atanh series on the reduced mantissa
    (|t| <= 0.1716, truncation < 1e-9); small arguments use the
    cancellation-free identity log1p(x) = 2 atanh(x/(x+2)) — ~2 ulp end
    to end, and immune to XLA's allow-excess-precision reassociation.

    f64 inputs defer to ``jnp.log1p`` (exact on CPU, where f64 runs).
    The derivative is the exact closed form ``1 / (1 + x)`` (custom_jvp),
    keeping the bit manipulation out of autodiff.
    """
    x = jnp.asarray(x)
    if x.dtype != jnp.float32:
        return jnp.log1p(x)

    def series(t):
        # 2*atanh(t) for |t| <= ~0.172: truncation < 1e-10 relative
        t2 = t * t
        return 2.0 * t * (
            1.0
            + t2 * (1.0 / 3.0 + t2 * (0.2 + t2 * (1.0 / 7.0 + t2 * (1.0 / 9.0))))
        )

    # |x| < 0.25: log1p(x) = 2 atanh(x / (x + 2)) — no 1+x rounding at all
    # (robust against XLA's allow-excess-precision reassociation, which
    # cancels compensated-summation tricks).
    small = series(x / (x + 2.0))

    # |x| >= 0.25: exact exponent extraction on u = 1 + x (whose rounding
    # is benign here), atanh series on the reduced mantissa.
    u = jnp.maximum(1.0 + x, 1e-30)
    bits = jax.lax.bitcast_convert_type(u, jnp.int32)
    e = (bits >> 23) - 127
    mbits = (bits & jnp.int32(0x007FFFFF)) | jnp.int32(0x3F800000)
    mm = jax.lax.bitcast_convert_type(mbits, jnp.float32)
    big = mm > 1.4142135
    mm = jnp.where(big, 0.5 * mm, mm)
    e = (e + big.astype(jnp.int32)).astype(jnp.float32)
    large = e * 0.6931471805599453 + series((mm - 1.0) / (mm + 1.0))

    return jnp.where(jnp.abs(x) < 0.25, small, large)


@log1p_accurate.defjvp
def _log1p_accurate_jvp(primals, tangents):
    (x,) = primals
    (t,) = tangents
    return log1p_accurate(x), t / (1.0 + x)
