"""Jitted preconditioned Conjugate Gradient.

Parity: fenris-sparse/src/cg.rs — builder-configured PCG (:196) with
pluggable stopping criterion (``RelativeResidualCriterion`` :85: approximate
residual ||r|| <= tol * ||b||), workspace reuse (:128) and the failure
taxonomy ``SolveErrorKind`` (:279): indefinite operator (p·Ap <= 0),
indefinite preconditioner (r·z < 0), max iterations.

TPU-first: the solve loop is a single ``lax.while_loop`` under ``jit`` — no
host round-trips per iteration; status is carried as an int code so the
whole Newton/CG stack stays on device.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..utils import hoist_closure
import numpy as np

__all__ = ["conjugate_gradient", "CgResult", "CG_CONVERGED", "CG_MAX_ITER", "CG_INDEFINITE_OPERATOR", "CG_INDEFINITE_PRECONDITIONER"]

CG_CONVERGED = 0
CG_MAX_ITER = 1
CG_INDEFINITE_OPERATOR = 2
CG_INDEFINITE_PRECONDITIONER = 3


class CgResult(NamedTuple):
    """Solution plus solve metadata (cf. ``CgOutput``, cg.rs:349)."""

    x: jnp.ndarray
    num_iterations: jnp.ndarray  # int32 scalar
    status: jnp.ndarray  # int32 scalar, one of the CG_* codes
    residual_norm: jnp.ndarray


def _as_operator(op) -> Callable:
    if callable(op):
        return op
    # CsrMatrix: precompute row indices once so the loop body is pure
    # gather/segment-sum (no per-iteration searchsorted).
    from . import CsrMatrix

    if isinstance(op, CsrMatrix):
        rows = jnp.searchsorted(
            op.row_ptr[1:], jnp.arange(op.nnz), side="right"
        ).astype(jnp.int32)
        n = op.shape[0]

        def matvec(v):
            return jax.ops.segment_sum(
                op.values * v[op.col_indices], rows, num_segments=n
            )

        return matvec
    raise TypeError(f"unsupported operator type {type(op)}")


def conjugate_gradient(
    operator,
    rhs,
    x0: Optional[jnp.ndarray] = None,
    preconditioner=None,
    rel_tolerance: float = 1e-8,
    max_iter: Optional[int] = None,
    check_definiteness: bool = True,
    host_loop: bool = False,
    validate_operator: bool = False,
) -> CgResult:
    """Solve ``A x = b`` for SPD ``A`` with (optionally preconditioned) CG.

    ``operator``/``preconditioner`` may be CsrMatrix or callables ``v -> Av``.
    Stopping criterion: ``||r_k|| <= rel_tolerance * ||b||`` using the
    approximate (recursively updated) residual, matching
    ``RelativeResidualCriterion`` (cg.rs:107-125).

    ``host_loop=True`` runs the same algorithm with the iteration driven
    from the host: the operator, the preconditioner, and the vector
    updates execute as *separate* device programs (2 scalar readbacks per
    iteration).  Use for very large models whose operator is a Pallas
    kernel and whose preconditioner is a large unrolled program (e.g.
    multigrid): fusing both into one ``while_loop`` body has faulted the
    TPU worker at ≥10M dofs (XLA/Mosaic scoped-VMEM interaction), while
    the split programs are reliable; the per-iteration dispatch overhead
    is negligible against ≥10ms operator applications.

    ``validate_operator=True`` (host loop only) probes the *compiled*
    operator and preconditioner programs against their eager evaluations
    on ``b`` before iterating, falling back to eager evaluation (correct
    but much slower) with a loud warning on mismatch.  XLA:TPU has
    repeatedly miscompiled large fused programs on this platform (dropped
    z-slab contributions, wrong flat-select planes — see CLAUDE.md); a
    silently wrong operator makes CG diverge or misconverge, so solvers
    at ≥10M dofs validate once per solve.
    """
    A = _as_operator(operator)
    M = _as_operator(preconditioner) if preconditioner is not None else None
    b = jnp.asarray(rhs)  # any shape — CG is elementwise + vdot/norm
    n = b.size
    if x0 is None:
        x0 = jnp.zeros_like(b)
    if max_iter is None:
        max_iter = 10 * n

    # Hoist arrays captured in the operator/preconditioner closures into
    # explicit arguments.  This is load-bearing on TPU: arrays embedded as
    # XLA constants inside the while-loop body hit a pathological slow path
    # (~1000x slower gathers than the same arrays passed as parameters).
    probe = jnp.zeros_like(b)
    # hoist_closure re-traces per call (no caching); the lambda wrap only
    # normalizes callable objects (e.g. multigrid preconditioners) to a
    # plain function signature
    A_conv, a_consts = hoist_closure(lambda v: A(v), probe)
    if M is not None:
        M_fn = M
        M_conv, m_consts = hoist_closure(lambda v: M_fn(v), probe)
    else:
        M_conv, m_consts = None, ()

    if host_loop:
        return _cg_host(
            A_conv, a_consts, M_conv, m_consts, b, x0,
            rel_tolerance, int(max_iter), bool(check_definiteness),
            eager_fns=(A, M) if validate_operator else None,
        )

    def run(a_consts, m_consts, b, x0):
        A_fn = lambda v: A_conv(v, *a_consts)
        M_fn = (lambda v: M_conv(v, *m_consts)) if M_conv is not None else None
        return _cg_loop(
            A_fn, M_fn, b, x0, rel_tolerance, int(max_iter), bool(check_definiteness)
        )

    return jax.jit(run)(a_consts, m_consts, b, x0)


@jax.jit
def _host_residual(b, Ax):
    r = b - Ax
    return r, jnp.linalg.norm(r)


@jax.jit
def _host_alpha_update(p, Ap, x, r, rz):
    pAp = jnp.vdot(p, Ap)
    alpha = rz / pAp
    x1 = x + alpha * p
    r1 = r - alpha * Ap
    # one stacked readback: [pAp, ||r1||, ||p||]
    stats = jnp.stack([pAp, jnp.linalg.norm(r1), jnp.linalg.norm(p)])
    return x1, r1, stats


@jax.jit
def _host_beta_update(r1, z1, p, rz):
    rz1 = jnp.vdot(r1, z1)
    p1 = z1 + (rz1 / rz) * p
    return p1, rz1


def _cg_host(A_conv, a_consts, M_conv, m_consts, b, x0,
             rel_tolerance, max_iter, check_definiteness, eager_fns=None):
    """Host-driven PCG (see ``conjugate_gradient(host_loop=True)``).

    Identical algorithm and status taxonomy as :func:`_cg_loop`; the loop
    runs in Python with jitted stages, so the operator (e.g. a Pallas
    stencil kernel) and the preconditioner (e.g. an MG V-cycle) never
    share one XLA program.  ``eager_fns=(A_eager, M_eager)`` enables the
    compiled-program probe validation described in
    :func:`conjugate_gradient`.
    """
    A = jax.jit(lambda consts, v: A_conv(v, *consts))
    M = None if M_conv is None else jax.jit(lambda consts, v: M_conv(v, *consts))

    if eager_fns is not None:
        import warnings

        A_eager, M_eager = eager_fns
        # legitimate jit-vs-eager deviation is reduction reordering
        # (~1e-7 rel in f32); miscompiles are O(1) — a wide margin splits
        # them unambiguously
        rtol = 1e-4 if b.dtype == jnp.float32 else 1e-9
        ref = A_eager(b)
        got = A(a_consts, b)
        if float(jnp.linalg.norm(got - ref)) > rtol * (
            float(jnp.linalg.norm(ref)) + 1e-300
        ):
            warnings.warn(
                "compiled CG operator disagrees with its eager evaluation "
                "(XLA:TPU fusion miscompile — see CLAUDE.md); driving the "
                "operator eagerly (correct but slower)",
                stacklevel=3,
            )
            A = lambda consts, v: A_eager(v)
        if M is not None:
            ref = M_eager(b)
            got = M(m_consts, b)
            if float(jnp.linalg.norm(got - ref)) > rtol * (
                float(jnp.linalg.norm(ref)) + 1e-300
            ):
                warnings.warn(
                    "compiled CG preconditioner disagrees with its eager "
                    "evaluation (XLA:TPU fusion miscompile — see CLAUDE.md); "
                    "applying it eagerly (correct but slower)",
                    stacklevel=3,
                )
                M = lambda consts, v: M_eager(v)

    b_norm = float(jnp.linalg.norm(b))
    tol = float(rel_tolerance) * b_norm

    x = x0
    r, r_norm = _host_residual(b, A(a_consts, x0))
    if float(r_norm) <= tol:
        return CgResult(
            x=x,
            num_iterations=jnp.zeros((), jnp.int32),
            status=jnp.asarray(CG_CONVERGED, jnp.int32),
            residual_norm=r_norm,
        )
    z = M(m_consts, r) if M is not None else r
    rz = jnp.vdot(r, z)
    p = z
    status = -1
    k = 0
    while k < max_iter:
        Ap = A(a_consts, p)
        x1, r1, stats = _host_alpha_update(p, Ap, x, r, rz)
        pAp, r1n, pn = (float(s) for s in np.asarray(stats))
        if check_definiteness and pAp <= 0.0 and pn > 0.0:
            status = CG_INDEFINITE_OPERATOR  # keep the previous iterate
            break
        x, r, r_norm = x1, r1, r1n
        k += 1
        if r1n <= tol:
            status = CG_CONVERGED
            break
        z = M(m_consts, r) if M is not None else r
        p, rz1 = _host_beta_update(r, z, p, rz)
        if check_definiteness and float(rz1) < 0.0:
            status = CG_INDEFINITE_PRECONDITIONER
            break
        rz = rz1
    if status < 0:
        status = CG_MAX_ITER
    return CgResult(
        x=x,
        num_iterations=jnp.asarray(k, jnp.int32),
        status=jnp.asarray(status, jnp.int32),
        residual_norm=jnp.asarray(r_norm, b.dtype),
    )


def _cg_loop(A, M, b, x0, rel_tolerance, max_iter, check_definiteness):
    # Note: not jitted here — `lax.while_loop` compiles the loop body once
    # per call even eagerly, and callers embed this in an outer jit (where
    # A/M close over traced arrays) for end-to-end compilation.
    dtype = b.dtype
    b_norm = jnp.linalg.norm(b)
    tol = jnp.asarray(rel_tolerance, dtype) * b_norm

    r0 = b - A(x0)
    z0 = M(r0) if M is not None else r0
    rz0 = jnp.vdot(r0, z0)

    def cond(state):
        x, r, z, p, rz, k, status = state
        running = status < 0
        return running & (k < max_iter)

    def body(state):
        x, r, z, p, rz, k, status = state
        Ap = A(p)
        pAp = jnp.vdot(p, Ap)
        bad_op = check_definiteness & (pAp <= 0.0) & (jnp.linalg.norm(p) > 0.0)
        alpha = rz / pAp
        x1 = x + alpha * p
        r1 = r - alpha * Ap
        z1 = M(r1) if M is not None else r1
        rz1 = jnp.vdot(r1, z1)
        bad_prec = check_definiteness & (rz1 < 0.0)
        beta = rz1 / rz
        p1 = z1 + beta * p
        r1n = jnp.linalg.norm(r1)
        converged = r1n <= tol
        new_status = jnp.where(
            bad_op,
            CG_INDEFINITE_OPERATOR,
            jnp.where(
                converged,
                CG_CONVERGED,
                jnp.where(bad_prec, CG_INDEFINITE_PRECONDITIONER, -1),
            ),
        ).astype(jnp.int32)
        # On a bad operator step, keep the previous iterate.
        x1 = jnp.where(bad_op, x, x1)
        r1 = jnp.where(bad_op, r, r1)
        return (x1, r1, z1, p1, rz1, k + 1, new_status)

    init_status = jnp.where(
        jnp.linalg.norm(r0) <= tol, CG_CONVERGED, -1
    ).astype(jnp.int32)
    state = (x0, r0, z0, z0, rz0, jnp.zeros((), jnp.int32), init_status)
    x, r, z, p, rz, k, status = jax.lax.while_loop(cond, body, state)
    status = jnp.where(status < 0, CG_MAX_ITER, status).astype(jnp.int32)
    return CgResult(x=x, num_iterations=k, status=status, residual_norm=jnp.linalg.norm(r))
