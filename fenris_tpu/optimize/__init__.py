"""Nonlinear solvers: Newton's method with line search, FD calculus helpers.

Parity: fenris-optimize — ``newton`` (newton.rs:61), ``newton_line_search``
(:77) with ``NewtonSettings`` (:21), ``NoLineSearch`` (:146),
``BacktrackingLineSearch`` (Armijo, :172 — alpha schedule
1, 0.75, 0.5, 0.25, 0.25², …, condition g(x+αp) ≤ (1 - cα) g(x) with
c = 1e-4, alpha_min = 1e-6); finite-difference helpers from calculus.rs
(``approximate_jacobian_fd`` :266, ``approximate_gradient_fd`` :205).

TPU-first: the residual evaluation and linear solve are callables
(typically the batched assembly kernels + CG).  With concrete inputs the
outer Newton loop runs on the host over one jitted iteration — XLA:TPU
executes a while_loop nested inside another while body ~12x slower than
the identical un-nested work, so CG-inside-Newton must not be a nested
device loop.  Under an outer trace (e.g. a fully jitted sharded step)
the solver falls back to the jit-compatible ``lax.while_loop`` form.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import hoist_closure

__all__ = [
    "NewtonResult",
    "newton",
    "newton_line_search",
    "newton_cache",
    "backtracking_alphas",
    "mixed_precision_newton",
    "approximate_jacobian_fd",
    "approximate_gradient_fd",
    "NEWTON_CONVERGED",
    "NEWTON_MAX_ITER",
    "NEWTON_LINE_SEARCH_FAILED",
]

NEWTON_CONVERGED = 0
NEWTON_MAX_ITER = 1
NEWTON_LINE_SEARCH_FAILED = 2


def newton_cache(obj, *key) -> dict:
    """Per-object Newton solver cache keyed by solver parameters.

    Returns a dict suitable for :func:`newton_line_search`'s ``cache``
    argument, stored on ``obj`` so repeated ``solve`` calls skip
    re-tracing.  Callers must ensure the captured model state is
    unchanged between uses (see ``newton_line_search``).
    """
    caches = getattr(obj, "_newton_caches", None)
    if caches is None:
        caches = {}
        object.__setattr__(obj, "_newton_caches", caches)
    return caches.setdefault(key, {})


def identity_cache_key(obj, value) -> int:
    """``id(value)`` as a :func:`newton_cache` key component, made safe.

    A bare ``id()`` key is unsound: after ``value`` is garbage-collected
    CPython may reuse its id for a *different* object, silently resurrecting
    a stale cache entry (whose closure-converted solve captured the old
    object's arrays).  Pinning ``value`` on the cache owner keeps the id
    unique for the owner's lifetime.  Used for unhashable key objects such
    as dataclass preconditioners.
    """
    pins = getattr(obj, "_newton_cache_pins", None)
    if pins is None:
        pins = []
        object.__setattr__(obj, "_newton_cache_pins", pins)
    if all(p is not value for p in pins):
        pins.append(value)
    return id(value)


class NewtonResult(NamedTuple):
    x: jnp.ndarray
    iterations: jnp.ndarray
    status: jnp.ndarray
    residual_norm: jnp.ndarray


def _alpha_schedule(max_backtracks: int):
    """The reference's alpha schedule: 1, 0.75, 0.5, 0.25, 0.25^2, ... ."""
    alphas = [1.0, 0.75, 0.5]
    a = 0.25
    while len(alphas) < max_backtracks:
        alphas.append(a)
        a *= 0.25
    return jnp.asarray(alphas[:max_backtracks])


def backtracking_alphas(max_backtracks: int = 14):
    return _alpha_schedule(max_backtracks)


def newton(
    residual: Callable,
    solve_jacobian: Callable,
    x0,
    tolerance: float,
    max_iterations: int = 50,
) -> NewtonResult:
    """Newton's method with full steps (newton.rs:61).

    ``residual(x) -> F(x)``; ``solve_jacobian(x, F) -> d`` solving
    ``J(x) d = F`` (the step taken is ``-d``).  Iterates until
    ``||F|| <= tolerance``.  Fully jittable.
    """
    return newton_line_search(
        residual, solve_jacobian, x0, tolerance, max_iterations, line_search=False
    )


def newton_line_search(
    residual: Callable,
    solve_jacobian: Callable,
    x0,
    tolerance: float,
    max_iterations: int = 50,
    line_search: bool = True,
    c: float = 1e-4,
    alpha_min: float = 1e-6,
    max_backtracks: int = 14,
    cache: Optional[dict] = None,
) -> NewtonResult:
    """Newton with Armijo backtracking (newton.rs:77, :172).

    Line search minimizes g(x) = ||F(x)||²/2 with sufficient decrease
    g(x + αp) <= (1 - cα) g(x).

    ``cache``: optional caller-owned dict.  Tracing ``residual``/
    ``solve_jacobian`` (closure_convert + jit) costs tens of seconds for
    million-element models; with a cache, repeated solves (e.g. time
    stepping with evolving initial guesses) reuse the prepared jitted
    iteration.  On a cache hit the callables are NOT re-traced: arrays
    they captured are reused as snapshotted at first use.  Pass a fresh
    dict whenever anything captured by the callables changes (new mesh,
    new loads, new parameters) — only ``x0`` varies freely.
    """
    x0 = jnp.asarray(x0)

    key = (x0.shape, str(x0.dtype), line_search, max_backtracks, float(c))
    if cache is not None and cache.get("key") == key:
        res_conv, sj_conv = cache["fns"]
        res_consts, sj_consts = cache["consts"]
    else:
        # Hoist closure-captured arrays (mesh data, tabulations, dof
        # maps...) into explicit jit arguments — constants embedded in
        # while-loop bodies hit a pathological XLA:TPU slow path (see
        # sparse/cg.py).
        res_conv, res_consts = hoist_closure(residual, x0)
        f_probe = jax.eval_shape(residual, x0)
        sj_conv, sj_consts = hoist_closure(
            solve_jacobian, x0, jnp.zeros(f_probe.shape, f_probe.dtype)
        )
        if cache is not None:
            cache.clear()
            cache["key"] = key
            cache["fns"] = (res_conv, sj_conv)
            cache["consts"] = (res_consts, sj_consts)

    # A CG while_loop nested inside the Newton while_loop runs ~12x slower
    # on XLA:TPU than the same work un-nested (measured at 1M elements on
    # v5e).  With concrete inputs, drive the outer Newton loop from the
    # host with one jitted iteration (a few ms of sync per Newton step —
    # negligible against seconds of CG).  Under an outer trace (tracer
    # inputs, e.g. a fully jitted multi-chip step) fall back to the
    # device-side while_loop, which is the only jittable form.
    leaves = jax.tree_util.tree_leaves((x0, res_consts, sj_consts))
    traced = any(isinstance(l, jax.core.Tracer) for l in leaves)
    if not traced:
        return _newton_host_loop(
            res_conv,
            sj_conv,
            res_consts,
            sj_consts,
            x0,
            tolerance,
            max_iterations,
            line_search,
            c,
            alpha_min,
            max_backtracks,
            cache=cache,
        )

    def run(res_consts, sj_consts, x0):
        return _newton_loop(
            lambda x: res_conv(x, *res_consts),
            lambda x, f: sj_conv(x, f, *sj_consts),
            x0,
            tolerance,
            max_iterations,
            line_search,
            c,
            alpha_min,
            max_backtracks,
        )

    return jax.jit(run)(res_consts, sj_consts, x0)


def _newton_host_loop(
    res_conv,
    sj_conv,
    res_consts,
    sj_consts,
    x0,
    tolerance,
    max_iterations,
    line_search,
    c,
    alpha_min,
    max_backtracks,
    cache=None,
) -> NewtonResult:
    """Host-driven Newton outer loop with a single jitted iteration.

    Semantics match :func:`_newton_loop` exactly (same line search, same
    status codes); only the outer control flow runs on the host.
    """
    if cache is not None and "step" in cache:
        init, step = cache["init"], cache["step"]
        return _drive_host_loop(
            init, step, res_consts, sj_consts, x0, tolerance, max_iterations
        )
    alphas = _alpha_schedule(max_backtracks).astype(x0.dtype)

    @jax.jit
    def init(res_consts, x0):
        f0 = res_conv(x0, *res_consts)
        return f0, jnp.linalg.norm(f0)

    @jax.jit
    def step(res_consts, sj_consts, x, f):
        d = sj_conv(x, f, *sj_consts)
        p = -d
        if line_search:
            g0 = 0.5 * jnp.vdot(f, f)

            def cond(carry):
                i, found, _, _ = carry
                return (~found) & (i < max_backtracks)

            def body(carry):
                i, _, _, _ = carry
                alpha = alphas[i]
                f_try = res_conv(x + alpha * p, *res_consts)
                g = 0.5 * jnp.vdot(f_try, f_try)
                ok = g <= (1.0 - c * alpha) * g0
                return (i + 1, ok, jnp.where(ok, alpha, 0.0), f_try)

            _, found, alpha, f1 = jax.lax.while_loop(
                cond,
                body,
                (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                 jnp.zeros((), x0.dtype), f),
            )
            x1 = x + alpha * p
            f1 = jnp.where(found, f1, f)
            x1 = jnp.where(found, x1, x)
        else:
            found = jnp.ones((), bool)
            x1 = x + p
            f1 = res_conv(x1, *res_consts)
        return x1, f1, found, jnp.linalg.norm(f1)

    if cache is not None:
        cache["init"], cache["step"] = init, step
    return _drive_host_loop(
        init, step, res_consts, sj_consts, x0, tolerance, max_iterations
    )


def _drive_host_loop(init, step, res_consts, sj_consts, x0, tolerance, max_iterations):
    x = x0
    f, fn = init(res_consts, x0)
    fn = float(fn)
    tol = float(tolerance)
    status = NEWTON_CONVERGED if fn <= tol else -1
    k = 0
    while status < 0 and k < max_iterations:
        x, f, found, fn_dev = step(res_consts, sj_consts, x, f)
        k += 1
        fn = float(fn_dev)
        if not bool(found):
            status = NEWTON_LINE_SEARCH_FAILED
        elif fn <= tol:
            status = NEWTON_CONVERGED
    if status < 0:
        status = NEWTON_MAX_ITER
    return NewtonResult(
        x=x,
        iterations=jnp.asarray(k, jnp.int32),
        status=jnp.asarray(status, jnp.int32),
        residual_norm=jnp.asarray(fn, x0.dtype),
    )


def _newton_loop(
    residual,
    solve_jacobian,
    x0,
    tolerance,
    max_iterations,
    line_search,
    c,
    alpha_min,
    max_backtracks,
) -> NewtonResult:
    tol = jnp.asarray(tolerance, x0.dtype)
    alphas = _alpha_schedule(max_backtracks).astype(x0.dtype)

    def ls_step(x, f, p):
        """Early-exit Armijo backtracking: one residual sweep per trial.

        Returns (alpha, found, f(x + alpha p)) so the accepted residual is
        reused by the caller (the reference's loop also stops at the first
        sufficient decrease, newton.rs:190-214).
        """
        g0 = 0.5 * jnp.vdot(f, f)

        def cond(carry):
            i, found, _, _ = carry
            return (~found) & (i < max_backtracks)

        def body(carry):
            i, _, _, _ = carry
            alpha = alphas[i]
            f_try = residual(x + alpha * p)
            g = 0.5 * jnp.vdot(f_try, f_try)
            ok = g <= (1.0 - c * alpha) * g0
            return (i + 1, ok, jnp.where(ok, alpha, 0.0), f_try)

        _, found, alpha, f_acc = jax.lax.while_loop(
            cond, body, (jnp.zeros((), jnp.int32), jnp.zeros((), bool),
                         jnp.zeros((), x0.dtype), f)
        )
        return alpha, found, f_acc

    def cond(state):
        x, f, k, status = state
        return (status < 0) & (k < max_iterations)

    def body(state):
        x, f, k, status = state
        d = solve_jacobian(x, f)
        p = -d
        if line_search:
            alpha, found, f1 = ls_step(x, f, p)
            fail = ~found
            alpha = jnp.where(found, alpha, 0.0)
            f1 = jnp.where(found, f1, f)
        else:
            alpha = jnp.ones((), x0.dtype)
            fail = jnp.zeros((), bool)
        x1 = x + alpha * p
        if not line_search:
            f1 = residual(x1)
        fn = jnp.linalg.norm(f1)
        new_status = jnp.where(
            fail,
            NEWTON_LINE_SEARCH_FAILED,
            jnp.where(fn <= tol, NEWTON_CONVERGED, -1),
        ).astype(jnp.int32)
        return (x1, f1, k + 1, new_status)

    f0 = residual(x0)
    init_status = jnp.where(jnp.linalg.norm(f0) <= tol, NEWTON_CONVERGED, -1).astype(
        jnp.int32
    )
    x, f, k, status = jax.lax.while_loop(
        cond, body, (x0, f0, jnp.zeros((), jnp.int32), init_status)
    )
    status = jnp.where(status < 0, NEWTON_MAX_ITER, status).astype(jnp.int32)
    return NewtonResult(
        x=x, iterations=k, status=status, residual_norm=jnp.linalg.norm(f)
    )


# ---------------------------------------------------------------------------
# Mixed-precision Newton (f64 outer residual / f32 inner Krylov)
# ---------------------------------------------------------------------------


def mixed_precision_newton(
    residual64: Callable,
    inner_solve: Callable,
    u0,
    tolerance: float,
    max_iterations: int = 30,
    probe=None,
    verbose: bool = False,
) -> NewtonResult:
    """Newton with an f64 outer residual and a caller-supplied f32 inner solve.

    Finite-precision CG's attainable accuracy is ~eps*kappa; in f32 at 1M+
    dofs that floor is ~1e-1 relative, so a pure-f32 Newton stalls after ~1
    digit.  This is the standard cure (the FEM analogue of f32-master-weight
    training): keep the iterate and the *residual evaluation* in f64
    (emulated on TPU — paid once per line-search trial), and run each inner
    Krylov solve in fast f32.  Newton itself acts as iterative refinement,
    contracting by ~kappa(H)*eps_f32 per outer iteration, and converges to
    f64 residual accuracy while that product is well below 1.

    Args:
        residual64: **eager** callable ``u64 -> f64 residual``.  It is
            closure-converted + jitted internally; if ``probe`` is given the
            compiled program is validated against the eager evaluation on it
            (XLA:TPU's emulated-f64 fusion has silently dropped sweep
            contributions from large compiled residual programs) and the
            loop falls back to eager outer residuals on mismatch.
        inner_solve: ``(k, u32, f32) -> d32`` returning the (approximate)
            Newton direction for iteration ``k`` — typically an
            f32-preconditioned CG on the model's Hessian action at ``u32``.
        u0: f64 initial iterate.
        tolerance: *relative* to the initial residual norm.
        probe: optional f64 probe vector for the compiled-residual
            validation (same shape as ``u0``).

    Used by ``StructuredHyperelasticModel.solve_mixed`` and
    ``HyperelasticModel.solve_mixed``.  Requires ``jax_enable_x64``.
    """
    if not jax.config.jax_enable_x64:
        raise ValueError("mixed_precision_newton requires jax_enable_x64")
    u0 = jnp.asarray(u0, jnp.float64)
    res_fn, res_consts = hoist_closure(residual64, u0)
    res_jit = jax.jit(lambda consts, u: res_fn(u, *consts))
    if probe is not None:
        probe = jnp.asarray(probe, jnp.float64)
        ref = residual64(probe)
        got = res_jit(res_consts, probe)
        jit_ok = float(jnp.linalg.norm(got - ref)) <= 1e-9 * (
            float(jnp.linalg.norm(ref)) + 1e-300
        )
    else:
        jit_ok = True
    if jit_ok:
        res64 = lambda u: res_jit(res_consts, u)
    else:
        if verbose:
            print(
                "[mixed_newton] compiled f64 residual disagrees with the "
                "eager evaluation (XLA:TPU f64-emulation fusion bug); "
                "falling back to eager outer residuals",
                flush=True,
            )
        res64 = residual64

    f = res64(u0)
    nf0 = float(jnp.linalg.norm(f))
    nf = nf0
    u = u0
    alphas = [float(a) for a in backtracking_alphas()]
    status, k = NEWTON_MAX_ITER, 0
    if nf0 == 0.0:
        status = NEWTON_CONVERGED
    for k in range(1, max_iterations + 1):
        d = inner_solve(k, u.astype(jnp.float32), jnp.asarray(f, jnp.float32))
        d = jnp.asarray(d).astype(jnp.float64)
        # Armijo backtracking on the f64 residual norm
        accepted = False
        for alpha in alphas:
            u_try = u - alpha * d
            f_try = res64(u_try)
            nf_try = float(jnp.linalg.norm(f_try))
            if verbose:
                print(
                    f"[mixed_newton it {k}] alpha={alpha:g} "
                    f"|f|={nf_try:.6e} (prev {nf:.6e})",
                    flush=True,
                )
            if nf_try**2 <= (1.0 - 1e-4 * alpha) * nf**2:
                u, f, nf, accepted = u_try, f_try, nf_try, True
                break
        if not accepted:
            status = NEWTON_LINE_SEARCH_FAILED
            break
        if nf <= tolerance * nf0:
            status = NEWTON_CONVERGED
            break
    return NewtonResult(
        x=u,
        iterations=jnp.asarray(k, jnp.int32),
        status=jnp.asarray(status, jnp.int32),
        residual_norm=jnp.asarray(nf),
    )


# ---------------------------------------------------------------------------
# Finite-difference calculus (test utilities; calculus.rs:156-305)
# ---------------------------------------------------------------------------


def approximate_jacobian_fd(f: Callable, x, h: float = 1e-6) -> np.ndarray:
    """Central-difference Jacobian of ``f: R^n -> R^m`` (calculus.rs:266)."""
    x = np.asarray(x, dtype=np.float64)
    f0 = np.asarray(f(x))
    J = np.zeros((f0.shape[0], x.shape[0]))
    for j in range(x.shape[0]):
        e = np.zeros_like(x)
        e[j] = h
        J[:, j] = (np.asarray(f(x + e)) - np.asarray(f(x - e))) / (2 * h)
    return J


def approximate_gradient_fd(f: Callable, x, h: float = 1e-6) -> np.ndarray:
    """Central-difference gradient of a scalar function (calculus.rs:205)."""
    x = np.asarray(x, dtype=np.float64)
    g = np.zeros_like(x)
    for j in range(x.shape[0]):
        e = np.zeros_like(x)
        e[j] = h
        g[j] = (float(f(x + e)) - float(f(x - e))) / (2 * h)
    return g
