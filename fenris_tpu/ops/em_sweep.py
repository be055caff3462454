"""Fused element-sweep Pallas kernels: VMEM-resident element math.

The XLA element-minor sweep (:mod:`..assembly.local_em`) is limited by
kernel-fusion boundaries: its ~600-op elementwise chain per quadrature
point splits into many XLA kernels whose intermediates round-trip through
HBM (~37 ms per 1M-element Neo-Hookean sweep on v5e — ~4x the VPU-bound
floor).  This module runs the *same* element-minor code inside a single
Pallas kernel per tile of 1024 elements (8 sublanes x 128 lanes), so every
intermediate lives in VMEM/VREGs and HBM traffic is just X, u(, v) in and
f out.

Tangents for Newton-Krylov Hessian actions come from tracing ``jax.jvp``
of the element function *inside* the kernel body — generic over
operators/materials, no hand-derived tangent stress.

Only f32, scalar (broadcast) parameters, and volumetric elements; the XLA
sweep remains the general path and the CPU fallback.

**Status: working but compile-expensive on the current toolchain.**  The
kernels are exact in Pallas interpreter mode (tests/test_em_kernel.py)
and the compiled vector kernel is **bit-exact on v5e** — but Mosaic takes
~25 minutes to compile the ~600-op material body (one-time per
configuration; the persistent compilation cache makes subsequent runs
instant).  Structure notes that got it compiling at all: fori over
quadrature points with pl.ds ref reads and ref accumulation with a
trivial carry (scanned-xs lowering is unimplemented; full unrolls and
value-carry fori are far worse); scoped-VMEM default of 16MB overflows
at 69.7MB, raised via ``vmem_limit_bytes``.  The production unstructured
path remains banded gather/scatter + the scanned XLA element-minor sweep
until compile times are tolerable; opt in per deployment where a 25-min
warmup amortizes.  The tangent sweep is
:func:`em_vector_tangent_sweep`, using the materials' closed-form
``g_tangent`` (e.g. Neo-Hookean cofactor identities, solid/__init__.py)
for a VMEM-sized live set — the same route that made the structured
stencil hvp kernel production (:mod:`.structured_stencil`).  (A
traced-``jax.jvp`` tangent kernel was removed in round 4: pairing a
tangent with every primal intermediate needed 168MB live vs 128MB
physical VMEM on v5e and could never compile.)
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..assembly import local_em as LE
from ..assembly.local import Tabulation

__all__ = [
    "em_vector_sweep",
    "em_vector_tangent_sweep",
    "supports",
]

_TILE = (8, 128)
_ET = _TILE[0] * _TILE[1]


def supports(params, num_elements=None) -> bool:
    """Kernel path preconditions: TPU backend + scalar or per-element params.

    Per-element ``[E]`` leaves (``num_elements`` must be given) ride into
    the kernel as tiled operands; per-quadrature-point payloads stay on
    the XLA sweep.
    """
    if jax.default_backend() != "tpu":
        return False
    return all(
        not (hasattr(x, "ndim") and x.ndim >= 1)
        or (
            num_elements is not None
            and x.ndim == 1
            and x.shape[0] == num_elements
        )
        for x in jax.tree_util.tree_leaves(params)
    )


def _prep_params(params, E):
    """Split params into per-element tile operands + a kernel-side rebuild.

    Array leaves — per-element ``[E]`` vectors and 0-d device scalars
    (which may be tracers inside jitted solvers, and which pallas rejects
    as captured constants either way) — are broadcast/padded to
    ``[Et, 8, 128]`` and passed as kernel operands; the kernel reads one
    ``[8, 128]`` tile per grid step, which
    :func:`..assembly.local_em._params_levels` maps over both batch axes.
    Python/numpy number leaves stay closure constants (inlined literals).
    """
    leaves, treedef = jax.tree_util.tree_flatten(params)
    leaves = list(leaves)
    idx, tiles = [], []
    for i, x in enumerate(leaves):
        if isinstance(x, jax.Array):
            if x.ndim == 0:
                xe = jnp.broadcast_to(x.astype(jnp.float32), (E,))
            elif x.ndim == 1 and x.shape[0] == E:
                xe = x.astype(jnp.float32)
            else:
                raise ValueError(
                    f"unsupported param leaf shape {x.shape} for the fused "
                    f"element kernels (scalar or [{E}] expected)"
                )
            idx.append(i)
            tiles.append(_pad_tiles(xe, E)[0])
        elif hasattr(x, "ndim") and x.ndim == 1 and x.shape[0] == E:
            idx.append(i)
            tiles.append(_pad_tiles(jnp.asarray(x, jnp.float32), E)[0])
        elif hasattr(x, "ndim") and x.ndim == 0:
            leaves[i] = float(x)  # numpy scalar -> inlined literal

    def rebuild(tile_vals):
        merged = list(leaves)
        for i, tv in zip(idx, tile_vals):
            merged[i] = tv
        return jax.tree_util.tree_unflatten(treedef, merged)

    return tiles, rebuild


def _pad_tiles(x, E):
    """[..., E] -> [..., Et, 8, 128] padded with edge values."""
    Et = -(-E // _ET)
    pad = Et * _ET - E
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[..., -1:], pad, axis=-1)], axis=-1)
    return x.reshape(*x.shape[:-1], Et, *_TILE), Et


def _unpad_tiles(x, E):
    """[..., Et, 8, 128] -> [..., E]."""
    return x.reshape(*x.shape[:-3], -1)[..., :E]


def _vector_kernel(op, rebuild, npar, tab, gd_ref, dp_ref, w_ref, x_ref, u_ref, *rest):
    import jax.experimental.pallas as pl

    p_refs, o_ref = rest[:npar], rest[npar]
    params = rebuild([r[0] for r in p_refs])
    X_em = x_ref[:, :, 0]
    u_em = u_ref[:, :, 0]
    q = gd_ref.shape[0]
    o_ref[:, :, 0] = u_em * jnp.zeros((), jnp.float32)

    # ref accumulation with a trivial fori carry: Mosaic compiles this
    # shape of loop quickly; big value carries and full unrolls do not
    def body(i, _):
        gd = gd_ref[pl.ds(i, 1)][0]
        dp = dp_ref[pl.ds(i, 1)][0]
        w = w_ref[pl.ds(i, 1)][0, 0]
        o_ref[:, :, 0] += LE.elliptic_vector_qp(X_em, u_em, op, params, gd, dp, w)
        return 0

    jax.lax.fori_loop(0, q, body, 0)


def _vector_tangent_kernel(
    op, rebuild, npar, tab, gd_ref, dp_ref, w_ref, x_ref, u_ref, v_ref, *rest
):
    """Closed-form tangent sweep: the live set is a single tangent-stress
    evaluation per point.  A traced-``jax.jvp`` variant of this kernel
    (removed in round 4) paired a tangent with every primal intermediate
    and exceeded physical VMEM on v5e (168 MB live vs 128 MB); the
    closed-form ``elliptic_vector_tangent_qp`` body is the fix."""
    import jax.experimental.pallas as pl

    p_refs, o_ref = rest[:npar], rest[npar]
    params = rebuild([r[0] for r in p_refs])
    X_em = x_ref[:, :, 0]
    u_em = u_ref[:, :, 0]
    v_em = v_ref[:, :, 0]
    q = gd_ref.shape[0]
    o_ref[:, :, 0] = u_em * jnp.zeros((), jnp.float32)

    def body(i, _):
        gd = gd_ref[pl.ds(i, 1)][0]
        dp = dp_ref[pl.ds(i, 1)][0]
        w = w_ref[pl.ds(i, 1)][0, 0]
        o_ref[:, :, 0] += LE.elliptic_vector_tangent_qp(
            X_em, u_em, v_em, op, params, gd, dp, w
        )
        return 0

    jax.lax.fori_loop(0, q, body, 0)


def _tables(tab: Tabulation):
    return (
        jnp.asarray(tab.geo_dphi, jnp.float32),
        jnp.asarray(tab.dphi, jnp.float32),
        jnp.asarray(tab.weights, jnp.float32)[:, None],
    )


def _call(kernel, out_nodes, s, tab, operands, Et):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    tabs = _tables(tab)
    tab_specs = [
        pl.BlockSpec(t.shape, lambda e, nd=t.ndim: (0,) * nd) for t in tabs
    ]
    # operands are [..., Et, 8, 128]: one tile of elements per grid step,
    # leading dims (node/component axes; absent for param tiles) whole
    specs = [
        pl.BlockSpec(
            x.shape[:-3] + (1,) + _TILE,
            lambda e, nl=x.ndim - 3: (0,) * nl + (e, 0, 0),
        )
        for x in operands
    ]
    return pl.pallas_call(
        kernel,
        grid=(Et,),
        in_specs=tab_specs + specs,
        out_specs=pl.BlockSpec(
            (out_nodes, s, 1) + _TILE, lambda e: (0, 0, e, 0, 0)
        ),
        out_shape=jax.ShapeDtypeStruct(
            (out_nodes, s, Et) + _TILE, jnp.float32
        ),
        # the per-point body holds ~200 [8,128]-tile temporaries on
        # Mosaic's VMEM stack; the default 16MB scoped limit is too small
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
    )(*tabs, *operands)


def em_vector_sweep(X_em, u_em, op, params, tab: Tabulation):
    """[m,d,E],[n,s,E] -> f [n,s,E]: fused elliptic vector sweep (TPU)."""
    E = X_em.shape[-1]
    n, s = u_em.shape[0], u_em.shape[1]
    Xt, Et = _pad_tiles(X_em.astype(jnp.float32), E)
    ut, _ = _pad_tiles(u_em.astype(jnp.float32), E)
    ptiles, rebuild = _prep_params(params, E)
    out = _call(
        partial(_vector_kernel, op, rebuild, len(ptiles), tab),
        n,
        s,
        tab,
        (Xt, ut, *ptiles),
        Et,
    )
    return _unpad_tiles(out, E)


def em_vector_tangent_sweep(X_em, u_em, v_em, op, params, tab: Tabulation):
    """Fused Hessian-action sweep df = (∂f/∂u)[v] with closed-form tangents.

    The kernel body calls the operator's ``g_tangent`` (closed-form
    material tangent stress, e.g. the Neo-Hookean cofactor identities)
    instead of tracing ``jax.jvp`` of the primal — a traced variant's
    per-intermediate tangent pairing exceeded physical VMEM on v5e
    (168 MB vs 128 MB) and was removed.  Interpreter-exact vs the XLA
    tangent sweep (tests/test_em_kernel.py); compiled-path status tracked
    in the module docstring.
    """
    E = X_em.shape[-1]
    n, s = u_em.shape[0], u_em.shape[1]
    Xt, Et = _pad_tiles(X_em.astype(jnp.float32), E)
    ut, _ = _pad_tiles(u_em.astype(jnp.float32), E)
    vt, _ = _pad_tiles(v_em.astype(jnp.float32), E)
    ptiles, rebuild = _prep_params(params, E)
    out = _call(
        partial(_vector_tangent_kernel, op, rebuild, len(ptiles), tab),
        n,
        s,
        tab,
        (Xt, ut, vt, *ptiles),
        Et,
    )
    return _unpad_tiles(out, E)
