"""Nonlinear hyperelasticity: energy/residual/Hessian + Newton-Krylov solve.

Parity: the reference's user-composed outer loop (fenris-solid tests +
benches/assembly.rs:81-124; SURVEY §3.3): assemble gradient and Hessian of
the elastic energy with ``MaterialEllipticOperator``, apply Dirichlet BCs,
solve with CG, drive with ``newton_line_search``.

TPU-first design: the Newton system is solved **matrix-free** — the
Hessian-vector product is ``jax.jvp`` of the assembled residual, which XLA
fuses into one batched element sweep + scatter per CG iteration (the
CSR matrix is never materialized; only its diagonal is assembled for the
Jacobi preconditioner).  Each Newton iteration (linear solve, line search,
residual) is one jitted computation; the outer loop runs on the host —
a nested CG-in-Newton while_loop is ~12x slower on XLA:TPU (see
:mod:`.optimize`).  The same sweeps shard over a device mesh by
element-data-parallelism (:mod:`.parallel`).

Homogeneous Dirichlet constraints are enforced by dof masking: constrained
residual entries are zeroed and the Hessian action is ``mask ∘ H ∘ mask +
(I - mask)`` — spectrally equivalent to the reference's symmetric row/col
elimination (assembly/global.rs:379).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import cached_property, partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import global_ as G
from .assembly import local as L
from .fem import FemSpace
from .mesh import Mesh
from .operators import EllipticOperator
from .optimize import NewtonResult, newton_line_search
from .solid import HyperelasticMaterial, MaterialEllipticOperator
from .sparse.cg import conjugate_gradient
from .utils import hoist_closure

__all__ = ["HyperelasticModel"]

# streaming band assembly: per-chunk [n*chunk, R] expansion transient
# budget and chunk floor (see _dia_stream_chunks; module-level so tests
# can exercise the dedicated-copy branch at toy sizes)
_STREAM_EXPAND_BUDGET_BYTES = 6e8
_STREAM_CHUNK_FLOOR = 8192


@dataclass
class HyperelasticModel:
    """A hyperelastic solid ready for energy/force/Hessian evaluation.

    Args:
        mesh: volumetric mesh (solution_dim = geometry dim).
        material: a :class:`~fenris_tpu.solid.HyperelasticMaterial`.
        params: material parameter pytree (broadcast or per-(element, qp)).
        rule: quadrature rule (default: canonical stiffness rule).
        dirichlet_nodes: nodes with homogeneous Dirichlet conditions.
        body_force: optional ``f(x, params) -> [d]`` source.

    .. note:: Treat instances as immutable after construction: repeated
       ``solve`` calls reuse a cached, closure-converted Newton iteration
       whose captured arrays are snapshotted at first use (see
       :func:`~fenris_tpu.optimize.newton_cache`) — mutating fields
       (params, loads, mesh data) afterwards silently keeps the old
       physics.  Build a new model instead.
    """

    mesh: Mesh
    material: HyperelasticMaterial
    params: Any
    rule: Any = None
    dirichlet_nodes: Any = None
    body_force: Optional[Callable] = None
    dtype: Any = None
    #: elements per sweep chunk; bounds peak HBM for the fused jvp element
    #: sweeps (None = single fused sweep, best for small meshes).  Large
    #: meshes are processed as a lax.scan over chunks.
    chunk_size: Optional[int] = None
    #: use the banded MXU gather/scatter kernels (:mod:`..ops.banded`)
    #: instead of XLA gather/segment_sum — the fast path for large
    #: unstructured meshes on TPU.  Requires a bandwidth-reduced (RCM)
    #: node ordering for a narrow window.
    banded: bool = False
    #: owned node range per banded block (multiple of 1024)
    banded_r_nodes: int = 4096
    #: run the element math of the banded sweeps inside the fused Pallas
    #: kernels (:mod:`..ops.em_sweep`) instead of the XLA element-minor
    #: sweep — keeps every per-quadrature-point intermediate in VMEM.
    #: Opt-in: requires TPU + f32 + broadcast (scalar) params + ``banded``;
    #: anything else silently uses the XLA sweep.  First compile of the
    #: ~600-op material body is expensive on the current Mosaic toolchain
    #: (tens of minutes, persistently cached) — enable where the warmup
    #: amortizes.
    fused_kernels: bool = False

    def __post_init__(self):
        from .quadrature.canonical import canonical_stiffness

        d = self.mesh.dim
        self.operator: EllipticOperator = MaterialEllipticOperator(self.material, dim=d)
        rule = self.rule if self.rule is not None else canonical_stiffness(self.mesh.element)
        self.tab = L.tabulate(self.mesh.element, rule)
        if self.chunk_size is None:
            # Auto-chunk: keep per-sweep (element, qp, d^4)-sized jvp
            # intermediates bounded (~1 GB class).  The hvp sweep costs
            # ~q * d^4 * 8 bytes per element with tangents.
            budget = 2**28  # elements x qp x tensor budget
            per_el = self.tab.num_points * (self.mesh.dim**4 + 2 * self.mesh.element.num_nodes * self.mesh.dim)
            max_els = max(4096, budget // max(per_el, 1))
            if self.mesh.num_cells > max_els:
                self.chunk_size = int(max_els)
        self.space = FemSpace.create(self.mesh, solution_dim=d, dtype=self.dtype)
        mask = np.ones(self.space.num_dofs, dtype=bool)
        if self.dirichlet_nodes is not None and len(self.dirichlet_nodes):
            nd = np.asarray(self.dirichlet_nodes, dtype=np.int64)
            for i in range(d):
                mask[nd * d + i] = False
        self.free_mask = jnp.asarray(mask)
        self._plan = None
        if self.banded:
            self._setup_banded()
        if self.chunk_size is not None and self._plan is None:
            # eager: never first-touched under a trace (tracer-leak hazard,
            # see _chunked)
            self._chunked()
            self._chunked_params()
        self._f_ext = self._assemble_external_forces()

    # -- banded fast path ---------------------------------------------------------

    def _setup_banded(self):
        from .ops import banded as B

        d = self.mesh.dim
        r = min(
            self.banded_r_nodes,
            max(1024, -(-self.mesh.num_vertices // 1024) * 1024),
        )
        self._plan = B.make_banded_plan(
            np.asarray(self.mesh.cells), self.mesh.num_vertices, s=d, r_nodes=r
        )
        plan = self._plan
        dt = self.space.X_geo.dtype
        self._Xg_band = jnp.asarray(
            plan.pad_elements(np.asarray(self.space.X_geo)), dtype=dt
        )
        self._valid_el = jnp.asarray(plan.valid_elements(), dtype=dt)
        E = self.mesh.num_cells

        def pad_leaf(x):
            x = np.asarray(x)
            if x.ndim >= 1 and x.shape[0] == E:
                if x.ndim >= 2 and x.shape[1] == self.tab.num_points:
                    raise ValueError(
                        "per-quadrature-point parameter leaves ([E, q, ...]) "
                        "are not supported on the banded path; use "
                        "banded=False or per-element ([E] / [E, k]) params"
                    )
                return jnp.asarray(plan.pad_elements(x))
            return x

        self._params_band = jax.tree_util.tree_map(pad_leaf, self.params)
        # chunking: group whole banded blocks so lax.scan slices stay aligned
        bp = plan.elements_per_block
        if self.chunk_size is not None:
            g = max(1, self.chunk_size // bp)
        else:
            g = plan.k_blocks
        self._band_g = min(g, plan.k_blocks)
        self._band_c = -(-plan.k_blocks // self._band_g)

    def _banded_sweep(self, u_el, assemble, out_cols):
        """Chunked element sweep over the padded banded layout.

        ``assemble(Xc, uc, params) -> [c, out_cols]``; returns
        ``[padded_elements, out_cols]`` with padding rows zeroed.
        """
        plan = self._plan
        pe = plan.padded_elements
        bp = plan.elements_per_block
        csize = self._band_g * bp
        C = self._band_c
        Xg, valid, params = self._Xg_band, self._valid_el, self._params_band
        if C == 1:
            out = assemble(Xg, u_el, params)
            return out * valid[:, None]
        pad = C * csize - pe

        def pad_chunk(x):
            if pad:
                x = jnp.concatenate([x, jnp.repeat(x[:1], pad, axis=0)])
            return x.reshape(C, csize, *x.shape[1:])

        leaves, treedef = jax.tree_util.tree_flatten(params)
        flags = [hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == pe for x in leaves]
        per_el = [pad_chunk(jnp.asarray(x)) for x, f in zip(leaves, flags) if f]

        def body(_, xs):
            Xc, vc, uc, *pls = xs
            it = iter(pls)
            merged = [next(it) if f else x for x, f in zip(leaves, flags)]
            p = jax.tree_util.tree_unflatten(treedef, merged)
            f = assemble(Xc, uc, p)
            return None, f * vc[:, None]

        _, f = jax.lax.scan(
            body, None, (pad_chunk(Xg), pad_chunk(valid), pad_chunk(u_el), *per_el)
        )
        return f.reshape(C * csize, out_cols)[:pe]

    # -- assembly ---------------------------------------------------------------

    def _local(self, u):
        return self.space.local_dofs(u)

    def _chunked(self):
        """Padded, chunk-reshaped (X_geo, dofs, valid) for lax.scan sweeps.

        Built from host numpy and cached **only outside traces**: a first
        call under a jit/jvp trace (exactly what ``mixed_precision_newton``
        does via ``jax.closure_convert``) would otherwise cache tracers
        that leak into later eager calls (UnexpectedTracerError, hit at
        1M elements in tools/solve_assembled.py).  In-trace calls rebuild
        the arrays as trace constants — closure_convert then hoists them
        to arguments, avoiding the XLA:TPU constant-gather slow path
        (CLAUDE.md).  ``__post_init__`` precomputes the cache eagerly.
        """
        if getattr(self, "_chunk_cache", None) is not None:
            return self._chunk_cache
        c = self.chunk_size
        E = self.mesh.num_cells
        pad = (-E) % c
        Xg = np.asarray(self.space.X_geo)
        dofs = np.asarray(self.space.dofs)
        valid = np.ones(E, dtype=Xg.dtype)
        if pad:
            Xg = np.concatenate([Xg, np.repeat(Xg[:1], pad, axis=0)], axis=0)
            dofs = np.concatenate([dofs, np.repeat(dofs[:1], pad, axis=0)], axis=0)
            valid = np.concatenate([valid, np.zeros(pad, dtype=Xg.dtype)])
        k = Xg.shape[0] // c
        cache = (
            jnp.asarray(Xg.reshape(k, c, *Xg.shape[1:])),
            jnp.asarray(dofs.reshape(k, c, dofs.shape[1])),
            jnp.asarray(valid.reshape(k, c)),
        )
        if not any(isinstance(x, jax.core.Tracer) for x in cache):
            self._chunk_cache = cache
        return cache

    def _chunked_params(self):
        """Chunk-reshaped per-element param leaves for the plain scanned sweeps.

        Mirrors :meth:`_chunked` for ``self.params``: leaves with a leading
        ``num_cells`` axis are padded (repeating the first element) and
        reshaped to ``[k, chunk, ...]`` so the chunk scan can slice them;
        everything else is closed over unchanged.  Classification happens at
        the full element count *before* padding, so a constant leaf whose
        length coincides with the chunk size is never misread (the
        ambiguity flagged for the local.py chunked dispatch cannot occur
        here).  Returns ``(treedef, leaves, flags, per_el_chunked)``.
        """
        cached = getattr(self, "_chunk_param_cache", None)
        if cached is not None:
            return cached
        c = self.chunk_size
        E = self.mesh.num_cells
        pad = (-E) % c
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        flags = [
            hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == E for x in leaves
        ]
        per_el = []
        traced = False
        for x, f in zip(leaves, flags):
            if not f:
                continue
            if isinstance(x, jax.core.Tracer):
                traced = True
                a = x
                if pad:
                    a = jnp.concatenate([a, jnp.repeat(a[:1], pad, axis=0)], axis=0)
            else:
                a = np.asarray(x)
                if pad:
                    a = np.concatenate([a, np.repeat(a[:1], pad, axis=0)], axis=0)
            per_el.append(jnp.asarray(a.reshape(a.shape[0] // c, c, *a.shape[1:])))
        out = (treedef, leaves, flags, tuple(per_el))
        if not traced:
            self._chunk_param_cache = out
        return out

    def _chunk_scan(self, extra, body):
        """Run ``body(Xg, uref..., valid, params) -> per-chunk value`` over
        element chunks, threading chunked per-element param leaves.

        ``extra``: additional per-chunk arrays shaped ``[k, chunk, ...]``
        to scan alongside (e.g. gathered dofs).  Returns the stacked scan
        outputs ``[k, ...]``.
        """
        Xc, dofc, validc = self._chunked()
        treedef, leaves, flags, per_el = self._chunked_params()

        def scan_body(carry, xs):
            Xg, dofs, valid, *pls = xs
            it = iter(pls)
            merged = [next(it) if f else x for x, f in zip(leaves, flags)]
            p = jax.tree_util.tree_unflatten(treedef, merged)
            return body(carry, Xg, dofs, valid, p)

        return jax.lax.scan(
            scan_body, extra, (Xc, dofc, validc, *per_el)
        )

    def _fused_active(self) -> bool:
        """Whether the fused Pallas element kernels replace the XLA sweep."""
        if not self.fused_kernels or self._plan is None:
            return False
        from .ops import em_sweep

        return (
            em_sweep.supports(self.params, self.mesh.num_cells)
            and self.space.X_geo.dtype == jnp.float32
        )

    def _sweep_vector(self, u):
        """Internal-force element sweep, optionally chunked over elements."""
        n = self.mesh.element.num_nodes
        s = self.mesh.dim
        if self._plan is not None:
            from .assembly import local_em as LE
            from .ops import banded as B

            fused = self._fused_active()
            if fused:
                from .ops import em_sweep as K

            def assemble(Xc, uc, pc):
                Xe = jnp.transpose(Xc, (1, 2, 0))
                ue = jnp.transpose(uc, (1, 2, 0))
                if fused:
                    f = K.em_vector_sweep(Xe, ue, self.operator, pc, self.tab)
                else:
                    f = LE.assemble_element_elliptic_vectors_em(
                        Xe,
                        ue,
                        self.operator,
                        LE.params_to_element_minor(pc, uc.shape[0]),
                        self.tab,
                    )
                return jnp.transpose(f, (2, 0, 1)).reshape(uc.shape[0], n * s)

            u_el = B.gather(self._plan, u.reshape(-1, s))
            f_el = self._banded_sweep(u_el, assemble, n * s)
            pe = self._plan.padded_elements
            return B.scatter_add(self._plan, f_el.reshape(pe, n, s)).reshape(-1)
        if self.chunk_size is None:
            f_el = L.assemble_element_elliptic_vectors(
                self.space.X_geo, self._local(u), self.operator, self.params, self.tab
            )
            return G.assemble_vector(f_el, self.space.dofs, self.space.num_dofs)
        from .assembly import local_em as LE

        # element-minor sweep per chunk: [*, chunk]-minor intermediates stay
        # lane-tiled; the standard-layout einsum sweep's [E, q, n, ...]
        # intermediates pad 16-21x under XLA:TPU minor-dim tiling (observed
        # 34 GB HBM at chunk 260k in f64 — tools/solve_assembled.py)
        def body(acc, Xg, dofs, valid, p):
            u_el = u[dofs].reshape(-1, n, s)
            f_em = LE.assemble_element_elliptic_vectors_em(
                jnp.transpose(Xg, (1, 2, 0)),
                jnp.transpose(u_el, (1, 2, 0)),
                self.operator,
                LE.params_to_element_minor(p, Xg.shape[0]),
                self.tab,
            )
            f_el = jnp.transpose(f_em, (2, 0, 1)).reshape(-1, n * s)
            f_el = f_el * valid[:, None]
            return (
                acc
                + jax.ops.segment_sum(
                    f_el.reshape(-1), dofs.reshape(-1), num_segments=self.space.num_dofs
                ),
                None,
            )

        out, _ = self._chunk_scan(
            jnp.zeros(self.space.num_dofs, self.space.X_geo.dtype), body
        )
        return out

    def _assemble_external_forces(self):
        dtype = self.space.X_geo.dtype
        if self.body_force is None:
            return jnp.zeros(self.space.num_dofs, dtype=dtype)
        if self._plan is not None:
            from .ops import banded as B

            n, s = self.mesh.element.num_nodes, self.mesh.dim
            pe = self._plan.padded_elements
            b_el = L.assemble_element_source_vectors(
                self._Xg_band, self.body_force, None, s, self.tab
            )
            # pin to the model dtype: a user body_force returning a
            # default-precision array (f64 under x64) would otherwise
            # promote the residual of an f32 model, and downstream
            # assembly/CG mixes f32 operators with f64 vectors
            b_el = b_el.astype(dtype) * self._valid_el[:, None]
            return B.scatter_add(self._plan, b_el.reshape(pe, n, s)).reshape(-1)
        if self.chunk_size is not None:
            # chunked sweep: the unchunked einsum path materializes
            # [E, q, d, d] jacobians (+ mapped points / f values) for the
            # whole mesh — in f64 at 3.3M hex8 that alone overflowed HBM
            # (observed 22.2 GB vs 15.75, round 4 res=149 via solve_mixed's
            # f64 twin, whose __post_init__ lands here)
            n, s = self.mesh.element.num_nodes, self.mesh.dim

            def body(acc, Xg, dofs, valid, p):
                b_el = L.assemble_element_source_vectors(
                    Xg, self.body_force, None, s, self.tab
                )
                b_el = b_el.astype(dtype) * valid[:, None]
                return (
                    acc
                    + jax.ops.segment_sum(
                        b_el.reshape(-1),
                        dofs.reshape(-1),
                        num_segments=self.space.num_dofs,
                    ),
                    None,
                )

            out, _ = self._chunk_scan(
                jnp.zeros(self.space.num_dofs, dtype), body
            )
            return out
        b_el = L.assemble_element_source_vectors(
            self.space.X_geo, self.body_force, None, self.mesh.dim, self.tab
        )
        return G.assemble_vector(
            b_el.astype(dtype), self.space.dofs, self.space.num_dofs
        )

    def energy(self, u):
        """Total potential energy E(u) = ∫ψ(∇u) - f_ext·u."""
        if self._plan is not None:
            from .assembly import local_em as LE
            from .ops import banded as B

            u_el = B.gather(self._plan, u.reshape(-1, self.mesh.dim))
            e_el = self._banded_sweep(
                u_el,
                lambda Xc, uc, pc: LE.compute_element_elliptic_energy_em(
                    jnp.transpose(Xc, (1, 2, 0)),
                    jnp.transpose(uc, (1, 2, 0)),
                    self.operator,
                    LE.params_to_element_minor(pc, uc.shape[0]),
                    self.tab,
                )[:, None],
                1,
            )
            return jnp.sum(e_el) - jnp.vdot(self._f_ext, u)
        if self.chunk_size is not None:
            from .assembly import local_em as LE

            n, s = self.mesh.element.num_nodes, self.mesh.dim

            # element-minor energy sweep (layout rationale: _sweep_vector)
            def body(acc, Xg, dofs, valid, p):
                u_el = u[dofs].reshape(-1, n, s)
                e_el = LE.compute_element_elliptic_energy_em(
                    jnp.transpose(Xg, (1, 2, 0)),
                    jnp.transpose(u_el, (1, 2, 0)),
                    self.operator,
                    LE.params_to_element_minor(p, Xg.shape[0]),
                    self.tab,
                )
                return acc + jnp.sum(e_el * valid), None

            e, _ = self._chunk_scan(jnp.zeros((), self.space.X_geo.dtype), body)
            return e - jnp.vdot(self._f_ext, u)
        e = jnp.sum(
            L.compute_element_elliptic_energy(
                self.space.X_geo, self._local(u), self.operator, self.params, self.tab
            )
        )
        return e - jnp.vdot(self._f_ext, u)

    def internal_forces(self, u):
        return self._sweep_vector(u)

    def residual(self, u):
        """Masked residual: ∇E(u) with Dirichlet dofs projected out."""
        r = self.internal_forces(u) - self._f_ext
        return jnp.where(self.free_mask, r, 0.0)

    def _tangent_sweep(self, u, v):
        """Banded Hessian action: gather u,v → closed-form tangent sweep → scatter.

        Uses :func:`~.assembly.local_em.assemble_element_elliptic_tangent_vectors_em`
        (the material's closed-form ``g_tangent``) instead of ``jax.jvp``
        over the primal sweep — no primal force computation, ~half the
        per-CG-iteration element work.
        """
        from .assembly import local_em as LE
        from .ops import banded as B

        n = self.mesh.element.num_nodes
        s = self.mesh.dim
        fused = self._fused_active()
        if fused:
            from .ops import em_sweep as K
        u_el = B.gather(self._plan, u.reshape(-1, s))
        v_el = B.gather(self._plan, v.reshape(-1, s))
        uv_el = jnp.concatenate([u_el, v_el], axis=1)  # [pe, 2n, s]

        def assemble(Xc, uvc, pc):
            uc, vc = uvc[:, :n], uvc[:, n:]
            Xe = jnp.transpose(Xc, (1, 2, 0))
            ue = jnp.transpose(uc, (1, 2, 0))
            ve = jnp.transpose(vc, (1, 2, 0))
            if fused:
                f = K.em_vector_tangent_sweep(Xe, ue, ve, self.operator, pc, self.tab)
            else:
                f = LE.assemble_element_elliptic_tangent_vectors_em(
                    Xe,
                    ue,
                    ve,
                    self.operator,
                    LE.params_to_element_minor(pc, uc.shape[0]),
                    self.tab,
                )
            return jnp.transpose(f, (2, 0, 1)).reshape(uc.shape[0], n * s)

        f_el = self._banded_sweep(uv_el, assemble, n * s)
        pe = self._plan.padded_elements
        return B.scatter_add(self._plan, f_el.reshape(pe, n, s)).reshape(-1)

    def hessian_vector_product(self, u, v):
        """Exact Hessian action (matrix-free).

        Dispatch (measured at 250k hex8 Neo-Hookean on v5e, round 3):
        fused Pallas kernels use the closed-form tangent sweep (the closed
        form is what keeps their live set VMEM-resident); the XLA banded
        path uses ``jax.jvp`` of the primal sweep — the closed-form
        tangent's XLA lowering is 3.4x *slower* than jvp-of-primal there
        (90 ms vs 26 ms; the vmapped small-matrix inverse chains lower
        poorly), so "half the math" loses to better codegen.
        """
        vm = jnp.where(self.free_mask, v, 0.0)
        if self._plan is not None and self._fused_active():
            hv = self._tangent_sweep(u, vm)
        else:
            _, hv = jax.jvp(self.internal_forces, (u,), (vm,))
        return jnp.where(self.free_mask, hv, v)

    def hessian_operator(self, u):
        """Linearized Hessian action ``v -> H(u) v`` for repeated use.

        ``jax.linearize`` runs the primal element sweep once and stores its
        linearization residuals, so every application inside a CG loop costs
        only the linear tangent sweep (one gather + tangent math + one
        scatter) instead of redoing the primal (~2x per iteration).  Trades
        ~O(q) floats per element of memory for the residuals; prefer
        :meth:`hessian_vector_product` beyond ~16M element-quadrature
        points.
        """
        _, lin = jax.linearize(self.internal_forces, u)

        def hvp(v):
            vm = jnp.where(self.free_mask, v, 0.0)
            return jnp.where(self.free_mask, lin(vm), v)

        return hvp

    def assemble_hessian_matrices(self, u, chunk: int | None = None):
        """Element Hessian blocks [E, nd, nd] (for CSR assembly / diag).

        ``chunk`` bounds device memory at large E (the 6-D contraction
        intermediates pad ~50x under XLA:TPU minor-dim tiling; see
        :func:`..assembly.local.assemble_element_elliptic_matrices`).
        """
        return L.assemble_element_elliptic_matrices(
            self.space.X_geo,
            self._local(u),
            self.operator,
            self.params,
            self.tab,
            chunk=chunk,
        )

    def hessian_diagonal(self, u):
        """Assembled Hessian diagonal (Jacobi preconditioner), masked."""
        n = self.mesh.element.num_nodes
        s = self.mesh.dim
        if self._plan is not None:
            from .assembly import local_em as LE
            from .ops import banded as B

            u_el = B.gather(self._plan, u.reshape(-1, s))
            d_el = self._banded_sweep(
                u_el,
                lambda Xc, uc, pc: jnp.transpose(
                    LE.elliptic_matrix_diagonal_em(
                        jnp.transpose(Xc, (1, 2, 0)),
                        jnp.transpose(uc, (1, 2, 0)),
                        self.operator,
                        LE.params_to_element_minor(pc, uc.shape[0]),
                        self.tab,
                    ),
                    (2, 0, 1),
                ).reshape(uc.shape[0], n * s),
                n * s,
            )
            pe = self._plan.padded_elements
            diag = B.scatter_add(self._plan, d_el.reshape(pe, n, s)).reshape(-1)
            return jnp.where(self.free_mask & (diag != 0.0), diag, 1.0)
        if self.chunk_size is None:
            A_el = self.assemble_hessian_matrices(u)
            diag_el = jnp.diagonal(A_el, axis1=1, axis2=2)
            diag = jax.ops.segment_sum(
                diag_el.reshape(-1),
                self.space.dofs.reshape(-1),
                num_segments=self.space.num_dofs,
            )
        else:
            from .assembly import local_em as LE

            # element-minor diagonal sweep (layout rationale: _sweep_vector)
            def body(acc, Xg, dofs, valid, p):
                u_el = u[dofs].reshape(-1, n, s)
                d_em = LE.elliptic_matrix_diagonal_em(
                    jnp.transpose(Xg, (1, 2, 0)),
                    jnp.transpose(u_el, (1, 2, 0)),
                    self.operator,
                    LE.params_to_element_minor(p, Xg.shape[0]),
                    self.tab,
                )
                d_el = jnp.transpose(d_em, (2, 0, 1)).reshape(-1, n * s)
                d_el = d_el * valid[:, None]
                return (
                    acc
                    + jax.ops.segment_sum(
                        d_el.reshape(-1),
                        dofs.reshape(-1),
                        num_segments=self.space.num_dofs,
                    ),
                    None,
                )

            diag, _ = self._chunk_scan(
                jnp.zeros(self.space.num_dofs, self.space.X_geo.dtype), body
            )
        return jnp.where(self.free_mask & (diag != 0.0), diag, 1.0)

    def assemble_hessian_csr(self, u):
        """Materialized CSR Hessian values (BC-eliminated)."""
        values = G.assemble_csr(self.assemble_hessian_matrices(u), self.space.pattern)
        if self.dirichlet_nodes is not None and len(self.dirichlet_nodes):
            values = G.apply_homogeneous_dirichlet_bc_csr(
                values, self.space.pattern, self.dirichlet_nodes
            )
        return values

    def block_dia_plan(self, max_diagonals=None, min_fill: float = 0.0):
        """Cached element→block-DIA assembly plan (no symbolic CSR phase).

        See :func:`~fenris_tpu.sparse.block_dia.block_dia_assembly_plan`;
        the plan depends only on the mesh and the diagonal selection, so
        it is built once and reused across Newton iterations/solves.

        Tracer safety: the plan is pure host work on concrete mesh data,
        so construction runs under ``jax.ensure_compile_time_eval()`` —
        a first call inside a jit/jvp trace (e.g. ``jax.jit`` of
        :meth:`assemble_hessian_block_dia`) still caches concrete arrays
        instead of leaking tracers (the round-3 bench failure mode); a
        tracer-leaf guard backstops the cache like :meth:`_chunked`.
        """
        from .sparse.block_dia import block_dia_assembly_plan

        key = (max_diagonals, float(min_fill))
        cache = getattr(self, "_dia_plans", None)
        if cache is None:
            cache = {}
            self._dia_plans = cache
        if key not in cache:
            with jax.ensure_compile_time_eval():
                plan = block_dia_assembly_plan(
                    np.asarray(self.mesh.cells),
                    self.mesh.num_vertices,
                    self.mesh.dim,
                    max_diagonals=max_diagonals,
                    min_fill=min_fill,
                    # models that will stream the assembly never read the
                    # [E, n, n] slot table on the fast path — keep it off
                    # the device (847 MB at 3.3M hex8)
                    host_base=(
                        self.chunk_size is not None
                        and self.mesh.num_cells > self.chunk_size
                    ),
                )
            # a band costs s*s*N values regardless of population: a mesh
            # without a bandwidth-reducing node ordering explodes D (up to
            # ~n^2 per element pair set) — warn before the bands allocation
            # does (advisor r3; pass min_fill/max_diagonals or RCM-reorder)
            band_bytes = (
                (plan.num_diagonals + plan.rem_k)
                * plan.solution_dim**2
                * plan.num_nodes
                * np.dtype(self.space.X_geo.dtype).itemsize
            )
            if plan.num_diagonals > 512 or band_bytes > 2**33:
                import warnings

                warnings.warn(
                    f"block-DIA plan keeps {plan.num_diagonals} diagonals "
                    f"(~{band_bytes / 2**30:.1f} GiB of bands, fill "
                    f"{plan.fill:.3f}) — the mesh node ordering is not "
                    "locality-preserving; RCM-reorder the mesh "
                    "(fenris_tpu.mesh.reorder) or pass min_fill/"
                    "max_diagonals to spill sparse deltas to the ELL "
                    "remainder",
                    stacklevel=2,
                )
            if not any(
                isinstance(x, jax.core.Tracer)
                for x in jax.tree_util.tree_leaves(plan)
            ):
                cache[key] = plan
            return plan
        return cache[key]

    def block_dia_expand_plan(self, max_diagonals=None, min_fill: float = 0.0):
        """Cached class-static MXU band-assembly expansion plan (or None).

        See :func:`~fenris_tpu.sparse.block_dia.band_expand_plan`; ``None``
        when the mesh has no dominant slot-signature classes (irregular
        node orderings), in which case assembly uses the flat scatter.
        Tracer-safe under traces like :meth:`block_dia_plan`.
        """
        from .sparse.block_dia import band_expand_plan

        key = (max_diagonals, float(min_fill))
        cache = getattr(self, "_dia_expand_plans", None)
        if cache is None:
            cache = {}
            self._dia_expand_plans = cache
        if key not in cache:
            with jax.ensure_compile_time_eval():
                plan = band_expand_plan(
                    np.asarray(self.mesh.cells), self.block_dia_plan(*key)
                )
            if any(
                isinstance(x, jax.core.Tracer)
                for x in jax.tree_util.tree_leaves(plan)
            ):
                return plan
            cache[key] = plan
        return cache[key]

    def assemble_hessian_block_dia(self, u, max_diagonals=None, min_fill: float = 0.0):
        """Assembled tangent-stiffness operator in block-DIA layout (no BC).

        Element Hessians (MXU-layout assembly) scattered by ONE
        deterministic segment-sum straight into the zero-gather SpMV
        layout — the TPU replacement for the reference's assemble-CSR +
        CG pipeline (global.rs:133 + cg.rs:373).  Dirichlet semantics stay
        at the operator level (dof masking, identical to the matrix-free
        path), so ``where(free, A @ where(free, v, 0), v)`` equals
        :meth:`hessian_vector_product` to assembly-order roundoff.
        """
        from .sparse.block_dia import assemble_block_dia

        plan = self.block_dia_plan(max_diagonals, min_fill)
        expand = self.block_dia_expand_plan(max_diagonals, min_fill)
        E = self.mesh.num_cells
        nd = self.mesh.element.num_nodes * self.mesh.dim
        if (
            expand is not None
            and self.chunk_size is not None
            and E > self.chunk_size
        ):
            # streaming fused assemble+scatter: the full [E, nd, nd]
            # element-matrix buffer (7.6 GB f32 at 3.3M hex8) never
            # materializes — each chunk's element-minor matrices expand to
            # band rows and accumulate into the [N, D*s*s] band stack
            # inside one scan (round-4 HBM fix for the 10M-dof assembled
            # solve, tools/solve_assembled.py)
            return self._assemble_block_dia_streamed(u, plan, expand)
        if isinstance(plan.base, np.ndarray):
            # host_base was chosen for the streamed path, but this model
            # ended up on the flat scatter (e.g. band_expand_plan returned
            # None on an irregular mesh): upload the [E, n, n] slot table
            # once instead of re-converting it through jit arguments every
            # Newton iterate (~1 GB at 3.3M hex8; advisor r4)
            dev = getattr(self, "_dia_base_device", None)
            if dev is None or dev[0] is not plan.base:
                dev = (plan.base, jax.device_put(plan.base))
                self._dia_base_device = dev
            plan = plan._replace(base=dev[1])
        mat_chunk = self.chunk_size if self.chunk_size is not None else None
        if mat_chunk is None and E * nd * nd > 2**27:
            mat_chunk = 8192  # bound the 6-D contraction transients
        A_el = self.assemble_hessian_matrices(u, chunk=mat_chunk)
        num_chunks = -(-(E * nd * nd) // 2**27)  # ~0.5 GB transients/chunk
        return assemble_block_dia(
            plan, A_el, num_chunks=num_chunks, expand=expand
        )

    def _dia_stream_chunks(self, expand):
        """All scan inputs for the streamed band assembly, chunked at the
        streaming chunk size.

        The stream chunk is capped so the per-chunk ``[n·chunk, R]``
        expansion transient stays ~0.5 GB: at the hex8 auto chunk
        (~260k elements) it is 2 GB, which — on top of the double-buffered
        ``[N, R]`` carry and the resident model/plan state — ran the
        10.1M-dof assembly out of HBM (round 4, res=149).  When the cap
        bites, dedicated padded copies of (X_geo, dofs, valid) are built at
        the stream chunk; otherwise :meth:`_chunked`'s cache is reused.
        Returns ``(Xc, dofc, validc, colsc, maskc, per_el)``.
        """
        cache = getattr(self, "_dia_stream_cache", None)
        if cache is not None and cache[0] is expand:
            return cache[1]
        n = self.mesh.element.num_nodes
        R = int(expand.M.shape[-1])
        itemsize = np.dtype(self.space.X_geo.dtype).itemsize
        cap = max(
            _STREAM_CHUNK_FLOOR, int(_STREAM_EXPAND_BUDGET_BYTES // (n * R * itemsize))
        )
        c = min(self.chunk_size, cap)
        E = self.mesh.num_cells
        pad = (-E) % c

        def chunk_np(a, pad_mode):
            a = np.asarray(a)
            if pad:
                tail = (
                    np.repeat(a[:1], pad, axis=0)
                    if pad_mode == "edge"
                    else np.zeros((pad, *a.shape[1:]), a.dtype)
                )
                a = np.concatenate([a, tail], axis=0)
            return jnp.asarray(a.reshape(a.shape[0] // c, c, *a.shape[1:]))

        if c == self.chunk_size:
            Xc, dofc, validc = self._chunked()
        else:
            Xc = chunk_np(self.space.X_geo, "edge")
            dofc = chunk_np(self.space.dofs, "edge")
            validc = chunk_np(
                np.ones(E, dtype=np.dtype(self.space.X_geo.dtype)), "zero"
            )
        colsc = chunk_np(expand.cols, "edge")
        mask = np.asarray(expand.class_mask)
        if pad:
            mask = np.concatenate(
                [mask, np.zeros((mask.shape[0], pad), mask.dtype)], axis=1
            )
        maskc = jnp.asarray(
            np.moveaxis(mask.reshape(mask.shape[0], -1, c), 1, 0)
        )  # [k, C, c]
        if self.params is None:
            per_el = ()
        else:
            leaves, _ = jax.tree_util.tree_flatten(self.params)
            per_el = tuple(
                chunk_np(x, "edge")
                for x in leaves
                if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == E
            )
        out = (Xc, dofc, validc, colsc, maskc, per_el)
        self._dia_stream_cache = (expand, out)
        return out

    def _params_subset(self, idx):
        """``self.params`` restricted to the elements in ``idx`` (leaves
        with a leading ``num_cells`` axis are gathered; others pass
        through — same classification as :meth:`_chunked_params`)."""
        if self.params is None:
            return None
        E = self.mesh.num_cells

        def conv(x):
            if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == E:
                return x[idx]
            return x

        return jax.tree_util.tree_map(conv, self.params)

    def _assemble_block_dia_streamed(self, u, plan, expand):
        """Fused chunked element-matrix assembly + band-row scatter.

        Equal to ``assemble_block_dia(plan,
        assemble_hessian_matrices(u), expand=expand)`` to summation-order
        roundoff, but peak HBM is one ``[N, D*s*s]`` accumulator plus one
        chunk's transients instead of the full element-matrix buffer.
        """
        from .sparse.block_dia import (
            BlockDiaMatrix,
            _scatter_dia_impl,
            expand_rows_pairs_masked,
        )
        from .sparse.block_ell import BlockEllMatrix

        n, s = self.mesh.element.num_nodes, self.mesh.dim
        N, D, kr = plan.num_nodes, plan.num_diagonals, plan.rem_k
        R = expand.M.shape[-1]
        dtype = self.space.X_geo.dtype
        Xc, dofc, validc, colsc, maskc, per_el = self._dia_stream_chunks(expand)
        leaves, treedef = jax.tree_util.tree_flatten(self.params)
        E = self.mesh.num_cells
        flags = [
            hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == E for x in leaves
        ]
        Md = jnp.asarray(expand.M, dtype)
        u2 = u.astype(dtype)

        fns = getattr(self, "_dia_stream_fns", None)
        if fns is None:
            fns = self._dia_stream_fns = {}
        run = fns.get((N, R))
        if run is None:
            op, tab = self.operator, self.tab

            def run_impl(u2, Xc, dofc, validc, colsc, maskc, Md, per_el, consts):
                def body(acc, xs):
                    Xg, dofs, valid, cb, mb, *pls = xs
                    it = iter(pls)
                    ic = iter(consts)
                    # non-per-element leaves ride in as jit arguments too:
                    # closing over device-array leaves would embed them as
                    # HLO constants (the closure-constant slow path /
                    # program-size blowup CLAUDE.md flags; advisor r4)
                    merged = [next(it) if f else next(ic) for f in flags]
                    p = jax.tree_util.tree_unflatten(treedef, merged)
                    u_el = u2[dofs].reshape(-1, n, s)
                    # pairs layout [(i, j), a, b, e]: the projector
                    # matmuls' native output — no reshuffle between
                    # assembly and scatter
                    vals = L.assemble_element_elliptic_matrices_pairs(
                        Xg, u_el, op, p, tab
                    ) * valid[None, None, :]
                    rows, ids = expand_rows_pairs_masked(vals, cb, mb, Md)
                    return (
                        acc
                        + jax.ops.segment_sum(rows, ids, num_segments=N),
                        None,
                    )

                bandsT, _ = jax.lax.scan(
                    body,
                    jnp.zeros((N, R), Xc.dtype),
                    (Xc, dofc, validc, colsc, maskc, *per_el),
                )
                return jnp.transpose(bandsT)

            consts0 = tuple(x for x, f in zip(leaves, flags) if not f)
            # hoist the tabulation/projector constants the element
            # assembler builds at trace time into jit arguments —
            # embedded constants take XLA:TPU's slow constant path
            # (CLAUDE.md), which is why the solver entry points hoist too
            conv, hconsts = hoist_closure(
                run_impl, u2, Xc, dofc, validc, colsc, maskc, Md,
                tuple(per_el), consts0,
            )
            run = fns[(N, R)] = (jax.jit(conv), hconsts)
        jitted, hconsts = run
        consts = tuple(x for x, f in zip(leaves, flags) if not f)
        bands = jitted(
            u2, Xc, dofc, validc, colsc, maskc, Md, tuple(per_el), consts,
            *hconsts,
        )

        total = (D + kr) * s * s * N
        rem_blocks = jnp.zeros((kr * s * s, N), dtype) if kr else None
        if expand.slow_idx is not None:
            idx_all = np.asarray(expand.slow_idx)
            # band_expand_plan only guarantees >= 50% class coverage, so the
            # slow subset can be O(E/2): chunk it like the streamed fast
            # path so one call never materializes more than mat_chunk
            # element matrices (advisor r4 — an unchunked call at 10M-dof
            # scale reintroduces the HBM spike streaming exists to avoid)
            mat_chunk = 8192
            flat = jnp.zeros(total, dtype)
            for lo in range(0, len(idx_all), mat_chunk):
                idx = idx_all[lo : lo + mat_chunk]
                Xs = self.space.X_geo[idx]
                dofs_s = self.space.dofs[idx]
                u_el = u2[dofs_s].reshape(-1, n, s)
                A_s = L.assemble_element_elliptic_matrices_em(
                    Xs, u_el, self.operator, self._params_subset(idx), self.tab
                )
                A_s = jnp.transpose(A_s, (2, 0, 1))  # element-major chunk
                flat = flat + _scatter_dia_impl(
                    A_s, plan.base[idx], total, s, N, 1
                )
            bands = bands + flat[: D * s * s * N].reshape(D * s * s, N)
            if kr:
                rem_blocks = flat[D * s * s * N :].reshape(kr * s * s, N)
        remainder = None
        if kr:
            remainder = BlockEllMatrix(
                neighbors=plan.rem_neighbors,
                blocks=rem_blocks,
                num_nodes=N,
                solution_dim=s,
            )
        return BlockDiaMatrix(
            offsets=plan.offsets,
            bands=bands,
            num_nodes=N,
            solution_dim=s,
            remainder=remainder,
        )

    def assembled_hessian_operator(
        self,
        u,
        max_diagonals=None,
        min_fill: float = 0.0,
        layout: str = "dof",
        pallas="auto",
    ):
        """(hvp, inv_diag) from one assembled block-DIA Hessian.

        The per-CG-iteration cost drops from a full nonlinear element
        tangent sweep to one streaming band sweep (~15x on v5e at 250k
        hex8); the assembly runs once per Newton iterate and amortizes
        over the CG iterations.  The Jacobi diagonal reads straight off
        the zero-offset band.

        ``layout="component"`` returns the operator over ``[s, N]``
        component-major arrays driven by the fused Pallas band sweep
        (:func:`~fenris_tpu.sparse.dia_kernel.block_dia_operator`) — the
        TPU fast form (402 GB/s effective vs 28 GB/s node-major at 1M
        dofs, v5e: node-major ``[N, s]`` views tile their minor dim to
        128 lanes, ~42x amplified).  Solvers convert the rhs/solution at
        CG entry/exit only.
        """
        m = self.assemble_hessian_block_dia(u, max_diagonals, min_fill)
        s = m.solution_dim
        d0 = m.offsets.index(0)
        free = self.free_mask
        if layout == "component":
            from .sparse.dia_kernel import block_dia_operator

            N = m.num_nodes
            diag2 = jnp.stack(
                [m.bands[(d0 * s + i) * s + i] for i in range(s)], axis=0
            )  # [s, N]
            free2 = free.reshape(N, s).T
            inv_diag2 = 1.0 / jnp.where(free2 & (diag2 != 0.0), diag2, 1.0)
            mv = block_dia_operator(m, layout="component", pallas=pallas)

            def hvp_cm(v2):
                vm = jnp.where(free2, v2, 0.0)
                return jnp.where(free2, mv(vm), v2)

            return hvp_cm, inv_diag2
        diag = jnp.stack(
            [m.bands[(d0 * s + i) * s + i] for i in range(s)], axis=1
        ).reshape(-1)
        inv_diag = 1.0 / jnp.where(self.free_mask & (diag != 0.0), diag, 1.0)

        def hvp(v):
            vm = jnp.where(free, v, 0.0)
            return jnp.where(free, m @ vm, v)

        return hvp, inv_diag

    # -- solve ------------------------------------------------------------------

    def solve(
        self,
        u0=None,
        tolerance: float = 1e-8,
        max_newton_iterations: int = 30,
        cg_rel_tolerance: float = 1e-6,
        cg_max_iter: int = 2000,
        line_search: bool = True,
        preconditioner: Optional[Callable] = None,
        assembled: bool = False,
        dia_max_diagonals: Optional[int] = None,
        dia_min_fill: float = 0.0,
    ) -> NewtonResult:
        """Newton-Krylov solve of ∇E(u) = 0 (fully jittable).

        Inner solve: preconditioned CG on the matrix-free Hessian action
        (inexact Newton; the CG tolerance is relative per iteration).
        ``preconditioner``: optional u-independent ``r -> M^{-1} r``
        callable (e.g. a
        :class:`~fenris_tpu.multigrid.GeometricMGPreconditioner`); defaults
        to assembled-diagonal Jacobi, the reference's choice
        (poisson_mms_common.rs:142).

        ``assembled=True`` assembles the tangent stiffness into the
        zero-gather block-DIA layout once per Newton iterate and runs CG
        on the streaming SpMV (:meth:`assembled_hessian_operator`) —
        much cheaper per CG iteration than the matrix-free tangent sweep
        when the mesh's node ordering keeps the diagonal count small
        (structured-ish or RCM-reordered meshes).
        ``dia_max_diagonals``/``dia_min_fill`` tune the diagonal selection
        (see :func:`~fenris_tpu.sparse.block_dia.block_dia_assembly_plan`)
        for irregular meshes where exact DIA would keep too many bands.
        """
        if u0 is None:
            u0 = jnp.zeros(self.space.num_dofs, dtype=self.space.X_geo.dtype)

        # Linearize once per Newton iteration when the residual memory is
        # affordable; fall back to per-application jvp at very large scale.
        use_lin = self.mesh.num_cells * self.tab.num_points <= 16_000_000
        if assembled:
            # build host plans outside the traced solve
            self.block_dia_plan(dia_max_diagonals, dia_min_fill)
            self.block_dia_expand_plan(dia_max_diagonals, dia_min_fill)

        # component-major CG (the Pallas band-sweep fast form) requires a
        # layout-agnostic preconditioner; custom preconditioners (e.g. MG)
        # operate on node-major flat vectors, so they keep that layout
        use_cm = assembled and preconditioner is None

        # solve() fuses assembly + CG into ONE XLA program (the hoisted
        # solve_jacobian).  Embedding the Pallas band sweep in that giant
        # program compiled fine at 27k dofs but sat >30 min in the remote
        # compiler at 750k (round 4; possibly a wedged worker, never
        # reproduced bounded) — and the kernel only pays off when many CG
        # iterations amortize it, i.e. at scale, where production runs go
        # through solve_mixed's host-loop CG (operator = own small
        # program).  Keep the fused program on the XLA cm matvec.
        fused_pallas = False

        def solve_jacobian(u, f):
            if assembled and use_cm:
                hvp2, inv_diag2 = self.assembled_hessian_operator(
                    u,
                    dia_max_diagonals,
                    dia_min_fill,
                    layout="component",
                    pallas=fused_pallas,
                )
                f2 = f.reshape(-1, inv_diag2.shape[0]).T
                res = conjugate_gradient(
                    hvp2,
                    f2,
                    preconditioner=lambda v: inv_diag2 * v,
                    rel_tolerance=cg_rel_tolerance,
                    max_iter=cg_max_iter,
                    check_definiteness=False,
                )
                return res.x.T.reshape(-1)
            if assembled:
                hvp, inv_diag = self.assembled_hessian_operator(
                    u, dia_max_diagonals, dia_min_fill
                )
                M = (
                    (lambda v: inv_diag * v)
                    if preconditioner is None
                    else preconditioner
                )
            else:
                hvp = (
                    self.hessian_operator(u)
                    if use_lin
                    else (lambda v: self.hessian_vector_product(u, v))
                )
                if preconditioner is None:
                    inv_diag = 1.0 / self.hessian_diagonal(u)
                    M = lambda v: inv_diag * v
                else:
                    M = preconditioner
            res = conjugate_gradient(
                hvp,
                f,
                preconditioner=M,
                rel_tolerance=cg_rel_tolerance,
                max_iter=cg_max_iter,
                check_definiteness=False,
            )
            return res.x

        from .optimize import identity_cache_key, newton_cache

        cache = newton_cache(
            self,
            cg_rel_tolerance,
            cg_max_iter,
            line_search,
            assembled,
            dia_max_diagonals,
            float(dia_min_fill),
            identity_cache_key(self, preconditioner)
            if preconditioner is not None
            else None,
        )
        return newton_line_search(
            self.residual,
            solve_jacobian,
            u0,
            tolerance=tolerance,
            max_iterations=max_newton_iterations,
            line_search=line_search,
            cache=cache,
        )

    def solve_mixed(
        self,
        u0=None,
        tolerance: float = 1e-10,
        max_newton_iterations: int = 30,
        cg_rel_tolerance: float = 1e-4,
        cg_max_iter: int = 2000,
        preconditioner: Optional[Callable] = None,
        cg_host_loop: Optional[bool] = None,
        assembled: bool = False,
        dia_max_diagonals: Optional[int] = None,
        dia_min_fill: float = 0.0,
        verbose: bool = False,
    ) -> NewtonResult:
        """Mixed-precision Newton-Krylov: f64 outer residual, f32 inner CG.

        The unstructured counterpart of
        :meth:`~fenris_tpu.structured.StructuredHyperelasticModel.solve_mixed`
        (see :func:`~fenris_tpu.optimize.mixed_precision_newton` for the
        algorithm): each inner CG runs on this model's fast f32 path (banded
        MXU kernels when ``banded=True``), while the outer residual/line
        search are evaluated by an f64 twin model on the plain XLA sweep —
        so the Newton iteration refines to f64 accuracy instead of stalling
        at the f32 floor (~eps*kappa).  ``tolerance`` is relative to the
        initial residual norm.  Requires ``jax_enable_x64``; the model
        itself must be in f32 speed mode.
        """
        if self.space.X_geo.dtype != jnp.float32:
            raise ValueError(
                "solve_mixed runs the inner CG on the f32 path; build the "
                "model with dtype=jnp.float32 (f64 models: use solve())"
            )
        from dataclasses import replace

        from .optimize import mixed_precision_newton

        # f64 twin on the plain XLA sweep (banded/fused kernels are
        # f32-only); evaluated once per line-search trial.  The twin must
        # chunk much earlier than the f32 auto-heuristic: the unchunked
        # standard-layout sweep's [E, q, n, d] intermediates lane-pad
        # d=3 -> 128 (42x), which in f64 is 28 GB at 238k hex8 — observed
        # XLA:TPU hbm OOM (round 4, res=62; the 260k auto-chunk threshold
        # is dtype-blind and never triggers there).
        chunk64 = self.chunk_size
        if self.mesh.num_cells > 32768:
            chunk64 = min(chunk64 or 32768, 32768)
        model64 = replace(
            self,
            dtype=jnp.float64,
            banded=False,
            fused_kernels=False,
            chunk_size=chunk64,
        )
        # probe scale ~1% of an element edge (displacement-like magnitude)
        pts = np.asarray(self.mesh.points)
        h_est = (pts.max(0) - pts.min(0)).max() / max(
            round(self.mesh.num_cells ** (1.0 / self.mesh.dim)), 1
        )
        probe = np.random.default_rng(0).standard_normal(self.space.num_dofs) * (
            0.01 * h_est
        )

        # linearize once per Newton iteration when the residual memory is
        # affordable (one gather + stored-primal tangent per CG iteration
        # instead of re-gathering/re-evaluating u element data every
        # application); same guard as solve()
        use_lin = self.mesh.num_cells * self.tab.num_points <= 16_000_000

        if cg_host_loop is None:
            # see StructuredHyperelasticModel.solve_mixed: XLA:TPU has
            # miscompiled operators fused inside the CG while_loop at
            # >1M dofs; host-loop programs are probe-validated
            cg_host_loop = self.space.num_dofs > 1_000_000

        if assembled:
            # build host plans outside the traced inner solves
            self.block_dia_plan(dia_max_diagonals, dia_min_fill)
            self.block_dia_expand_plan(dia_max_diagonals, dia_min_fill)

        # component-major fast form (see solve()): Jacobi-preconditioned
        # assembled CG runs on [s, N] arrays through the Pallas band sweep
        use_cm = assembled and preconditioner is None

        def inner_solve(k, u32, f32):
            if assembled and use_cm:
                # the Pallas band sweep hangs the remote compiler when
                # embedded in a jitted CG while_loop (see solve()); only
                # the host-loop CG may use it (operator = own program)
                hvp2, inv_diag2 = self.assembled_hessian_operator(
                    u32,
                    dia_max_diagonals,
                    dia_min_fill,
                    layout="component",
                    pallas="auto" if cg_host_loop else False,
                )
                f2 = f32.reshape(-1, inv_diag2.shape[0]).T
                cg = conjugate_gradient(
                    hvp2,
                    f2,
                    preconditioner=lambda v: inv_diag2 * v,
                    rel_tolerance=cg_rel_tolerance,
                    max_iter=cg_max_iter,
                    check_definiteness=False,
                    host_loop=bool(cg_host_loop),
                    validate_operator=bool(cg_host_loop) and k == 1,
                )
                if verbose:
                    print(
                        f"[solve_mixed it {k}] cg iters={int(cg.num_iterations)} "
                        f"status={int(cg.status)} |r|={float(cg.residual_norm):.3e}",
                        flush=True,
                    )
                return cg.x.T.reshape(-1)
            if assembled:
                hvp, inv_diag = self.assembled_hessian_operator(
                    u32, dia_max_diagonals, dia_min_fill
                )
                prec = (
                    (lambda v: inv_diag * v)
                    if preconditioner is None
                    else preconditioner
                )
            elif preconditioner is None:
                inv_diag = 1.0 / self.hessian_diagonal(u32)
                prec = lambda v: inv_diag * v
            else:
                prec = preconditioner
            if not assembled:
                hvp = (
                    self.hessian_operator(u32)
                    if use_lin
                    else (lambda v: self.hessian_vector_product(u32, v))
                )
            cg = conjugate_gradient(
                hvp,
                f32,
                preconditioner=prec,
                rel_tolerance=cg_rel_tolerance,
                max_iter=cg_max_iter,
                check_definiteness=False,
                host_loop=bool(cg_host_loop),
                # probe the compiled operator/preconditioner programs once
                # per solve (first Newton iteration) on this
                # miscompile-prone platform
                validate_operator=bool(cg_host_loop) and k == 1,
            )
            if verbose:
                print(
                    f"[solve_mixed it {k}] cg iters={int(cg.num_iterations)} "
                    f"status={int(cg.status)} |r|={float(cg.residual_norm):.3e}",
                    flush=True,
                )
            return cg.x

        u = (
            jnp.zeros(self.space.num_dofs, jnp.float64)
            if u0 is None
            else u0
        )
        return mixed_precision_newton(
            model64.residual,
            inner_solve,
            u,
            tolerance=tolerance,
            max_iterations=max_newton_iterations,
            probe=probe,
            verbose=verbose,
        )
