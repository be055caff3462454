"""Structured-grid fast path: stencil-based assembly without gather/scatter.

On the target TPU stack, irregular gathers and scatters run at ~7M
indices/s while elementwise/slice/matmul traffic runs at HBM/MXU speed
(see ops/ and the project memory).  For **uniform box hex meshes** — the
flagship large-scale configuration (BASELINE config 5: Neo-Hookean on a
1M-element hex grid) — all FEM data movement can be expressed as *shifted
slices*:

* the per-element dof gather ``u[cells]`` becomes 8 shifted views of the
  node grid;
* the global scatter-add becomes 8 shifted slice-adds
  (``dynamic_update_slice``, not scatter);
* the geometry is affine and **identical for every element**, so the
  physical basis gradients are a tiny constant table.

The result is a pure elementwise/slice pipeline that XLA fuses, with zero
irregular memory traffic — the TPU-native equivalent of a structured
stencil code, while reusing the exact same material point functions and
Newton/CG stack as the unstructured path.

``StructuredHyperelasticModel`` mirrors :class:`~fenris_tpu.elasticity.
HyperelasticModel`` (same residual/hvp/diagonal/solve interface, same
node ordering as ``create_rectangular_uniform_hex_mesh``) and agrees with
it to roundoff; tests assert exact correspondence.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional, Tuple

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import local as L
from .mesh import Mesh
from .operators import EllipticOperator
from .optimize import NewtonResult, newton_line_search
from .quadrature.canonical import canonical_stiffness
from .reference_elements import ELEMENTS
from .solid import HyperelasticMaterial, MaterialEllipticOperator
from .sparse.cg import conjugate_gradient

__all__ = ["StructuredHyperelasticModel"]

from .config import MATMUL_PRECISION

# f32 einsums must not route through bf16 MXU passes (see config.py)
_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)

# local hex8 node -> (di, dj, dk) grid offsets, matching the reference hex
# node ordering (mesh/procedural.py create_rectangular_uniform_hex_mesh)
_OFFSETS = ((0, 0, 0), (1, 0, 0), (1, 1, 0), (0, 1, 0),
            (0, 0, 1), (1, 0, 1), (1, 1, 1), (0, 1, 1))


@dataclass
class StructuredHyperelasticModel:
    """Hyperelastic solid on a uniform box hex grid (stencil assembly).

    Args:
        cells: (ncx, ncy, ncz) cell counts.
        spacing: uniform cell edge length h.
        material/params: as in HyperelasticModel.
        dirichlet_mask: boolean [num_nodes * 3] (True = constrained) or None.
        body_force: constant [3] body force density, a callable
            ``f(x, params) -> [3]`` evaluated at quadrature points
            (spatially varying loads, manufactured solutions), or None.
    """

    cells: Tuple[int, int, int]
    spacing: float
    material: HyperelasticMaterial
    params: Any
    dirichlet_mask: Any = None
    body_force: Any = None
    dtype: Any = jnp.float32
    #: cell planes per z-chunk for the assembly sweeps (None = auto: single
    #: fused sweep for small grids; above ~128k elements a chunked lax.scan
    #: keeping each chunk's [3, 3, q, chunk] intermediates VMEM-resident —
    #: measured optimum ~8k cells/chunk with a 2-plane floor (the +1 halo
    #: plane makes thinner chunks re-read too much; v5e sweep in git history:
    #: 2 planes = 74M el/s hvp vs 20 planes = 41M at 1M elements).
    z_chunk_planes: Any = None
    #: fused Pallas stencil kernels for residual + Hessian action:
    #: "auto" (default) enables them on the TPU backend for f32 Neo-Hookean
    #: models (measured v5e, 1M elements: hvp 258M el/s vs 59M XLA, f32-
    #: roundoff agreement); True forces, False disables.  Paths that are
    #: differentiated through (energy, internal_forces) stay on XLA.
    pallas: Any = "auto"
    #: z planes per Pallas slab window
    pallas_kz: int = 4

    def __post_init__(self):
        ncx, ncy, ncz = self.cells
        if self.z_chunk_planes is None:
            E = ncx * ncy * ncz
            if E > 2**17:
                per_plane = ncx * ncy
                self.z_chunk_planes = max(2, 8192 // per_plane)
            else:
                self.z_chunk_planes = 0  # single sweep
        self.node_shape = (ncz + 1, ncy + 1, ncx + 1)  # (z, y, x) grid
        self.num_nodes = int(np.prod(self.node_shape))
        self.num_dofs = self.num_nodes * 3
        self.operator: EllipticOperator = MaterialEllipticOperator(self.material, dim=3)

        el = ELEMENTS["hex8"]
        tab = L.tabulate(el, canonical_stiffness(el))
        h = float(self.spacing)
        # Affine geometry: J = (h/2) I for every element and quadrature point.
        detJ = (h / 2.0) ** 3
        self.wdet = jnp.asarray(tab.weights * detJ, self.dtype)  # [q]
        self.gp = jnp.asarray(tab.dphi * (2.0 / h), self.dtype)  # [q, n, d]
        self.phi = jnp.asarray(tab.phi, self.dtype)  # [q, n]
        self._qp_ref = np.asarray(tab.points)  # [q, 3] in [-1, 1]^3
        self.q = tab.num_points

        if self.dirichlet_mask is not None:
            free = ~np.asarray(self.dirichlet_mask, dtype=bool)
        else:
            free = np.ones(self.num_dofs, dtype=bool)
        self.free_mask = jnp.asarray(free)
        # Grid-layout ([s, z, y, x]) mask and loads: Dirichlet masking and
        # the load subtraction MUST happen in grid layout — XLA:TPU
        # miscompiles flat-layout elementwise ops when they fuse with the
        # _ungrid transpose at large shapes (observed at (124,124,232),
        # 10.9M dofs: the first two z-planes of where(free, hv, v) took
        # wrong values under jit while the eager program was correct,
        # making the CG operator non-SPD).  Masking on the grid form and
        # transposing once at the program edge compiles correctly.
        self._free_grid = jnp.asarray(
            np.moveaxis(np.asarray(free).reshape(self.node_shape + (3,)), -1, 0).copy()
        )
        self._f_ext = self._external_forces()
        self._f_ext_grid = self._grid(self._f_ext)

    # -- helpers ---------------------------------------------------------------
    #
    # Layout note: all intermediates keep the (large) grid axes LAST so XLA
    # tiles the (8, 128) vector registers over grid points.  Arrays shaped
    # [..., d, s] with d = s = 3 minor would suffer ~100x tile-padding
    # amplification when materialized (measured on v5e); grid-minor layout
    # plus vmap(in_axes=-1) over the flattened grid avoids it entirely.

    def _grid(self, u):
        """[s, z, y, x] node grid from a flat dof vector."""
        return jnp.moveaxis(u.reshape(self.node_shape + (3,)), -1, 0)

    def _ungrid(self, g):
        """flat dof vector from [s, z, y, x]."""
        return jnp.moveaxis(g, 0, -1).reshape(-1)

    def _gather_elements(self, ug):
        """[n, s, z, y, x] element-local dofs via 8 shifted slices."""
        ncx, ncy, ncz = self.cells
        views = [
            ug[:, dk : dk + ncz, dj : dj + ncy, di : di + ncx]
            for (di, dj, dk) in _OFFSETS
        ]
        return jnp.stack(views, axis=0)

    def _scatter_nodes(self, f_el):
        """Inverse of _gather_elements: 8 shifted slice-adds (no scatter).

        ``f_el``: [n, s, zc, yc, xc] -> [s, z, y, x] node accumulation.
        """
        ncx, ncy, ncz = self.cells
        out = jnp.zeros((3,) + self.node_shape, dtype=f_el.dtype)
        for n, (di, dj, dk) in enumerate(_OFFSETS):
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, (0, dk, dj, di), (3, ncz, ncy, ncx))
                + f_el[n],
                (0, dk, dj, di),
            )
        return out

    def _qp_coords(self):
        """Physical quadrature-point coordinates, grid-minor [q, 3, zc, yc, xc].

        The box spans [0, nc*h] per axis; element (k, j, i) maps the
        reference hex [-1, 1]^3 affinely with J = (h/2) I.
        """
        ncx, ncy, ncz = self.cells
        h = float(self.spacing)
        npdt = np.float64 if self.dtype == jnp.float64 else np.float32
        qp = self._qp_ref  # [q, 3], (x, y, z) components
        cx = ((np.arange(ncx) + (qp[:, 0:1] + 1.0) / 2.0) * h).astype(npdt)
        cy = ((np.arange(ncy) + (qp[:, 1:2] + 1.0) / 2.0) * h).astype(npdt)
        cz = ((np.arange(ncz) + (qp[:, 2:3] + 1.0) / 2.0) * h).astype(npdt)
        q = qp.shape[0]
        X = np.zeros((q, 3, ncz, ncy, ncx), dtype=npdt)
        X[:, 0] = cx[:, None, None, :]
        X[:, 1] = cy[:, None, :, None]
        X[:, 2] = cz[:, :, None, None]
        return jnp.asarray(X)

    def _eval_at_qps(self, fn):
        """Evaluate ``fn(x) -> [s]`` at all quadrature points -> [q, s, zc, yc, xc]."""
        X = self._qp_coords()
        q = X.shape[0]
        pts = jnp.moveaxis(X, 1, -1).reshape(-1, 3)  # [q*E, 3]
        vals = jax.jit(jax.vmap(fn))(pts).astype(self.dtype)  # [q*E, s]
        s = vals.shape[-1]
        return jnp.moveaxis(vals.reshape((q,) + tuple(self.cells[::-1]) + (s,)), -1, 1)

    def l2_error(self, u, u_exact) -> float:
        """Quadrature L2 norm of (u_h - u_exact) over the box.

        ``u_exact(x) -> [3]``; same estimator as error.rs:313 specialized
        to the uniform grid (exact for the stiffness rule's strength).
        """
        U = self._gather_elements(self._grid(jnp.asarray(u, self.dtype)))
        uh_q = _einsum("qn,ns...->qs...", self.phi, U)  # [q, s, zc, yc, xc]
        ue_q = self._eval_at_qps(u_exact)
        d = uh_q - ue_q
        return float(jnp.sqrt(_einsum("q,qszyx->", self.wdet, d * d)))

    def _external_forces(self):
        if self.body_force is None:
            return jnp.zeros(self.num_dofs, self.dtype)
        if callable(self.body_force):
            # spatially varying load: f_ext[I] = sum_el sum_q w detJ phi_I(q) f(x_q)
            Fq = self._eval_at_qps(lambda x: self.body_force(x, self.params))
            f_el = _einsum("q,qn,qs...->ns...", self.wdet, self.phi, Fq)
            return self._ungrid(self._scatter_nodes(f_el))
        b = jnp.asarray(self.body_force, self.dtype)
        f_el_node = jnp.sum(self.wdet) / 8.0 * b  # [3]
        ones_el = jnp.broadcast_to(
            f_el_node[None, :, None, None, None],
            (8, 3, self.cells[2], self.cells[1], self.cells[0]),
        )
        return self._ungrid(self._scatter_nodes(ones_el))

    # -- assembly --------------------------------------------------------------

    def _u_grad(self, u):
        """G [d, s, q, zc, yc, xc] displacement gradients at all qps."""
        U = self._gather_elements(self._grid(u))  # [n, s, z, y, x]
        return _einsum("qnd,nszyx->dsqzyx", self.gp, U)

    def _pointwise(self, fn, G):
        """vmap a pointwise fn over the trailing (q, z, y, x) axes of G.

        ``G``: [d, s, q, zc, yc, xc]; fn takes a [d, s] matrix.  Batch axes
        stay trailing so every intermediate keeps grid-minor layout.
        """
        q = G.shape[2]
        B = int(np.prod(G.shape[3:]))
        flat = G.reshape(3, 3, q * B)
        out = jax.vmap(lambda Gp: fn(Gp), in_axes=-1, out_axes=-1)(flat)
        return out, (q, B)

    def _slab_forces_local(self, u_slab, zmask):
        """Forces of a slab of cell planes from its (slab+1)-plane node data.

        ``u_slab``: [s, slab+1, y, x]; ``zmask``: [slab] validity of each
        cell plane.  Returns [s, slab+1, y, x] local node forces.
        """
        ncx, ncy, _ = self.cells
        slab = u_slab.shape[1] - 1
        views = [
            u_slab[:, dk : dk + slab, dj : dj + ncy, di : di + ncx]
            for (di, dj, dk) in _OFFSETS
        ]
        U = jnp.stack(views, axis=0)  # [n, s, slab, yc, xc]
        G = _einsum("qnd,nszyx->dsqzyx", self.gp, U)
        q = G.shape[2]
        B = int(np.prod(G.shape[3:]))
        flat = G.reshape(3, 3, q * B)
        g = jax.vmap(
            lambda Gp: self.operator.g(Gp, self.params), in_axes=-1, out_axes=-1
        )(flat).reshape((3, 3, q) + G.shape[3:])
        f_el = _einsum("q,qnd,dsqzyx->nszyx", self.wdet, self.gp, g)
        f_el = f_el * zmask[None, None, :, None, None]
        out = jnp.zeros((3, slab + 1) + self.node_shape[1:], f_el.dtype)
        for n, (di, dj, dk) in enumerate(_OFFSETS):
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, (0, dk, dj, di), (3, slab, ncy, ncx))
                + f_el[n],
                (0, dk, dj, di),
            )
        return out

    def internal_forces_grid(self, u):
        """Internal forces in grid layout [s, z, y, x] (flat dof input)."""
        if not self.z_chunk_planes:
            G = self._u_grad(u)
            g_flat, (q, B) = self._pointwise(
                lambda Gp: self.operator.g(Gp, self.params), G
            )  # [d, s, q*B]
            g = g_flat.reshape((3, 3, q) + G.shape[3:])
            f_el = _einsum("q,qnd,dsqzyx->nszyx", self.wdet, self.gp, g)
            return self._scatter_nodes(f_el)

        # chunked: lax.scan over z-slabs of cell planes
        return self._chunked_slab_sweep(self._grid(u), self._slab_forces_local)

    def internal_forces(self, u):
        return self._ungrid(self.internal_forces_grid(u))

    def _chunked_slab_sweep(self, ug, local_fn):
        """Chunked z-slab node-field sweep: Σ of per-slab contributions.

        ``local_fn(u_slab [3, slab+1, y, x], zmask [slab]) -> [3, slab+1,
        y, x]`` local node contributions of one slab of cell planes.
        The scan *stacks* the per-slab outputs and recombines them with
        static-shape ops only.  (An earlier formulation accumulated into
        the scan carry with overlapping ``dynamic_update_slice``
        read-modify-writes; XLA:TPU silently drops slab contributions
        from that program when it fuses with the residual's downstream
        mask/subtract — observed at (62,62,116), slab=2: the first ~21
        node planes of f_ext vanished, which made solve_mixed's Newton
        direction garbage.  Stacked outputs dodge the miscompile class.)
        """
        ncx, ncy, ncz = self.cells
        slab = int(self.z_chunk_planes)
        k = -(-ncz // slab)
        ncz_pad = k * slab
        ug_p = jnp.pad(
            ug, ((0, 0), (0, ncz_pad + 1 - self.node_shape[0]), (0, 0), (0, 0))
        )
        zmask = jnp.asarray(
            (np.arange(ncz_pad) < ncz).astype(np.float32).reshape(k, slab),
            ug.dtype,
        )
        starts = jnp.asarray(np.arange(k) * slab, jnp.int32)

        def body(carry, xs):
            z0, zm = xs
            zero = jnp.zeros((), z0.dtype)
            u_slab = jax.lax.dynamic_slice(
                ug_p, (zero, z0, zero, zero), (3, slab + 1) + self.node_shape[1:]
            )
            return carry, local_fn(u_slab, zm)

        _, ys = jax.lax.scan(body, jnp.zeros((), jnp.int32), (starts, zmask))
        # ys: [k, 3, slab+1, y, x]; slab i's last plane is slab i+1's first
        owned = ys[:, :, :slab]
        owned = owned.at[1:, :, 0].add(ys[:-1, :, slab])
        grid = jnp.moveaxis(owned, 1, 0).reshape(
            (3, k * slab) + self.node_shape[1:]
        )
        grid = jnp.concatenate([grid, ys[-1, :, slab:]], axis=1)
        return grid[:, : self.node_shape[0]]

    # -- fused Pallas stencil path (ops/structured_stencil.py) -------------
    # Explicit opt-in: the kernels fuse the whole per-element chain into
    # one z-slab pass (essential HBM traffic only).  Neo-Hookean f32 only.

    def _check_pallas(self):
        from .solid import NeoHookeanMaterial

        if not isinstance(self.material, NeoHookeanMaterial):
            raise NotImplementedError("Pallas stencil path is Neo-Hookean only")
        if self.dtype != jnp.float32:
            # the stencil kernels compute in f32; silently downcasting an
            # f64 model would break the solve_mixed outer-residual contract
            raise NotImplementedError(
                "Pallas stencil kernels are f32-only; use dtype=jnp.float32 "
                "(f64 models must take the XLA path, e.g. pallas=False)"
            )

    def _pallas_active(self) -> bool:
        if self.pallas is True:
            self._check_pallas()  # loud error beats a silent f32 downcast
            return True
        if self.pallas != "auto":
            return False
        from .solid import NeoHookeanMaterial

        return (
            jax.default_backend() == "tpu"
            and self.dtype == jnp.float32
            and isinstance(self.material, NeoHookeanMaterial)
        )

    def internal_forces_pallas_grid(self, u, KZ: int = 4):
        """Internal forces via the fused Pallas z-slab kernel, grid layout."""
        self._check_pallas()
        from .ops.structured_stencil import neo_hookean_residual_pallas

        return neo_hookean_residual_pallas(
            self._grid(u), self.spacing, float(self.params.mu), float(self.params.lam), KZ=KZ
        )

    def internal_forces_pallas(self, u, KZ: int = 4):
        return self._ungrid(self.internal_forces_pallas_grid(u, KZ=KZ))

    def residual_pallas(self, u, KZ: int = 4):
        # grid-layout subtract/mask (see __post_init__ note on the
        # flat-op + _ungrid-transpose fusion miscompile)
        rg = self.internal_forces_pallas_grid(u, KZ=KZ) - self._f_ext_grid
        return self._ungrid(jnp.where(self._free_grid, rg, 0.0))

    def hessian_vector_product_pallas(self, u, v, KZ: int = 4):
        """Hessian action via the fused closed-form tangent kernel."""
        self._check_pallas()
        from .ops.structured_stencil import neo_hookean_hvp_pallas

        vg = self._grid(v)
        hv = neo_hookean_hvp_pallas(
            self._grid(u), jnp.where(self._free_grid, vg, 0.0), self.spacing,
            float(self.params.mu), float(self.params.lam), KZ=KZ,
        )
        return self._ungrid(jnp.where(self._free_grid, hv, vg))

    def residual(self, u):
        if self._pallas_active():
            return self.residual_pallas(u, KZ=self.pallas_kz)
        rg = self.internal_forces_grid(u) - self._f_ext_grid
        return self._ungrid(jnp.where(self._free_grid, rg, 0.0))

    def hessian_vector_product(self, u, v):
        if self._pallas_active():
            return self.hessian_vector_product_pallas(u, v, KZ=self.pallas_kz)
        vg = self._grid(v)
        vm = self._ungrid(jnp.where(self._free_grid, vg, 0.0))
        _, hvg = jax.jvp(self.internal_forces_grid, (u,), (vm,))
        return self._ungrid(jnp.where(self._free_grid, hvg, vg))

    def energy(self, u):
        if not self.z_chunk_planes:
            G = self._u_grad(u)
            q = G.shape[2]
            B = int(np.prod(G.shape[3:]))
            flat = G.reshape(3, 3, q * B)
            psi = jax.vmap(
                lambda Gp: self.operator.energy(Gp, self.params), in_axes=-1, out_axes=-1
            )(flat)
            psi = psi.reshape((q,) + G.shape[3:])
            return _einsum("q,qzyx->", self.wdet, psi) - jnp.vdot(self._f_ext, u)

        # chunked: lax.scan over z-slabs (the unchunked [d,s,q,grid] chain
        # is ~8GB f32 / 16GB f64 at 10M dofs — past HBM)
        ncx, ncy, ncz = self.cells
        slab = int(self.z_chunk_planes)
        k = -(-ncz // slab)
        ncz_pad = k * slab
        ug = self._grid(u)
        ug_p = jnp.pad(ug, ((0, 0), (0, ncz_pad + 1 - self.node_shape[0]), (0, 0), (0, 0)))
        zmask = jnp.asarray(
            (np.arange(ncz_pad) < ncz).astype(np.float32).reshape(k, slab), ug.dtype
        )
        starts = jnp.asarray(np.arange(k) * slab, jnp.int32)

        def body(acc, xs):
            z0, zm = xs
            zero = jnp.zeros((), z0.dtype)
            u_slab = jax.lax.dynamic_slice(
                ug_p, (zero, z0, zero, zero), (3, slab + 1) + self.node_shape[1:]
            )
            views = [
                u_slab[:, dk : dk + slab, dj : dj + ncy, di : di + ncx]
                for (di, dj, dk) in _OFFSETS
            ]
            U = jnp.stack(views, axis=0)  # [n, s, slab, yc, xc]
            G = _einsum("qnd,nszyx->dsqzyx", self.gp, U)
            q = G.shape[2]
            B = int(np.prod(G.shape[3:]))
            flat = G.reshape(3, 3, q * B)
            psi = jax.vmap(
                lambda Gp: self.operator.energy(Gp, self.params),
                in_axes=-1,
                out_axes=-1,
            )(flat).reshape((q,) + G.shape[3:])
            psi = psi * zm[None, :, None, None]
            return acc + _einsum("q,qzyx->", self.wdet, psi), None

        e, _ = jax.lax.scan(body, jnp.zeros((), ug.dtype), (starts, zmask))
        return e - jnp.vdot(self._f_ext, u)

    def _slab_diag_local(self, u_slab, zmask):
        """Hessian-diagonal contributions of a slab ([s, slab+1, y, x])."""
        ncx, ncy, _ = self.cells
        slab = u_slab.shape[1] - 1
        views = [
            u_slab[:, dk : dk + slab, dj : dj + ncy, di : di + ncx]
            for (di, dj, dk) in _OFFSETS
        ]
        U = jnp.stack(views, axis=0)
        G = _einsum("qnd,nszyx->dsqzyx", self.gp, U)
        q = G.shape[2]
        B = int(np.prod(G.shape[3:]))
        flat = G.reshape(3, 3, q * B)
        D = jax.vmap(
            lambda Gp: self.operator.contraction(Gp, self.params),
            in_axes=-1,
            out_axes=-1,
        )(flat).reshape((3, 3, 3, 3, q) + G.shape[3:])
        d_el = _einsum("q,qnk,kimiqzyx,qnm->nizyx", self.wdet, self.gp, D, self.gp)
        d_el = d_el * zmask[None, None, :, None, None]
        out = jnp.zeros((3, slab + 1) + self.node_shape[1:], d_el.dtype)
        for n, (di, dj, dk) in enumerate(_OFFSETS):
            out = jax.lax.dynamic_update_slice(
                out,
                jax.lax.dynamic_slice(out, (0, dk, dj, di), (3, slab, ncy, ncx))
                + d_el[n],
                (0, dk, dj, di),
            )
        return out

    def hessian_diagonal(self, u):
        """Assembled Hessian diagonal via the contraction tensor stencil."""
        if not self.z_chunk_planes:
            G = self._u_grad(u)
            q = G.shape[2]
            D_flat, (q, B) = self._pointwise(
                lambda Gp: self.operator.contraction(Gp, self.params), G
            )  # [k, i, m, j, q*B]
            D = D_flat.reshape((3, 3, 3, 3, q) + G.shape[3:])
            # d_el[n, i, ...] = sum_q w gp[q,n,k] D[k,i,m,i] gp[q,n,m]
            d_el = _einsum(
                "q,qnk,kimiqzyx,qnm->nizyx", self.wdet, self.gp, D, self.gp
            )
            dg = self._scatter_nodes(d_el)
            return self._ungrid(jnp.where(self._free_grid & (dg != 0.0), dg, 1.0))

        dg = self._chunked_slab_sweep(self._grid(u), self._slab_diag_local)
        return self._ungrid(jnp.where(self._free_grid & (dg != 0.0), dg, 1.0))

    # -- solve -----------------------------------------------------------------

    def solve(
        self,
        u0=None,
        tolerance: float = 1e-6,
        max_newton_iterations: int = 30,
        cg_rel_tolerance: float = 1e-5,
        cg_max_iter: int = 1000,
        line_search: bool = True,
        preconditioner: str = "jacobi",
    ) -> NewtonResult:
        """Newton-Krylov solve; ``preconditioner`` is "jacobi" or "mg"
        (geometric multigrid V-cycle — essential at 1M+ dofs, see
        :mod:`fenris_tpu.multigrid`)."""
        if u0 is None:
            u0 = jnp.zeros(self.num_dofs, self.dtype)

        mg = None
        if preconditioner == "mg":
            from .multigrid import StructuredMGPreconditioner

            mg = StructuredMGPreconditioner(self)

        def solve_jacobian(u, f):
            if mg is not None:
                prec = mg
            else:
                inv_diag = 1.0 / self.hessian_diagonal(u)
                prec = lambda v: inv_diag * v
            return conjugate_gradient(
                lambda v: self.hessian_vector_product(u, v),
                f,
                preconditioner=prec,
                rel_tolerance=cg_rel_tolerance,
                max_iter=cg_max_iter,
                check_definiteness=False,
            ).x

        from .optimize import newton_cache

        cache = newton_cache(self, "newton", cg_rel_tolerance, cg_max_iter, line_search)
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
        cg_max_iter: int = 1000,
        preconditioner: str = "mg",
        cg_host_loop: Optional[bool] = None,
        verbose: bool = False,
    ) -> NewtonResult:
        """Mixed-precision Newton-Krylov: f64 outer residual, f32 inner CG.

        Finite-precision CG's attainable accuracy is ~eps*kappa; in f32 at
        1M+ dofs that floor is ~1e-1 relative, so a pure-f32 Newton stalls
        after ~1 digit.  This is the standard cure (and the FEM analogue of
        f32-master-weight training): keep the iterate and the *residual
        evaluation* in f64 (emulated on TPU — paid once per Newton
        iteration), and run each inner Krylov solve in fast f32.  Newton
        itself acts as iterative refinement, converging to f64 residual
        accuracy while all per-CG-iteration work stays at f32 speed.

        Regime: refinement contracts by ~kappa(H)*eps_f32 per outer
        iteration, so it reaches f64 accuracy while that product is well
        below 1 (measured on v5e: 32^3 -> 2.6e-11 rel in 3 iterations,
        89 s; at 96^3 elasticity kappa*eps_f32 ~ 0.1 and the stall matches
        the pure-f32 floor — tighter tolerances there need f64 inner
        solves, i.e. ``dtype=jnp.float64`` throughout).

        ``tolerance`` is relative to the initial residual norm.  Requires
        ``jax_enable_x64``.

        ``cg_host_loop``: drive the inner CG from the host (separate
        device programs for the Pallas operator and the MG V-cycle).
        Default ``None`` = auto: on for MG-preconditioned models above
        3M dofs, where fusing the Pallas hvp and the unrolled V-cycle
        into one ``while_loop`` program has faulted the TPU worker.
        """
        from dataclasses import replace

        from .optimize import mixed_precision_newton

        # pallas=False: the f64 outer residual must run the XLA path (the
        # Pallas kernels are f32-only and would silently downcast it).
        # mixed_precision_newton closure-converts + probe-validates the
        # compiled residual (XLA:TPU's emulated-f64 fusion has silently
        # dropped z-slab contributions — see _chunked_slab_sweep).
        model64 = replace(self, dtype=jnp.float64, pallas=False)
        probe = jnp.asarray(
            np.random.default_rng(0).standard_normal(self.num_dofs)
            * (0.01 * self.spacing),
            jnp.float64,
        )

        mg = None
        if preconditioner == "mg":
            from .multigrid import StructuredMGPreconditioner

            mg = StructuredMGPreconditioner(self)
        if cg_host_loop is None:
            # Host loop above 1M dofs: XLA:TPU has miscompiled the operator
            # *inside* the fused CG while_loop at (62,62,116) (reported
            # |r| 1e-8, true residual 0.196 — device-loop-only; the
            # standalone jit of the same hvp is bit-exact), and faulted the
            # worker at >=10M with Pallas+MG.  Host-loop programs are
            # individually probe-validated (validate_operator) and the
            # 2 readbacks/iter are negligible against >=10ms operators.
            cg_host_loop = self.num_dofs > 1_000_000

        def inner_solve(k, u32, f32):
            if mg is not None:
                prec = mg
            else:
                inv_diag = 1.0 / self.hessian_diagonal(u32)
                prec = lambda v: inv_diag * v
            cg = conjugate_gradient(
                lambda v: self.hessian_vector_product(u32, v),
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

        u = jnp.zeros(self.num_dofs, jnp.float64) if u0 is None else u0
        return mixed_precision_newton(
            model64.residual,
            inner_solve,
            u,
            tolerance=tolerance,
            max_iterations=max_newton_iterations,
            probe=probe,
            verbose=verbose,
        )

    # -- interop ---------------------------------------------------------------

    def to_mesh(self) -> Mesh:
        """The equivalent unstructured mesh (same node ordering)."""
        from .mesh.procedural import create_rectangular_uniform_hex_mesh

        ncx, ncy, ncz = self.cells
        return create_rectangular_uniform_hex_mesh(self.spacing, ncx, ncy, ncz, 1)
