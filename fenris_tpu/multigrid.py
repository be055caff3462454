"""Geometric multigrid preconditioning for structured-grid elasticity.

The reference's linear solver story is Jacobi-preconditioned CG
(fenris-sparse cg.rs) — adequate at its shared-memory scales but O(1/h)
iterations.  At the TPU-native target scale (10M+ dofs) the inner Krylov
solve dominates; this module supplies the missing piece: a **matrix-free
geometric V-cycle** on the uniform hex grid, where every transfer operator
is pure slicing/averaging (no gather/scatter — the same hardware insight
as :mod:`.structured`):

* level hierarchy: cell counts halved per level while even;
* level operators: **rediscretized constant-coefficient linear elasticity**
  (the u-independent small-strain Hessian) via the same stencil machinery
  (`StructuredHyperelasticModel` with `LinearElasticMaterial`), built once
  and reused across all Newton iterations — a spectrally-equivalent
  preconditioner for the Neo-Hookean Hessian at moderate strains;
* smoother: damped Jacobi (symmetric pre/post, SPD-preserving);
* transfers: full-weighting restriction / trilinear prolongation as
  strided slices;
* Dirichlet constraints: masked at every level (masks restricted by
  injection).

Used as the preconditioner inside the existing CG; tests verify V-cycle
symmetry/positivity behavior indirectly through CG convergence-rate
improvements and exact-solution recovery.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, List, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .solid import LameParameters, LinearElasticMaterial

__all__ = [
    "StructuredMGPreconditioner",
    "GeometricMGPreconditioner",
    "rcm_refined_hierarchy",
]


def _smooth_axis(a, axis):
    """[1/4, 1/2, 1/4] stencil along an axis with zero (Dirichlet) edges."""
    lo = jnp.concatenate(
        [jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis)),
         jax.lax.slice_in_dim(a, 0, a.shape[axis] - 1, axis=axis)],
        axis=axis,
    )
    hi = jnp.concatenate(
        [jax.lax.slice_in_dim(a, 1, a.shape[axis], axis=axis),
         jnp.zeros_like(jax.lax.slice_in_dim(a, 0, 1, axis=axis))],
        axis=axis,
    )
    return 0.25 * lo + 0.5 * a + 0.25 * hi


def _restrict(v):
    """Galerkin restriction R = Pᵀ on a [s, z, y, x] node grid (fine->coarse).

    Pᵀ for trilinear prolongation has per-axis weights [1/2, 1, 1/2]
    (zero-extended at boundaries); fine grids have odd node counts (2m+1),
    coarse nodes at even fine indices.  Using Pᵀ (not the averaged
    [1/4,1/2,1/4] form) keeps the restricted residual consistent with the
    rediscretized coarse FEM operator, whose entries scale like h in 3D.
    """
    for axis in (1, 2, 3):
        v = 2.0 * _smooth_axis(v, axis)
    return v[:, ::2, ::2, ::2]


def _prolong_axis(a, axis):
    """Linear interpolation doubling (2m+1 -> 4m+1 nodes) along an axis."""
    n = a.shape[axis]
    left = jax.lax.slice_in_dim(a, 0, n - 1, axis=axis)
    right = jax.lax.slice_in_dim(a, 1, n, axis=axis)
    mid = 0.5 * (left + right)
    # interleave: out[2i] = a[i], out[2i+1] = mid[i]
    stacked = jnp.stack([left, mid], axis=axis + 1)
    shape = list(a.shape)
    shape[axis] = 2 * (n - 1)
    inter = stacked.reshape(shape)
    last = jax.lax.slice_in_dim(a, n - 1, n, axis=axis)
    return jnp.concatenate([inter, last], axis=axis)


def _prolong(v):
    """Trilinear prolongation (coarse -> fine) on [s, z, y, x] node grids."""
    for axis in (1, 2, 3):
        v = _prolong_axis(v, axis)
    return v


@dataclass
class StructuredMGPreconditioner:
    """V-cycle preconditioner for a structured hyperelastic model.

    Args:
        model: a :class:`~fenris_tpu.structured.StructuredHyperelasticModel`
            (provides grid geometry, Lamé parameters and the Dirichlet mask).
        num_smooth: pre- and post-smoothing sweeps (damped Jacobi).
        omega: Jacobi damping.
        coarse_iters: Jacobi iterations at the coarsest level.
    """

    model: Any
    num_smooth: int = 2
    omega: float = 0.5
    coarse_iters: int = 40

    def __post_init__(self):
        m = self.model
        params = m.params
        mu = float(params.mu)
        lam = float(params.lam)

        # Build the level hierarchy: (cells, spacing, linear model, masks)
        from .structured import StructuredHyperelasticModel

        self.levels: List[dict] = []
        cells = tuple(int(c) for c in m.cells)
        spacing = float(m.spacing)
        free = np.asarray(m.free_mask).reshape(m.node_shape + (3,))
        while True:
            lin = StructuredHyperelasticModel(
                cells=cells,
                spacing=spacing,
                material=LinearElasticMaterial(),
                params=LameParameters(mu=mu, lam=lam),
                dtype=m.dtype,
            )
            u0 = jnp.zeros(lin.num_dofs, m.dtype)
            diag = lin.hessian_diagonal(u0)
            free_flat = jnp.asarray(free.reshape(-1))
            diag = jnp.where(free_flat, diag, 1.0)
            # grid-layout ([s, z, y, x]) mask/diagonal: the V-cycle runs
            # entirely in grid layout — flat elementwise ops fused with the
            # _grid/_ungrid transposes miscompile on XLA:TPU at large
            # shapes (see StructuredHyperelasticModel.__post_init__)
            self.levels.append(
                dict(
                    model=lin,
                    node_shape=lin.node_shape,
                    free=free_flat,
                    inv_diag=1.0 / diag,
                    free_grid=lin._grid(free_flat),
                    inv_diag_grid=lin._grid(1.0 / diag),
                )
            )
            if any(c % 2 or c < 4 for c in cells) or len(self.levels) >= 6:
                break
            cells = tuple(c // 2 for c in cells)
            spacing *= 2.0
            free = free[::2, ::2, ::2, :]  # injection of the constraint mask

    # -- level operations -----------------------------------------------------

    # All level operations run in grid layout [s, z, y, x]: the only
    # flat<->grid transposes are at __call__'s edges, so no flat
    # elementwise op can fuse with a transpose (the XLA:TPU miscompile
    # class documented in StructuredHyperelasticModel.__post_init__).

    def _apply_g(self, lvl, vg):
        L = self.levels[lvl]
        vm = jnp.where(L["free_grid"], vg, 0.0)
        # linear material: Hessian action == internal forces (u-independent)
        avg = L["model"].internal_forces_grid(L["model"]._ungrid(vm))
        return jnp.where(L["free_grid"], avg, vg)

    def _smooth_g(self, lvl, xg, bg, iters):
        L = self.levels[lvl]
        # Unrolled on purpose: a fori_loop lowers to while_loop, and a
        # while nested inside the CG while_loop runs ~12x slower on
        # XLA:TPU (measured; see optimize/__init__.py).  iters is small.
        for _ in range(int(iters)):
            rg = bg - self._apply_g(lvl, xg)
            xg = xg + self.omega * L["inv_diag_grid"] * rg
        return xg

    def _vcycle_g(self, lvl, bg):
        xg = self._smooth_g(lvl, jnp.zeros_like(bg), bg, self.num_smooth)
        if lvl == len(self.levels) - 1:
            return self._smooth_g(lvl, xg, bg, self.coarse_iters)
        rg = bg - self._apply_g(lvl, xg)
        r_c = jnp.where(self.levels[lvl + 1]["free_grid"], _restrict(rg), 0.0)
        e_c = self._vcycle_g(lvl + 1, r_c)
        eg = jnp.where(self.levels[lvl]["free_grid"], _prolong(e_c), 0.0)
        return self._smooth_g(lvl, xg + eg, bg, self.num_smooth)

    def __call__(self, r):
        """Apply the V-cycle preconditioner: M^{-1} r."""
        m = self.levels[0]["model"]
        return m._ungrid(self._vcycle_g(0, m._grid(r)))


# ---------------------------------------------------------------------------
# Unstructured geometric multigrid over a refinement hierarchy
# ---------------------------------------------------------------------------


def rcm_refined_hierarchy(coarse_mesh, levels: int):
    """Refine ``levels`` times, then RCM-reorder the finest mesh.

    Returns ``(fine_mesh, fine_permutation)``: the bandwidth-reduced fine
    mesh to build the (banded) model on, and the ``new -> old`` vertex
    relabeling to hand to
    :class:`GeometricMGPreconditioner(fine_permutation=...)` so its
    transfer operators follow the reordering.
    """
    from .mesh.refinement import refine_uniformly_repeat
    from .mesh.reorder import reorder_mesh, reverse_cuthill_mckee

    fine = refine_uniformly_repeat(coarse_mesh, levels)
    perm = reverse_cuthill_mckee(fine).astype(np.int64)
    fine_r, _ = reorder_mesh(fine, perm)
    return fine_r, perm


def _prolong_unstructured(parents, weights, u_c):
    """Apply P: coarse nodal field [Nc, s] -> fine [Nf, s]."""
    return jnp.sum(weights[:, :, None] * u_c[parents], axis=1)


def _restrict_unstructured(parents, weights, r_f, num_coarse: int):
    """Apply Pᵀ: fine nodal field [Nf, s] -> coarse [Nc, s]."""
    s = r_f.shape[-1]
    contrib = (weights[:, :, None] * r_f[:, None, :]).reshape(-1, s)
    return jax.ops.segment_sum(
        contrib, jnp.asarray(parents).reshape(-1), num_segments=num_coarse
    )


@dataclass
class GeometricMGPreconditioner:
    """Matrix-free geometric V-cycle for *unstructured* hyperelastic models.

    The unstructured counterpart of :class:`StructuredMGPreconditioner`:
    the caller supplies the coarse mesh whose ``levels``-fold uniform
    refinement produced the model's fine mesh
    (:func:`~fenris_tpu.mesh.refinement.refine_uniformly_repeat`); transfer
    operators come from the refinement's sparse prolongation
    (:func:`~fenris_tpu.mesh.refinement.prolongation_for_refinement`,
    restriction = transpose), and every level's operator is a
    **rediscretized constant-coefficient linear-elastic Hessian** — the
    same spectral-equivalence strategy as the structured path, so the
    preconditioner is u-independent and built once per model.

    Extends the reference beyond its Jacobi-CG solver story
    (fenris-sparse/src/cg.rs): at >=1M dofs Jacobi-CG iteration counts grow
    like O(1/h) while the V-cycle keeps them roughly flat.

    **Composing with the banded fast path.**  The banded MXU kernels
    (:mod:`.ops.banded`) need a bandwidth-reduced (RCM) node ordering,
    while the refinement hierarchy's transfers are expressed in
    refinement ordering (coarse nodes a prefix, midpoints appended — the
    worst possible bandwidth).  Passing ``fine_permutation`` (the
    ``new -> old`` vertex relabeling that produced ``model.mesh`` from
    ``refine_uniformly_repeat(coarse_mesh, levels)``; see
    :func:`rcm_refined_hierarchy`) makes the preconditioner relabel the
    transfer arrays and per-level Dirichlet sets into the model's
    ordering, so the V-cycle runs natively on the RCM mesh with no
    permutation gathers in the hot path.  With ``banded=True`` the
    intermediate levels are additionally RCM-reordered themselves and
    every level's rediscretized operator uses the banded MXU sweeps.
    """

    model: Any  # HyperelasticModel on the fine mesh
    coarse_mesh: Any  # Mesh whose `levels`-fold refinement is model.mesh
    levels: int
    num_smooth: int = 2
    omega: float = 0.5
    coarse_iters: int = 40
    #: new->old vertex relabeling of the finest mesh (None = refinement
    #: ordering, i.e. model.mesh is exactly the repeated refinement)
    fine_permutation: Any = None
    #: per-level banded MXU sweeps (requires ``fine_permutation``)
    banded: bool = False

    def __post_init__(self):
        from .elasticity import HyperelasticModel
        from .mesh.refinement import (
            prolongation_for_refinement,
            refine_uniformly,
        )
        from .mesh.reorder import reorder_mesh, reverse_cuthill_mckee

        m = self.model
        s = m.mesh.dim
        # scalar Lamé parameters for the rediscretized levels (per-element
        # fields are averaged: the preconditioner only needs spectral
        # equivalence, not exactness)
        params = m.params
        mu = float(np.mean(np.asarray(params.mu)))
        lam = float(np.mean(np.asarray(params.lam)))
        dirichlet_f = (
            np.asarray(m.dirichlet_nodes, dtype=np.int64)
            if m.dirichlet_nodes is not None
            else np.zeros(0, dtype=np.int64)
        )

        meshes = [self.coarse_mesh]
        transfers = []  # per refinement step: (parents, weights)
        for _ in range(self.levels):
            transfers.append(prolongation_for_refinement(meshes[-1]))
            meshes.append(refine_uniformly(meshes[-1]))
        if meshes[-1].num_vertices != m.mesh.num_vertices:
            raise ValueError(
                "coarse_mesh refined `levels` times does not match the "
                f"model mesh ({meshes[-1].num_vertices} vs "
                f"{m.mesh.num_vertices} vertices)"
            )
        if self.banded and self.fine_permutation is None:
            raise ValueError(
                "banded=True needs fine_permutation: refinement ordering "
                "is not bandwidth-reduced (use rcm_refined_hierarchy)"
            )

        # per-level vertex relabelings, new -> old (None = identity).
        # The *old* labels are refinement ordering, in which coarse nodes
        # are a prefix of fine nodes (the property the transfers and the
        # Dirichlet restriction below rely on).
        perms: List[Any] = [None] * (self.levels + 1)
        if self.fine_permutation is not None:
            pf = np.asarray(self.fine_permutation, dtype=np.int64)
            if pf.shape != (m.mesh.num_vertices,):
                raise ValueError(
                    "fine_permutation must be a [num_vertices] new->old map"
                )
            perms[self.levels] = pf
            meshes[self.levels] = m.mesh
            if self.banded:
                # intermediate levels get their own RCM ordering so their
                # banded sweeps see a reduced bandwidth too (the coarse
                # level keeps the caller's ordering: its cost is 8^levels
                # times smaller and it often is a well-ordered generator
                # mesh already)
                for li in range(1, self.levels):
                    p = reverse_cuthill_mckee(meshes[li]).astype(np.int64)
                    meshes[li], _ = reorder_mesh(meshes[li], p)
                    perms[li] = p

        def inv_of(p, n):
            if p is None:
                return None
            inv = np.empty(n, dtype=np.int64)
            inv[p] = np.arange(n, dtype=np.int64)
            return inv

        invs = [inv_of(p, mesh.num_vertices) for p, mesh in zip(perms, meshes)]

        # relabel each transfer into the (possibly permuted) level orderings:
        # rows follow the fine level's new ordering, entries map through the
        # coarse level's old->new relabeling
        rel_transfers = []
        for li in range(self.levels):
            par, wts = transfers[li]
            par = np.asarray(par, dtype=np.int64)
            wts = np.asarray(wts)
            pf, ic = perms[li + 1], invs[li]
            if pf is not None:
                par, wts = par[pf], wts[pf]
            if ic is not None:
                par = ic[par]
            rel_transfers.append((par, wts))

        # Dirichlet nodes in refinement (old) labels of the finest mesh
        dir_old = (
            perms[self.levels][dirichlet_f]
            if perms[self.levels] is not None
            else dirichlet_f
        )

        # fine -> coarse level order (levels[0] = finest)
        self.levels_data: List[dict] = []
        for li in range(self.levels, -1, -1):
            mesh_l = meshes[li]
            # refinement appends vertices, so coarse nodes are a prefix of
            # the fine nodes: constraint masks restrict by injection
            dirichlet_l = dir_old[dir_old < mesh_l.num_vertices]
            if invs[li] is not None:
                dirichlet_l = invs[li][dirichlet_l]
            lin = HyperelasticModel(
                mesh=mesh_l,
                material=LinearElasticMaterial(),
                params=LameParameters(mu=mu, lam=lam),
                dirichlet_nodes=dirichlet_l,
                dtype=m.space.X_geo.dtype,
                banded=self.banded,
            )
            u0 = jnp.zeros(lin.space.num_dofs, m.space.X_geo.dtype)
            inv_diag = 1.0 / lin.hessian_diagonal(u0)
            entry = dict(
                model=lin,
                free=lin.free_mask,
                inv_diag=inv_diag,
                num_vertices=mesh_l.num_vertices,
                s=s,
            )
            if li > 0:
                par, wts = rel_transfers[li - 1]
                entry["parents"] = jnp.asarray(par)
                entry["weights"] = jnp.asarray(wts, m.space.X_geo.dtype)
            self.levels_data.append(entry)

    def _apply(self, lvl, v):
        L = self.levels_data[lvl]
        vm = jnp.where(L["free"], v, 0.0)
        # linear material: Hessian action == internal forces (u-independent)
        av = L["model"].internal_forces(vm)
        return jnp.where(L["free"], av, v)

    def _smooth(self, lvl, x, b, iters):
        L = self.levels_data[lvl]
        # unrolled: nested device loops are ~12x slower on XLA:TPU
        for _ in range(int(iters)):
            r = b - self._apply(lvl, x)
            x = x + self.omega * L["inv_diag"] * r
        return x

    def _vcycle(self, lvl, b):
        x = self._smooth(lvl, jnp.zeros_like(b), b, self.num_smooth)
        if lvl == len(self.levels_data) - 1:
            return self._smooth(lvl, x, b, self.coarse_iters)
        L = self.levels_data[lvl]
        Lc = self.levels_data[lvl + 1]
        s = L["s"]
        r = (b - self._apply(lvl, x)).reshape(-1, s)
        r_c = _restrict_unstructured(
            L["parents"], L["weights"], r, Lc["num_vertices"]
        ).reshape(-1)
        r_c = jnp.where(Lc["free"], r_c, 0.0)
        e_c = self._vcycle(lvl + 1, r_c)
        e = _prolong_unstructured(
            L["parents"], L["weights"], e_c.reshape(-1, s)
        ).reshape(-1)
        e = jnp.where(L["free"], e, 0.0)
        x = x + e
        return self._smooth(lvl, x, b, self.num_smooth)

    def __call__(self, r):
        """Apply the V-cycle preconditioner: M^{-1} r."""
        return self._vcycle(0, r)
