"""Multi-chip banded execution: banded blocks sharded over the device mesh.

The banded plan (:mod:`..ops.banded`) partitions elements by contiguous
owned node ranges — a ready-made 1D domain decomposition.  Here the K
banded blocks are sharded across the mesh axis ``"dp"``:

* each device owns ``K / n_dev`` consecutive blocks (elements, index
  tables, geometry resident per-device);
* the dof state is replicated; each device slices its contiguous blocked
  node *window* (own ranges + halo = the union of its blocks' windows)
  with one ``dynamic_slice``, runs the banded gather → element-minor sweep
  → banded scatter entirely on local data, and deposits its window into a
  zero global buffer;
* a single ``psum`` combines the windows (adjacent-device halo overlaps
  add correctly) — one collective per assembly sweep, as in
  :mod:`..parallel` but with the MXU gather/scatter kernels inside.

This is the unstructured analogue of the structured z-slab decomposition
(:mod:`.structured`); the reference has no distributed execution at all
(README.md:60).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..assembly import local_em as LE
from ..elasticity import HyperelasticModel
from ..ops import banded as B
from ..optimize import newton_line_search
from ..sparse.cg import conjugate_gradient

__all__ = ["ShardedBandedElasticity"]


@dataclass
class ShardedBandedElasticity:
    """Banded-block-sharded view of a ``HyperelasticModel(banded=True)``.

    Replicated-in/replicated-out ``residual`` / ``hessian_vector_product``
    / ``solve``; internals run as ``shard_map`` programs with the banded
    Pallas kernels (XLA fallback off-TPU) on per-device block shards.
    """

    model: HyperelasticModel
    mesh: DeviceMesh
    axis: str = "dp"

    def __post_init__(self):
        m = self.model
        if m._plan is None:
            raise ValueError("model must be constructed with banded=True")
        plan = m._plan
        n_dev = int(self.mesh.devices.size)
        K = plan.k_blocks
        Kd = -(-K // n_dev)
        K_pad = Kd * n_dev
        bp, ra, wa = plan.elements_per_block, plan.ra, plan.wa
        na_local = Kd * ra + wa
        # last device slices [ (n_dev-1)*Kd*ra, K_pad*ra + wa )
        na_ext = max(plan.na_pad, K_pad * ra + wa)

        def pad_k(x, fill=0):
            x = np.asarray(x).reshape(K, -1)
            out = np.full((K_pad, x.shape[1]), fill, x.dtype)
            out[:K] = x
            return out

        a_loc = pad_k(plan.a_loc)
        b_loc = pad_k(plan.b_loc)
        valid = pad_k(plan.valid_rows)
        nodes = pad_k(plan.nodes_padded)
        # window-local node ids for the XLA fallback: subtract each
        # device's window start (padding rows keep index 0: valid=0)
        dev_of_block = np.arange(K_pad) // Kd
        offs = (dev_of_block * Kd * ra * 128)[:, None]
        nodes_local = np.where(valid > 0, nodes - offs, 0)
        if nodes_local.min() < 0 or (
            nodes_local.max() >= na_local * 128
        ):
            raise AssertionError("window-local node id out of range")

        # per-device local plan: Kd blocks over the local window
        self.local_plan = dataclasses.replace(
            plan,
            k_blocks=Kd,
            na_pad=na_local,
            num_nodes=na_local * 128,
        )
        self.n_dev = n_dev
        self.Kd = Kd
        self.K_pad = K_pad
        self.na_ext = na_ext
        self.num_dofs = m.space.num_dofs

        # element-level data padded to K_pad blocks, sharded by block
        dt = m.space.X_geo.dtype
        Xb = np.asarray(m._Xg_band).reshape(plan.k_blocks * bp, *m._Xg_band.shape[1:])
        Xb_pad = np.concatenate(
            [Xb, np.repeat(Xb[:1], (K_pad - K) * bp, axis=0)], axis=0
        )
        vel = np.concatenate(
            [np.asarray(m._valid_el), np.zeros((K_pad - K) * bp)]
        ).astype(dt)

        shard = NamedSharding(self.mesh, P(self.axis))
        put = lambda x: jax.device_put(jnp.asarray(x), shard)
        self.a_loc = put(a_loc.reshape(n_dev, -1))
        self.b_loc = put(b_loc.reshape(n_dev, -1))
        self.valid_rows = put(valid.reshape(n_dev, -1).astype(np.float32))
        self.nodes_local = put(nodes_local.reshape(n_dev, -1))
        self.X_band = put(Xb_pad.reshape(n_dev, Kd * bp, *Xb_pad.shape[1:]))
        self.valid_el = put(vel.reshape(n_dev, Kd * bp))

        # per-element parameter leaves (padded to K*bp by the model) are
        # padded to K_pad*bp and sharded by block like the geometry;
        # scalar leaves stay replicated closure constants
        pe_global = K * bp
        leaves, self._params_treedef = jax.tree_util.tree_flatten(m._params_band)
        self._params_flags = [
            hasattr(x, "ndim") and getattr(x, "ndim", 0) >= 1 and x.shape[0] == pe_global
            for x in leaves
        ]
        self._params_scalar = [
            x for x, f in zip(leaves, self._params_flags) if not f
        ]
        self._params_sharded = tuple(
            put(
                np.concatenate(
                    [np.asarray(x), np.repeat(np.asarray(x)[:1], (K_pad - K) * bp, axis=0)]
                ).reshape(n_dev, Kd * bp, *np.asarray(x).shape[1:])
            )
            for x, f in zip(leaves, self._params_flags)
            if f
        )

        self._ext_plan = dataclasses.replace(
            plan, k_blocks=K_pad, na_pad=na_ext
        )
        self._shmap = partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P(self.axis),) * (6 + len(self._params_sharded)) + (P(),),
            out_specs=P(),
        )

    # -- sharded banded sweep -----------------------------------------------------

    def _local_params(self, pls):
        it = iter(p[0] for p in pls)
        scal = iter(self._params_scalar)
        leaves = [
            next(it) if f else next(scal) for f in self._params_flags
        ]
        return jax.tree_util.tree_unflatten(self._params_treedef, leaves)

    def _sweep_shardfn(self, a, b, vrows, nloc, Xc, vel, *pls_u):
        *pls, u = pls_u
        m = self.model
        lp = self.local_plan
        s, n, ra = lp.s, lp.n, lp.ra
        d = jax.lax.axis_index(self.axis)
        ub = B._to_blocked(self._ext_plan, u.reshape(-1, s))
        start = (d * self.Kd * ra).astype(jnp.int32)
        ub_loc = jax.lax.dynamic_slice(
            ub, (start, jnp.zeros((), jnp.int32)), (lp.na_pad, s * 128)
        )
        arrays = (
            a.reshape(1, -1),
            b.reshape(1, -1),
            vrows.reshape(1, -1),
            nloc.reshape(-1),
        )
        u_el = B.gather_blocked(lp, ub_loc, arrays=arrays)
        Xg = Xc[0]
        f_em = LE.assemble_element_elliptic_vectors_em(
            jnp.transpose(Xg, (1, 2, 0)),
            jnp.transpose(u_el, (1, 2, 0)),
            m.operator,
            self._local_params(pls),
            m.tab,
        )
        f_el = jnp.transpose(f_em, (2, 0, 1)) * vel[0][:, None, None]
        ub_out = B.scatter_add_blocked(lp, f_el, arrays=arrays)
        out = jnp.zeros((self.na_ext, s * 128), ub_out.dtype)
        out = jax.lax.dynamic_update_slice(
            out, ub_out, (start, jnp.zeros((), jnp.int32))
        )
        out = jax.lax.psum(out, self.axis)
        return B._from_blocked(self._ext_plan, out)[: m.mesh.num_vertices].reshape(-1)

    def internal_forces(self, u):
        return self._shmap(self._sweep_shardfn)(
            self.a_loc,
            self.b_loc,
            self.valid_rows,
            self.nodes_local,
            self.X_band,
            self.valid_el,
            *self._params_sharded,
            u,
        )

    def residual(self, u):
        r = self.internal_forces(u) - self.model._f_ext
        return jnp.where(self.model.free_mask, r, 0.0)

    def hessian_vector_product(self, u, v):
        m = self.model
        vm = jnp.where(m.free_mask, v, 0.0)
        _, hv = jax.jvp(self.internal_forces, (u,), (vm,))
        return jnp.where(m.free_mask, hv, v)

    def solve(
        self,
        u0=None,
        tolerance: float = 1e-8,
        max_newton_iterations: int = 30,
        cg_rel_tolerance: float = 1e-6,
        cg_max_iter: int = 2000,
        line_search: bool = True,
    ):
        m = self.model
        if u0 is None:
            u0 = jnp.zeros(self.num_dofs, dtype=m.space.X_geo.dtype)

        def solve_jacobian(u, f):
            inv_diag = 1.0 / m.hessian_diagonal(u)  # replicated diag sweep
            return conjugate_gradient(
                lambda v: self.hessian_vector_product(u, v),
                f,
                preconditioner=lambda v: inv_diag * v,
                rel_tolerance=cg_rel_tolerance,
                max_iter=cg_max_iter,
                check_definiteness=False,
            ).x

        from ..optimize import newton_cache

        return newton_line_search(
            self.residual,
            solve_jacobian,
            u0,
            tolerance=tolerance,
            max_iterations=max_newton_iterations,
            line_search=line_search,
            cache=newton_cache(self, cg_rel_tolerance, cg_max_iter, line_search),
        )
