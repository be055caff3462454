"""Multi-chip structured-grid elasticity: z-slab domain decomposition.

The structured stencil model (:mod:`fenris_tpu.structured`) shards across
the device mesh by **z-slabs of cells**: each device computes the
residual/Hessian-action contributions of its slab with purely local shifted
slices (the slab's node planes plus one halo plane are sliced from the
replicated state), and partial node forces are combined with a single
``psum`` — the structured-grid analogue of halo exchange, with the halo
accumulation folded into the collective.

The displacement state is replicated (a 10M-dof f32 state is 40 MB —
negligible against HBM); scaling past single-chip memory would shard the
state itself and replace the psum with neighbor ``ppermute`` exchanges,
which this layout is designed to accommodate.
"""

from __future__ import annotations

from dataclasses import dataclass
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..optimize import newton_line_search
from ..sparse.cg import conjugate_gradient
from ..structured import _OFFSETS, StructuredHyperelasticModel

__all__ = ["StructuredShardedElasticity"]

from ..config import MATMUL_PRECISION

# f32 einsums must not route through bf16 MXU passes (see config.py)
_einsum = functools.partial(jnp.einsum, precision=MATMUL_PRECISION)


@dataclass
class StructuredShardedElasticity:
    """z-slab sharded view of a :class:`StructuredHyperelasticModel`."""

    model: StructuredHyperelasticModel
    mesh: DeviceMesh

    def __post_init__(self):
        m = self.model
        self.n_dev = int(self.mesh.devices.size)
        ncx, ncy, ncz = m.cells
        # pad cell planes to a multiple of the device count (dead cells
        # masked out of the assembly)
        self.ncz_pad = ((ncz + self.n_dev - 1) // self.n_dev) * self.n_dev
        self.slab = self.ncz_pad // self.n_dev
        zmask = np.zeros(self.ncz_pad, dtype=np.float32)
        zmask[:ncz] = 1.0
        shard = NamedSharding(self.mesh, P("dp"))
        self.zmask = jax.device_put(
            jnp.asarray(zmask.reshape(self.n_dev, self.slab)), shard
        )
        # per-device slab start plane (node index)
        starts = (np.arange(self.n_dev) * self.slab).astype(np.int32)
        self.z_starts = jax.device_put(jnp.asarray(starts[:, None]), shard)
        self.num_dofs = m.num_dofs

    def _slab_forces(self, z_start, zmask_slab, u):
        """One device's partial internal forces (full-size output)."""
        m = self.model
        ncx, ncy, ncz = m.cells
        ug = m._grid(u)  # [s, z, y, x] (replicated)
        # pad node planes so every device's (slab + 1)-plane window exists
        # (dead cell planes are masked below)
        pad_planes = self.ncz_pad + 1 - m.node_shape[0]
        ug = jnp.pad(ug, ((0, 0), (0, pad_planes), (0, 0), (0, 0)))
        z0 = z_start[0, 0].astype(jnp.int32)
        zeros = jnp.zeros((), jnp.int32)
        local = jax.lax.dynamic_slice(
            ug, (zeros, z0, zeros, zeros), (3, self.slab + 1, m.node_shape[1], m.node_shape[2])
        )
        # element gather within the slab: shifted slices
        views = [
            local[:, dk : dk + self.slab, dj : dj + ncy, di : di + ncx]
            for (di, dj, dk) in _OFFSETS
        ]
        U = jnp.stack(views, axis=0)  # [n, s, slab, y, x]
        G = _einsum("qnd,nszyx->dsqzyx", m.gp, U)
        q = G.shape[2]
        B = int(np.prod(G.shape[3:]))
        flat = G.reshape(3, 3, q * B)
        g = jax.vmap(lambda Gp: m.operator.g(Gp, m.params), in_axes=-1, out_axes=-1)(
            flat
        ).reshape((3, 3, q) + G.shape[3:])
        f_el = _einsum("q,qnd,dsqzyx->nszyx", m.wdet, m.gp, g)
        zm = zmask_slab.reshape(-1)  # local [slab]
        f_el = f_el * zm[None, None, :, None, None]
        # local scatter into a (slab + 1)-plane node buffer
        out_local = jnp.zeros((3, self.slab + 1) + m.node_shape[1:], f_el.dtype)
        for n, (di, dj, dk) in enumerate(_OFFSETS):
            out_local = jax.lax.dynamic_update_slice(
                out_local,
                jax.lax.dynamic_slice(
                    out_local, (0, dk, dj, di), (3, self.slab, ncy, ncx)
                )
                + f_el[n],
                (0, dk, dj, di),
            )
        # place into the (padded) full node grid, combine across devices,
        # then trim the padding
        full = jnp.zeros((3, self.ncz_pad + 1) + m.node_shape[1:], f_el.dtype)
        full = jax.lax.dynamic_update_slice(full, out_local, (zeros, z0, zeros, zeros))
        full = jax.lax.psum(full, "dp")
        return m._ungrid(full[:, : m.node_shape[0]])

    def internal_forces(self, u):
        m = self.model
        fn = jax.shard_map(
            self._slab_forces,
            mesh=self.mesh,
            in_specs=(P("dp"), P("dp"), P()),
            out_specs=P(),
        )
        return fn(self.z_starts, self.zmask, u)

    def residual(self, u):
        r = self.internal_forces(u) - self.model._f_ext
        return jnp.where(self.model.free_mask, r, 0.0)

    def hessian_vector_product(self, u, v):
        m = self.model
        vm = jnp.where(m.free_mask, v, 0.0)
        _, hv = jax.jvp(self.internal_forces, (u,), (vm,))
        return jnp.where(m.free_mask, hv, v)

    def newton_step(self, u, cg_rel_tolerance=1e-5, cg_max_iter=200):
        """One inexact-Newton step (the multi-chip training step)."""
        m = self.model
        f = self.residual(u)
        inv_diag = 1.0 / m.hessian_diagonal(u)  # cheap; replicated
        res = conjugate_gradient(
            lambda v: self.hessian_vector_product(u, v),
            f,
            preconditioner=lambda v: inv_diag * v,
            rel_tolerance=cg_rel_tolerance,
            max_iter=cg_max_iter,
            check_definiteness=False,
        )
        return u - res.x, jnp.linalg.norm(f)

    def solve(self, u0=None, tolerance=1e-6, max_newton_iterations=30,
              cg_rel_tolerance=1e-5, cg_max_iter=1000, line_search=True):
        m = self.model
        if u0 is None:
            u0 = jnp.zeros(self.num_dofs, m.dtype)

        def solve_jacobian(u, f):
            inv_diag = 1.0 / m.hessian_diagonal(u)
            return conjugate_gradient(
                lambda v: self.hessian_vector_product(u, v),
                f,
                preconditioner=lambda v: inv_diag * v,
                rel_tolerance=cg_rel_tolerance,
                max_iter=cg_max_iter,
                check_definiteness=False,
            ).x

        return newton_line_search(
            self.residual, solve_jacobian, u0,
            tolerance=tolerance, max_iterations=max_newton_iterations,
            line_search=line_search,
        )
