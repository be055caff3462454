"""Multi-chip execution: element-sharded assembly over a device mesh.

The reference is explicitly single-process shared-memory (README.md:60; its
parallelism is rayon + graph coloring).  The TPU-native scaling story
replaces that wholesale (SURVEY §2.3):

* **Elements are sharded** across the device mesh axis ``"dp"`` (the FEM
  analogue of data parallelism — quadrature-heavy element kernels are
  embarrassingly parallel).
* The global dof vector is **replicated**; per-device partial assemblies
  (segment-sums over the local element shard) are combined with a single
  ``psum`` over ICI — the deterministic collective that replaces the
  reference's per-color rayon barrier (assembly/global.rs:322).
* The Newton/CG state stays replicated, so every CG iteration costs one
  sharded element sweep + one psum; no host synchronization anywhere.

Padding: element blocks are padded to a multiple of the device count with
degenerate entries whose contributions are masked to zero.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh as DeviceMesh
from jax.sharding import NamedSharding, PartitionSpec as P

from ..assembly import global_ as G
from ..assembly import local as L
from ..elasticity import HyperelasticModel
from ..optimize import newton_line_search
from ..sparse.cg import conjugate_gradient

__all__ = ["make_device_mesh", "ShardedElasticity"]


def make_device_mesh(num_devices: Optional[int] = None, axis: str = "dp") -> DeviceMesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    return DeviceMesh(np.asarray(devices[:n]), (axis,))


def _pad_to_multiple(arr: np.ndarray, multiple: int):
    E = arr.shape[0]
    pad = (-E) % multiple
    if pad == 0:
        return arr, E
    padded = np.concatenate([arr, np.repeat(arr[:1], pad, axis=0)], axis=0)
    return padded, E


@dataclass
class ShardedElasticity:
    """Element-data-parallel view of a :class:`HyperelasticModel`.

    Provides replicated-in/replicated-out ``residual``, ``hvp`` and
    ``solve`` whose internals run as ``shard_map`` programs over the device
    mesh, with element shards resident per-device and one ``psum`` per
    assembly sweep.
    """

    model: HyperelasticModel
    mesh: DeviceMesh

    def __post_init__(self):
        m = self.model
        n_dev = self.mesh.devices.size
        Xg = np.asarray(m.space.X_geo)
        dofs = np.asarray(m.space.dofs)
        Xg_p, E = _pad_to_multiple(Xg, n_dev)
        dofs_p, _ = _pad_to_multiple(dofs, n_dev)
        valid = np.zeros(Xg_p.shape[0], dtype=Xg.dtype)
        valid[:E] = 1.0
        shard = NamedSharding(self.mesh, P("dp"))
        self.X_geo = jax.device_put(jnp.asarray(Xg_p), shard)
        self.dofs = jax.device_put(jnp.asarray(dofs_p), shard)
        self.valid = jax.device_put(jnp.asarray(valid), shard)
        self.num_dofs = m.space.num_dofs
        self._shmap = partial(
            jax.shard_map,
            mesh=self.mesh,
            in_specs=(P("dp"), P("dp"), P("dp"), P()),
            out_specs=P(),
        )

    # -- sharded assembly sweeps ------------------------------------------------

    def _internal_forces_shardfn(self, Xg, dofs, valid, u):
        m = self.model
        s = m.mesh.dim
        n = m.mesh.element.num_nodes
        u_el = u[dofs].reshape(-1, n, s)
        f_el = L.assemble_element_elliptic_vectors(Xg, u_el, m.operator, m.params, m.tab)
        f_el = f_el * valid[:, None]
        partial_sum = jax.ops.segment_sum(
            f_el.reshape(-1), dofs.reshape(-1), num_segments=self.num_dofs
        )
        return jax.lax.psum(partial_sum, "dp")

    def internal_forces(self, u):
        return self._shmap(self._internal_forces_shardfn)(
            self.X_geo, self.dofs, self.valid, u
        )

    def residual(self, u):
        r = self.internal_forces(u) - self.model._f_ext
        return jnp.where(self.model.free_mask, r, 0.0)

    def hessian_vector_product(self, u, v):
        m = self.model
        vm = jnp.where(m.free_mask, v, 0.0)
        _, hv = jax.jvp(self.internal_forces, (u,), (vm,))
        return jnp.where(m.free_mask, hv, v)

    def hessian_diagonal(self, u):
        m = self.model
        s = m.mesh.dim
        n = m.mesh.element.num_nodes

        def shard_fn(Xg, dofs, valid, u):
            u_el = u[dofs].reshape(-1, n, s)
            A_el = L.assemble_element_elliptic_matrices(
                Xg, u_el, m.operator, m.params, m.tab
            )
            diag_el = jnp.diagonal(A_el, axis1=1, axis2=2) * valid[:, None]
            partial_sum = jax.ops.segment_sum(
                diag_el.reshape(-1), dofs.reshape(-1), num_segments=self.num_dofs
            )
            return jax.lax.psum(partial_sum, "dp")

        diag = self._shmap(shard_fn)(self.X_geo, self.dofs, self.valid, u)
        return jnp.where(m.free_mask & (diag != 0.0), diag, 1.0)

    def energy(self, u):
        m = self.model
        s = m.mesh.dim
        n = m.mesh.element.num_nodes

        def shard_fn(Xg, dofs, valid, u):
            u_el = u[dofs].reshape(-1, n, s)
            e = L.compute_element_elliptic_energy(Xg, u_el, m.operator, m.params, m.tab)
            return jax.lax.psum(jnp.sum(e * valid), "dp")

        e = self._shmap(shard_fn)(self.X_geo, self.dofs, self.valid, u)
        return e - jnp.vdot(m._f_ext, u)

    # -- solve --------------------------------------------------------------------

    def newton_step(self, u, cg_rel_tolerance=1e-6, cg_max_iter=500):
        """One inexact-Newton step (the multi-chip 'training step')."""
        f = self.residual(u)
        inv_diag = 1.0 / self.hessian_diagonal(u)
        res = conjugate_gradient(
            lambda v: self.hessian_vector_product(u, v),
            f,
            preconditioner=lambda v: inv_diag * v,
            rel_tolerance=cg_rel_tolerance,
            max_iter=cg_max_iter,
            check_definiteness=False,
        )
        return u - res.x, jnp.linalg.norm(f)

    def solve(
        self,
        u0=None,
        tolerance: float = 1e-8,
        max_newton_iterations: int = 30,
        cg_rel_tolerance: float = 1e-6,
        cg_max_iter: int = 2000,
        line_search: bool = True,
    ):
        if u0 is None:
            u0 = jnp.zeros(self.num_dofs, dtype=self.X_geo.dtype)

        def solve_jacobian(u, f):
            inv_diag = 1.0 / self.hessian_diagonal(u)
            return conjugate_gradient(
                lambda v: self.hessian_vector_product(u, v),
                f,
                preconditioner=lambda v: inv_diag * v,
                rel_tolerance=cg_rel_tolerance,
                max_iter=cg_max_iter,
                check_definiteness=False,
            ).x

        return newton_line_search(
            self.residual,
            solve_jacobian,
            u0,
            tolerance=tolerance,
            max_iterations=max_newton_iterations,
            line_search=line_search,
        )
