"""High-level FEM workflows: assemble → constrain → solve → estimate error.

The generalized Poisson pipeline mirrors the reference's example/test flow
(examples/poisson2d.rs:17, tests/convergence_tests/poisson_mms_common.rs:173
``solve_poisson``) with the TPU-native stack underneath: batched element
kernels, segment-sum CSR scatter, jitted preconditioned CG.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .assembly import global_ as G
from .assembly import local as L
from .error import estimate_H1_seminorm_error, estimate_L2_error
from .mesh import Mesh
from .operators import EllipticOperator, LaplaceOperator
from .sparse import CsrMatrix, from_pattern
from .sparse.cg import conjugate_gradient

__all__ = [
    "FemSpace",
    "assemble_poisson_system",
    "solve_poisson",
    "solve_poisson_matrix_free",
    "PoissonResult",
]


@dataclass(frozen=True)
class FemSpace:
    """Device-resident assembly view of a mesh.

    Precomputes the gathered geometry/full node coordinate blocks; the
    dof-level CSR pattern (host-side symbolic assembly, the expensive part
    of setup at ~1M+ elements) is built lazily on first access — fully
    matrix-free pipelines never pay for it.
    """

    mesh: Mesh
    solution_dim: int
    X_geo: jnp.ndarray  # [E, m, d]
    X_full: jnp.ndarray  # [E, n, d]
    dofs: jnp.ndarray  # [E, n*s]
    _pattern: Optional[G.CsrPattern] = None

    @staticmethod
    def create(mesh: Mesh, solution_dim: int = 1, dtype=None) -> "FemSpace":
        dtype = dtype or (jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
        m = mesh.element.geometry.num_nodes
        Xf = jnp.asarray(mesh.cell_points(), dtype=dtype)
        return FemSpace(
            mesh=mesh,
            solution_dim=solution_dim,
            X_geo=Xf[:, :m, :],
            X_full=Xf,
            dofs=jnp.asarray(G.element_dof_indices(mesh.cells, solution_dim)),
        )

    @property
    def pattern(self) -> G.CsrPattern:
        """Dof-level CSR pattern (symbolic assembly); built on first use."""
        if self._pattern is None:
            object.__setattr__(
                self,
                "_pattern",
                G.csr_pattern(self.mesh.cells, self.mesh.num_vertices, self.solution_dim),
            )
        return self._pattern

    @property
    def num_dofs(self) -> int:
        return self.mesh.num_vertices * self.solution_dim

    def local_dofs(self, u) -> jnp.ndarray:
        """Gather per-element local dofs [E, n, s] from a global vector."""
        n = self.mesh.element.num_nodes
        s = self.solution_dim
        return u[self.dofs].reshape(-1, n, s)


class PoissonResult(NamedTuple):
    u: jnp.ndarray
    l2_error: Optional[float]
    h1_seminorm_error: Optional[float]
    cg_iterations: int


def assemble_poisson_system(
    space: FemSpace,
    rule,
    source: Callable,
    operator: Optional[EllipticOperator] = None,
    dirichlet_nodes=None,
):
    """Assemble the (BC-constrained) linear system for -div g(∇u) = f.

    Mirrors ``assemble_linear_system`` (poisson_mms_common.rs:70): elliptic
    matrix with the given operator (default Laplace), source vector, then
    symmetric homogeneous Dirichlet elimination.
    """
    op = operator or LaplaceOperator()
    tab = L.tabulate(space.mesh.element, rule)
    E = space.mesh.num_cells
    n = space.mesh.element.num_nodes
    u0 = jnp.zeros((E, n, op.solution_dim), dtype=space.X_geo.dtype)
    A_el = L.assemble_element_elliptic_matrices(space.X_geo, u0, op, None, tab)
    values = G.assemble_csr(A_el, space.pattern)
    b_el = L.assemble_element_source_vectors(
        space.X_geo, source, None, op.solution_dim, tab
    )
    b = G.assemble_vector(b_el, space.dofs, space.num_dofs)
    if dirichlet_nodes is not None and len(dirichlet_nodes):
        values = G.apply_homogeneous_dirichlet_bc_csr(
            values, space.pattern, dirichlet_nodes
        )
        b = G.apply_homogeneous_dirichlet_bc_rhs(b, dirichlet_nodes, space.solution_dim)
    return from_pattern(space.pattern, values), b


def solve_poisson(
    mesh: Mesh,
    rule,
    error_rule,
    source: Callable,
    u_exact: Optional[Callable] = None,
    u_exact_grad: Optional[Callable] = None,
    dirichlet_nodes=None,
    rel_tolerance: float = 1e-9,
    max_iter: int = 10000,
) -> PoissonResult:
    """End-to-end Poisson solve + optional error estimation.

    Parity: poisson_mms_common.rs:173 (``solve_poisson``) — Jacobi-
    preconditioned CG at 1e-9 relative residual (:142-163), then L²/H¹
    error by high-order quadrature.
    """
    space = FemSpace.create(mesh)
    A, b = assemble_poisson_system(space, rule, source, dirichlet_nodes=dirichlet_nodes)
    diag = A.diagonal()
    inv_diag = jnp.where(diag != 0.0, 1.0 / diag, 1.0)
    res = conjugate_gradient(
        A,
        b,
        preconditioner=lambda v: inv_diag * v,
        rel_tolerance=rel_tolerance,
        max_iter=max_iter,
    )
    u = res.x
    l2 = h1 = None
    if u_exact is not None:
        tab_err = L.tabulate(mesh.element, error_rule)
        u_el = space.local_dofs(u)
        l2 = float(estimate_L2_error(space.X_geo, u_el, u_exact, tab_err))
        if u_exact_grad is not None:
            h1 = float(
                estimate_H1_seminorm_error(space.X_geo, u_el, u_exact_grad, tab_err)
            )
    return PoissonResult(
        u=u, l2_error=l2, h1_seminorm_error=h1, cg_iterations=int(res.num_iterations)
    )


def solve_poisson_assembled(
    mesh: Mesh,
    rule,
    error_rule,
    source: Callable,
    u_exact: Optional[Callable] = None,
    u_exact_grad: Optional[Callable] = None,
    dirichlet_nodes=None,
    operator: Optional[EllipticOperator] = None,
    rel_tolerance: float = 1e-9,
    max_iter: int = 10000,
    max_diagonals: Optional[int] = None,
    min_fill: float = 0.0,
) -> PoissonResult:
    """Assembled-operator Poisson solve on the block-DIA streaming SpMV.

    The reference's end-to-end path — assemble the stiffness, then CG on
    it (poisson_mms_common.rs:70 + :142) — re-done TPU-native: element
    matrices land directly on node-minor block diagonals
    (:func:`~fenris_tpu.sparse.block_dia.assemble_block_dia`, no symbolic
    CSR phase), and every CG iteration is a zero-gather band sweep.
    Dirichlet conditions apply as operator-level dof masking (identity on
    constrained dofs), which yields the same solution as the reference's
    symmetric row/column elimination for homogeneous BCs.
    """
    from .sparse.block_dia import assemble_block_dia, block_dia_assembly_plan

    op = operator or LaplaceOperator()
    s = op.solution_dim
    space = FemSpace.create(mesh, solution_dim=s)
    tab = L.tabulate(mesh.element, rule)
    E = mesh.num_cells
    n = mesh.element.num_nodes
    u0 = jnp.zeros((E, n, s), dtype=space.X_geo.dtype)
    A_el = L.assemble_element_elliptic_matrices(space.X_geo, u0, op, None, tab)
    plan = block_dia_assembly_plan(
        np.asarray(mesh.cells),
        mesh.num_vertices,
        s,
        max_diagonals=max_diagonals,
        min_fill=min_fill,
    )
    num_chunks = max(1, -(-(E * (n * s) ** 2) // 2**27))
    A = assemble_block_dia(plan, A_el, num_chunks=num_chunks)

    b_el = L.assemble_element_source_vectors(space.X_geo, source, None, s, tab)
    b = G.assemble_vector(b_el, space.dofs, space.num_dofs)

    mask = np.ones(space.num_dofs, dtype=bool)
    if dirichlet_nodes is not None and len(dirichlet_nodes):
        nd = np.asarray(dirichlet_nodes, dtype=np.int64)
        for i in range(s):
            mask[nd * s + i] = False
    free = jnp.asarray(mask)
    b = jnp.where(free, b, 0.0)

    d0 = A.offsets.index(0)
    diag = jnp.stack(
        [A.bands[(d0 * s + i) * s + i] for i in range(s)], axis=1
    ).reshape(-1)
    inv_diag = 1.0 / jnp.where(free & (diag != 0.0), diag, 1.0)

    def apply_A(v):
        vm = jnp.where(free, v, 0.0)
        return jnp.where(free, A @ vm, v)

    res = conjugate_gradient(
        apply_A,
        b,
        preconditioner=lambda v: inv_diag * v,
        rel_tolerance=rel_tolerance,
        max_iter=max_iter,
    )
    u = res.x
    l2 = h1 = None
    if u_exact is not None:
        tab_err = L.tabulate(mesh.element, error_rule)
        u_el = space.local_dofs(u)
        l2 = float(estimate_L2_error(space.X_geo, u_el, u_exact, tab_err))
        if u_exact_grad is not None:
            h1 = float(
                estimate_H1_seminorm_error(space.X_geo, u_el, u_exact_grad, tab_err)
            )
    return PoissonResult(
        u=u, l2_error=l2, h1_seminorm_error=h1, cg_iterations=int(res.num_iterations)
    )


def solve_poisson_matrix_free(
    mesh: Mesh,
    rule,
    error_rule,
    source: Callable,
    u_exact: Optional[Callable] = None,
    u_exact_grad: Optional[Callable] = None,
    dirichlet_nodes=None,
    operator: Optional[EllipticOperator] = None,
    rel_tolerance: float = 1e-9,
    max_iter: int = 10000,
    banded_r_nodes: int = 4096,
) -> PoissonResult:
    """Matrix-free Poisson solve: CG on the operator action, no CSR ever.

    The TPU-idiomatic fast path the reference lacks: the stiffness action
    ``v -> A v`` is one banded gather -> element-minor elliptic sweep ->
    banded scatter (exactly the assembled operator for linear g), so both
    the symbolic assembly (the host-side sort) and the materialized matrix
    disappear.  Semantics match :func:`solve_poisson` (same BC masking up
    to the spectrally-equivalent mask formulation, same Jacobi
    preconditioner, same error estimation).
    """
    from .assembly import local_em as LE
    from .ops import banded as B

    op = operator or LaplaceOperator()
    s = op.solution_dim
    dtype = jnp.float64 if jax.config.jax_enable_x64 else jnp.float32
    tab = L.tabulate(mesh.element, rule)
    r = min(banded_r_nodes, max(1024, -(-mesh.num_vertices // 1024) * 1024))
    plan = B.make_banded_plan(np.asarray(mesh.cells), mesh.num_vertices, s=s, r_nodes=r)
    Xf = mesh.cell_points()
    m = mesh.element.geometry.num_nodes
    Xg_band = jnp.asarray(plan.pad_elements(Xf[:, :m, :]), dtype=dtype)
    X_em = jnp.transpose(Xg_band, (1, 2, 0))
    valid = jnp.asarray(plan.valid_elements(), dtype=dtype)
    num_dofs = mesh.num_vertices * s

    mask = np.ones(num_dofs, dtype=bool)
    if dirichlet_nodes is not None and len(dirichlet_nodes):
        nd = np.asarray(dirichlet_nodes, dtype=np.int64)
        for i in range(s):
            mask[nd * s + i] = False
    free = jnp.asarray(mask)

    def apply_A(v):
        vm = jnp.where(free, v, 0.0)
        u_em = jnp.transpose(B.gather(plan, vm.reshape(-1, s)), (1, 2, 0))
        f_em = LE.assemble_element_elliptic_vectors_em(X_em, u_em, op, None, tab)
        f_em = f_em * valid[None, None, :]
        av = B.scatter_add(plan, jnp.transpose(f_em, (2, 0, 1))).reshape(-1)
        return jnp.where(free, av, v)

    # RHS: source vectors over the padded layout, scattered, then BC'd
    b_el = L.assemble_element_source_vectors(Xg_band, source, None, s, tab)
    b_el = b_el * valid[:, None]
    n = mesh.element.num_nodes
    b = B.scatter_add(plan, b_el.reshape(plan.padded_elements, n, s)).reshape(-1)
    b = jnp.where(free, b, 0.0)

    # Jacobi preconditioner from the element-matrix diagonals
    u0_em = jnp.zeros((n, s, plan.padded_elements), dtype)
    d_em = LE.elliptic_matrix_diagonal_em(X_em, u0_em, op, None, tab) * valid[None, None, :]
    diag = B.scatter_add(plan, jnp.transpose(d_em, (2, 0, 1))).reshape(-1)
    diag = jnp.where(free & (diag != 0.0), diag, 1.0)
    inv_diag = 1.0 / diag

    res = conjugate_gradient(
        apply_A,
        b,
        preconditioner=lambda v: inv_diag * v,
        rel_tolerance=rel_tolerance,
        max_iter=max_iter,
    )
    u = res.x
    l2 = h1 = None
    if u_exact is not None:
        space = FemSpace.create(mesh)
        tab_err = L.tabulate(mesh.element, error_rule)
        u_el = space.local_dofs(u)
        l2 = float(estimate_L2_error(space.X_geo, u_el, u_exact, tab_err))
        if u_exact_grad is not None:
            h1 = float(
                estimate_H1_seminorm_error(space.X_geo, u_el, u_exact_grad, tab_err)
            )
    return PoissonResult(
        u=u, l2_error=l2, h1_seminorm_error=h1, cg_iterations=int(res.num_iterations)
    )

