"""Fused element-stiffness Mosaic kernel vs the XLA pairs path (interpret).

The kernel (fenris_tpu/ops/stiffness_kernel.py) is the production TPU path
for constant-contraction element matrices (reference hot loop:
src/assembly/local/elliptic.rs:361-434); these tests pin its semantics —
including the mirror-by-transpose off-diagonal blocks — on CPU via
``interpret=True`` (real-TPU exactness + throughput is driven by bench.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.assembly import local as L
from fenris_tpu.fem import FemSpace
from fenris_tpu.mesh.convert import convert_mesh
from fenris_tpu.mesh.procedural import (
    create_rectangular_uniform_tet_mesh,
    create_unit_box_uniform_hex_mesh_3d,
    create_unit_square_uniform_quad_mesh_2d,
)
from fenris_tpu.operators import LaplaceOperator
from fenris_tpu.quadrature.canonical import canonical_stiffness
from fenris_tpu.solid import (
    LameParameters,
    LinearElasticMaterial,
    MaterialEllipticOperator,
)
from fenris_tpu.ops.stiffness_kernel import stiffness_pairs_pallas


def _case(kind):
    if kind == "hex20":
        return convert_mesh(create_unit_box_uniform_hex_mesh_3d(3), "hex20"), 3
    if kind == "tet10":
        return (
            convert_mesh(
                create_rectangular_uniform_tet_mesh(1.0, 1, 1, 1, 3), "tet10"
            ),
            3,
        )
    if kind == "hex8":
        return create_unit_box_uniform_hex_mesh_3d(3), 3
    if kind == "quad9":
        return convert_mesh(create_unit_square_uniform_quad_mesh_2d(5), "quad9"), 2
    raise ValueError(kind)


@pytest.mark.parametrize("kind", ["hex20", "tet10", "hex8", "quad9"])
def test_stiffness_kernel_matches_xla_pairs(kind):
    """Kernel == XLA pairs path at f32 roundoff; mirror blocks are EXACT
    node-transposes of their upper blocks (pure VMEM copies)."""
    mesh, dim = _case(kind)
    space = FemSpace.create(mesh)
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    mop = MaterialEllipticOperator(LinearElasticMaterial(), dim=dim)
    params = LameParameters(mu=384.0, lam=577.0)
    E = mesh.num_cells
    n = mesh.element.num_nodes
    u0 = jnp.zeros((E, n, dim), jnp.float32)
    Xg = jnp.asarray(space.X_geo, jnp.float32)
    ref = np.asarray(
        L.assemble_element_elliptic_matrices_pairs(
            Xg, u0, mop, params, tab, pallas=False
        ),
        np.float64,
    )
    got = np.asarray(
        stiffness_pairs_pallas(Xg, mop, params, tab, interpret=True), np.float64
    )
    scale = np.abs(ref).max()
    assert np.abs(ref - got).max() / scale < 5e-6

    s = dim
    gb = got.reshape(s, s, n, n, E)
    for i in range(s):
        for j in range(i + 1, s):
            np.testing.assert_array_equal(gb[j, i], gb[i, j].transpose(1, 0, 2))


def test_stiffness_kernel_scalar_laplace():
    """s=1 (no off-diagonal pairs): the kernel covers scalar operators."""
    mesh = create_unit_box_uniform_hex_mesh_3d(3)
    space = FemSpace.create(mesh)
    tab = L.tabulate(mesh.element, canonical_stiffness(mesh.element))
    op = LaplaceOperator()
    E = mesh.num_cells
    n = mesh.element.num_nodes
    u0 = jnp.zeros((E, n, 1), jnp.float32)
    Xg = jnp.asarray(space.X_geo, jnp.float32)
    ref = np.asarray(
        L.assemble_element_elliptic_matrices_pairs(
            Xg, u0, op, None, tab, pallas=False
        ),
        np.float64,
    )
    got = np.asarray(
        stiffness_pairs_pallas(Xg, op, None, tab, interpret=True), np.float64
    )
    assert np.abs(ref - got).max() / np.abs(ref).max() < 5e-6
