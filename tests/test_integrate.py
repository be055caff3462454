"""Integration tests: volumes, surface areas, function integrals
(cf. src/integrate.rs tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu import quadrature as quad
from fenris_tpu.assembly import local as L
from fenris_tpu.integrate import integrate, integrate_over_elements, volume_form
from fenris_tpu.mesh import convert, procedural


def _X(mesh):
    m = mesh.element.geometry.num_nodes
    return jnp.asarray(mesh.cell_points()[:, :m, :])


@pytest.mark.parametrize(
    "mesh,rule",
    [
        (procedural.create_unit_square_uniform_quad_mesh_2d(3), quad.quadrilateral_gauss(2)),
        (procedural.create_unit_square_uniform_tri_mesh_2d(3), quad.total_order.triangle(2)),
        (procedural.create_unit_box_uniform_hex_mesh_3d(2), quad.hexahedron_gauss(2)),
        (procedural.create_unit_box_uniform_tet_mesh_3d(2), quad.total_order.tetrahedron(2)),
    ],
    ids=["quad", "tri", "hex", "tet"],
)
def test_unit_volume(mesh, rule):
    tab = L.tabulate(mesh.element, rule)
    vol = float(integrate(_X(mesh), None, lambda x, u, G: 1.0, tab))
    assert abs(vol - 1.0) < 1e-12


def test_surface_area_of_cube_boundary():
    """Surface integration with non-square jacobians (volume_form)."""
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    surf = mesh.boundary_mesh()  # quad4 faces embedded in 3D
    tab = L.tabulate(surf.element, quad.quadrilateral_gauss(2))
    X = jnp.asarray(surf.cell_points())
    area = float(integrate(X, None, lambda x, u, G: 1.0, tab, needs_gradient=False))
    assert abs(area - 6.0) < 1e-12


def test_integral_of_polynomial_function():
    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(4)
    tab = L.tabulate(mesh.element, quad.quadrilateral_gauss(4))
    val = float(
        integrate(_X(mesh), None, lambda x, u, G: x[0] ** 2 * x[1], tab)
    )
    assert abs(val - (1 / 3) * (1 / 2)) < 1e-13


def test_integral_of_fe_function_and_gradient():
    """∫ u_h and ∫ |∇u_h|² for u = x + 2y in the Q1 space (exact)."""
    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(3)
    u = jnp.asarray(mesh.points[:, 0] + 2 * mesh.points[:, 1])
    u_el = u[jnp.asarray(mesh.cells)][:, :, None]
    tab = L.tabulate(mesh.element, quad.quadrilateral_gauss(2))
    int_u = float(integrate(_X(mesh), u_el, lambda x, u_, G: u_[0], tab))
    assert abs(int_u - 1.5) < 1e-13  # ∫ (x + 2y) over unit square
    int_g2 = float(
        integrate(_X(mesh), u_el, lambda x, u_, G: jnp.sum(G * G), tab)
    )
    assert abs(int_g2 - 5.0) < 1e-13  # |∇u|² = 1 + 4


def test_per_element_integrals_sum_to_global():
    mesh = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    tab = L.tabulate(mesh.element, quad.total_order.tetrahedron(3))
    per_el = integrate_over_elements(
        _X(mesh), None, lambda x, u, G: jnp.exp(x[0]), tab
    )
    total = float(jnp.sum(per_el))
    # ∫ exp(x) over unit cube = e - 1, up to quadrature error of strength 3
    assert abs(total - (np.e - 1.0)) < 1e-4


def test_volume_form_surface_element():
    # a skewed quad in 3D: area = |cross product| for the parallelogram
    pts = np.array([[0, 0, 0], [1, 0, 1], [1, 1, 2], [0, 1, 1]], dtype=float)
    from fenris_tpu.mesh import Mesh
    from fenris_tpu.reference_elements import ELEMENTS

    mesh = Mesh(pts, np.array([[0, 1, 2, 3]], dtype=np.int32), ELEMENTS["quad4"])
    tab = L.tabulate(mesh.element, quad.quadrilateral_gauss(2))
    X = jnp.asarray(mesh.cell_points())
    area = float(integrate(X, None, lambda x, u, G: 1.0, tab, needs_gradient=False))
    exact = np.linalg.norm(np.cross([1, 0, 1], [0, 1, 1]))
    assert abs(area - exact) < 1e-12
