"""Interpolation / point-location tests (cf. tests/integration_tests/interpolation.rs)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.mesh import convert, procedural
from fenris_tpu.space import (
    FixedInterpolator,
    find_closest_element,
    interpolate_at_points,
    interpolate_gradient_at_points,
    map_physical_coordinates,
)
from fenris_tpu.reference_elements import ELEMENTS


def test_inverse_mapping_roundtrip_hex(rng):
    el = ELEMENTS["hex8"]
    X = el.nodes + rng.uniform(-0.2, 0.2, size=el.nodes.shape)
    xi_true = rng.uniform(-0.9, 0.9, size=(20, 3))
    phi, _ = el.tabulate(xi_true)
    x = phi @ X
    xi = np.asarray(
        map_physical_coordinates(el, jnp.asarray(np.repeat(X[None], 20, 0)), jnp.asarray(x))
    )
    assert np.abs(xi - xi_true).max() < 1e-10


def test_find_closest_element_interior_points(rng):
    mesh = procedural.create_unit_square_uniform_tri_mesh_2d(4)
    pts = rng.uniform(0.01, 0.99, size=(50, 2))
    res = find_closest_element(mesh, jnp.asarray(pts))
    assert np.asarray(res.domain_distance).max() < 1e-9
    # verify: mapping the found reference coords forward gives the query point
    el = mesh.element
    X = mesh.cell_points()[np.asarray(res.element_indices)]
    phi, _ = el.tabulate(np.asarray(res.reference_coords))
    x_mapped = np.einsum("qn,qnd->qd", phi, X)
    assert np.abs(x_mapped - pts).max() < 1e-10


@pytest.mark.parametrize("elname", ["tri6", "quad9"])
def test_interpolation_reproduces_polynomial(elname, rng):
    """Quadratic elements must reproduce quadratic functions exactly."""
    base = (
        procedural.create_unit_square_uniform_tri_mesh_2d(3)
        if elname == "tri6"
        else procedural.create_unit_square_uniform_quad_mesh_2d(3)
    )
    mesh = convert.convert_mesh(base, elname)
    f = lambda p: 2.0 + p[:, 0] ** 2 - 0.5 * p[:, 0] * p[:, 1] + p[:, 1] ** 2
    u = jnp.asarray(f(mesh.points))
    pts = rng.uniform(0.05, 0.95, size=(40, 2))
    vals, res = interpolate_at_points(mesh, u, jnp.asarray(pts))
    assert np.abs(np.asarray(vals)[:, 0] - f(pts)).max() < 1e-9


def test_interpolate_gradient(rng):
    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(6)
    # u = 3x + 2y is in Q1 space -> exact gradient
    u = jnp.asarray(3.0 * mesh.points[:, 0] + 2.0 * mesh.points[:, 1])
    pts = rng.uniform(0.05, 0.95, size=(30, 2))
    grads, _ = interpolate_gradient_at_points(mesh, u, jnp.asarray(pts))
    g = np.asarray(grads)[:, :, 0]
    assert np.abs(g - np.array([3.0, 2.0])).max() < 1e-10


def test_extrapolation_by_closest_element():
    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(4)
    u = jnp.asarray(mesh.points[:, 0])  # u = x
    pts = jnp.asarray([[1.5, 0.5], [-0.3, 0.2], [0.5, 2.0]])
    vals, res = interpolate_at_points(mesh, u, pts)
    # outside points clamp to the boundary of the closest element: u = x
    # evaluates to the boundary x value
    assert np.asarray(res.domain_distance).min() > 0.0
    expect = np.array([1.0, 0.0, 0.5])
    assert np.abs(np.asarray(vals)[:, 0] - expect).max() < 1e-9


def test_fixed_interpolator_matches_direct(rng):
    mesh = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    u = jnp.asarray(np.sin(mesh.points @ np.array([1.0, 2.0, 3.0])))
    pts = rng.uniform(0.1, 0.9, size=(25, 3))
    direct, _ = interpolate_at_points(mesh, u, jnp.asarray(pts))
    interp = FixedInterpolator.from_space_and_points(mesh, jnp.asarray(pts), with_gradients=True)
    fixed = interp.interpolate(u)
    assert np.abs(np.asarray(direct) - np.asarray(fixed)).max() < 1e-12
    # gradient of a linear function is exact
    u_lin = jnp.asarray(mesh.points @ np.array([1.0, -2.0, 0.5]))
    interp2 = FixedInterpolator.from_space_and_points(mesh, jnp.asarray(pts), with_gradients=True)
    g = np.asarray(interp2.interpolate_gradient(u_lin))[:, :, 0]
    assert np.abs(g - np.array([1.0, -2.0, 0.5])).max() < 1e-9
