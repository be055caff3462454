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


# ---------------------------------------------------------------------------
# round 2: constrained closest-point projection + GridIndex safety
# ---------------------------------------------------------------------------


def test_closest_point_in_element_tet_voronoi(rng):
    """Constrained projection matches the exact affine-tet oracle per
    Voronoi region (tests/unit_tests/element/tetrahedron.rs:259-313)."""
    from fenris_tpu.geometry import tetrahedron_closest_point
    from fenris_tpu.space import closest_point_in_element

    el = ELEMENTS["tet4"]
    for _ in range(5):
        X = el.nodes + rng.uniform(-0.15, 0.15, size=el.nodes.shape)
        pts = rng.uniform(-3.0, 3.0, size=(40, 3))
        xi, inside, dist = closest_point_in_element(
            el, jnp.asarray(np.repeat(X[None], len(pts), 0)), jnp.asarray(pts)
        )
        phi, _ = el.tabulate(np.asarray(xi))
        x_closest = np.einsum("qn,nd->qd", phi, X)
        for k, p in enumerate(pts):
            cp, is_in = tetrahedron_closest_point(X, p)
            assert bool(inside[k]) == is_in
            assert np.linalg.norm(x_closest[k] - cp) < 1e-8, (p, x_closest[k], cp)
            assert abs(float(dist[k]) - np.linalg.norm(p - cp)) < 1e-8


def test_closest_point_in_element_hex_sampling_oracle(rng):
    """Trilinear hex closest point beats dense reference-domain sampling."""
    from fenris_tpu.space import closest_point_in_element

    el = ELEMENTS["hex8"]
    X = el.nodes + rng.uniform(-0.2, 0.2, size=el.nodes.shape)
    pts = rng.uniform(-3.0, 3.0, size=(20, 3))
    _, inside, dist = closest_point_in_element(
        el, jnp.asarray(np.repeat(X[None], len(pts), 0)), jnp.asarray(pts)
    )
    # dense sampling of the reference domain can only do worse
    g = np.linspace(-1, 1, 13)
    xis = np.stack(np.meshgrid(g, g, g, indexing="ij"), -1).reshape(-1, 3)
    phi, _ = el.tabulate(xis)
    samples = phi @ X
    for k, p in enumerate(pts):
        d_samp = np.linalg.norm(samples - p, axis=1).min()
        assert float(dist[k]) <= d_samp + 1e-9


def test_project_physical_coordinates_unconstrained(rng):
    """project_physical_coordinates == map_physical_coordinates inside
    (element.rs:396 normal-equations Gauss-Newton)."""
    from fenris_tpu.space import project_physical_coordinates

    el = ELEMENTS["quad4"]
    X = el.nodes + rng.uniform(-0.1, 0.1, size=el.nodes.shape)
    xi_true = rng.uniform(-0.9, 0.9, size=(15, 2))
    phi, _ = el.tabulate(xi_true)
    x = phi @ X
    xi = np.asarray(
        project_physical_coordinates(
            el, jnp.asarray(np.repeat(X[None], 15, 0)), jnp.asarray(x)
        )
    )
    assert np.abs(xi - xi_true).max() < 1e-10


def test_project_reference_domain_exact(rng):
    from fenris_tpu.space import project_reference_domain, reference_domain_distance

    for name in ("tri3", "tet4", "quad4", "hex8"):
        el = ELEMENTS[name]
        d = el.ref_dim
        xi = jnp.asarray(rng.uniform(-3.0, 3.0, size=(200, d)))
        p = project_reference_domain(el, xi)
        # projection lands in the domain
        assert float(reference_domain_distance(el, p).max()) < 1e-12
        # projection is idempotent and no sampled domain point is closer
        assert np.allclose(np.asarray(project_reference_domain(el, p)), np.asarray(p))
        samples = rng.uniform(-1.0, 1.0, size=(500, d))
        keep = np.asarray(reference_domain_distance(el, jnp.asarray(samples))) <= 0
        samples = samples[keep]
        d_proj = np.linalg.norm(np.asarray(p) - np.asarray(xi), axis=1)
        for k in range(0, 200, 25):
            d_samp = np.linalg.norm(samples - np.asarray(xi)[k], axis=1).min()
            assert d_proj[k] <= d_samp + 1e-9


def test_grid_index_empty_cells_safe(rng):
    """A GridIndex over a sparse mesh must agree with the brute-force
    oracle even for queries landing in empty grid cells."""
    from fenris_tpu.space import GridIndex

    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(8)
    # L-shaped domain: drop the upper-right quadrant
    centers = mesh.cell_points().mean(axis=1)
    keep = np.flatnonzero(~((centers[:, 0] > 0.5) & (centers[:, 1] > 0.5)))
    mesh = mesh.keep_cells(keep)
    index = GridIndex.build(mesh, avg_elements_per_cell=0.5)  # force many cells
    assert (np.asarray(index.table) >= 0).any(axis=1).all(), "empty rows remain"
    # queries inside the hole and far outside
    pts = np.concatenate(
        [
            rng.uniform(0.6, 0.95, size=(15, 2)),  # in the hole
            rng.uniform(-1.0, 2.0, size=(25, 2)),  # anywhere
        ]
    )
    fast = find_closest_element(mesh, jnp.asarray(pts), index=index)
    brute = find_closest_element(mesh, jnp.asarray(pts), num_candidates=mesh.num_cells)
    # physical distances must agree (element ids may differ on exact ties)
    np.testing.assert_allclose(
        np.asarray(fast.domain_distance),
        np.asarray(brute.domain_distance),
        rtol=1e-8,
        atol=1e-10,
    )


def test_find_closest_element_outside_matches_brute_force(rng):
    """Outside-point queries: accelerated == brute force on a random mesh,
    and values extrapolate at the true closest point."""
    mesh = procedural.create_unit_box_uniform_tet_mesh_3d(3)
    pts = rng.uniform(-0.5, 1.5, size=(40, 3))
    res_k = find_closest_element(mesh, jnp.asarray(pts), num_candidates=12)
    res_all = find_closest_element(mesh, jnp.asarray(pts), num_candidates=mesh.num_cells)
    np.testing.assert_allclose(
        np.asarray(res_k.domain_distance),
        np.asarray(res_all.domain_distance),
        rtol=1e-8,
        atol=1e-10,
    )


def test_find_closest_element_traced_matches_concrete(rng):
    """The traced (jitted) grid path — no host certification available —
    must agree with the concrete path; regression for ring-candidate
    duplicates crowding distinct elements out of the top-k."""
    import jax

    from fenris_tpu.space import GridIndex

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(4)
    index = GridIndex.build(mesh, avg_elements_per_cell=0.25)  # fine grid:
    # each element rasterizes into many cells -> heavy ring duplication
    pts = rng.uniform(0.02, 0.98, size=(30, 3))

    concrete = find_closest_element(mesh, jnp.asarray(pts), index=index)
    traced = jax.jit(
        lambda p: find_closest_element(mesh, p, index=index)
    )(jnp.asarray(pts))
    np.testing.assert_allclose(
        np.asarray(traced.domain_distance),
        np.asarray(concrete.domain_distance),
        rtol=1e-8,
        atol=1e-10,
    )
    np.testing.assert_array_equal(
        np.asarray(traced.element_indices), np.asarray(concrete.element_indices)
    )
