"""Geometry toolkit tests (cf. fenris-geometry/tests)."""

import numpy as np
import pytest

from fenris_tpu.geometry import (
    Aabb,
    Ball,
    BoxSdf,
    HalfSpace,
    LineSegment,
    PolyMesh,
    Tetrahedron,
    Triangle,
    convex_polygon_clip_halfplane,
    orient2d,
    orient3d,
)
from fenris_tpu.mesh import procedural


def test_aabb_queries(rng):
    box = Aabb(np.array([0.0, 0.0]), np.array([1.0, 2.0]))
    assert box.contains(np.array([[0.5, 1.0], [1.5, 1.0]])).tolist() == [True, False]
    assert np.allclose(box.dist2(np.array([2.0, 0.5])), 1.0)
    assert np.allclose(box.closest_point(np.array([2.0, -1.0])), [1.0, 0.0])
    assert np.allclose(box.center, [0.5, 1.0])
    # max_dist2 from origin corner: farthest corner is (1,2)
    assert np.allclose(box.max_dist2(np.array([0.0, 0.0])), 5.0)
    grown = box.grow(0.5)
    assert np.allclose(grown.extents, [2.0, 3.0])


def test_orientation_predicates():
    assert orient2d([0, 0], [1, 0], [0, 1]) > 0
    assert orient2d([0, 0], [0, 1], [1, 0]) < 0
    assert orient3d([0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]) > 0


def test_halfspace_and_sdfs(rng):
    hs = HalfSpace.from_point_and_normal([0.0, 0.0, 0.5], [0.0, 0.0, 1.0])
    assert hs.contains(np.array([[0, 0, 0.0], [0, 0, 1.0]])).tolist() == [True, False]
    ball = Ball(center=np.array([0.0, 0.0]), radius=2.0)
    pts = rng.uniform(-3, 3, size=(50, 2))
    phi = ball.eval(pts)
    assert np.allclose(phi, np.linalg.norm(pts, axis=1) - 2.0)
    g = ball.gradient(pts)
    assert np.allclose(np.linalg.norm(g, axis=1), 1.0)
    box = BoxSdf(np.array([0.0, 0.0]), np.array([1.0, 1.0]))
    assert box.eval(np.array([0.5, 0.5])) < 0
    assert abs(box.eval(np.array([2.0, 0.5])) - 1.0) < 1e-12


def test_primitive_measures():
    t = Triangle(np.array([[0.0, 0], [1, 0], [0, 1]]))
    assert abs(t.area() - 0.5) < 1e-15
    tet = Tetrahedron(np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]]))
    assert abs(tet.volume() - 1 / 6) < 1e-15
    seg = LineSegment(np.array([0.0, 0]), np.array([2.0, 0]))
    assert np.allclose(seg.closest_point(np.array([1.0, 5.0])), [1.0, 0.0])
    assert np.allclose(seg.midpoint, [1.0, 0.0])


def test_convex_clip():
    square = np.array([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    half = HalfSpace.from_point_and_normal([0.5, 0.0], [1.0, 0.0])
    clipped = convex_polygon_clip_halfplane(square, half)
    # left half remains: area 0.5
    x, y = clipped[:, 0], clipped[:, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    assert abs(area - 0.5) < 1e-12


def test_polymesh_volume_and_clip():
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(1)
    pm = PolyMesh.from_hex_mesh(mesh)
    assert abs(pm.volume() - 1.0) < 1e-12
    half = HalfSpace.from_point_and_normal([0.5, 0.0, 0.0], [1.0, 0.0, 0.0])
    clipped = pm.intersect_half_space(half)
    assert abs(clipped.volume() - 0.5) < 1e-10


def test_polymesh_sphere_approximation():
    """Repeated half-space clipping of a cube approximates a ball
    (create_simple_stupid_sphere, procedural.rs:405)."""
    mesh = procedural.create_rectangular_uniform_hex_mesh(2.0, 1, 1, 1, 1)
    pm = PolyMesh.from_hex_mesh(mesh).translate([-1.0, -1.0, -1.0])
    n_sweeps = 6
    for i in range(n_sweeps):
        for j in range(n_sweeps):
            theta = np.pi * i / n_sweeps
            phi = 2 * np.pi * j / n_sweeps
            x = np.array(
                [np.sin(theta) * np.cos(phi), np.sin(theta) * np.sin(phi), np.cos(theta)]
            )
            pm = pm.intersect_half_space(
                HalfSpace.from_point_and_normal(x, x)  # outward normal at x
            )
    vol = pm.volume()
    ball_vol = 4 / 3 * np.pi
    assert 0.8 * ball_vol < vol < 1.5 * ball_vol


# ---------------------------------------------------------------------------
# round 2: primitives (line.rs / triangle.rs / tetrahedron.rs parity)
# ---------------------------------------------------------------------------


def test_line_intersections():
    from fenris_tpu.geometry import Line, Plane

    l1 = Line.from_point_and_dir([0.0, 0.0], [1.0, 0.0])
    l2 = Line.from_point_and_dir([2.0, -1.0], [0.0, 1.0])
    t1, t2 = l1.intersect_line_parametric(l2)
    assert abs(t1 - 2.0) < 1e-14 and abs(t2 - 1.0) < 1e-14
    assert np.allclose(l1.intersect(l2), [2.0, 0.0])
    # parallel lines -> None
    assert l1.intersect_line_parametric(
        Line.from_point_and_dir([0.0, 1.0], [2.0, 0.0])
    ) is None
    # projection
    assert abs(l1.project_point_parametric([3.0, 7.0]) - 3.0) < 1e-14
    # 3D line-plane
    l3 = Line.from_point_and_dir([0.0, 0, 0], [0, 0, 2.0])
    plane = Plane(np.array([0.0, 0, 1.0]), np.array([0.0, 0, 1.0]))
    assert abs(l3.intersect_plane_parametric(plane) - 0.5) < 1e-14


def test_segment_queries(rng):
    from fenris_tpu.geometry import HalfPlane, LineSegment, segment_segment_closest

    s = LineSegment(np.array([0.0, 0.0]), np.array([2.0, 0.0]))
    assert s.intersect_segment_parametric(
        LineSegment(np.array([1.0, -1.0]), np.array([1.0, 1.0]))
    ) == pytest.approx(0.5)
    assert s.intersect_segment_parametric(
        LineSegment(np.array([3.0, -1.0]), np.array([3.0, 1.0]))
    ) is None
    hp = HalfPlane.from_point_and_normal([1.0, 0.0], [1.0, 0.0])
    t0, t1 = s.intersect_half_plane_parametric(hp)
    assert (t0, t1) == (0.0, pytest.approx(0.5))
    clipped = s.intersect_half_plane(hp)
    assert np.allclose(clipped.b, [1.0, 0.0])
    # closest pair on skew 3D segments: known distance 1
    s1, t1b, c1, c2 = segment_segment_closest(
        [0.0, 0, 0], [2.0, 0, 0], [1.0, -1.0, 1.0], [1.0, 1.0, 1.0]
    )
    assert np.allclose(c1, [1.0, 0, 0]) and np.allclose(c2, [1.0, 0, 1.0])
    # property: closest pair never beats random sampled pairs
    for _ in range(20):
        p1, q1, p2, q2 = rng.standard_normal((4, 3))
        _, _, c1, c2 = segment_segment_closest(p1, q1, p2, q2)
        dmin = np.linalg.norm(c1 - c2)
        ts = rng.random((30, 2))
        pts1 = p1 + ts[:, :1] * (q1 - p1)
        pts2 = p2 + ts[:, 1:] * (q2 - p2)
        assert dmin <= np.linalg.norm(pts1 - pts2, axis=1).min() + 1e-9


def test_triangle_closest_point_voronoi_regions():
    """Per-Voronoi-region closest point (the reference's property tests,
    tests/unit_tests/element/tetrahedron.rs:259-313 style)."""
    from fenris_tpu.geometry import triangle_closest_point

    tri = np.array([[0.0, 0, 0], [2.0, 0, 0], [0.0, 2.0, 0]])
    # interior
    cp, reg = triangle_closest_point(tri, [0.5, 0.5, 3.0])
    assert reg == "interior" and np.allclose(cp, [0.5, 0.5, 0.0])
    # vertex regions
    cp, reg = triangle_closest_point(tri, [-1.0, -1.0, 1.0])
    assert reg == "vertex:0" and np.allclose(cp, tri[0])
    cp, reg = triangle_closest_point(tri, [3.0, -1.0, 0.0])
    assert reg == "vertex:1" and np.allclose(cp, tri[1])
    cp, reg = triangle_closest_point(tri, [-0.5, 3.0, -2.0])
    assert reg == "vertex:2" and np.allclose(cp, tri[2])
    # edge regions
    cp, reg = triangle_closest_point(tri, [1.0, -1.0, 0.5])
    assert reg == "edge:01" and np.allclose(cp, [1.0, 0.0, 0.0])
    cp, reg = triangle_closest_point(tri, [-1.0, 1.0, 0.0])
    assert reg == "edge:02" and np.allclose(cp, [0.0, 1.0, 0.0])
    cp, reg = triangle_closest_point(tri, [2.0, 2.0, 0.0])
    assert reg == "edge:12" and np.allclose(cp, [1.0, 1.0, 0.0])


def test_triangle_closest_point_matches_sampling(rng):
    from fenris_tpu.geometry import triangle_closest_point

    for _ in range(25):
        tri = rng.standard_normal((3, 3))
        p = 2.0 * rng.standard_normal(3)
        cp, _ = triangle_closest_point(tri, p)
        d = np.linalg.norm(p - cp)
        # dense barycentric sampling can only do worse
        w = rng.dirichlet(np.ones(3), size=500)
        samples = w @ tri
        assert d <= np.linalg.norm(samples - p, axis=1).min() + 1e-9


def test_tetrahedron_closest_point(rng):
    from fenris_tpu.geometry import Tetrahedron

    tet = Tetrahedron(np.array([[0.0, 0, 0], [1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]))
    assert tet.contains_point([0.1, 0.1, 0.1])
    assert not tet.contains_point([1.0, 1.0, 1.0])
    cp, inside = tet.closest_point([0.2, 0.2, 0.1])
    assert inside and np.allclose(cp, [0.2, 0.2, 0.1])
    cp, inside = tet.closest_point([0.25, 0.25, -1.0])
    assert not inside and np.allclose(cp, [0.25, 0.25, 0.0])
    assert tet.distance([0.25, 0.25, -1.0]) == pytest.approx(1.0)
    # negative-orientation tet gives identical answers
    tet2 = Tetrahedron(tet.vertices[[1, 0, 2, 3]])
    for _ in range(10):
        p = rng.standard_normal(3)
        assert tet.distance(p) == pytest.approx(tet2.distance(p), abs=1e-12)


def test_winding_number_cube():
    from fenris_tpu.geometry import compute_winding_number_for_triangles_3d
    from fenris_tpu.mesh import procedural

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(1)
    surf = mesh.boundary_mesh().split_into_triangles()
    tris = [surf.points[c] for c in np.asarray(surf.cells)]
    # orient consistently outward via face centroids vs box center
    oriented = []
    for t in tris:
        n = np.cross(t[1] - t[0], t[2] - t[0])
        c = t.mean(axis=0) - 0.5
        oriented.append(t if n @ c > 0 else t[[0, 2, 1]])
    w_in = compute_winding_number_for_triangles_3d(oriented, [0.5, 0.5, 0.5])
    w_out = compute_winding_number_for_triangles_3d(oriented, [2.0, 2.0, 2.0])
    assert abs(w_in - 1.0) < 1e-10
    assert abs(w_out) < 1e-10


# ---------------------------------------------------------------------------
# round 2: polygons (polygon.rs / polytope.rs parity)
# ---------------------------------------------------------------------------


def test_simple_polygon_area_and_orientation():
    from fenris_tpu.geometry import SimplePolygon2d

    square = SimplePolygon2d.from_vertices([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    assert square.signed_area() == pytest.approx(1.0)
    assert square.orientation() == "counterclockwise"
    assert SimplePolygon2d.from_vertices(
        square.vertices[::-1]
    ).signed_area() == pytest.approx(-1.0)
    # L-shaped (nonconvex) polygon
    ell = SimplePolygon2d.from_vertices(
        [[0.0, 0], [2, 0], [2, 1], [1, 1], [1, 2], [0, 2]]
    )
    assert ell.area() == pytest.approx(3.0)
    # triangulation at centroid covers the polygon for convex inputs
    tri_area = sum(
        0.5 * abs(np.cross(t[1] - t[0], t[2] - t[0])) for t in square.triangulate()
    )
    assert tri_area == pytest.approx(1.0)


def test_simple_polygon_closest_edge_signed_distance():
    from fenris_tpu.geometry import SimplePolygon2d

    square = SimplePolygon2d.from_vertices([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    inside = square.closest_edge([0.5, 0.3])
    assert inside.signed_distance == pytest.approx(-0.3)
    outside = square.closest_edge([1.5, 0.5])
    assert outside.signed_distance == pytest.approx(0.5)
    assert np.allclose(outside.edge_point, [1.0, 0.5])
    corner = square.closest_edge([2.0, -1.0])  # vertex region: pseudonormal sign
    assert corner.signed_distance == pytest.approx(np.sqrt(2.0))
    assert square.contains_point([0.99, 0.01])
    assert not square.contains_point([1.01, 0.5])
    assert square.distance([2.0, 0.5]) == pytest.approx(1.0)
    assert square.distance([0.5, 0.5]) == 0.0


def test_simple_polygon_intersects_segment():
    from fenris_tpu.geometry import SimplePolygon2d

    square = SimplePolygon2d.from_vertices([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    assert square.intersects_segment([-1.0, 0.5], [2.0, 0.5])  # crosses
    assert square.intersects_segment([0.2, 0.2], [0.8, 0.8])  # contained
    assert not square.intersects_segment([2.0, 2.0], [3.0, 2.0])  # outside


def test_simple_polygon3d_area_and_clip():
    from fenris_tpu.geometry import HalfSpace, SimplePolygon3d

    # unit square in the z=1 plane
    poly = SimplePolygon3d.from_vertices(
        [[0.0, 0, 1], [1, 0, 1], [1, 1, 1], [0, 1, 1]]
    )
    assert poly.area() == pytest.approx(1.0)
    assert np.allclose(poly.normal(), [0, 0, 1.0])
    clipped = poly.intersect_half_space(
        HalfSpace.from_point_and_normal([0.25, 0.0, 0.0], [1.0, 0.0, 0.0])
    )
    assert clipped.area() == pytest.approx(0.25)


def test_convex_polygon_clipping():
    from fenris_tpu.geometry import ConvexPolygon, HalfPlane

    square = ConvexPolygon.from_vertices([[0.0, 0], [1, 0], [1, 1], [0, 1]])
    assert square.is_convex()
    assert square.contains_point([0.5, 0.5])
    assert not square.contains_point([1.5, 0.5])
    clipped = square.intersect_halfplane(
        HalfPlane.from_point_and_normal([0.5, 0.0], [1.0, 0.0])
    )
    assert clipped.area() == pytest.approx(0.5)
    # polygon-polygon intersection: two offset unit squares
    other = ConvexPolygon.from_vertices(
        np.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]]) + 0.5
    )
    inter = square.intersect_polygon(other)
    assert inter.area() == pytest.approx(0.25)
    # fully disjoint -> empty
    far = ConvexPolygon.from_vertices(np.asarray([[0.0, 0], [1, 0], [1, 1], [0, 1]]) + 5.0)
    assert square.intersect_polygon(far).is_empty()
    # triangulation covers the area
    tri_area = sum(
        0.5 * abs(np.cross(t[1] - t[0], t[2] - t[0])) for t in inter.triangulate()
    )
    assert tri_area == pytest.approx(inter.area())
    # degenerate chain: clip down to a segment, then to a point, then empty
    seg = square.intersect_halfplane(HalfPlane.from_point_and_normal([0.0, 1.0], [0.0, 1.0]))
    # the clip at the boundary y<=... keeps the full square (y in [0,1]):
    assert seg.area() == pytest.approx(1.0)


def test_convex_polygon_random_clip_area_monotone(rng):
    from fenris_tpu.geometry import ConvexPolygon, HalfPlane

    square = ConvexPolygon.from_vertices([[0.0, 0], [2, 0], [2, 2], [0, 2]])
    poly = square
    prev_area = poly.area()
    for _ in range(12):
        p = rng.uniform(0, 2, size=2)
        n = rng.standard_normal(2)
        poly = poly.intersect_halfplane(HalfPlane.from_point_and_normal(p, n))
        a = poly.area()
        assert a <= prev_area + 1e-12
        assert poly.is_convex()
        prev_area = a


# ---------------------------------------------------------------------------
# round 2: topological PolyMesh clipping (polymesh.rs:576 parity)
# ---------------------------------------------------------------------------


def test_polymesh_topological_clip_partitions_volume(rng):
    """clip(h) and clip(-h) partition the mesh volume for random planes."""
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    pm = PolyMesh.from_hex_mesh(mesh)
    v0 = pm.volume()
    for _ in range(8):
        p = rng.uniform(0.2, 0.8, size=3)
        n = rng.standard_normal(3)
        h1 = HalfSpace.from_point_and_normal(p, n)
        h2 = HalfSpace.from_point_and_normal(p, -n)
        v1 = pm.intersect_half_space(h1).volume()
        v2 = pm.intersect_half_space(h2).volume()
        assert abs(v1 + v2 - v0) < 1e-10


def test_polymesh_clip_preserves_shared_faces():
    """Interior faces stay shared between cells after an oblique clip."""
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    pm = PolyMesh.from_hex_mesh(mesh)
    clipped = pm.intersect_half_space(
        HalfSpace.from_point_and_normal([0.5, 0.5, 0.5], [1.0, 1.0, 1.0])
    )
    counts = np.zeros(clipped.num_faces, dtype=int)
    for cfaces in clipped.cells:
        for f in cfaces:
            counts[f] += 1
    # every face is used by one or two cells; interior sharing survives
    assert counts.max() == 2
    assert (counts >= 1).sum() >= clipped.num_cells  # no dangling cells
    # each clipped cell is closed: its faces' edges must pair up
    for cfaces in clipped.cells:
        edge_count = {}
        for f in cfaces:
            loop = clipped.faces[f]
            for k in range(len(loop)):
                e = tuple(sorted((loop[k], loop[(k + 1) % len(loop)])))
                edge_count[e] = edge_count.get(e, 0) + 1
        assert all(c == 2 for c in edge_count.values()), "cell not watertight"


def test_polymesh_oblique_clip_volume_tetrahedron_corner():
    """Cut a corner tetrahedron off the unit cube: exact volume check."""
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(1)
    pm = PolyMesh.from_hex_mesh(mesh)
    # contains = {x : n·(x-p) <= 0}; plane x+y+z = 0.5 through (0.5, 0, 0)
    corner = pm.intersect_half_space(
        HalfSpace.from_point_and_normal([0.5, 0.0, 0.0], [1.0, 1.0, 1.0])
    )  # keeps x+y+z <= 0.5: the origin corner tet
    assert abs(corner.volume() - 0.5**3 / 6.0) < 1e-12
    rest = pm.intersect_half_space(
        HalfSpace.from_point_and_normal([0.5, 0.0, 0.0], [-1.0, -1.0, -1.0])
    )
    assert abs(rest.volume() - (1.0 - 0.5**3 / 6.0)) < 1e-12


def test_polymesh_intersect_convex_polyhedron():
    from fenris_tpu.geometry import PolyMesh

    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    pm = PolyMesh.from_hex_mesh(mesh)
    # convex region = box [0.25, 0.75]^3 given by its 6 half-spaces
    halves = []
    for ax in range(3):
        for sign, off in ((1.0, 0.75), (-1.0, 0.25)):
            n = np.zeros(3)
            n[ax] = sign
            p = np.full(3, 0.5)
            p[ax] = off
            halves.append(HalfSpace.from_point_and_normal(p, n))
    inner = pm.intersect_convex_polyhedron(halves)
    assert abs(inner.volume() - 0.5**3) < 1e-12


def test_polymesh_from_tet_mesh_and_boundary():
    mesh = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    pm = PolyMesh.from_cell_mesh(mesh)
    assert abs(pm.volume() - 1.0) < 1e-12
    bf = pm.find_boundary_faces()
    # boundary of the unit cube: area 6
    assert abs(pm.surface_area() - 6.0) < 1e-12
    assert len(bf) > 0


def test_create_simple_stupid_sphere_api():
    """procedural.rs:405 parity: the sphere generator as public API."""
    from fenris_tpu.mesh.procedural import create_simple_stupid_sphere

    pm = create_simple_stupid_sphere([1.0, -2.0, 0.5], 1.0, 6)
    vol = pm.volume()
    ball = 4.0 / 3.0 * np.pi
    assert 0.8 * ball < vol < 1.5 * ball
    center = 0.5 * (pm.vertices.min(axis=0) + pm.vertices.max(axis=0))
    assert np.allclose(center, [1.0, -2.0, 0.5], atol=1e-9)
    # triangulated (tet4) volume agrees with the polymesh volume
    tet = pm.triangulate()
    v = tet.points[np.asarray(tet.cells)]
    vols = np.abs(np.linalg.det(v[:, 1:] - v[:, :1])) / 6.0
    assert abs(vols.sum() - vol) < 1e-9


def test_convex_polygon_segment_contains_point():
    """Degenerate 2-vertex polygon: membership means *on the segment*,
    not inside the lone edge's half-plane (cf. polytope.rs:102)."""
    from fenris_tpu.geometry.polygon import ConvexPolygon

    seg = ConvexPolygon(np.array([[0.0, 0.0], [1.0, 0.0]]))
    assert not seg.contains_point([0.5, -5.0])
    assert not seg.contains_point([0.5, 0.5])
    assert not seg.contains_point([1.5, 0.0], tol=1e-9)
    assert seg.contains_point([0.5, 0.0], tol=1e-12)
    assert seg.contains_point([0.25, 1e-13], tol=1e-12)
