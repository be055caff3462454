"""Convex polygon/polyhedron primitives (quad.rs, hexahedron.rs, lib.rs:393-648).

Property tests mirror the reference's proptest strategies
(fenris-geometry/src/proptest.rs): random convex quads by triangle
extrusion (:184-218), random convex polyhedra by positive-determinant
affine maps of the reference hexahedron.
"""

import numpy as np
import pytest

from fenris_tpu.geometry import (
    ConvexPolyhedron,
    HalfSpace,
    Hexahedron,
    PolyMesh,
    Polygon3d,
    Quad2d,
    Quad3d,
    compute_polyhedron_volume_from_faces,
)


def _random_affine(rng, scale=1.0):
    """Random positive-determinant affine map (preserves convexity)."""
    while True:
        A = rng.standard_normal((3, 3)) * scale
        if np.linalg.det(A) > 0.1 * scale**3:
            return A, rng.standard_normal(3) * 2.0


def _random_hex(rng):
    A, b = _random_affine(rng)
    return Hexahedron(Hexahedron.reference().vertices @ A.T + b), A


# -- Polygon3d / Quad3d -------------------------------------------------------


def test_quad3d_area_and_normal():
    q = Quad3d.from_vertices([[0, 0, 0], [2, 0, 0], [2, 1, 0], [0, 1, 0]])
    assert abs(q.area() - 2.0) < 1e-14
    np.testing.assert_allclose(q.compute_normal(), [0, 0, 1], atol=1e-15)
    av = q.compute_area_vector()
    np.testing.assert_allclose(av, [0, 0, 2.0], atol=1e-14)


def test_quad3d_closest_point_regions():
    q = Quad3d.from_vertices([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]])
    # interior projection
    r = q.closest_point([0.5, 0.5, 2.0])
    np.testing.assert_allclose(r.closest_point, [0.5, 0.5, 0.0], atol=1e-14)
    assert abs(r.distance - 2.0) < 1e-14
    # edge region
    r = q.closest_point([0.5, -1.0, 0.0])
    np.testing.assert_allclose(r.closest_point, [0.5, 0.0, 0.0], atol=1e-14)
    # corner region
    r = q.closest_point([-3.0, -4.0, 0.0])
    np.testing.assert_allclose(r.closest_point, [0.0, 0.0, 0.0], atol=1e-14)
    assert abs(r.distance - 5.0) < 1e-14


def test_polygon3d_closest_point_vs_triangulation(rng):
    """Convex planar polygon distance == min over fan-triangle distances."""
    from fenris_tpu.geometry import Triangle

    for _ in range(25):
        n = int(rng.integers(3, 8))
        ang = np.sort(rng.uniform(0, 2 * np.pi, size=n))
        if np.min(np.diff(ang, append=ang[0] + 2 * np.pi)) < 1e-2:
            continue
        pts2 = np.stack([np.cos(ang), np.sin(ang)], axis=1)
        A, b = _random_affine(rng)
        pts3 = np.concatenate([pts2, np.zeros((n, 1))], axis=1) @ A.T + b
        poly = Polygon3d.from_vertices(pts3)
        p = rng.standard_normal(3) * 3.0
        d_poly = poly.closest_point(p).distance
        d_tris = min(
            Triangle(np.stack([pts3[0], pts3[k], pts3[k + 1]])).distance(p)
            for k in range(1, n - 1)
        )
        assert abs(d_poly - d_tris) < 1e-9, (d_poly, d_tris)


# -- Quad2d -------------------------------------------------------------------


def _extrude_convex_quad(rng):
    """Reference strategy: extrude a triangle edge point outward
    (proptest.rs:184-211)."""
    a = rng.standard_normal(2) * 2
    bvec = rng.uniform(0.5, 3.0, size=2) * rng.choice([-1.0, 1.0], size=2)
    b = a + bvec
    ab = b - a
    nrm = np.array([-ab[1], ab[0]])
    c = a + rng.uniform(-2, 2) * ab + rng.uniform(0.5, 3.0) * nrm
    t1 = rng.uniform(0.1, 0.9)
    t3 = rng.uniform(0.1, 5.0)
    d1, d2 = b - a, c - a
    d3 = (1.0 + t3) * (t1 * d1 + (1.0 - t1) * d2)
    # CCW ordering: a, b, a + d3, c (triangle a,b,c is CCW by construction)
    return Quad2d.from_vertices([a, b, a + d3, c])


def test_quad2d_concave_corner_and_split():
    convex = Quad2d.from_vertices([[0, 0], [1, 0], [1, 1], [0, 1]])
    assert convex.concave_corner() is None
    assert convex.split_into_triangle_connectivities() == ((0, 1, 2), (0, 2, 3))
    assert abs(convex.area() - 1.0) < 1e-14

    # dart: vertex 2 pulled inside the triangle (0,1,3) -> concave at 2
    dart = Quad2d.from_vertices([[0, 0], [2, 0], [0.5, 0.5], [0, 2]])
    c = dart.concave_corner()
    assert c == 2
    c1, c2 = dart.split_into_triangle_connectivities()
    # both split triangles must avoid the diagonal through the reflex vertex
    t1, t2 = dart.split_into_triangles()
    assert abs(t1.area() + t2.area() - dart.area()) < 1e-14
    assert t1.area() > 0 and t2.area() > 0


def test_quad2d_properties_random(rng):
    for _ in range(50):
        q = _extrude_convex_quad(rng)
        assert q.concave_corner() is None, q.vertices
        t1, t2 = q.split_into_triangles()
        assert abs(q.area() - (t1.area() + t2.area())) < 1e-9 * max(1.0, q.area())
        # distance: zero inside (centroid), positive outside the bbox
        centroid = q.vertices.mean(axis=0)
        assert q.distance(centroid) <= 1e-12
        far = q.vertices.max(axis=0) + np.array([10.0, 0.0])
        assert q.distance(far) > 1.0


# -- ConvexPolyhedron / Hexahedron --------------------------------------------


def test_reference_hexahedron_measures():
    h = Hexahedron.reference()
    assert h.num_faces == 6
    assert abs(h.compute_volume() - 8.0) < 1e-13
    assert h.contains_point([0.0, 0.0, 0.0])
    assert not h.contains_point([1.5, 0.0, 0.0])
    r = h.compute_signed_distance([0.0, 0.0, 0.0])
    assert abs(r.signed_distance + 1.0) < 1e-14
    r = h.compute_signed_distance([2.0, 0.0, 0.0])
    assert abs(r.signed_distance - 1.0) < 1e-14
    np.testing.assert_allclose(r.point, [1.0, 0.0, 0.0], atol=1e-14)
    assert abs(h.distance([0.0, 0.0, 0.0])) == 0.0  # clamped outside distance
    bb = h.bounding_box()
    np.testing.assert_allclose(bb.min, [-1, -1, -1])
    np.testing.assert_allclose(bb.max, [1, 1, 1])


def test_hexahedron_faces_point_inward():
    """Face normals follow hexahedron.rs:89 (towards the interior)."""
    h = Hexahedron.reference()
    for f in h.faces():
        n = f.compute_normal()
        x0 = f.vertices.mean(axis=0)
        # stepping along the normal from the face must go inside
        assert h.contains_point(x0 + 0.1 * n)


def test_random_hexahedron_properties(rng):
    for _ in range(20):
        h, A = _random_hex(rng)
        assert abs(h.compute_volume() - 8.0 * np.linalg.det(A)) < 1e-8 * abs(
            8.0 * np.linalg.det(A)
        )
        for _ in range(10):
            p = rng.standard_normal(3) * 2.5
            sd = h.compute_signed_distance(p)
            inside = h.contains_point(p)
            assert inside == (sd.signed_distance <= 1e-12), (p, sd)
            # |signed distance| equals the distance to the returned point
            assert abs(abs(sd.signed_distance) - np.linalg.norm(p - sd.point)) < 1e-9
            # returned point lies (approximately) on the boundary
            bd = h.compute_signed_distance(sd.point).signed_distance
            assert abs(bd) < 1e-8


def test_generic_convex_polyhedron_tet():
    """ConvexPolyhedron.from_vertices_and_faces on a tetrahedron."""
    v = np.array([[0.0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]])
    # inward-pointing winding for each face
    faces = [(0, 1, 2), (3, 2, 1), (3, 1, 0), (3, 0, 2)]
    tet = ConvexPolyhedron.from_vertices_and_faces(v, faces)
    for f in tet.faces():
        n = f.compute_normal()
        x0 = f.vertices.mean(axis=0)
        assert tet.contains_point(x0 + 1e-3 * n), "face not inward"
    assert abs(tet.compute_volume() - 1.0 / 6.0) < 1e-14
    assert tet.contains_point([0.1, 0.1, 0.1])
    assert not tet.contains_point([1.0, 1.0, 1.0])
    sd = tet.compute_signed_distance([0.1, 0.1, 0.1])
    assert sd.signed_distance < 0


def test_volume_from_faces_helper():
    h = Hexahedron.reference()
    assert abs(compute_polyhedron_volume_from_faces(h.faces()) - 8.0) < 1e-13


# -- PolyMesh integration ------------------------------------------------------


def _box_polymesh(lo=-2.0, hi=2.0):
    from fenris_tpu.mesh.procedural import create_unit_box_uniform_hex_mesh_3d

    mesh = create_unit_box_uniform_hex_mesh_3d(2)
    pts = np.asarray(mesh.points) * (hi - lo) + lo
    from fenris_tpu.mesh import Mesh

    return PolyMesh.from_cell_mesh(Mesh(pts, mesh.cells, mesh.element))


def test_polymesh_clip_against_hexahedron(rng):
    """intersect_convex_polyhedron accepts a Hexahedron object and clips
    to its volume (clip mesh against a hexahedron workflow,
    hexahedron.rs + polymesh.rs:564)."""
    pm = _box_polymesh()
    A = np.diag(rng.uniform(0.3, 0.9, size=3))
    h = Hexahedron(Hexahedron.reference().vertices @ A.T)
    clipped = pm.intersect_convex_polyhedron(h)
    assert abs(clipped.volume() - h.compute_volume()) < 1e-9
    # raw half-space iterables keep working
    clipped2 = pm.intersect_convex_polyhedron(h.half_spaces())
    assert abs(clipped2.volume() - h.compute_volume()) < 1e-9


def test_polymesh_polygonal_vtu_export(tmp_path):
    """export_vtu writes true VTK_POLYGON cells (vtkio.rs polygon topology)."""
    import xml.etree.ElementTree as ET

    pm = _box_polymesh().intersect_convex_polyhedron(Hexahedron.reference())
    path = tmp_path / "poly.vtu"
    pm.export_vtu(path)
    root = ET.parse(path).getroot()
    piece = root.find(".//Piece")
    assert int(piece.get("NumberOfCells")) == len(pm.faces)
    assert int(piece.get("NumberOfPoints")) == len(pm.vertices)
    arrays = {a.get("Name"): a for a in piece.find("Cells")}
    types = np.fromstring(arrays["types"].text.replace("\n", " "), sep=" ")
    assert (types == 7).all()  # VTK_POLYGON
    offsets = np.fromstring(arrays["offsets"].text.replace("\n", " "), sep=" ")
    assert offsets[-1] == sum(len(f) for f in pm.faces)
    conn = np.fromstring(arrays["connectivity"].text.replace("\n", " "), sep=" ")
    assert len(conn) == offsets[-1]
    assert conn.max() < len(pm.vertices)


# -- util.rs helpers ------------------------------------------------------------


def test_orthonormal_vectors_3d(rng):
    from fenris_tpu.geometry import compute_orthonormal_vectors_3d

    v = rng.standard_normal((40, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    t1, t2 = compute_orthonormal_vectors_3d(v)
    for a, b in ((t1, t2), (t1, v), (t2, v)):
        assert np.abs((a * b).sum(axis=1)).max() < 1e-12
    assert np.abs(np.linalg.norm(t1, axis=1) - 1).max() < 1e-12
    assert np.abs(np.linalg.norm(t2, axis=1) - 1).max() < 1e-12
    # right-handed: t1 x t2 == v (the Pixar construction's orientation)
    cr = np.cross(t1, t2)
    assert np.abs(cr - v).max() < 1e-12


def test_shift_invariant_equality():
    from fenris_tpu.geometry import slices_are_equal_shift_invariant

    assert slices_are_equal_shift_invariant([1, 2, 3], [3, 1, 2])
    assert not slices_are_equal_shift_invariant([1, 2, 3], [3, 2, 1])
    assert slices_are_equal_shift_invariant([], [])
    assert not slices_are_equal_shift_invariant([1], [1, 1])
    close = lambda a, b: abs(a - b) < 1e-9
    assert slices_are_equal_shift_invariant([1.0, 2.0], [2.0, 1.0 + 1e-12], close)
