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
