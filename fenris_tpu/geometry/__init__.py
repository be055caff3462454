"""Geometry toolkit: AABBs, primitives, signed distance functions, polymesh.

Parity: fenris-geometry — ``AxisAlignedBoundingBox`` with distance/closest
point queries (lib.rs:87,:264-330), orientation tests (:355), primitive
shapes (src/primitives/), the SDF trait + ``BoundedSdf`` (sdf.rs), and a
general polytopal ``PolyMesh`` with half-space intersection
(polymesh.rs:66,:564-576) powering the procedural sphere generator.

Host-side vectorized numpy (geometry setup is not a device hot path);
SDF evaluators are additionally jax-compatible where noted.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "Aabb",
    "HalfSpace",
    "Ball",
    "BoxSdf",
    "SdfUnion",
    "Triangle",
    "Tetrahedron",
    "LineSegment",
    "Plane",
    "orient2d",
    "orient3d",
    "PolyMesh",
    "convex_polygon_clip_halfplane",
]


# ---------------------------------------------------------------------------
# AABB
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class Aabb:
    """Axis-aligned bounding box (fenris-geometry lib.rs:87)."""

    min: np.ndarray
    max: np.ndarray

    @staticmethod
    def from_points(points) -> "Aabb":
        p = np.asarray(points, dtype=np.float64)
        return Aabb(p.min(axis=0), p.max(axis=0))

    @property
    def center(self) -> np.ndarray:
        return (self.min + self.max) / 2.0

    @property
    def extents(self) -> np.ndarray:
        return self.max - self.min

    def contains(self, points) -> np.ndarray:
        p = np.asarray(points)
        return ((p >= self.min) & (p <= self.max)).all(axis=-1)

    def closest_point(self, points) -> np.ndarray:
        """Closest point inside the box per query (lib.rs:318)."""
        return np.clip(np.asarray(points), self.min, self.max)

    def dist2(self, points) -> np.ndarray:
        """Squared distance to the box (0 inside; lib.rs:264)."""
        p = np.asarray(points)
        d = np.maximum(self.min - p, 0.0) + np.maximum(p - self.max, 0.0)
        return np.sum(d * d, axis=-1)

    def max_dist2(self, points) -> np.ndarray:
        """Max squared distance to any point of the box (lib.rs:293)."""
        p = np.asarray(points)
        d = np.maximum(np.abs(self.min - p), np.abs(self.max - p))
        return np.sum(d * d, axis=-1)

    def intersects(self, other: "Aabb") -> bool:
        return bool(((self.min <= other.max) & (other.min <= self.max)).all())

    def enclose(self, other: "Aabb") -> "Aabb":
        return Aabb(np.minimum(self.min, other.min), np.maximum(self.max, other.max))

    def grow(self, amount: float) -> "Aabb":
        return Aabb(self.min - amount, self.max + amount)


# ---------------------------------------------------------------------------
# Orientation predicates (double precision; fenris-geometry lib.rs:355)
# ---------------------------------------------------------------------------


def orient2d(a, b, c) -> np.ndarray:
    """> 0 if (a, b, c) is counterclockwise."""
    a, b, c = (np.asarray(v) for v in (a, b, c))
    return (b[..., 0] - a[..., 0]) * (c[..., 1] - a[..., 1]) - (
        b[..., 1] - a[..., 1]
    ) * (c[..., 0] - a[..., 0])


def orient3d(a, b, c, d) -> np.ndarray:
    """> 0 if d is on the positive side of plane (a, b, c)."""
    a, b, c, d = (np.asarray(v) for v in (a, b, c, d))
    m = np.stack([b - a, c - a, d - a], axis=-2)
    return np.linalg.det(m)


# ---------------------------------------------------------------------------
# Primitives + SDFs
# ---------------------------------------------------------------------------


@dataclass(frozen=True)
class HalfSpace:
    """{x : n·(x - p) <= 0}: the half-space behind the plane (normal points out)."""

    point: np.ndarray
    normal: np.ndarray  # unit

    @staticmethod
    def from_point_and_normal(point, normal) -> "HalfSpace":
        n = np.asarray(normal, dtype=np.float64)
        return HalfSpace(np.asarray(point, dtype=np.float64), n / np.linalg.norm(n))

    def signed_distance(self, points) -> np.ndarray:
        return (np.asarray(points) - self.point) @ self.normal

    def contains(self, points) -> np.ndarray:
        return self.signed_distance(points) <= 0.0


@dataclass(frozen=True)
class Plane:
    point: np.ndarray
    normal: np.ndarray

    def project(self, points) -> np.ndarray:
        p = np.asarray(points)
        d = (p - self.point) @ self.normal
        return p - d[..., None] * self.normal


@dataclass(frozen=True)
class Ball:
    """Solid ball; a :class:`BoundedSdf` (primitives + sdf.rs)."""

    center: np.ndarray
    radius: float

    def eval(self, points) -> np.ndarray:
        p = np.asarray(points)
        return np.linalg.norm(p - self.center, axis=-1) - self.radius

    def gradient(self, points) -> np.ndarray:
        p = np.asarray(points)
        d = p - self.center
        n = np.linalg.norm(d, axis=-1, keepdims=True)
        return d / np.maximum(n, 1e-300)

    def bounding_box(self):
        c = np.asarray(self.center, dtype=np.float64)
        return (c - self.radius, c + self.radius)


@dataclass(frozen=True)
class BoxSdf:
    """Axis-aligned box SDF."""

    min: np.ndarray
    max: np.ndarray

    def eval(self, points) -> np.ndarray:
        p = np.asarray(points)
        c = (np.asarray(self.min) + np.asarray(self.max)) / 2.0
        h = (np.asarray(self.max) - np.asarray(self.min)) / 2.0
        q = np.abs(p - c) - h
        outside = np.linalg.norm(np.maximum(q, 0.0), axis=-1)
        inside = np.minimum(q.max(axis=-1), 0.0)
        return outside + inside

    def gradient(self, points) -> np.ndarray:
        eps = 1e-7
        p = np.asarray(points, dtype=np.float64)
        g = np.zeros_like(p)
        for ax in range(p.shape[-1]):
            e = np.zeros(p.shape[-1])
            e[ax] = eps
            g[..., ax] = (self.eval(p + e) - self.eval(p - e)) / (2 * eps)
        n = np.linalg.norm(g, axis=-1, keepdims=True)
        return g / np.maximum(n, 1e-300)

    def bounding_box(self):
        return (np.asarray(self.min, dtype=np.float64), np.asarray(self.max, dtype=np.float64))


@dataclass(frozen=True)
class SdfUnion:
    """Union of SDFs (min); bounded if all parts are."""

    parts: Tuple

    def eval(self, points):
        return np.minimum.reduce([p.eval(points) for p in self.parts])

    def gradient(self, points):
        vals = np.stack([p.eval(points) for p in self.parts])
        grads = np.stack([p.gradient(points) for p in self.parts])
        idx = np.argmin(vals, axis=0)
        return np.take_along_axis(
            grads, idx[None, ..., None], axis=0
        )[0]

    def bounding_box(self):
        los, his = zip(*(p.bounding_box() for p in self.parts))
        return (np.minimum.reduce(los), np.maximum.reduce(his))


@dataclass(frozen=True)
class LineSegment:
    a: np.ndarray
    b: np.ndarray

    @property
    def midpoint(self):
        return (np.asarray(self.a) + np.asarray(self.b)) / 2.0

    def closest_point(self, points):
        a, b = np.asarray(self.a), np.asarray(self.b)
        ab = b - a
        t = np.clip(((np.asarray(points) - a) @ ab) / (ab @ ab), 0.0, 1.0)
        return a + t[..., None] * ab


@dataclass(frozen=True)
class Triangle:
    vertices: np.ndarray  # [3, d]

    def area(self) -> float:
        v = np.asarray(self.vertices)
        e1, e2 = v[1] - v[0], v[2] - v[0]
        if v.shape[1] == 2:
            return 0.5 * abs(e1[0] * e2[1] - e1[1] * e2[0])
        return 0.5 * float(np.linalg.norm(np.cross(e1, e2)))

    def normal(self) -> np.ndarray:
        v = np.asarray(self.vertices)
        n = np.cross(v[1] - v[0], v[2] - v[0])
        return n / np.linalg.norm(n)

    def centroid(self) -> np.ndarray:
        return np.asarray(self.vertices).mean(axis=0)


@dataclass(frozen=True)
class Tetrahedron:
    vertices: np.ndarray  # [4, 3]

    def signed_volume(self) -> float:
        v = np.asarray(self.vertices)
        return float(np.linalg.det(np.stack([v[1] - v[0], v[2] - v[0], v[3] - v[0]])) / 6.0)

    def volume(self) -> float:
        return abs(self.signed_volume())

    def centroid(self) -> np.ndarray:
        return np.asarray(self.vertices).mean(axis=0)


# ---------------------------------------------------------------------------
# Convex clipping + PolyMesh
# ---------------------------------------------------------------------------


def convex_polygon_clip_halfplane(vertices: np.ndarray, half: HalfSpace) -> np.ndarray:
    """Sutherland-Hodgman clip of a convex polygon against a half-space."""
    v = np.asarray(vertices, dtype=np.float64)
    if len(v) == 0:
        return v
    d = half.signed_distance(v)
    out: List[np.ndarray] = []
    n = len(v)
    for i in range(n):
        j = (i + 1) % n
        if d[i] <= 0:
            out.append(v[i])
        if (d[i] <= 0) != (d[j] <= 0):
            t = d[i] / (d[i] - d[j])
            out.append(v[i] + t * (v[j] - v[i]))
    return np.asarray(out) if out else np.zeros((0, v.shape[1]))


@dataclass
class PolyMesh:
    """General polytopal mesh: vertices + faces + cells (polymesh.rs:66).

    Faces are vertex-index lists; cells are face-index lists.  Supports
    half-space intersection (each convex cell clipped; polymesh.rs:564-576),
    volume computation (:555) and triangulation (:337).
    """

    vertices: np.ndarray  # [N, 3]
    faces: List[List[int]]
    cells: List[List[int]]

    @staticmethod
    def from_hex_mesh(mesh) -> "PolyMesh":
        """Convert a hex8 Mesh into a PolyMesh (one cell per hex)."""
        from .reference_elements import ELEMENTS

        assert mesh.element.name == "hex8"
        faces: List[List[int]] = []
        cells: List[List[int]] = []
        face_map = {}
        for cell in mesh.cells:
            cfaces = []
            for local in ELEMENTS["hex8"].faces:
                fv = tuple(int(cell[i]) for i in local)
                key = tuple(sorted(fv))
                if key not in face_map:
                    face_map[key] = len(faces)
                    faces.append(list(fv))
                cfaces.append(face_map[key])
            cells.append(cfaces)
        return PolyMesh(np.asarray(mesh.points, dtype=np.float64), faces, cells)

    def translate(self, offset) -> "PolyMesh":
        return PolyMesh(self.vertices + np.asarray(offset), self.faces, self.cells)

    def cell_vertex_sets(self) -> List[np.ndarray]:
        out = []
        for cfaces in self.cells:
            idx = sorted({v for f in cfaces for v in self.faces[f]})
            out.append(np.asarray(idx))
        return out

    def volume(self) -> float:
        """Total volume via divergence theorem over (outward) cell faces."""
        total = 0.0
        for cfaces in self.cells:
            vol = 0.0
            # compute centroid of the cell for orientation-free accumulation
            vs = sorted({v for f in cfaces for v in self.faces[f]})
            c = self.vertices[vs].mean(axis=0)
            for f in cfaces:
                poly = self.vertices[self.faces[f]]
                for k in range(1, len(poly) - 1):
                    tet = np.stack([poly[0], poly[k], poly[k + 1], c])
                    vol += abs(
                        np.linalg.det(
                            np.stack([tet[1] - tet[0], tet[2] - tet[0], tet[3] - tet[0]])
                        )
                        / 6.0
                    )
            total += vol
        return total

    def triangulate(self):
        """Tetrahedralize each (convex) cell by fanning from its centroid
        (polymesh.rs:337).  Returns a tet4 :class:`~fenris_tpu.mesh.Mesh`."""
        from .mesh import Mesh
        from .reference_elements import ELEMENTS

        verts: List[np.ndarray] = [v for v in self.vertices]
        tets: List[List[int]] = []
        for cfaces in self.cells:
            vs = sorted({v for f in cfaces for v in self.faces[f]})
            centroid = self.vertices[vs].mean(axis=0)
            ci = len(verts)
            verts.append(centroid)
            for f in cfaces:
                face = self.faces[f]
                fc = self.vertices[face].mean(axis=0)
                fi = len(verts)
                verts.append(fc)
                n = len(face)
                for k in range(n):
                    a, b = face[k], face[(k + 1) % n]
                    tet = [a, b, fi, ci]
                    # orient positively
                    v0, v1, v2, v3 = (np.asarray(verts[i]) for i in tet)
                    if np.linalg.det(np.stack([v1 - v0, v2 - v0, v3 - v0])) < 0:
                        tet = [b, a, fi, ci]
                    tets.append(tet)
        return Mesh(np.asarray(verts), np.asarray(tets, dtype=np.int32), ELEMENTS["tet4"])

    def export_vtu(self, path) -> None:
        """Export as VTK polyhedral-ish data: triangulated tet mesh
        (fenris-geometry/src/vtkio.rs equivalent)."""
        from .io.vtk import write_vtu

        write_vtu(path, self.triangulate())

    def intersect_half_space(self, half: HalfSpace) -> "PolyMesh":
        """Clip every (convex) cell against a half-space (polymesh.rs:564).

        Cells are re-derived per cell via vertex-based convex clipping:
        each convex cell is represented by its vertex set; the clipped cell
        is the convex hull of kept vertices + edge intersections + the
        face polygon cut.  For axis-behaved inputs (boxes, repeated clips
        producing convex cells) this reproduces the reference's behavior.
        """
        new_vertices: List[np.ndarray] = []
        new_faces: List[List[int]] = []
        new_cells: List[List[int]] = []

        def add_vertex(v):
            new_vertices.append(v)
            return len(new_vertices) - 1

        for cfaces in self.cells:
            # collect cell's faces as polygons, clip each, and build the cut face
            polys = []
            cut_points: List[np.ndarray] = []
            for f in cfaces:
                poly = self.vertices[self.faces[f]]
                clipped = convex_polygon_clip_halfplane(poly, half)
                if len(clipped) >= 3:
                    polys.append(clipped)
                d = half.signed_distance(poly)
                n = len(poly)
                for i in range(n):
                    j = (i + 1) % n
                    if (d[i] <= 0) != (d[j] <= 0):
                        t = d[i] / (d[i] - d[j])
                        cut_points.append(poly[i] + t * (poly[j] - poly[i]))
            if not polys:
                continue
            # cut face: order intersection points around their centroid
            if len(cut_points) >= 3:
                pts = np.asarray(cut_points)
                # deduplicate
                uniq = []
                for p in pts:
                    if not any(np.linalg.norm(p - q) < 1e-12 for q in uniq):
                        uniq.append(p)
                if len(uniq) >= 3:
                    pts = np.asarray(uniq)
                    c = pts.mean(axis=0)
                    nrm = half.normal
                    # build orthonormal frame in the cut plane
                    a = np.eye(3)[np.argmin(np.abs(nrm))]
                    t1 = np.cross(nrm, a)
                    t1 /= np.linalg.norm(t1)
                    t2 = np.cross(nrm, t1)
                    ang = np.arctan2((pts - c) @ t2, (pts - c) @ t1)
                    polys.append(pts[np.argsort(ang)])
            cell_face_ids = []
            for poly in polys:
                ids = [add_vertex(p) for p in poly]
                new_faces.append(ids)
                cell_face_ids.append(len(new_faces) - 1)
            new_cells.append(cell_face_ids)

        if not new_vertices:
            return PolyMesh(np.zeros((0, 3)), [], [])
        verts = np.asarray(new_vertices)
        # global vertex dedup
        rounded = np.round(verts / 1e-12) * 1e-12
        uniq, inverse = np.unique(rounded, axis=0, return_inverse=True)
        faces = [[int(inverse[i]) for i in f] for f in new_faces]
        return PolyMesh(uniq, faces, new_cells)
