"""Mesh layer tests: procedural generation, topology, conversion,
refinement, reordering (cf. tests/unit_tests/mesh*)."""

import numpy as np
import pytest

from fenris_tpu.mesh import Mesh, convert, procedural, refinement, reorder
from fenris_tpu.reference_elements import ELEMENTS


def tet_signed_volumes(mesh):
    X = mesh.cell_points()
    return (
        np.linalg.det(
            np.stack([X[:, 1] - X[:, 0], X[:, 2] - X[:, 0], X[:, 3] - X[:, 0]], axis=1)
        )
        / 6.0
    )


def test_unit_square_quad_mesh_structure():
    m = procedural.create_unit_square_uniform_quad_mesh_2d(4)
    assert m.num_vertices == 25 and m.num_cells == 16
    assert m.points.min() == 0.0 and m.points.max() == 1.0
    # first vertex is the top-left (0, 1) per the reference layout
    assert tuple(m.points[0]) == (0.0, 1.0)
    # quads are CCW (positive area via shoelace)
    X = m.cell_points()
    area = 0.5 * np.abs(
        np.sum(
            X[:, :, 0] * np.roll(X[:, :, 1], -1, axis=1)
            - np.roll(X[:, :, 0], -1, axis=1) * X[:, :, 1],
            axis=1,
        )
    )
    assert np.allclose(area, 1 / 16)


def test_unit_square_tri_mesh():
    m = procedural.create_unit_square_uniform_tri_mesh_2d(3)
    assert m.num_cells == 18
    X = m.cell_points()
    cross = np.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0])
    assert (cross > 0).all()  # consistently oriented
    assert abs(cross.sum() / 2 - 1.0) < 1e-14


def test_unit_box_hex_mesh():
    m = procedural.create_unit_box_uniform_hex_mesh_3d(3)
    assert m.num_vertices == 64 and m.num_cells == 27


def test_bcc_tet_mesh_positive_volumes():
    m = procedural.create_unit_box_uniform_tet_mesh_3d(3)
    sv = tet_signed_volumes(m)
    assert (sv > 0).all()
    assert abs(sv.sum() - 1.0) < 1e-12


def test_boundary_extraction_hex():
    m = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    assert len(m.find_boundary_faces()) == 24
    assert len(m.find_boundary_vertices()) == 26
    assert len(m.find_boundary_cells()) == 8  # every cell touches the boundary
    surf = m.extract_surface_mesh()
    assert surf.element.name == "quad4"
    assert surf.num_vertices == 26


def test_boundary_extraction_tri():
    m = procedural.create_unit_square_uniform_tri_mesh_2d(4)
    bverts = m.find_boundary_vertices()
    expect = np.flatnonzero(
        (np.abs(m.points) < 1e-12).any(axis=1) | (np.abs(m.points - 1) < 1e-12).any(axis=1)
    )
    assert np.array_equal(bverts, expect)


def test_keep_cells_relabels():
    m = procedural.create_unit_square_uniform_quad_mesh_2d(3)
    kept = m.keep_cells([0, 4, 8])
    assert kept.num_cells == 3
    assert kept.cells.max() < kept.num_vertices
    # vertex positions preserved
    orig = m.points[np.unique(m.cells[[0, 4, 8]])]
    assert np.allclose(np.sort(kept.points, axis=0), np.sort(orig, axis=0))


@pytest.mark.parametrize(
    "src,dst,expect_verts",
    [
        ("tri3", "tri6", None),
        ("quad4", "quad9", 81),
        ("quad4", "quad8", 65),
        ("tet4", "tet10", None),
        ("tet4", "tet20", None),
        ("hex8", "hex20", 81),
        ("hex8", "hex27", 125),
    ],
)
def test_conversion_counts_and_interpolation(src, dst, expect_verts):
    if src == "tri3":
        m = procedural.create_unit_square_uniform_tri_mesh_2d(4)
    elif src == "quad4":
        m = procedural.create_unit_square_uniform_quad_mesh_2d(4)
    elif src == "tet4":
        m = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    else:
        m = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    hi = convert.convert_mesh(m, dst)
    assert hi.element.name == dst
    if expect_verts:
        assert hi.num_vertices == expect_verts
    # original vertices keep indices and positions
    assert np.allclose(hi.points[: m.num_vertices], m.points)
    # every cell's nodes must interpolate the reference nodes through the
    # linear geometry map of the parent cell
    el = ELEMENTS[dst]
    src_el = ELEMENTS[src]
    phi, _ = src_el.tabulate(el.nodes)
    expected = np.einsum("nm,emd->end", phi, m.cell_points())
    assert np.abs(hi.cell_points() - expected).max() < 1e-12


def test_tet20_shared_edge_nodes_consistent():
    m = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    hi = convert.convert_mesh(m, "tet20")
    # interior edges shared by many tets: total nodes must match formula
    # V + 2*edges + faces (counted once each)
    # just sanity-check count below parent-sum (dedup happened)
    assert hi.num_vertices < m.num_cells * 20


def test_refinement_tri_preserves_area_and_counts():
    m = procedural.create_unit_square_uniform_tri_mesh_2d(2)
    r = refinement.refine_uniformly(m)
    assert r.num_cells == 4 * m.num_cells
    X = r.cell_points()
    area = 0.5 * np.cross(X[:, 1] - X[:, 0], X[:, 2] - X[:, 0])
    assert (area > 0).all() and abs(area.sum() - 1.0) < 1e-14


def test_refinement_tet_hex_preserve_volume():
    t = procedural.create_unit_box_uniform_tet_mesh_3d(2)
    rt = refinement.refine_uniformly(t)
    sv = tet_signed_volumes(rt)
    assert (sv > 0).all() and abs(sv.sum() - 1.0) < 1e-12
    h = procedural.create_unit_box_uniform_hex_mesh_3d(2)
    rh = refinement.refine_uniformly(h)
    assert rh.num_cells == 64 and rh.num_vertices == 125


def test_refinement_repeat():
    m = procedural.create_unit_square_uniform_quad_mesh_2d(1)
    r = refinement.refine_uniformly_repeat(m, 3)
    assert r.num_cells == 64


def test_rcm_reduces_bandwidth():
    m = procedural.create_unit_box_uniform_tet_mesh_3d(3)
    def bandwidth(mesh):
        c = mesh.cells.astype(np.int64)
        return int((c.max(axis=1) - c.min(axis=1)).max())
    m2, perm = reorder.reorder_mesh(m)
    assert sorted(perm.tolist()) == list(range(m.num_vertices))
    assert bandwidth(m2) <= bandwidth(m)
    # geometry preserved
    assert np.allclose(np.sort(m2.points, axis=0), np.sort(m.points, axis=0))


def test_split_into_triangles_diagonal_convention():
    m = procedural.create_unit_square_uniform_quad_mesh_2d(1)
    t = m.split_into_triangles()
    q = m.cells[0]
    assert np.array_equal(t.cells[0], q[[0, 1, 2]])
    assert np.array_equal(t.cells[1], q[[0, 2, 3]])


def test_voxelize_sdf_circle():
    class CircleSdf:
        def bounding_box(self):
            return (np.array([-1.0, -1.0]), np.array([1.0, 1.0]))

        def eval(self, pts):
            return np.linalg.norm(pts, axis=-1) - 1.0

        def gradient(self, pts):
            n = np.linalg.norm(pts, axis=-1, keepdims=True)
            return pts / np.maximum(n, 1e-12)

    mesh = procedural.voxelize_sdf_2d(CircleSdf(), 0.25)
    assert mesh.num_cells > 0
    # all kept cells have at least one vertex inside the circle
    phi = CircleSdf().eval(mesh.points)
    assert ((phi[mesh.cells] <= 0).any(axis=1)).all()
    snapped = procedural.approximate_quad_mesh_for_sdf_2d(CircleSdf(), 0.25)
    assert CircleSdf().eval(snapped.points).max() < 1e-9


def test_diameters():
    m = procedural.create_unit_square_uniform_quad_mesh_2d(4)
    assert np.allclose(m.diameters(), np.sqrt(2) / 4)
