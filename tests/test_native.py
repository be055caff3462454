"""Native C++ pattern builder vs numpy reference."""

import os

import numpy as np
import pytest

import fenris_tpu.native as native_mod
from fenris_tpu.assembly import global_ as G
from fenris_tpu.mesh import procedural
from fenris_tpu.native import build_pattern_native, native_available


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize(
    "mesh,s",
    [
        (procedural.create_unit_square_uniform_tri_mesh_2d(5), 1),
        (procedural.create_unit_square_uniform_quad_mesh_2d(4), 2),
        (procedural.create_unit_box_uniform_tet_mesh_3d(2), 3),
        (procedural.create_unit_box_uniform_hex_mesh_3d(3), 1),
    ],
    ids=["tri-s1", "quad-s2", "tet-s3", "hex-s1"],
)
def test_native_matches_numpy(mesh, s, monkeypatch):
    p_native = G.csr_pattern(mesh.cells, mesh.num_vertices, s)
    # force numpy fallback
    monkeypatch.setenv("FENRIS_TPU_NO_NATIVE", "1")
    monkeypatch.setattr(native_mod, "_load_attempted", True)
    monkeypatch.setattr(native_mod, "_lib", None)
    p_numpy = G.csr_pattern(mesh.cells, mesh.num_vertices, s)
    assert p_native.nnz == p_numpy.nnz
    for fieldname in ("row_ptr", "col_indices", "rows_of_nnz", "scatter_indices", "diag_positions"):
        assert np.array_equal(
            getattr(p_native, fieldname), getattr(p_numpy, fieldname)
        ), fieldname


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_empty_and_single_element():
    cells = np.array([[0, 1, 2]], dtype=np.int32)
    out = build_pattern_native(cells, 3, 1)
    row_ptr, cols, rows, scatter, diag = out
    assert len(cols) == 9
    assert np.array_equal(row_ptr, [0, 3, 6, 9])
    assert (diag >= 0).all()


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
@pytest.mark.parametrize(
    "mesh",
    [
        procedural.create_unit_square_uniform_tri_mesh_2d(7),
        procedural.create_unit_box_uniform_hex_mesh_3d(4),
        procedural.create_unit_box_uniform_tet_mesh_3d(3),
    ],
    ids=["tri", "hex", "tet"],
)
def test_native_cuthill_mckee_matches_numpy(mesh):
    from fenris_tpu.mesh.reorder import _cuthill_mckee_numpy
    from fenris_tpu.native import cuthill_mckee_native

    want = _cuthill_mckee_numpy(mesh)
    got = cuthill_mckee_native(np.asarray(mesh.cells), mesh.num_vertices)
    assert got is not None
    assert np.array_equal(got, want)


@pytest.mark.skipif(not native_available(), reason="no C++ toolchain")
def test_native_cuthill_mckee_disconnected_components():
    """Isolated vertices and multiple components seed identically."""
    from fenris_tpu.mesh import Mesh
    from fenris_tpu.mesh.reorder import _cuthill_mckee_numpy
    from fenris_tpu.native import cuthill_mckee_native
    from fenris_tpu.reference_elements import ELEMENTS

    # two disjoint triangles + an unreferenced vertex (index 6)
    points = np.zeros((7, 2))
    points[:, 0] = np.arange(7)
    cells = np.array([[3, 4, 5], [0, 1, 2]], dtype=np.int32)
    mesh = Mesh(points, cells, ELEMENTS["tri3"])
    want = _cuthill_mckee_numpy(mesh)
    got = cuthill_mckee_native(np.asarray(mesh.cells), mesh.num_vertices)
    assert np.array_equal(got, want)
