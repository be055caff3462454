"""I/O tests: Gmsh import fixtures and VTU export round-trips.

Mirrors tests/unit_tests/io/* with the same 11 Gmsh fixture meshes.
"""

import xml.etree.ElementTree as ET
from pathlib import Path

import numpy as np
import pytest

from fenris_tpu.io import FiniteElementMeshDataSetBuilder, load_msh, write_vtu
from fenris_tpu.mesh import procedural

MESH_DIR = Path(__file__).parent / "assets" / "meshes"

FIXTURES = [
    ("square_tri3_4.msh", "tri3", 4),
    ("square_tri6_4.msh", "tri6", 4),
    ("square_quad4_4.msh", "quad4", 4),
    ("square_quad4_79.msh", "quad4", 79),
    ("square_quad9_4.msh", "quad9", 4),
    ("rectangle_tri3_110.msh", "tri3", 110),
    ("cube_tet4_24.msh", "tet4", 24),
    ("cube_tet10_24.msh", "tet10", 24),
    ("cube_hex8_8.msh", "hex8", 8),
    ("cube_hex27_8.msh", "hex27", 8),
    ("sphere_tet4_593.msh", "tet4", 593),
]


@pytest.mark.parametrize("fname,eltype,ncells", FIXTURES)
def test_load_msh_fixture(fname, eltype, ncells):
    mesh = load_msh(MESH_DIR / fname)
    assert mesh.element.name == eltype
    assert mesh.num_cells == ncells
    assert mesh.cells.min() >= 0 and mesh.cells.max() < mesh.num_vertices
    # every element must have positive geometric measure
    from fenris_tpu.assembly import local as L
    from fenris_tpu import quadrature as quad
    import jax.numpy as jnp

    rule = quad.total_order.for_domain(mesh.element.domain, 2)
    tab = L.tabulate(mesh.element, rule)
    m = mesh.element.geometry.num_nodes
    X = jnp.asarray(mesh.cell_points()[:, :m, :])
    J = L.jacobians(X, jnp.asarray(tab.geo_dphi))
    _, det = L.inv_and_det(J)
    assert float(jnp.min(det)) > 0.0


def test_tet10_fixture_volume():
    mesh = load_msh(MESH_DIR / "cube_tet10_24.msh")
    # corner tet volumes must fill the cube
    X = mesh.points[mesh.cells[:, :4]]
    sv = np.linalg.det(np.stack([X[:, 1] - X[:, 0], X[:, 2] - X[:, 0], X[:, 3] - X[:, 0]], 1)) / 6
    ext = mesh.points.max(axis=0) - mesh.points.min(axis=0)
    assert abs(abs(sv).sum() - np.prod(ext)) < 1e-9


def test_write_vtu_roundtrip_structure(tmp_path):
    mesh = procedural.create_unit_square_uniform_quad_mesh_2d(3)
    u = np.sin(mesh.points[:, 0])
    path = tmp_path / "out.vtu"
    (
        FiniteElementMeshDataSetBuilder.from_mesh(mesh)
        .with_title("test")
        .with_point_scalar_attributes("u_h", u)
        .with_cell_scalar_attributes("cell_id", np.arange(mesh.num_cells))
        .try_export(path)
    )
    tree = ET.parse(path)
    piece = tree.getroot().find(".//Piece")
    assert int(piece.get("NumberOfPoints")) == mesh.num_vertices
    assert int(piece.get("NumberOfCells")) == mesh.num_cells
    names = [d.get("Name") for d in piece.findall(".//PointData/DataArray")]
    assert "u_h" in names
    conn = piece.find(".//Cells/DataArray[@Name='connectivity']").text.split()
    assert len(conn) == mesh.num_cells * 4
    types = piece.find(".//Cells/DataArray[@Name='types']").text.split()
    assert set(types) == {"9"}


@pytest.mark.parametrize("elname", ["tet10", "hex20", "hex27", "tet20", "tri6", "quad9"])
def test_vtu_higher_order_types(tmp_path, elname):
    from fenris_tpu.mesh import convert

    if elname.startswith("te"):
        base = procedural.create_unit_box_uniform_tet_mesh_3d(1)
    elif elname.startswith("hex"):
        base = procedural.create_unit_box_uniform_hex_mesh_3d(1)
    elif elname == "tri6":
        base = procedural.create_unit_square_uniform_tri_mesh_2d(1)
    else:
        base = procedural.create_unit_square_uniform_quad_mesh_2d(1)
    mesh = convert.convert_mesh(base, elname)
    path = tmp_path / f"{elname}.vtu"
    write_vtu(path, mesh)
    tree = ET.parse(path)
    types = set(tree.getroot().find(".//Cells/DataArray[@Name='types']").text.split())
    expect = {"tet10": "24", "hex20": "25", "hex27": "25", "tet20": "10", "tri6": "22", "quad9": "28"}
    assert types == {expect[elname]}


def test_msh_vtu_pipeline(tmp_path):
    mesh = load_msh(MESH_DIR / "sphere_tet4_593.msh")
    write_vtu(tmp_path / "sphere.vtu", mesh, point_data={"r": np.linalg.norm(mesh.points, axis=1)})
    assert (tmp_path / "sphere.vtu").exists()


# -- binary MSH 4.1 -----------------------------------------------------------


def _ascii_msh_to_binary(path, endian="<", size_t=8):
    """Re-encode an ASCII MSH 4.1 fixture as a binary MSH 4.1 payload."""
    import re

    text = Path(path).read_text()

    def section(name):
        m = re.search(rf"\${name}\n(.*?)\$End{name}", text, re.S)
        return m.group(1).strip().splitlines()

    szt = np.dtype(f"{endian}u{size_t}")
    i4 = np.dtype(f"{endian}i4")
    f8 = np.dtype(f"{endian}f8")
    out = [f"$MeshFormat\n4.1 1 {size_t}\n".encode(),
           np.asarray([1], i4).tobytes(), b"\n$EndMeshFormat\n"]

    nodes = section("Nodes")
    hdr = [int(v) for v in nodes[0].split()]
    out.append(b"$Nodes\n" + np.asarray(hdr, szt).tobytes())
    i = 1
    for _ in range(hdr[0]):
        dim, tag, par, n = (int(v) for v in nodes[i].split())
        out.append(np.asarray([dim, tag, par], i4).tobytes())
        out.append(np.asarray([n], szt).tobytes())
        out.append(np.asarray([int(nodes[i + 1 + k]) for k in range(n)], szt).tobytes())
        coords = [[float(v) for v in nodes[i + 1 + n + k].split()[:3]] for k in range(n)]
        out.append(np.asarray(coords, f8).tobytes())
        i += 1 + 2 * n
    out.append(b"\n$EndNodes\n")

    els = section("Elements")
    hdr = [int(v) for v in els[0].split()]
    out.append(b"$Elements\n" + np.asarray(hdr, szt).tobytes())
    i = 1
    for _ in range(hdr[0]):
        dim, tag, etype, n = (int(v) for v in els[i].split())
        out.append(np.asarray([dim, tag, etype], i4).tobytes())
        out.append(np.asarray([n], szt).tobytes())
        rows = [[int(v) for v in els[i + 1 + k].split()] for k in range(n)]
        out.append(np.asarray(rows, szt).tobytes())
        i += 1 + n
    out.append(b"\n$EndElements\n")
    return b"".join(out)


@pytest.mark.parametrize("fname,eltype,ncells", FIXTURES)
def test_load_msh_binary_matches_ascii(fname, eltype, ncells):
    from fenris_tpu.io.msh import load_msh_from_bytes

    ascii_mesh = load_msh(MESH_DIR / fname)
    bin_mesh = load_msh_from_bytes(_ascii_msh_to_binary(MESH_DIR / fname))
    assert bin_mesh.element.name == ascii_mesh.element.name == eltype
    assert bin_mesh.num_cells == ncells
    np.testing.assert_array_equal(
        np.asarray(bin_mesh.cells), np.asarray(ascii_mesh.cells)
    )
    np.testing.assert_allclose(
        np.asarray(bin_mesh.points), np.asarray(ascii_mesh.points), rtol=0, atol=0
    )


@pytest.mark.parametrize("endian,size_t", [(">", 8), ("<", 4)])
def test_load_msh_binary_variants(endian, size_t):
    from fenris_tpu.io.msh import load_msh_from_bytes

    fname = "square_quad4_4.msh"
    ascii_mesh = load_msh(MESH_DIR / fname)
    blob = _ascii_msh_to_binary(MESH_DIR / fname, endian=endian, size_t=size_t)
    bin_mesh = load_msh_from_bytes(blob)
    np.testing.assert_array_equal(
        np.asarray(bin_mesh.cells), np.asarray(ascii_mesh.cells)
    )
    np.testing.assert_allclose(
        np.asarray(bin_mesh.points), np.asarray(ascii_mesh.points), rtol=0, atol=0
    )
