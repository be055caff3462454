"""Poisson MMS convergence acceptance tests.

These assert L²/H¹ errors within 1% of the reference's committed values
(tests/reference_values/*.json, identical to the reference repo's CI gate in
tests/convergence_tests/poisson_{2,3}d_mms.rs).

By default each suite runs a truncated resolution sweep (fast, still
multi-decade in h); set FENRIS_TPU_FULL_CONVERGENCE=1 to run the reference's
full resolutions.
"""

import os

import pytest

from fenris_tpu import quadrature as quad
from fenris_tpu.mesh import convert, procedural

from mms_common import assert_close_to_reference, load_reference, run_mms

FULL = os.environ.get("FENRIS_TPU_FULL_CONVERGENCE", "0") not in ("0", "")


def _trunc(resolutions, keep):
    return resolutions if FULL else resolutions[:keep]


@pytest.mark.parametrize(
    "name,mesh_producer,rule,error_rule,resolutions,keep",
    [
        (
            "poisson2d_mms_quad4",
            procedural.create_unit_square_uniform_quad_mesh_2d,
            quad.quadrilateral_gauss(2),
            quad.quadrilateral_gauss(6),
            [1, 2, 4, 8, 16, 32],
            5,
        ),
        (
            "poisson2d_mms_quad9",
            lambda r: convert.convert_mesh(
                procedural.create_unit_square_uniform_quad_mesh_2d(r), "quad9"
            ),
            quad.quadrilateral_gauss(2),
            quad.quadrilateral_gauss(6),
            [1, 2, 4, 8, 16, 32],
            5,
        ),
        (
            "poisson2d_mms_tri3",
            procedural.create_unit_square_uniform_tri_mesh_2d,
            quad.total_order.triangle(0),
            quad.total_order.triangle(6),
            [1, 2, 4, 8, 16, 32],
            5,
        ),
        (
            "poisson2d_mms_tri6",
            lambda r: convert.convert_mesh(
                procedural.create_unit_square_uniform_tri_mesh_2d(r), "tri6"
            ),
            quad.total_order.triangle(2),
            quad.total_order.triangle(6),
            [1, 2, 4, 8, 16, 32],
            5,
        ),
    ],
)
def test_poisson_2d_mms(name, mesh_producer, rule, error_rule, resolutions, keep):
    summary = run_mms(
        load_reference(name)["element_name"],
        _trunc(resolutions, keep),
        mesh_producer,
        rule,
        error_rule,
        dim=2,
    )
    assert_close_to_reference(summary, load_reference(name))


@pytest.mark.parametrize(
    "name,mesh_producer,rule,error_rule,resolutions,keep",
    [
        (
            "poisson3d_mms_hex8",
            procedural.create_unit_box_uniform_hex_mesh_3d,
            quad.hexahedron_gauss(2),
            quad.hexahedron_gauss(6),
            [1, 2, 4, 8, 16, 32],
            4,
        ),
        (
            "poisson3d_mms_hex20",
            lambda r: convert.convert_mesh(
                procedural.create_unit_box_uniform_hex_mesh_3d(r), "hex20"
            ),
            quad.hexahedron_gauss(4),
            quad.hexahedron_gauss(6),
            [1, 2, 4, 8, 16],
            4,
        ),
        (
            "poisson3d_mms_hex27",
            lambda r: convert.convert_mesh(
                procedural.create_unit_box_uniform_hex_mesh_3d(r), "hex27"
            ),
            quad.hexahedron_gauss(4),
            quad.hexahedron_gauss(6),
            [1, 2, 4, 8, 16],
            4,
        ),
        (
            "poisson3d_mms_tet4",
            procedural.create_unit_box_uniform_tet_mesh_3d,
            quad.total_order.tetrahedron(0),
            quad.total_order.tetrahedron(6),
            [1, 2, 4, 8, 16],
            4,
        ),
        (
            "poisson3d_mms_tet10",
            lambda r: convert.convert_mesh(
                procedural.create_unit_box_uniform_tet_mesh_3d(r), "tet10"
            ),
            quad.total_order.tetrahedron(2),
            quad.total_order.tetrahedron(6),
            [1, 2, 4, 8, 12],
            4,
        ),
        (
            "poisson3d_mms_tet20",
            lambda r: convert.convert_mesh(
                procedural.create_unit_box_uniform_tet_mesh_3d(r), "tet20"
            ),
            quad.total_order.tetrahedron(4),
            quad.total_order.tetrahedron(6),
            [1, 2, 4, 6, 8, 12],
            4,
        ),
    ],
)
def test_poisson_3d_mms(name, mesh_producer, rule, error_rule, resolutions, keep):
    summary = run_mms(
        load_reference(name)["element_name"],
        _trunc(resolutions, keep),
        mesh_producer,
        rule,
        error_rule,
        dim=3,
    )
    assert_close_to_reference(summary, load_reference(name))
