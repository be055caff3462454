"""Element correctness property tests.

Mirrors the reference's proptest strategy (tests/unit_tests/element/*):
Lagrange delta property, partition of unity, gradient-sum-zero, gradients
vs finite differences of the basis, and jax-traceable evaluation parity
with host tabulation.
"""

import numpy as np
import pytest

from fenris_tpu.reference_elements import ELEMENTS

ALL_ELEMENTS = sorted(ELEMENTS)


def random_ref_points(el, rng, n=64):
    """Random points in the reference domain (box sampling; simplex filter)."""
    pts = rng.uniform(-1.0, 1.0, size=(4 * n, el.ref_dim))
    if el.domain in ("tri", "tet"):
        pts = pts[pts.sum(axis=1) <= 2.0 - el.ref_dim]
    return pts[:n]


@pytest.mark.parametrize("name", ALL_ELEMENTS)
def test_lagrange_property(name):
    el = ELEMENTS[name]
    phi, _ = el.tabulate(el.nodes)
    assert np.abs(phi - np.eye(el.num_nodes)).max() < 1e-13


@pytest.mark.parametrize("name", ALL_ELEMENTS)
def test_partition_of_unity(name, rng):
    el = ELEMENTS[name]
    pts = random_ref_points(el, rng)
    phi, dphi = el.tabulate(pts)
    assert np.abs(phi.sum(axis=1) - 1.0).max() < 1e-12
    assert np.abs(dphi.sum(axis=1)).max() < 1e-12


@pytest.mark.parametrize("name", ALL_ELEMENTS)
def test_gradients_match_finite_differences(name, rng):
    el = ELEMENTS[name]
    pts = random_ref_points(el, rng, n=16)
    h = 1e-6
    _, dphi = el.tabulate(pts)
    for d in range(el.ref_dim):
        e = np.zeros(el.ref_dim)
        e[d] = h
        pp, _ = el.tabulate(pts + e)
        pm, _ = el.tabulate(pts - e)
        fd = (pp - pm) / (2 * h)
        assert np.abs(fd - dphi[:, :, d]).max() < 1e-7


@pytest.mark.parametrize("name", ALL_ELEMENTS)
def test_jax_evaluation_matches_tabulation(name, rng):
    import jax.numpy as jnp

    el = ELEMENTS[name]
    pts = random_ref_points(el, rng, n=8)
    phi_np, dphi_np = el.tabulate(pts)
    phi_j = np.asarray(el.phi(jnp.asarray(pts)))
    dphi_j = np.asarray(el.dphi(jnp.asarray(pts)))
    assert np.abs(phi_np - phi_j).max() < 1e-12
    assert np.abs(dphi_np - dphi_j).max() < 1e-12


@pytest.mark.parametrize("name", ALL_ELEMENTS)
def test_geometry_element_is_corner_restriction(name):
    el = ELEMENTS[name]
    geo = el.geometry
    assert geo.num_nodes >= geo.num_vertices
    # geometry nodes must be the element's leading corner vertices
    assert np.allclose(el.nodes[: geo.num_nodes], geo.nodes)


@pytest.mark.parametrize("name", [n for n in ALL_ELEMENTS if ELEMENTS[n].ref_dim >= 2])
def test_face_nodes_lie_on_faces(name):
    el = ELEMENTS[name]
    fel = el.face_element()
    for fn in el.face_nodes():
        if fel is not None:
            assert len(fn) == fel.num_nodes
        # Corner nodes of the face must be corner vertices of the element
        nv = fel.num_vertices if fel is not None else len(fn)
        assert all(i < el.num_vertices for i in fn[:nv])


def test_degrees_and_counts():
    expect = {
        "seg2": 2, "seg3": 3, "tri3": 3, "tri6": 6, "quad4": 4, "quad8": 8,
        "quad9": 9, "tet4": 4, "tet10": 10, "tet20": 20, "hex8": 8,
        "hex20": 20, "hex27": 27,
    }
    for name, n in expect.items():
        assert ELEMENTS[name].num_nodes == n
