"""Quadrature tables as the spatially-varying-data mechanism.

Parity: src/assembly/local/quadrature_table.rs (Uniform :213 / General :57 /
Compact :312) consumed by the elliptic/mass/source assemblers — per-element
and per-quadrature-point payloads must flow into assembly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu import quadrature as quad
from fenris_tpu.assembly import local as L
from fenris_tpu.assembly.quadrature_table import (
    GeneralQuadratureTable,
    UniformQuadratureTable,
    compact_quadrature_table,
)
from fenris_tpu.mesh import procedural
from fenris_tpu.operators import LaplaceOperator
from fenris_tpu.solid import LameParameters, MaterialEllipticOperator, NeoHookeanMaterial


@pytest.fixture
def hex_setup(rng):
    mesh = procedural.create_unit_box_uniform_hex_mesh_3d(3)
    X = jnp.asarray(mesh.cell_points())
    return mesh, X


def test_uniform_table_per_point_density_mass(hex_setup, rng):
    """[E, q] density payload reaches every quadrature point (mass.rs:20)."""
    mesh, X = hex_setup
    rule = quad.hexahedron_gauss(2)
    rho = jnp.asarray(1.0 + rng.random((mesh.num_cells, len(rule.weights))))
    table = UniformQuadratureTable.from_rule(mesh.element, rule, data=rho)
    M_table = table.assemble_mass_matrices(X, solution_dim=1)
    M_direct = L.assemble_element_mass_matrices(X, rho, 1, table.tab)
    np.testing.assert_allclose(np.asarray(M_table), np.asarray(M_direct), rtol=1e-14)
    # and the density actually matters
    M_unit = table.tab and L.assemble_element_mass_matrices(X, 1.0, 1, table.tab)
    assert np.abs(np.asarray(M_table) - np.asarray(M_unit)).max() > 1e-6


def test_uniform_table_elliptic_with_per_element_params(hex_setup, rng):
    """Per-element material parameters through the table data payload."""
    mesh, X = hex_setup
    rule = quad.hexahedron_gauss(2)
    mu_el = jnp.asarray(300.0 + 100.0 * rng.random(mesh.num_cells))
    params = LameParameters(mu=mu_el, lam=577.0)
    op = MaterialEllipticOperator(NeoHookeanMaterial(), dim=3)
    table = UniformQuadratureTable.from_rule(mesh.element, rule, data=params)
    u_el = jnp.asarray(rng.standard_normal((mesh.num_cells, 8, 3)) * 0.01)
    A_table = table.assemble_elliptic_matrices(X, u_el, op)
    A_direct = L.assemble_element_elliptic_matrices(X, u_el, op, params, table.tab)
    np.testing.assert_allclose(np.asarray(A_table), np.asarray(A_direct), rtol=1e-14)
    f_table = table.assemble_elliptic_vectors(X, u_el, op)
    f_direct = L.assemble_element_elliptic_vectors(X, u_el, op, params, table.tab)
    np.testing.assert_allclose(np.asarray(f_table), np.asarray(f_direct), rtol=1e-14)


def test_general_table_mixed_rules(hex_setup, rng):
    """Two element groups with different-strength rules assemble per group
    and scatter back in element order (quadrature_table.rs:57)."""
    mesh, X = hex_setup
    E = mesh.num_cells
    rules = [quad.hexahedron_gauss(1), quad.hexahedron_gauss(3)]
    ids = (np.arange(E) % 2).astype(np.int64)
    table = GeneralQuadratureTable.from_rules(mesh.element, rules, ids)
    assert table.num_elements() == E
    op = LaplaceOperator()
    u_el = jnp.asarray(rng.standard_normal((E, 8, 1)))
    A = np.asarray(table.assemble_elliptic_matrices(X, u_el, op))
    # oracle: each element assembled with its own rule
    for rid, rule in enumerate(rules):
        idx = np.flatnonzero(ids == rid)
        tab = L.tabulate(mesh.element, rule)
        A_ref = np.asarray(
            L.assemble_element_elliptic_matrices(X[idx], u_el[idx], op, None, tab)
        )
        np.testing.assert_allclose(A[idx], A_ref, rtol=1e-13, atol=1e-14)


def test_general_table_per_group_data(hex_setup, rng):
    mesh, X = hex_setup
    E = mesh.num_cells
    rule = quad.hexahedron_gauss(2)
    ids = (np.arange(E) >= E // 2).astype(np.int64)
    # per-group per-element densities with matching group sizes
    n0 = int((ids == 0).sum())
    n1 = E - n0
    rho0 = jnp.asarray(1.0 + rng.random(n0))
    rho1 = jnp.asarray(2.0 + rng.random(n1))
    table = GeneralQuadratureTable.from_rules(
        mesh.element, [rule, rule], ids, data_per_rule=[rho0, rho1]
    )
    M = np.asarray(table.assemble_mass_matrices(X, solution_dim=1))
    tab = L.tabulate(mesh.element, rule)
    M0 = np.asarray(
        L.assemble_element_mass_matrices(X[np.flatnonzero(ids == 0)], rho0[:, None] * jnp.ones((1, len(rule.weights))), 1, tab)
    )
    np.testing.assert_allclose(M[: n0], M0, rtol=1e-13)


def test_compact_table_dedups_rules(hex_setup, rng):
    """CompactQuadratureTable: identical rules share one group
    (quadrature_table.rs:312)."""
    mesh, X = hex_setup
    E = mesh.num_cells
    r1 = quad.hexahedron_gauss(2)
    r2 = quad.hexahedron_gauss(3)
    per_element = [r1 if e % 3 else r2 for e in range(E)]
    table = compact_quadrature_table(mesh.element, per_element)
    assert len(table.groups) == 2  # dedup worked
    assert table.num_elements() == E
    op = LaplaceOperator()
    u_el = jnp.asarray(rng.standard_normal((E, 8, 1)))
    A = np.asarray(table.assemble_elliptic_matrices(X, u_el, op))
    for e in (0, 1, 5):
        tab = L.tabulate(mesh.element, per_element[e])
        A_ref = np.asarray(
            L.assemble_element_elliptic_matrices(
                X[e : e + 1], u_el[e : e + 1], op, None, tab
            )
        )[0]
        np.testing.assert_allclose(A[e], A_ref, rtol=1e-13, atol=1e-14)


def test_uniform_table_source_vectors(hex_setup):
    mesh, X = hex_setup
    rule = quad.hexahedron_gauss(2)
    table = UniformQuadratureTable.from_rule(mesh.element, rule)
    src = lambda x, p: jnp.array([x[0] + 1.0])
    b = table.assemble_source_vectors(X, src, solution_dim=1)
    b_ref = L.assemble_element_source_vectors(X, src, None, 1, table.tab)
    np.testing.assert_allclose(np.asarray(b), np.asarray(b_ref), rtol=1e-14)
