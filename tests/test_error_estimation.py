"""Error estimation vs fine-mesh reference solutions.

Mirrors tests/convergence_tests/error_estimation.rs: estimate L²/H¹ errors
of coarse Tri3 interpolants of sin(πx)sin(πy) against (a) the analytic
solution and (b) fine-mesh FE interpolants evaluated through the spatial
index, asserting 1% agreement with the reference's committed values.

By default runs a subset of the (coarse, fine) sample grid; set
FENRIS_TPU_FULL_CONVERGENCE=1 for the full 56-sample suite.
"""

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu import quadrature as quad
from fenris_tpu.assembly import local as L
from fenris_tpu.error import (
    estimate_H1_seminorm_error_batched,
    estimate_L2_error_batched,
)
from fenris_tpu.mesh import procedural
from fenris_tpu.space import GridIndex, interpolate_at_points, interpolate_gradient_at_points

FULL = os.environ.get("FENRIS_TPU_FULL_CONVERGENCE", "0") not in ("0", "")
PI = np.pi


def u_fn(pts):
    return np.sin(PI * pts[:, 0]) * np.sin(PI * pts[:, 1])


def grad_fn(pts):
    return np.stack(
        [
            PI * np.cos(PI * pts[:, 0]) * np.sin(PI * pts[:, 1]),
            PI * np.sin(PI * pts[:, 0]) * np.cos(PI * pts[:, 1]),
        ],
        axis=-1,
    )


def load_reference():
    path = Path(__file__).parent / "reference_values" / "error_estimation_tri3_summary.json"
    return json.load(open(path))


def _coarse_fields(coarse_res, rule_strength=20):
    mesh = procedural.create_unit_square_uniform_tri_mesh_2d(coarse_res)
    tab = L.tabulate(mesh.element, quad.total_order.triangle(rule_strength))
    X = jnp.asarray(mesh.cell_points())
    u = jnp.asarray(u_fn(mesh.points))
    u_el = u[jnp.asarray(mesh.cells)][:, :, None]
    return mesh, tab, X, u_el


def test_error_estimation_analytic_samples():
    ref = load_reference()
    samples = [s for s in ref["samples"] if s["fine_res"] == 0]
    coarse_list = [s["coarse_res"] for s in samples] if FULL else [1, 2, 4, 16]
    for s in samples:
        if s["coarse_res"] not in coarse_list:
            continue
        mesh, tab, X, u_el = _coarse_fields(s["coarse_res"])
        l2 = float(
            estimate_L2_error_batched(X, u_el, lambda p: np.asarray(u_fn(np.asarray(p)))[:, None], tab)
        )
        h1 = float(
            estimate_H1_seminorm_error_batched(
                X, u_el, lambda p: np.asarray(grad_fn(np.asarray(p)))[:, :, None], tab
            )
        )
        assert abs(l2 - s["L2_error"]) / s["L2_error"] <= 0.01, (s, l2)
        assert abs(h1 - s["H1_semi_error"]) / s["H1_semi_error"] <= 0.01, (s, h1)


def test_error_estimation_vs_fine_mesh_interpolant():
    ref = load_reference()
    pairs = (
        [(s["coarse_res"], s["fine_res"]) for s in ref["samples"] if s["fine_res"] > 0]
        if FULL
        else [(1, 64), (4, 64), (16, 64), (2, 128), (8, 131)]
    )
    by_key = {(s["coarse_res"], s["fine_res"]): s for s in ref["samples"]}
    fine_cache = {}
    for coarse_res, fine_res in pairs:
        if fine_res not in fine_cache:
            fmesh = procedural.create_unit_square_uniform_tri_mesh_2d(fine_res)
            findex = GridIndex.build(fmesh)
            fu = jnp.asarray(u_fn(fmesh.points))
            fine_cache[fine_res] = (fmesh, findex, fu)
        fmesh, findex, fu = fine_cache[fine_res]

        def u_fine(pts):
            vals, _ = interpolate_at_points(fmesh, fu, jnp.asarray(pts), index=findex)
            return vals

        def grad_fine(pts):
            g, _ = interpolate_gradient_at_points(
                fmesh, fu, jnp.asarray(pts), index=findex
            )
            return g

        mesh, tab, X, u_el = _coarse_fields(coarse_res)
        l2 = float(estimate_L2_error_batched(X, u_el, u_fine, tab))
        h1 = float(estimate_H1_seminorm_error_batched(X, u_el, grad_fine, tab))
        s = by_key[(coarse_res, fine_res)]
        assert abs(l2 - s["L2_error"]) / s["L2_error"] <= 0.01, (s, l2)
        assert abs(h1 - s["H1_semi_error"]) / s["H1_semi_error"] <= 0.01, (s, h1)


def test_grid_index_agrees_with_brute_force(rng):
    from fenris_tpu.space import find_closest_element

    mesh = procedural.create_unit_square_uniform_tri_mesh_2d(8)
    index = GridIndex.build(mesh)
    pts = jnp.asarray(rng.uniform(0.01, 0.99, size=(64, 2)))
    res_bf = find_closest_element(mesh, pts, num_candidates=16)
    res_gi = find_closest_element(mesh, pts, index=index)
    assert np.array_equal(
        np.asarray(res_bf.element_indices), np.asarray(res_gi.element_indices)
    )
    assert np.abs(
        np.asarray(res_bf.reference_coords) - np.asarray(res_gi.reference_coords)
    ).max() < 1e-10
