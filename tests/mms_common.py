"""Shared MMS convergence harness (mirrors poisson_mms_common.rs)."""

import json
import os
from pathlib import Path

import jax.numpy as jnp
import numpy as np

from fenris_tpu import quadrature as quad
from fenris_tpu.fem import solve_poisson
from fenris_tpu.mesh import convert, procedural

REFERENCE_DIR = Path(__file__).parent / "reference_values"

PI = np.pi


def u_exact_2d(x):
    return jnp.sin(PI * x[0]) * jnp.sin(PI * x[1])


def u_exact_grad_2d(x):
    return jnp.array(
        [
            PI * jnp.cos(PI * x[0]) * jnp.sin(PI * x[1]),
            PI * jnp.sin(PI * x[0]) * jnp.cos(PI * x[1]),
        ]
    )


def source_2d(x, p):
    return 2.0 * PI * PI * u_exact_2d(x)


def u_exact_3d(x):
    return jnp.sin(PI * x[0]) * jnp.sin(PI * x[1]) * jnp.sin(PI * x[2])


def u_exact_grad_3d(x):
    s = jnp.sin(PI * x)
    c = jnp.cos(PI * x)
    return PI * jnp.array([c[0] * s[1] * s[2], s[0] * c[1] * s[2], s[0] * s[1] * c[2]])


def source_3d(x, p):
    return 3.0 * PI * PI * u_exact_3d(x)


def dirichlet_nodes(mesh):
    """Nodes with ||x - 0.5||_inf > 0.4999 (poisson_mms_common.rs:122-135)."""
    return np.flatnonzero(np.abs(mesh.points - 0.5).max(axis=1) > 0.4999)


def run_mms(element_name, resolutions, mesh_producer, rule, error_rule, dim):
    if dim == 2:
        src, ue, ug = source_2d, u_exact_2d, u_exact_grad_2d
    else:
        src, ue, ug = source_3d, u_exact_3d, u_exact_grad_3d
    summary = {
        "element_name": element_name,
        "L2_errors": [],
        "H1_seminorm_errors": [],
        "resolutions": [],
    }
    for res in resolutions:
        mesh = mesh_producer(res)
        result = solve_poisson(
            mesh, rule, error_rule, src, ue, ug, dirichlet_nodes(mesh)
        )
        summary["resolutions"].append(float(mesh.diameters().max()))
        summary["L2_errors"].append(result.l2_error)
        summary["H1_seminorm_errors"].append(result.h1_seminorm_error)
    # Committed-evidence hook: FENRIS_TPU_CONVERGENCE_ARTIFACTS=<dir> dumps
    # each run's summary (the reference persists them the same way,
    # poisson_mms_common.rs:296-299) so a full-resolution pass is checkable
    # without a rerun.
    art_dir = os.environ.get("FENRIS_TPU_CONVERGENCE_ARTIFACTS")
    if art_dir:
        Path(art_dir).mkdir(parents=True, exist_ok=True)
        name = summary["element_name"]
        dim = "2d" if dim == 2 else "3d"
        with open(Path(art_dir) / f"poisson{dim}_mms_{name}_summary.json", "w") as f:
            json.dump(summary, f, indent=1)
    return summary


def assert_close_to_reference(summary, reference, tol=0.01):
    """1% relative tolerance, matching poisson_mms_common.rs:40-65."""
    assert summary["element_name"] == reference["element_name"]
    ref_res = reference["resolutions"][: len(summary["resolutions"])]
    assert np.allclose(summary["resolutions"], ref_res, rtol=1e-12)
    for key in ("L2_errors", "H1_seminorm_errors"):
        for ours, ref in zip(summary[key], reference[key]):
            rel = abs(ours - ref) / abs(ref)
            assert rel <= tol, (
                f"{summary['element_name']} {key}: {ours} vs reference {ref} "
                f"(rel err {rel:.4f})"
            )


def load_reference(name):
    with open(REFERENCE_DIR / f"{name}_summary.json") as f:
        return json.load(f)
