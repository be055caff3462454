"""Utility decomposition tests (cf. src/util.rs tests)."""

import jax.numpy as jnp
import numpy as np
import pytest

from fenris_tpu.utils import (
    apd,
    condition_number_sym,
    extremal_eigenvalues,
    polar_decomposition,
    rotation_svd,
    save_matrix_market,
)


def random_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_rotation_svd_properties(rng):
    M = jnp.asarray(rng.standard_normal((8, 3, 3)))
    U, s, V = rotation_svd(M)
    assert np.allclose(np.linalg.det(np.asarray(U)), 1.0)
    assert np.allclose(np.linalg.det(np.asarray(V)), 1.0)
    recon = np.asarray(U) @ (np.asarray(s)[..., :, None] * np.swapaxes(np.asarray(V), -1, -2))
    assert np.abs(recon - np.asarray(M)).max() < 1e-10


def test_polar_decomposition(rng):
    F = jnp.asarray(rng.standard_normal((5, 3, 3)) * 0.3 + np.eye(3))
    R, S = polar_decomposition(F)
    Rn, Sn = np.asarray(R), np.asarray(S)
    assert np.allclose(np.linalg.det(Rn), 1.0)
    assert np.abs(Rn @ Sn - np.asarray(F)).max() < 1e-10
    assert np.abs(Sn - np.swapaxes(Sn, -1, -2)).max() < 1e-10


def test_apd_recovers_rotation(rng):
    R_true = np.stack([random_rotation(rng) for _ in range(6)])
    # F = R * S with S SPD near identity
    S = np.eye(3) + 0.2 * np.stack(
        [(lambda a: (a + a.T) / 2)(rng.standard_normal((3, 3))) for _ in range(6)]
    )
    F = jnp.asarray(R_true @ S)
    R = np.asarray(apd(F))
    R_svd, _ = polar_decomposition(F)
    assert np.abs(R - np.asarray(R_svd)).max() < 1e-5


def test_eigen_helpers(rng):
    A = rng.standard_normal((4, 4))
    A = A @ A.T + 4 * np.eye(4)
    lo, hi = extremal_eigenvalues(jnp.asarray(A))
    ev = np.linalg.eigvalsh(A)
    assert abs(float(lo) - ev[0]) < 1e-10 and abs(float(hi) - ev[-1]) < 1e-10
    assert abs(float(condition_number_sym(jnp.asarray(A))) - ev[-1] / ev[0]) < 1e-10


def test_matrix_market_roundtrip(tmp_path, rng):
    m = rng.standard_normal((4, 5)) * (rng.uniform(size=(4, 5)) < 0.5)
    path = tmp_path / "m.mtx"
    save_matrix_market(path, m)
    lines = path.read_text().splitlines()
    assert lines[0].startswith("%%MatrixMarket")
    nr, nc, nnz = (int(v) for v in lines[1].split())
    assert (nr, nc) == (4, 5) and nnz == np.count_nonzero(m)
    recon = np.zeros((4, 5))
    for line in lines[2:]:
        r, c, v = line.split()
        recon[int(r) - 1, int(c) - 1] = float(v)
    assert np.abs(recon - m).max() < 1e-15
