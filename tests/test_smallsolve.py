"""Unrolled small-SPD solvers == LAPACK reference (ops/smallsolve.py).

These replace XLA's batched LU/inv in the PSF/linPSF/ECC normal-equation
steps (models/psf_fit.py, models/linpsf.py, ops/registration.py), where
batched tiny solves were measured ~27x slower on TPU.
"""

import numpy as np
import pytest

from photometry_tpu.ops.smallsolve import (chol_small, cho_solve_small,
                                           solve_spd_small,
                                           spd_inverse_diag_small)


def _spd_batch(B, K, seed=0, cond_scale=1.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(B, K, K)).astype(np.float32)
    A = np.einsum("bij,bkj->bik", A, A) + cond_scale * K * np.eye(K, dtype=np.float32)
    return A


@pytest.mark.parametrize("K", [2, 5, 15])
def test_chol_matches_numpy(K):
    A = _spd_batch(64, K)
    L = np.asarray(chol_small(A))
    want = np.linalg.cholesky(A.astype(np.float64))
    np.testing.assert_allclose(L, want, rtol=2e-4, atol=1e-4)


@pytest.mark.parametrize("K", [3, 15])
def test_solve_matches_numpy(K):
    A = _spd_batch(128, K, seed=1)
    rng = np.random.default_rng(2)
    b = rng.normal(size=(128, K)).astype(np.float32)
    got = np.asarray(solve_spd_small(A, b))
    want = np.linalg.solve(A.astype(np.float64), b[..., None])[..., 0]
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_solve_matrix_rhs():
    A = _spd_batch(16, 6, seed=3)
    rng = np.random.default_rng(4)
    B = rng.normal(size=(16, 6, 4)).astype(np.float32)
    got = np.asarray(cho_solve_small(chol_small(A), B))
    want = np.linalg.solve(A.astype(np.float64), B)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=5e-4)


def test_inverse_diag_matches_numpy():
    A = _spd_batch(64, 15, seed=5)
    got = np.asarray(spd_inverse_diag_small(A))
    want = np.diagonal(np.linalg.inv(A.astype(np.float64)), axis1=-2, axis2=-1)
    np.testing.assert_allclose(got, want, rtol=5e-3, atol=1e-6)


def test_singular_dummy_columns_stay_finite():
    """Zeroed parameter columns (frozen dummy stars in the LM fit) must not
    produce NaNs once ridged — the exact pattern psf_fit uses."""
    A = _spd_batch(8, 9, seed=6)
    A[:, 6:, :] = 0.0
    A[:, :, 6:] = 0.0
    ridge = 1e-6 * np.eye(9, dtype=np.float32)
    d = np.asarray(spd_inverse_diag_small(A + ridge))
    assert np.all(np.isfinite(d[:, :6]))
