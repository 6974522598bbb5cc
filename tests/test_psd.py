"""Unit tests for PSD sqrt / ridge-leverage primitives."""

import jax.numpy as jnp
import numpy as np
import pytest

from modegpt_tpu.ops.psd import (
    cholesky_solve_ridged,
    ridge_inverse_diag,
    sqrt_and_inv_sqrt_psd,
    sqrt_psd,
)


def test_sqrt_psd_squares_back(make_psd):
    M = make_psd(32)
    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=0.0))
    np.testing.assert_allclose(S @ S, M, rtol=1e-8, atol=1e-10)


def test_sqrt_psd_ridge_shifts_eigenvalues(make_psd):
    M = make_psd(16)
    ridge = 0.5
    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=ridge))
    w_m = np.linalg.eigvalsh(M)
    w_s = np.linalg.eigvalsh(S @ S)
    np.testing.assert_allclose(np.sort(w_s), np.sort(w_m + ridge), rtol=1e-8, atol=1e-9)


def test_sqrt_psd_scaled_ridge(make_psd):
    M = make_psd(16)
    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=1e-2, scaled=True))
    w_m = np.linalg.eigvalsh(M)
    w_s = np.linalg.eigvalsh(S @ S)
    np.testing.assert_allclose(np.sort(w_s), np.sort(w_m + 1e-2 * w_m.max()), rtol=1e-8)


def test_inv_sqrt_is_inverse_of_sqrt(make_psd):
    M = make_psd(24)
    S, Si = sqrt_and_inv_sqrt_psd(jnp.asarray(M), ridge=1e-6)
    prod = np.asarray(S) @ np.asarray(Si)
    np.testing.assert_allclose(prod, np.eye(24), rtol=1e-6, atol=1e-8)


def test_ridge_inverse_diag_matches_dense_inverse(make_psd):
    C = make_psd(40)
    lam = 1e-2
    got = np.asarray(ridge_inverse_diag(jnp.asarray(C), lam))
    want = np.diag(np.linalg.inv(C + lam * np.eye(40)))
    np.testing.assert_allclose(got, want, rtol=1e-8, atol=1e-12)


def test_cholesky_solve_ridged(make_psd, rng):
    A = make_psd(20)
    B = rng.standard_normal((20, 7))
    X = np.asarray(cholesky_solve_ridged(jnp.asarray(A), jnp.asarray(B), ridge=1e-6))
    want = np.linalg.solve(A + 1e-6 * np.eye(20), B)
    np.testing.assert_allclose(X, want, rtol=1e-7, atol=1e-10)


def test_torch_parity_sqrt(make_psd):
    """Golden parity: same math as the reference's sqrt_M, written in torch."""
    torch = pytest.importorskip("torch")
    M = make_psd(48)
    ridge = 1e-4

    # Reference formula (src/compression_utils.py:21-48): eigh, += ridge,
    # clamped sqrt, reassemble.
    w, V = torch.linalg.eigh(torch.tensor(M, dtype=torch.float64))
    w = w + ridge
    S_ref = (V @ torch.diag(torch.sqrt(w.clamp(min=0))) @ V.T).numpy()

    S = np.asarray(sqrt_psd(jnp.asarray(M), ridge=ridge))
    np.testing.assert_allclose(S, S_ref, rtol=1e-9, atol=1e-10)
