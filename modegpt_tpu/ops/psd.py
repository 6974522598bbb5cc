"""PSD matrix square roots and ridge-leverage utilities.

TPU-native equivalents of the reference's shared linear algebra
(reference: src/compression_utils.py:15-55 `sqrt_M`,
src/compression/compress_mlp.py:13-25 `get_ridge_scores`).

All functions are pure, jittable and `vmap`-batchable over leading axes
(the solvers vmap them over attention heads and shard_map them over
layers). Eigendecompositions use `jnp.linalg.eigh`; on TPU these lower to
XLA's batched Jacobi eigensolver, on CPU to LAPACK (used by the f64
parity path).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

__all__ = ["sqrt_psd", "sqrt_and_inv_sqrt_psd", "ridge_inverse_diag"]


def _ridged_eigh(M: jax.Array, ridge: float, scaled: bool):
    """eigh with additive ridge on the eigenvalues.

    Mirrors the reference's regularisation: eigenvalues get
    ``ridge * max_eig`` added when ``scaled`` else ``ridge``
    (reference: src/compression_utils.py:35-36).
    """
    w, V = jnp.linalg.eigh(M)
    scale = w[-1] if scaled else jnp.asarray(1.0, dtype=w.dtype)
    w = w + jnp.asarray(ridge, dtype=w.dtype) * scale
    return w, V


def psd_diagnostics(M: jax.Array, ridge: float = 1e-4, scaled: bool = False) -> dict:
    """Eigenvalue-range / condition-number diagnostics for a PSD matrix.

    Host-side equivalent of the reference's pre/post-regularisation
    condition prints and non-PSD warnings inside sqrt_M
    (reference: src/compression_utils.py:28-45) — exposed as data so the
    pipeline can log it under --debug instead of printing inline.
    """
    w = jnp.linalg.eigvalsh(M)
    w_max, w_min, w_mean = w[-1], w[0], jnp.mean(w)
    scale = w_max if scaled else jnp.asarray(1.0, w.dtype)
    w_reg_min = w_min + ridge * scale
    out = {
        "max_eig": float(w_max),
        "min_eig": float(w_min),
        "mean_eig": float(w_mean),
        "cond_pre": float(w_max / (w_min + 1e-9)),
        "cond_post": float((w_max + ridge * scale) / (w_reg_min + 1e-9)),
        "is_psd": bool(w_min >= -1e-9 * max(float(w_max), 1.0)),
    }
    return out


@partial(jax.jit, static_argnames=("scaled",))
def sqrt_psd(M: jax.Array, ridge: float = 1e-4, scaled: bool = False) -> jax.Array:
    """PSD square root with eigenvalue ridge.

    ``sqrt_psd(M) @ sqrt_psd(M) ≈ M + ridge*I`` for PSD ``M``.
    Negative post-ridge eigenvalues are clamped to zero, as in the
    reference (src/compression_utils.py:47).
    """
    w, V = _ridged_eigh(M, ridge, scaled)
    sw = jnp.sqrt(jnp.clip(w, 0.0))
    return (V * sw) @ V.T


@partial(jax.jit, static_argnames=("scaled",))
def sqrt_and_inv_sqrt_psd(
    M: jax.Array, ridge: float = 1e-4, scaled: bool = False
) -> Tuple[jax.Array, jax.Array]:
    """Simultaneous PSD square root and inverse square root.

    The reference computes the inverse either from the same eigensystem
    (src/compression_utils.py:50-55) or as ``inv(sqrt_M)``
    (src/compression/compress_vo.py:45); post-ridge the two coincide for
    PSD inputs since all eigenvalues are >= ridge > 0.
    """
    w, V = _ridged_eigh(M, ridge, scaled)
    sw = jnp.sqrt(jnp.clip(w, 0.0))
    isw = 1.0 / jnp.clip(sw, 1e-12)
    return (V * sw) @ V.T, (V * isw) @ V.T


@jax.jit
def ridge_inverse_diag(C: jax.Array, ridge: float = 1e-2) -> jax.Array:
    """diag((C + ridge*I)^-1) via Cholesky — the Type-I ridge leverage score.

    Columns with the *smallest* inverse-diagonal entries are the most
    informative and are kept (reference:
    src/compression/compress_mlp.py:13-25,45).
    """
    n = C.shape[0]
    eye = jnp.eye(n, dtype=C.dtype)
    C_ridge = C + jnp.asarray(ridge, dtype=C.dtype) * eye
    L = jnp.linalg.cholesky(C_ridge)
    # diag(A^-1) = sum_k (L^-T)_{ik}^2 ; solve L X = I then sum columns of X^2.
    Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
    return jnp.sum(Linv * Linv, axis=0)


def cholesky_solve_ridged(A: jax.Array, B: jax.Array, ridge: float = 1e-6) -> jax.Array:
    """Solve ``(A + ridge*I) X = B`` for PSD ``A`` via Cholesky.

    Used by the Nyström down-projection re-solve
    (reference: src/compression/compress_mlp.py:56-57).
    """
    n = A.shape[0]
    A_ridge = A + jnp.asarray(ridge, dtype=A.dtype) * jnp.eye(n, dtype=A.dtype)
    L = jnp.linalg.cholesky(A_ridge)
    y = jax.scipy.linalg.solve_triangular(L, B, lower=True)
    return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)
