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


# XLA's TPU triangular_solve keeps the shrinking remainder of the RHS
# live across its internal 128-column update steps — for an [n, n] solve
# that is ~n^3/64 bytes of simultaneously-live HBM (20 GB at n=11008,
# the 7B d_int). Solving the RHS in independent column blocks under a
# lax.scan bounds live memory to one block's working set and is EXACT
# (triangular solves are columnwise-independent).
_TRI_SOLVE_BLOCK = 1024

# Even one column block of the native solve keeps ~n^2 * 16 bytes of
# remainder temps live (the n/128 internal update steps again): 1.9 GB
# at n=11008 (fits, proven by the 7B captures) but 10.5 GB at n=25600 —
# the 32B-geometry d_int OOMs the 16 GB chip outright. Above this
# threshold the solves switch to explicit row-blocked substitution
# (`_tri_solve_lower_rowblocked`): per step, one [rb, n] panel of L and
# the [n, m] solution carry are live, nothing else. The row-block
# update is a dense matmul (2x the triangular FLOPs) but runs on the
# MXU at full tilt, unlike the native op's 128-column stepping.
# Thresholded so every geometry captured on the native path (<= 14336)
# keeps its proven program shape.
_TRI_NATIVE_MAX_N = 16384
_TRI_ROWBLOCK = 2048


def _tri_solve_lower_rowblocked(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``L X = B`` (lower-triangular L) by exact blocked forward
    substitution: X_i = L_ii^-1 (B_i - L[i, :] @ X_so_far).

    The panel matmul picks up only solved rows (unsolved rows of the
    carry are zero; L's upper triangle is zero), so the result is exact
    — the blocking changes memory behaviour, not math.
    """
    n, m = B.shape
    rb = _TRI_ROWBLOCK
    nb, rem = divmod(n, rb)
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    X = jnp.zeros((n, m), B.dtype)

    def body(X, i):
        r0, z = i * rb, jnp.int32(0)
        Li = jax.lax.dynamic_slice(L, (r0, z), (rb, n))
        Bi = jax.lax.dynamic_slice(B, (r0, z), (rb, m))
        Lii = jax.lax.dynamic_slice(Li, (z, r0), (rb, rb))
        Xi = jax.scipy.linalg.solve_triangular(Lii, Bi - dot(Li, X), lower=True)
        return jax.lax.dynamic_update_slice(X, Xi, (r0, z)), None

    if nb:
        X, _ = jax.lax.scan(body, X, jnp.arange(nb, dtype=jnp.int32))
    if rem:
        r0 = nb * rb
        Lr = L[r0:, :]
        Xr = jax.scipy.linalg.solve_triangular(
            L[r0:, r0:], B[r0:, :] - dot(Lr, X), lower=True
        )
        X = jax.lax.dynamic_update_slice(X, Xr, (r0, 0))
    return X


def _tri_solve_lowerT_rowblocked(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``L.T X = B`` by blocked BACK substitution, slicing column
    panels of ``L`` directly so the [n, n] transpose is never
    materialised. Row panel i of L.T is L[:, r0:r0+rb].T."""
    n, m = B.shape
    rb = _TRI_ROWBLOCK
    nb, rem = divmod(n, rb)
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    X = jnp.zeros((n, m), B.dtype)
    if rem:
        r0 = nb * rb
        Xr = jax.scipy.linalg.solve_triangular(
            L[r0:, r0:].T, B[r0:, :], lower=False
        )
        X = jax.lax.dynamic_update_slice(X, Xr, (r0, 0))

    def body(X, i):
        r0, z = i * rb, jnp.int32(0)
        Ui = jax.lax.dynamic_slice(L, (z, r0), (n, rb)).T  # [rb, n] panel of L.T
        Bi = jax.lax.dynamic_slice(B, (r0, z), (rb, m))
        Uii = jax.lax.dynamic_slice(Ui, (z, r0), (rb, rb))
        Xi = jax.scipy.linalg.solve_triangular(Uii, Bi - dot(Ui, X), lower=False)
        return jax.lax.dynamic_update_slice(X, Xi, (r0, z)), None

    if nb:
        X, _ = jax.lax.scan(body, X, jnp.arange(nb - 1, -1, -1, dtype=jnp.int32))
    return X


def _tri_solve_blocked(L: jax.Array, B: jax.Array, lower: bool) -> jax.Array:
    n, m = B.shape
    if lower and n > _TRI_NATIVE_MAX_N:
        return _tri_solve_lower_rowblocked(L, B)
    block = _TRI_SOLVE_BLOCK
    if m <= 2 * block:
        return jax.scipy.linalg.solve_triangular(L, B, lower=lower)
    pad = (-m) % block
    Bp = jnp.pad(B, ((0, 0), (0, pad)))
    nb = Bp.shape[1] // block
    blocks = jnp.moveaxis(Bp.reshape(n, nb, block), 1, 0)  # [nb, n, block]

    def body(_, rhs):
        return None, jax.scipy.linalg.solve_triangular(L, rhs, lower=lower)

    _, out = jax.lax.scan(body, None, blocks)
    return jnp.moveaxis(out, 0, 1).reshape(n, nb * block)[:, :m]


# XLA's native TPU Cholesky/triangular-solve step 128-wide internal
# panels whose small matmuls cannot fill the MXU — measured 3.65 s for
# the 7B-geometry [11008, 11008] f32 Type-I factorization, ~0.7% of the
# f32 matmul ceiling (bench_results/r04/profile_window.json; VERDICT r4
# weak-4). The recursive blocked forms below reorganise the SAME exact
# math (identical FLOP count, no approximation) so that ~all work lands
# in half-size HIGHEST-precision matmuls that the MXU tiles natively:
#
#   chol([[A11,  ·],[A21, A22]]):  L11 = chol(A11)       (recurse)
#                                  L21 = A21 L11^-T      (tri-solve)
#                                  L22 = chol(A22 - L21 L21^T)
#
# and the triangular solves recurse the same way (X1 = L11^-1 B1;
# X2 = L22^-1 (B2 - L21 X1)), bottoming out in native ops at
# _CHOL_LEAF. Rounding differs from the native op only in summation
# order; engagement is thresholded at _CHOL_RECURSIVE_MIN_N so every
# golden-parity geometry (tiny dims) keeps the native program, and
# capped at _TRI_NATIVE_MAX_N where the rowblocked substitution bounds
# live HBM instead (32B-geometry d_int).
_CHOL_LEAF = 1024
_CHOL_RECURSIVE_MIN_N = 4096


def _split_point(n: int) -> int:
    """Half split, rounded to the MXU's 128 lane grid when big enough to
    matter; always strictly inside (0, n) so recursion shrinks."""
    h = n // 2
    if h >= 256:
        h = (h + 127) // 128 * 128
    return min(max(h, 1), n - 1)


def _tri_solve_lower_recursive(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``L X = B`` (lower L) with the subtraction steps as
    half-size matmuls; exact blocked forward substitution."""
    n = L.shape[0]
    if n <= _CHOL_LEAF:
        return jax.scipy.linalg.solve_triangular(L, B, lower=True)
    n1 = _split_point(n)
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    X1 = _tri_solve_lower_recursive(L[:n1, :n1], B[:n1])
    X2 = _tri_solve_lower_recursive(
        L[n1:, n1:], B[n1:] - dot(L[n1:, :n1], X1)
    )
    return jnp.concatenate([X1, X2], axis=0)


def _tri_solve_lowerT_recursive(L: jax.Array, B: jax.Array) -> jax.Array:
    """Solve ``L.T X = B`` (back substitution) recursively; the upper
    factor's panels are sliced from ``L`` directly, no [n, n] transpose
    is materialised."""
    n = L.shape[0]
    if n <= _CHOL_LEAF:
        return jax.scipy.linalg.solve_triangular(L.T, B, lower=False)
    n1 = _split_point(n)
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    X2 = _tri_solve_lowerT_recursive(L[n1:, n1:], B[n1:])
    X1 = _tri_solve_lowerT_recursive(
        L[:n1, :n1], B[:n1] - dot(L[n1:, :n1].T, X2)
    )
    return jnp.concatenate([X1, X2], axis=0)


def _cholesky_recursive(A: jax.Array) -> jax.Array:
    """Blocked right-looking Cholesky with static half splits.

    Exact: same recurrence the native op implements, reorganised into
    MXU-sized matmuls. An indefinite ``A`` produces NaN on some leaf's
    diagonal exactly like the native op — the NaNs propagate through the
    panel solve and trailing update into every later block, so
    `_cholesky_escalated`'s NaN-on-diagonal retry detection is
    unchanged."""
    n = A.shape[0]
    if n <= _CHOL_LEAF:
        return jnp.linalg.cholesky(A)
    n1 = _split_point(n)
    dot = partial(jnp.matmul, precision=jax.lax.Precision.HIGHEST)
    L11 = _cholesky_recursive(A[:n1, :n1])
    # L21 = A21 L11^-T  <=>  L11 L21^T = A21^T
    L21 = _tri_solve_lower_recursive(L11, jnp.swapaxes(A[n1:, :n1], 0, 1)).T
    L22 = _cholesky_recursive(A[n1:, n1:] - dot(L21, L21.T))
    top = jnp.concatenate([L11, jnp.zeros((n1, n - n1), A.dtype)], axis=1)
    bot = jnp.concatenate([L21, L22], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def _use_recursive(n: int) -> bool:
    import os

    return (
        _CHOL_RECURSIVE_MIN_N < n <= _TRI_NATIVE_MAX_N
        and os.environ.get("MODEGPT_CHOL_RECURSIVE", "1") != "0"
    )


def _chol(A: jax.Array) -> jax.Array:
    """Size-dispatched Cholesky: native below the recursion threshold
    (golden-parity geometries), recursive blocked in the MXU-starved
    mid range, native again above _TRI_NATIVE_MAX_N (the lowmem
    geometries pair it with rowblocked substitution; recursion's
    concatenated temporaries would defeat their live-HBM bound).
    MODEGPT_CHOL_RECURSIVE=0 forces the native op everywhere — the
    escape hatch for memory-tight jobs where the recursion's extra
    [n, n] temporaries matter more than its MXU fill (read at trace
    time)."""
    n = A.shape[-1]
    if A.ndim == 2 and _use_recursive(n):
        return _cholesky_recursive(A)
    return jnp.linalg.cholesky(A)


def _cholesky_escalated(A: jax.Array, ridge) -> jax.Array:
    """Cholesky of ``A + r*I``, escalating ``r`` while pivots fail.

    The reference factorises these Grams in float64, where its absolute
    ridges (1e-6 .. 1e-2) sit far above rounding noise. The TPU-native
    f32 path can violate that: when the calibration token count is
    smaller than the kept rank (near-full-rank solves on few tokens;
    per-expert MoE Grams at top_k/E routing), ``A`` is singular by
    construction and an absolute 1e-6 ridge is BELOW f32's rounding
    floor (~eps * ||A||) — Cholesky then hits a negative pivot and the
    factors come out NaN. On failure (NaN on the factor diagonal), retry
    with the ridge raised to the factorisation's own rounding scale
    (8 * eps * trace(A) >= 8 * eps * lambda_max), then geometrically.
    The well-conditioned case runs the identical single factorisation,
    so factor-parity with the f64 oracle is unchanged there.

    Compile-cost note: the loop carries the first attempt too (k=0 uses
    the caller's ridge verbatim) so the program contains exactly ONE
    Cholesky lowering — a second instance outside the loop measurably
    blows up XLA's TPU compile of the batched solver programs.
    """
    n = A.shape[0]
    eye = jnp.eye(n, dtype=A.dtype)
    r0 = jnp.asarray(ridge, dtype=A.dtype)
    floor = 8 * jnp.finfo(A.dtype).eps * jnp.trace(A)

    def cond(state):
        L, r, k = state
        return ((k == 0) | jnp.any(jnp.isnan(jnp.diagonal(L)))) & (k < 9)

    def body(state):
        L, r, k = state
        r2 = jnp.where(k == 0, r, jnp.maximum(r * 32.0, floor))
        return _chol(A + r2 * eye), r2, k + 1

    # Under shard_map the loop body's L/r outputs are varying over the
    # mesh axes A is varying over; while_loop requires the initial carry
    # to match, so promote the constant initializers to A's vma set
    # (jax 0.9 "varying manual axes"). Outside shard_map vma is empty
    # and this is a no-op.
    L0 = jnp.full_like(A, jnp.nan)
    vma = frozenset(getattr(jax.typeof(A), "vma", ()))
    if vma:
        def promote(x):
            missing = vma - frozenset(getattr(jax.typeof(x), "vma", ()))
            return jax.lax.pvary(x, tuple(missing)) if missing else x

        L0, r0 = promote(L0), promote(r0)
    L, _, _ = jax.lax.while_loop(cond, body, (L0, r0, jnp.int32(0)))
    return L


@jax.jit
def ridge_inverse_diag(C: jax.Array, ridge: float = 1e-2) -> jax.Array:
    """diag((C + ridge*I)^-1) via Cholesky — the Type-I ridge leverage score.

    Columns with the *smallest* inverse-diagonal entries are the most
    informative and are kept (reference:
    src/compression/compress_mlp.py:13-25,45).

    diag(A^-1)_j = ||L^-1 e_j||^2; the identity RHS is solved in column
    blocks (see `_tri_solve_blocked`) so large d_int (7B: 11008) stays
    within one chip's HBM.
    """
    n = C.shape[0]
    eye = jnp.eye(n, dtype=C.dtype)
    L = _cholesky_escalated(C, ridge)
    block = _TRI_SOLVE_BLOCK
    if n <= 2 * block:
        Linv = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return jnp.sum(Linv * Linv, axis=0)

    nb = -(-n // block)
    rows = jax.lax.broadcasted_iota(jnp.int32, (n, block), 0)
    big = n > _TRI_NATIVE_MAX_N  # 32B-geometry d_int: see _TRI_NATIVE_MAX_N

    def body(_, b):
        cols = b * block + jax.lax.broadcasted_iota(jnp.int32, (n, block), 1)
        rhs = (rows == cols).astype(C.dtype)  # identity columns [b*B, (b+1)*B)
        if big:
            X = _tri_solve_lower_rowblocked(L, rhs)
        elif _use_recursive(n):
            # mid range: the subtraction steps as MXU matmuls (same
            # reorganisation as _cholesky_recursive; see its note)
            X = _tri_solve_lower_recursive(L, rhs)
        else:
            X = jax.scipy.linalg.solve_triangular(L, rhs, lower=True)
        return None, jnp.sum(X * X, axis=0)

    _, pieces = jax.lax.scan(body, None, jnp.arange(nb, dtype=jnp.int32))
    return pieces.reshape(-1)[:n]


def cholesky_solve_ridged(A: jax.Array, B: jax.Array, ridge: float = 1e-6) -> jax.Array:
    """Solve ``(A + ridge*I) X = B`` for PSD ``A`` via Cholesky.

    Used by the Nyström down-projection re-solve
    (reference: src/compression/compress_mlp.py:56-57). Wide RHS solves
    in column blocks (memory-exactness note at `_tri_solve_blocked`).
    """
    L = _cholesky_escalated(A, ridge)
    n = A.shape[0]
    if _use_recursive(n):
        # mid range (7B..14B d_int): recursive solves keep the work in
        # MXU matmuls; RHS memory at these sizes is comfortably bounded
        # (the column-block scan exists for the native op's live-temp
        # blowup, which the recursion does not have)
        y = _tri_solve_lower_recursive(L, B)
        return _tri_solve_lowerT_recursive(L, y)
    y = _tri_solve_blocked(L, B, lower=True)
    if n > _TRI_NATIVE_MAX_N:
        # Back-substitution panels slice L's columns directly — no
        # [n, n] transpose materialisation next to the forward solve.
        return _tri_solve_lowerT_rowblocked(L, y)
    return _tri_solve_blocked(L.T, y, lower=False)
