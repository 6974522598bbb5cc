"""Type-II Q/K decomposition — CR column selection, RoPE-pair-aware.

TPU-native equivalent of the reference QK solver
(reference: src/compression/compress_qk.py). Two architecture kernels:

* RoPE archs (Llama/Qwen, MHA and GQA): score each rotary frequency pair
  ``j`` by the whitened column energies of the per-head Q/K Grams,
  summed over the query heads of the kv group, keep the top ``rank/2``
  pairs and slice the matching Q/K rows. The kept index mask doubles as
  the per-head *rotary mask* the compressed model uses to gather cos/sin
  (reference: compress_head_llama_grouped :320-384, compress_head_llama
  :387-436).

* OPT (no RoPE, attention biases): score = columnwise
  ``||sqrt(C_q)|| * ||sqrt(C_k)||``, keep the top ``rank`` rows of Q, K
  and their biases (reference: compress_head_opt :439-476).

All per-head eigendecompositions are `vmap`-batched: a layer is one XLA
program over ``[n_heads, head_dim, head_dim]`` — on TPU this hits the
batched Jacobi eigensolver instead of the reference's sequential
per-head loop.

Index-order convention: the rotary mask is ``concat(topk, topk + hd/2)``
with topk in descending-score order (NOT sorted), exactly as the
reference builds it (compress_qk.py:366-367) — the compressed model's
rotate_half pairs position ``i`` with ``i + rank/2``, which is only
consistent under this ordering.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "qk_rope_pair_scores",
    "qk_opt_scores",
    "compress_qk_layer_rope",
    "compress_qk_layer_opt",
]

# The reference regularises sqrt(C_q) with sqrt_M's default ridge (1e-4)
# and applies config.ridge_qk only to sqrt(C_k) in the GQA path
# (compress_qk.py:348-353); the MHA path uses defaults for both
# (compress_qk.py:406-407). We mirror both quirks.
DEFAULT_SQRT_RIDGE = 1e-4


class QKFactors(NamedTuple):
    """Compressed Q/K factors in HF weight layout.

    q: [n_heads * rank, d_model]
    k: [n_kv_heads * rank, d_model]
    rotary_mask: [n_kv_heads, rank] int32 or None (OPT)
    q_bias / k_bias: per-head-sliced biases or None (OPT only)
    """

    q: jax.Array
    k: jax.Array
    rotary_mask: Optional[jax.Array]
    q_bias: Optional[jax.Array] = None
    k_bias: Optional[jax.Array] = None


def _batched_sqrt_col_energy(cov: jax.Array, ridge: float) -> jax.Array:
    """Per-head column squared-norms of the PSD sqrt: [H, hd].

    The reference computes ``||sqrt_M(C)[:, j]||^2`` with a full per-head
    eigendecomposition (compress_qk.py:346-364). But the symmetric PSD
    sqrt squares back to the ridged matrix exactly —
    ``sqrt_M(C) @ sqrt_M(C) = C + ridge*I`` (negative-eigenvalue clamping
    aside, and calibration Grams are PSD by construction) — so the column
    energy is simply the ridged DIAGONAL:

        ||sqrt(C)[:, j]||^2 = (C + ridge*I)_jj = C_jj + ridge.

    Identical math, zero eigendecompositions: the hot QK scoring becomes
    a diagonal read, which matters on TPU where XLA's eigh is
    compile-and-Jacobi heavy. Verified against the eigh-based oracle in
    tests/test_solvers.py.
    """
    diag = jnp.diagonal(cov, axis1=-2, axis2=-1)
    return diag + jnp.asarray(ridge, dtype=cov.dtype)


@partial(jax.jit, static_argnames=("n_kv_heads",))
def qk_rope_pair_scores(
    cov_q: jax.Array,
    cov_k: jax.Array,
    ridge_qk: float,
    n_kv_heads: int,
) -> jax.Array:
    """RoPE frequency-pair scores per kv head: [n_kv_heads, head_dim/2].

    score[kv, j] = sqrt( sum_{q in group}  e_q[j]    * e_k[j]
                                         + e_q[j+h/2] * e_k[j+h/2] )
    where e = column energy of the whitening sqrt
    (reference: compress_qk.py:346-364).
    """
    n_heads, hd = cov_q.shape[0], cov_q.shape[-1]
    group = n_heads // n_kv_heads
    half = hd // 2

    eq = _batched_sqrt_col_energy(cov_q, DEFAULT_SQRT_RIDGE)  # [H, hd]
    ek = _batched_sqrt_col_energy(cov_k, ridge_qk)  # [Hk, hd]

    eq = eq.reshape(n_kv_heads, group, hd)
    pair = (
        eq[..., :half] * ek[:, None, :half] + eq[..., half:] * ek[:, None, half:]
    )  # [Hk, G, half]
    return jnp.sqrt(jnp.sum(pair, axis=1))  # [Hk, half]


@jax.jit
def qk_opt_scores(cov_q: jax.Array, cov_k: jax.Array, ridge_qk: float) -> jax.Array:
    """OPT per-head row scores: [n_heads, head_dim].

    score = ||sqrt(C_q)||_col * ||sqrt(C_k)||_col
    (reference: compress_qk.py:455-461 — both sqrts at default ridge).
    """
    del ridge_qk  # the reference OPT path uses sqrt_M defaults for both
    eq = _batched_sqrt_col_energy(cov_q, DEFAULT_SQRT_RIDGE)
    ek = _batched_sqrt_col_energy(cov_k, DEFAULT_SQRT_RIDGE)
    return jnp.sqrt(eq) * jnp.sqrt(ek)


@partial(jax.jit, static_argnames=("rank", "n_kv_heads"))
def _rope_select_and_slice(
    scores: jax.Array,
    W_q_heads: jax.Array,
    W_k_heads: jax.Array,
    rank: int,
    n_kv_heads: int,
):
    n_heads, hd, d_model = W_q_heads.shape
    group = n_heads // n_kv_heads
    half = hd // 2

    _, topk = jax.lax.top_k(scores, rank // 2)  # [Hk, rank/2], descending score order
    mask = jnp.concatenate([topk, topk + half], axis=-1)  # [Hk, rank]

    k_new = jnp.take_along_axis(W_k_heads, mask[:, :, None], axis=1)  # [Hk, rank, d]
    q_mask = jnp.repeat(mask, group, axis=0)  # [H, rank]
    q_new = jnp.take_along_axis(W_q_heads, q_mask[:, :, None], axis=1)  # [H, rank, d]

    return (
        q_new.reshape(n_heads * rank, d_model),
        k_new.reshape(n_kv_heads * rank, d_model),
        mask.astype(jnp.int32),
    )


def compress_qk_layer_rope(
    cov_q: jax.Array,
    cov_k: jax.Array,
    W_q: jax.Array,
    W_k: jax.Array,
    rank: int,
    ridge_qk: float,
) -> QKFactors:
    """Type-II solve for one RoPE layer (Llama MHA/GQA, Qwen3).

    Args:
      cov_q: [n_heads, hd, hd] per-head Q Grams.
      cov_k: [n_kv_heads, hd, hd] per-head K Grams.
      W_q:   [n_heads*hd, d_model], W_k: [n_kv_heads*hd, d_model].
      rank:  even kept-dim per head (caller enforces evenness,
             reference: compress_qk.py:180-182).
    """
    n_heads, hd = cov_q.shape[0], cov_q.shape[-1]
    n_kv_heads = cov_k.shape[0]
    d_model = W_q.shape[-1]
    assert rank % 2 == 0 and 2 <= rank <= hd

    scores = qk_rope_pair_scores(cov_q, cov_k, ridge_qk, n_kv_heads)
    q_new, k_new, mask = _rope_select_and_slice(
        scores,
        W_q.reshape(n_heads, hd, d_model),
        W_k.reshape(n_kv_heads, hd, d_model),
        rank,
        n_kv_heads,
    )
    return QKFactors(q=q_new, k=k_new, rotary_mask=mask)


@partial(jax.jit, static_argnames=("rank", "n_heads"))
def _opt_select_and_slice(
    scores: jax.Array,
    W_q_heads: jax.Array,
    W_k_heads: jax.Array,
    bias_q: jax.Array,
    bias_k: jax.Array,
    rank: int,
    n_heads: int,
):
    _, hd, d_model = W_q_heads.shape
    _, topk = jax.lax.top_k(scores, rank)  # [H, rank]
    q_new = jnp.take_along_axis(W_q_heads, topk[:, :, None], axis=1)
    k_new = jnp.take_along_axis(W_k_heads, topk[:, :, None], axis=1)
    bq = jnp.take_along_axis(bias_q.reshape(n_heads, hd), topk, axis=1)
    bk = jnp.take_along_axis(bias_k.reshape(n_heads, hd), topk, axis=1)
    return (
        q_new.reshape(n_heads * rank, d_model),
        k_new.reshape(n_heads * rank, d_model),
        bq.reshape(n_heads * rank),
        bk.reshape(n_heads * rank),
    )


def compress_qk_layer_opt(
    cov_q: jax.Array,
    cov_k: jax.Array,
    W_q: jax.Array,
    W_k: jax.Array,
    bias_q: jax.Array,
    bias_k: jax.Array,
    rank: int,
    ridge_qk: float,
) -> QKFactors:
    """Type-II solve for one OPT layer (no RoPE; biases sliced too)."""
    n_heads, hd = cov_q.shape[0], cov_q.shape[-1]
    d_model = W_q.shape[-1]
    scores = qk_opt_scores(cov_q, cov_k, ridge_qk)
    q_new, k_new, bq, bk = _opt_select_and_slice(
        scores,
        W_q.reshape(n_heads, hd, d_model),
        W_k.reshape(n_heads, hd, d_model),
        bias_q,
        bias_k,
        rank,
        n_heads,
    )
    return QKFactors(q=q_new, k=k_new, rotary_mask=None, q_bias=bq, k_bias=bk)


@partial(jax.jit, static_argnames=("rank", "n_heads"))
def _qk_svd_solve(
    cov_x: jax.Array,
    W_q: jax.Array,
    W_k: jax.Array,
    bias_q: Optional[jax.Array],
    bias_k: Optional[jax.Array],
    rank: int,
    n_heads: int,
    ridge: float,
):
    """Whitened two-stage SVD of the QK bilinear form, batched over heads.

    Per head: U,S,Vh = svd(sqrt(C_x) @ Wq_h^T); U',S',Vh' = svd(S Vh Wk_h);
    Q_new = (C^-1/2 U U')[:, :r], K_new = diag(S')[:r] Vh'[:r, :], with a
    scale balance alpha = sqrt(max|K|/max|Q|) (reference:
    compress_qk_svd, compress_qk.py:62-91). At full rank
    Q_new @ K_new == Wq_h^T @ Wk_h exactly (the whitening cancels).
    Biases are projected with the reference's final formulas
    (compress_qk.py:104-119).
    """
    d_model = cov_x.shape[0]
    hd = W_q.shape[0] // n_heads
    from modegpt_tpu.ops.psd import sqrt_and_inv_sqrt_psd

    sqrt_C, inv_sqrt_C = sqrt_and_inv_sqrt_psd(cov_x, ridge)

    Wq_h = W_q.reshape(n_heads, hd, d_model)
    Wk_h = W_k.reshape(n_heads, hd, d_model)

    def per_head(q_head, k_head, b_q, b_k):
        U, S, Vh = jnp.linalg.svd(sqrt_C @ q_head.T, full_matrices=False)
        A = (S[:, None] * Vh) @ k_head  # [hd, d]
        Up, Sp, Vph = jnp.linalg.svd(A, full_matrices=False)
        Q = (inv_sqrt_C @ U @ Up)[:, :rank]  # [d, r]
        K = Sp[:rank, None] * Vph[:rank, :]  # [r, d]
        alpha = jnp.sqrt(jnp.max(jnp.abs(K)) / jnp.maximum(jnp.max(jnp.abs(Q)), 1e-30))
        Q = (Q * alpha).T  # [r, d] q weight
        K = K / alpha  # [r, d] k weight
        # Bias projection: match the score cross-terms in least squares.
        # (Wq x + bq)^T (Wk y + bk) has cross-terms bq^T Wk y and
        # x^T Wq^T bk; requiring bq'^T K == bq^T Wk and Q^T bk' == Wq^T bk
        # gives the pinv solves below. (The reference's experimental
        # formulas at compress_qk.py:104-119 are annotated in-source as
        # driving the bias toward zero; this is the exact LS solution.)
        new_bq = jnp.linalg.pinv(K.T) @ (k_head.T @ b_q) if b_q is not None else None
        new_bk = jnp.linalg.pinv(Q.T) @ (q_head.T @ b_k) if b_k is not None else None
        return Q, K, new_bq, new_bk

    if bias_q is None:
        Qs, Ks, _, _ = jax.vmap(lambda q, k: per_head(q, k, None, None))(Wq_h, Wk_h)
        bq_new = bk_new = None
    else:
        bq_h = bias_q.reshape(n_heads, hd)
        bk_h = bias_k.reshape(n_heads, hd)
        Qs, Ks, bq_new, bk_new = jax.vmap(per_head)(Wq_h, Wk_h, bq_h, bk_h)
        bq_new = bq_new.reshape(n_heads * rank)
        bk_new = bk_new.reshape(n_heads * rank)
    return (
        Qs.reshape(n_heads * rank, d_model),
        Ks.reshape(n_heads * rank, d_model),
        bq_new,
        bk_new,
    )


def compress_qk_layer_svd(
    cov_x: jax.Array,
    W_q: jax.Array,
    W_k: jax.Array,
    bias_q: Optional[jax.Array],
    bias_k: Optional[jax.Array],
    rank: int,
    ridge_qk: float,
    n_heads: int,
) -> QKFactors:
    """Alternative Type-II solve: whitened SVD of the QK bilinear form.

    The reference ships this as an unused alternative "better for OPT
    models" (compress_qk.py:16-148, never called by the driver); here
    it's a first-class option for non-RoPE archs via
    ``CompressionConfig.qk_method='svd'``.
    """
    q, k, bq, bk = _qk_svd_solve(
        cov_x, W_q, W_k, bias_q, bias_k, rank, n_heads, ridge_qk
    )
    return QKFactors(q=q, k=k, rotary_mask=None, q_bias=bq, k_bias=bk)
