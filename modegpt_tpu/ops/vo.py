"""Type-III V/O decomposition — correlation-whitened SVD.

TPU-native equivalent of the reference VO solver
(reference: src/compression/compress_vo.py). Given the covariance ``C_x``
of the attention-input activations:

* MHA path (reference: compress_head :162-223): two-stage whitened SVD —
  ``U, S, Vh = svd(sqrt(C_x) @ W_v_head^T)`` then
  ``U', S', Vh' = svd(diag(S) @ Vh @ W_o_head^T)``;
  ``V_new = (C^-1/2 U U')[:, :r]``, ``O_new = diag(S')[:r] Vh'[:r, :]``.

* GQA path (reference: compress_head_grouped :112-159): a single SVD on
  the shared V head — ``V_new = C^-1/2 U[:, :r]``, and each of the
  group's O heads is projected through the shared basis:
  ``O_new = diag(S)[:r] Vh[:r, :] @ W_o_head^T``.

All per-head SVDs are `vmap`-batched into one XLA program per layer.
The reference's MHA second SVD uses ``full_matrices=True``
(compress_vo.py:194) but only consumes the first ``r <= head_dim`` rows
of Vh, so the economy SVD is mathematically identical and ~d_model/head_dim
times cheaper — we use the economy form.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from modegpt_tpu.ops.psd import sqrt_and_inv_sqrt_psd

__all__ = ["compress_vo_layer", "vo_full_factors", "vo_factors_from_full", "VOFactors"]


class VOFactors(NamedTuple):
    """Compressed V/O factors in HF weight layout.

    v: [n_kv_heads * rank, d_model]
    o: [d_model, n_heads * rank]
    """

    v: jax.Array
    o: jax.Array


def _whiteners(cov_x: jax.Array, ridge_vo: float, whiten: str):
    """Return (F, unwhiten) with F^T F = cov_x + ridge*I and
    unwhiten(M) = F^{-1} M.

    whiten="eigh": F is the symmetric PSD sqrt — bit-matches the
    reference (compress_vo.py:43-45).
    whiten="cholesky": F = L^T from the Cholesky factorisation. Any F
    with F^T F = C yields the same whitened column space, hence the SAME
    functional O_new @ V_new (the truncation is an orthogonal projection
    in whitened coordinates); only the individual factors differ by the
    basis change. Cholesky avoids XLA's slow TPU eigh on [d_model]^2 —
    used by the f32_device speed path.
    """
    if whiten == "eigh":
        sqrt_C, inv_sqrt_C = sqrt_and_inv_sqrt_psd(cov_x, ridge_vo)
        return sqrt_C, lambda M: inv_sqrt_C @ M
    from modegpt_tpu.ops.psd import _cholesky_escalated

    # d_model can exceed the calibration token count at 13B+ scale
    # (cov_x singular by construction) — escalate the ridge past f32's
    # rounding floor instead of NaN-ing (see _cholesky_escalated).
    L = _cholesky_escalated(cov_x, ridge_vo)
    unwhiten = lambda M: jax.scipy.linalg.solve_triangular(L.T, M, lower=False)
    return L.T, unwhiten


@partial(jax.jit, static_argnames=("n_heads", "n_kv_heads", "whiten"))
def vo_full_factors(
    cov_x: jax.Array,
    W_v: jax.Array,
    W_o: jax.Array,
    n_heads: int,
    n_kv_heads: int,
    ridge_vo: float,
    whiten: str = "eigh",
):
    """Rank-INDEPENDENT full factor forms.

    Returns (v_full, o_full):
      v_full: [Hk, d, hd] — unwhitened left basis; truncation to rank r
              is exactly ``v_full[:, :, :r]`` (unwhitening is linear).
      o_full: [H, hd, d]  — scaled right factors; truncation is
              ``o_full[:, :r, :]``.

    This is the TPU-first shape of the solver: one fixed-shape XLA
    program per layer stack regardless of per-layer ranks (heterogeneous
    ranks would otherwise force one compile per distinct rank — XLA
    compile time dominates on TPU, see SURVEY.md §7 hard part 3). The
    rank slicing happens on the host.
    """
    d_model = cov_x.shape[0]
    hd = W_v.shape[0] // n_kv_heads
    group = n_heads // n_kv_heads

    sqrt_C, unwhiten = _whiteners(cov_x, ridge_vo, whiten)

    V_heads = W_v.reshape(n_kv_heads, hd, d_model)  # [Hk, hd, d]
    O_heads = W_o.reshape(d_model, n_heads, hd).transpose(1, 0, 2)  # [H, d, hd]

    # Stage 1 (all paths): batched economy SVD of sqrt(C) @ V_head^T [d, hd].
    def svd1(v_head):
        return jnp.linalg.svd(sqrt_C @ v_head.T, full_matrices=False)

    U, S, Vh = jax.vmap(svd1)(V_heads)  # U:[Hk,d,hd] S:[Hk,hd] Vh:[Hk,hd,hd]

    if group == 1:
        # MHA: second SVD through the O head.
        def svd2(s, vh, o_head):
            A = (s[:, None] * vh) @ o_head  # [hd, d] ; o_head passed as [d, hd]^T
            return jnp.linalg.svd(A, full_matrices=False)

        A_in = O_heads.transpose(0, 2, 1)  # [H, hd, d] == O_head^T
        Up, Sp, Vph = jax.vmap(svd2)(S, Vh, A_in)
        UUp = jnp.einsum("hef,hfg->heg", U, Up)  # [H, d, hd]
        v_full = jax.vmap(unwhiten, in_axes=0)(UUp)  # [H, d, hd]
        o_full = Sp[:, :, None] * Vph  # [H, hd, d]
    else:
        # GQA: shared V basis per kv head, O heads projected through it.
        v_full = jax.vmap(unwhiten, in_axes=0)(U)  # [Hk, d, hd]
        SVh = S[:, :, None] * Vh  # [Hk, hd, hd]
        O_grp = O_heads.reshape(n_kv_heads, group, d_model, hd)
        o_full = jnp.einsum("hre,hgde->hgrd", SVh, O_grp)  # [Hk, G, hd, d]
        o_full = o_full.reshape(n_heads, hd, d_model)

    return v_full, o_full


def vo_factors_from_full(v_full, o_full, rank: int, n_heads: int, n_kv_heads: int) -> "VOFactors":
    """Slice full factor forms to rank and lay out as HF weights."""
    d_model = v_full.shape[1]
    v_w = v_full[:, :, :rank].transpose(0, 2, 1).reshape(n_kv_heads * rank, d_model)
    o_w = o_full[:, :rank, :].transpose(2, 0, 1).reshape(d_model, n_heads * rank)
    return VOFactors(v=v_w, o=o_w)


def _vo_solve(
    cov_x: jax.Array,
    W_v: jax.Array,
    W_o: jax.Array,
    rank: int,
    n_heads: int,
    n_kv_heads: int,
    ridge_vo: float,
    whiten: str = "eigh",
):
    v_full, o_full = vo_full_factors(cov_x, W_v, W_o, n_heads, n_kv_heads, ridge_vo, whiten)
    f = vo_factors_from_full(v_full, o_full, rank, n_heads, n_kv_heads)
    return f.v, f.o


def compress_vo_layer(
    cov_x: jax.Array,
    W_v: jax.Array,
    W_o: jax.Array,
    rank: int,
    n_heads: int,
    n_kv_heads: int,
    ridge_vo: float,
    whiten: str = "eigh",
) -> VOFactors:
    """Type-III solve for one layer.

    Args:
      cov_x: [d_model, d_model] attention-input covariance.
      W_v:   [n_kv_heads*hd, d_model] value weight (HF layout).
      W_o:   [d_model, n_heads*hd] output weight (HF layout).
      rank:  kept dims per head (caller applies the even-rank rule for
             RoPE archs, reference: compress_vo.py:39-41).
    """
    v_w, o_w = _vo_solve(cov_x, W_v, W_o, rank, n_heads, n_kv_heads, ridge_vo, whiten)
    return VOFactors(v=v_w, o=o_w)
