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

__all__ = ["compress_vo_layer", "VOFactors"]


class VOFactors(NamedTuple):
    """Compressed V/O factors in HF weight layout.

    v: [n_kv_heads * rank, d_model]
    o: [d_model, n_heads * rank]
    """

    v: jax.Array
    o: jax.Array


@partial(jax.jit, static_argnames=("rank", "n_heads", "n_kv_heads"))
def _vo_solve(
    cov_x: jax.Array,
    W_v: jax.Array,
    W_o: jax.Array,
    rank: int,
    n_heads: int,
    n_kv_heads: int,
    ridge_vo: float,
):
    d_model = cov_x.shape[0]
    hd = W_v.shape[0] // n_kv_heads
    group = n_heads // n_kv_heads

    sqrt_C, inv_sqrt_C = sqrt_and_inv_sqrt_psd(cov_x, ridge_vo)

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
        # V_new per head: (inv_sqrt_C @ U @ Up)[:, :rank]  -> weight rows [rank, d]
        v_new = jnp.einsum("de,hef,hfg->hdg", inv_sqrt_C, U, Up)[:, :, :rank]
        v_new = v_new.transpose(0, 2, 1)  # [H, rank, d]
        o_new = Sp[:, :rank, None] * Vph[:, :rank, :]  # [H, rank, d]
    else:
        # GQA: shared V basis per kv head, O heads projected through it.
        v_new = jnp.einsum("de,hef->hdf", inv_sqrt_C, U[:, :, :rank])  # [Hk, d, rank]
        v_new = v_new.transpose(0, 2, 1)  # [Hk, rank, d]
        SVh = S[:, :rank, None] * Vh[:, :rank, :]  # [Hk, rank, hd]
        O_grp = O_heads.reshape(n_kv_heads, group, d_model, hd)
        o_new = jnp.einsum("hre,hgde->hgrd", SVh, O_grp)  # [Hk, G, rank, d]
        o_new = o_new.reshape(n_heads, rank, d_model)

    v_w = v_new.reshape(n_kv_heads * rank, d_model)
    # O weight layout [d_model, n_heads*rank]: per-head column blocks.
    o_w = o_new.transpose(2, 0, 1).reshape(d_model, n_heads * rank)
    return v_w, o_w


def compress_vo_layer(
    cov_x: jax.Array,
    W_v: jax.Array,
    W_o: jax.Array,
    rank: int,
    n_heads: int,
    n_kv_heads: int,
    ridge_vo: float,
) -> VOFactors:
    """Type-III solve for one layer.

    Args:
      cov_x: [d_model, d_model] attention-input covariance.
      W_v:   [n_kv_heads*hd, d_model] value weight (HF layout).
      W_o:   [d_model, n_heads*hd] output weight (HF layout).
      rank:  kept dims per head (caller applies the even-rank rule for
             RoPE archs, reference: compress_vo.py:39-41).
    """
    v_w, o_w = _vo_solve(cov_x, W_v, W_o, rank, n_heads, n_kv_heads, ridge_vo)
    return VOFactors(v=v_w, o=o_w)
