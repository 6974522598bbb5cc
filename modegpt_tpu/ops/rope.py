"""Rotary position embeddings with frequency masking, and masked RMSNorm.

TPU-native re-derivation of the compressed model's two novel kernels:

* Masked RoPE (reference: src/patchers/LlamaRebuild.py:119-187): after QK
  compression each kv head keeps a subset of rotary frequency pairs; the
  kept cos/sin columns are gathered per head via the layer's rotary mask.
  The mask ordering is ``concat(topk, topk + hd/2)`` so rotate_half's
  pairing of position ``i`` with ``i + r/2`` matches the original
  frequency pairs.

* Masked per-head q/k RMSNorm (reference:
  src/patchers/DenseQwenRebuild.py:262-286): Qwen3 normalises q/k per
  head with a learned weight of the *original* head_dim; the compressed
  model gathers the matching weight coordinates through the rotary mask.

Both are expressed as `take`-based gathers over the frequency axis, which
XLA lowers to efficient TPU gathers; everything is batch-friendly and
fuses into the surrounding attention computation.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

__all__ = ["rope_cos_sin", "apply_rope", "masked_head_rms_norm", "masked_flat_rms_norm"]


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    theta: float = 10000.0,
    dtype=jnp.float32,
    scaling: Optional[tuple] = None,
) -> Tuple[jax.Array, jax.Array]:
    """cos/sin tables [T, head_dim] at the ORIGINAL head dim.

    The duplicated-frequency layout matches HF: emb = concat(freqs, freqs)
    (reference: LlamaRebuild.py:104-107). Computed in float32 regardless
    of model dtype, as HF forces (LlamaRebuild.py:103).

    scaling: optional frequency-scaling spec (ModelSpec.rope_scaling):
      ("linear", factor) — position interpolation (inv_freq / factor);
      ("llama3", factor, low_freq_factor, high_freq_factor,
       original_max_position_embeddings) — Llama-3.1 per-wavelength
       scaling (HF modeling_rope_utils._compute_llama3_parameters).
    """
    half = head_dim // 2
    inv_freq = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) * 2.0 / head_dim))
    if scaling is not None:
        kind = scaling[0]
        if kind == "linear":
            inv_freq = inv_freq / scaling[1]
        elif kind == "llama3":
            _, factor, low_f, high_f, old_len = scaling
            wavelen = 2.0 * jnp.pi / inv_freq
            scaled = jnp.where(wavelen > old_len / low_f, inv_freq / factor, inv_freq)
            smooth = (old_len / wavelen - low_f) / (high_f - low_f)
            smoothed = (1.0 - smooth) * scaled / factor + smooth * scaled
            medium = (wavelen <= old_len / low_f) & (wavelen >= old_len / high_f)
            inv_freq = jnp.where(medium, smoothed, scaled)
        else:
            raise ValueError(f"unsupported rope scaling {kind!r}")
    freqs = positions.astype(jnp.float32)[:, None] * inv_freq[None, :]  # [T, half]
    emb = jnp.concatenate([freqs, freqs], axis=-1)  # [T, head_dim]
    return jnp.cos(emb).astype(dtype), jnp.sin(emb).astype(dtype)


def _rotate_half(x: jax.Array) -> jax.Array:
    half = x.shape[-1] // 2
    return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)


def apply_rope(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    rotary_mask: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Apply (optionally masked) RoPE.

    Args:
      q: [B, H, T, r]      (r = compressed head dim, == head_dim if dense)
      k: [B, Hk, T, r]
      cos/sin: [T, head_dim] full-dim tables from `rope_cos_sin`.
      rotary_mask: [Hk, r] int indices into head_dim, or None for dense.
    """
    if rotary_mask is None:
        c = cos[None, None, :, :]
        s = sin[None, None, :, :]
        return q * c + _rotate_half(q) * s, k * c + _rotate_half(k) * s

    n_heads, n_kv = q.shape[1], k.shape[1]
    group = n_heads // n_kv
    # Gather kept frequency columns per kv head: [Hk, T, r]
    cos_k = cos.T[rotary_mask].transpose(0, 2, 1)  # cos.T: [hd, T] -> [Hk, r, T] -> [Hk, T, r]
    sin_k = sin.T[rotary_mask].transpose(0, 2, 1)
    cos_q = jnp.repeat(cos_k, group, axis=0)  # [H, T, r]
    sin_q = jnp.repeat(sin_k, group, axis=0)

    q_emb = q * cos_q[None] + _rotate_half(q) * sin_q[None]
    k_emb = k * cos_k[None] + _rotate_half(k) * sin_k[None]
    return q_emb, k_emb


def apply_rope_ragged(
    q: jax.Array,
    k: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    rotary_mask: Optional[jax.Array],
    group: int,
) -> Tuple[jax.Array, jax.Array]:
    """RoPE with PER-ROW phase tables (decode at per-sequence positions).

    q: [B, H, S, R], k: [B, Hk, S, R], cos/sin: [B, S, head_dim],
    rotary_mask: [Hk, R] kept-frequency indices or None (dense).
    """
    if rotary_mask is None:
        cos_h = cos[:, None]  # [B, 1, S, head_dim]; R == head_dim
        sin_h = sin[:, None]
        cq, sq, ck, sk = cos_h, sin_h, cos_h, sin_h
    else:
        # gather kept frequencies per kv head: [B, S, Hk, R] -> [B, Hk, S, R]
        cos_h = jnp.take(cos, rotary_mask, axis=-1).transpose(0, 2, 1, 3)
        sin_h = jnp.take(sin, rotary_mask, axis=-1).transpose(0, 2, 1, 3)
        cq = jnp.repeat(cos_h, group, axis=1)
        sq = jnp.repeat(sin_h, group, axis=1)
        ck, sk = cos_h, sin_h
    return q * cq + _rotate_half(q) * sq, k * ck + _rotate_half(k) * sk


def masked_flat_rms_norm(
    x: jax.Array,
    weight: jax.Array,
    rotary_mask: Optional[jax.Array],
    n_heads: int,
    head_dim: int,
    group: int,
    eps: float,
    true_dim=None,
) -> jax.Array:
    """Whole-projection q/k RMSNorm (olmo2: one RMSNorm over [H*hd],
    HF Olmo2Attention.q_norm/k_norm) with the weight gathered through the
    rotary mask for compressed models.

    Args:
      x: [B, T, H*r] flat projection output (r = compressed head dim).
      weight: [H*head_dim] learned weight at the ORIGINAL dims.
      rotary_mask: [Hk, r] kept indices per kv head, or None (dense).
      group: heads per kv head for the q side (1 for k).
      true_dim: normalisation denominator (sum(x^2)/true_dim); defaults
        to x's last dim — padded execution passes H * r_true so zero
        pads don't dilute the variance.
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    denom = jnp.asarray(true_dim if true_dim is not None else x.shape[-1], jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / denom
    normed = xf * jax.lax.rsqrt(var + eps)
    if rotary_mask is None:
        w = weight.astype(jnp.float32)
    else:
        mask = jnp.repeat(rotary_mask, group, axis=0) if group > 1 else rotary_mask
        r = mask.shape[1]
        idx = (
            jnp.arange(n_heads, dtype=mask.dtype)[:, None] * head_dim + mask
        ).reshape(n_heads * r)
        w = weight.astype(jnp.float32)[idx]
    return (normed * w).astype(dtype)


def masked_head_rms_norm(
    x: jax.Array,
    weight: jax.Array,
    rotary_mask: Optional[jax.Array],
    group: int,
    eps: float,
) -> jax.Array:
    """Per-head RMSNorm with weight gathered through the rotary mask.

    Args:
      x: [B, T, H, r] per-head states (H = n_heads for q with
         ``group = n_heads // n_kv_heads``, or n_kv_heads for k with
         ``group = 1``).
      weight: [head_dim] learned norm weight at the ORIGINAL head dim.
      rotary_mask: [Hk, r] kept indices, or None (dense: plain RMSNorm).
    """
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    normed = xf * jax.lax.rsqrt(var + eps)
    if rotary_mask is None:
        w = weight.astype(jnp.float32)[None, None, None, :]
    else:
        mask = jnp.repeat(rotary_mask, group, axis=0) if group > 1 else rotary_mask
        w = weight.astype(jnp.float32)[mask][None, None, :, :]  # [1, 1, H, r]
    return (normed * w).astype(dtype)
