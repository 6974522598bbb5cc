"""Streaming generation with an attention-sink ring cache.

The slot-table serving cache (models/serving.py) is bounded by
``max_len``; sequences beyond it are rejected. This module provides the
unbounded-length alternative: a fixed cache of ``n_sink`` pinned initial
tokens plus a ring over the last ``window - n_sink`` tokens
(StreamingLLM, Xiao et al. 2023 — sinks stabilise softmax mass that
would otherwise concentrate on evicted early positions).

TPU-native design:

* PRE-RoPE keys are cached; every step re-applies RoPE at CACHE-RELATIVE
  positions (sinks at 0..n_sink-1, ring tokens contiguous after) — the
  StreamingLLM rule that keeps positions inside the trained range no
  matter how long the stream runs. Cost: one rope over [window, r] per
  layer per step, negligible next to the matmuls.
* The ring is addressed by ``global_pos % ring_len``; eviction is an
  overwrite, never a copy or reallocation — the decode step compiles
  once for the lifetime of the stream.
* Runs on the padded-uniform stack (PaddedModel), so heterogeneous-rank
  compressed models stream through one scanned layer body.

Beyond the window this is deliberately LOSSY (evicted tokens are gone)
— the price of O(window) memory for O(stream) tokens. Within the window
(total length <= window) it is exactly greedy generation (tested).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from modegpt_tpu.models.forward import _act, _linear, _norm
from modegpt_tpu.models.padded import PaddedModel, _embed, _unembed
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.rope import apply_rope, rope_cos_sin

__all__ = ["streaming_generate"]


def _slot_of(g, n_sink: int, ring_len: int):
    """Cache slot for global position g: sinks pinned, rest ring-addressed."""
    return jnp.where(g < n_sink, g, n_sink + (g - n_sink) % ring_len)


def _rel_positions(g, C: int, n_sink: int, ring_len: int):
    """Per-slot cache-relative positions + validity for current global
    step g (the token AT g is being produced; cache holds 0..g-1...
    actually 0..g — the current token's k/v are written before attending).

    Slot layout: [0, n_sink) sinks hold globals 0..n_sink-1 (relative =
    global). Ring slot s holds the LARGEST global p <= g with
    p >= n_sink and (p - n_sink) % ring_len == s - n_sink; its relative
    position is n_sink + (p - ring_start) where ring_start is the oldest
    retained ring global. Slots whose p exceeds g (not yet written this
    lap) or that duplicate are invalid.
    """
    slots = jnp.arange(C, dtype=jnp.int32)
    is_sink = slots < n_sink
    # ring: residue r = slot - n_sink; largest p <= g with p ≡ r (mod L)
    r = slots - n_sink
    m = g - n_sink  # >= 0 once g >= n_sink
    # p - n_sink = m - ((m - r) mod L)
    p_ring = n_sink + m - jnp.mod(m - r, ring_len)
    p = jnp.where(is_sink, slots, p_ring)
    valid = (p >= 0) & (p <= g) & (is_sink | (p >= n_sink))
    n_ring = jnp.minimum(g - n_sink + 1, ring_len)  # retained ring tokens
    ring_start = g + 1 - n_ring
    rel = jnp.where(is_sink, slots, n_sink + (p - ring_start))
    rel = jnp.where(valid, rel, 0)
    return rel, valid, p


def _stream_step(
    spec: ModelSpec, layers, other, q_hd_true, token, ck, cv, g,
    n_sink: int,
):
    """One-token streaming decode at global position g (scalar).

    ck/cv: [L, B, Hk, C, r] PRE-RoPE key cache / value cache.
    Returns (logits [B, V], ck, cv).
    """
    B = token.shape[0]
    H, Hk = spec.n_heads, spec.n_kv_heads
    C = ck.shape[3]
    ring_len = C - n_sink
    Rq = spec.q_ranks[0] // H
    Rv = spec.v_ranks[0] // Hk

    slot = _slot_of(g, n_sink, ring_len)
    rel, valid, p_global = _rel_positions(g, C, n_sink, ring_len)
    # a model's OWN sliding window masks by GLOBAL distance; uniform
    # stacks use the static spec window, mixed (gemma2) stacks carry a
    # per-layer scanned "window" leaf handled inside the body
    uniform_sliding = (
        spec.layer_types
        and not spec.mixed_windows
        and spec.layer_types[0] == "sliding_attention"
        and spec.sliding_window
    )
    if uniform_sliding:
        valid = valid & (g - p_global < spec.sliding_window)
    q_rel = jnp.minimum(g, jnp.asarray(C - 1, jnp.int32))

    # positions embed at the query's RELATIVE position (OPT positions too)
    x = _embed(spec, other, token[:, None], pos0=q_rel)

    cos_k = sin_k = cos_q = sin_q = None
    if spec.uses_rope:
        cos_k, sin_k = rope_cos_sin(
            rel, spec.head_dim, spec.rope_theta, dtype=x.dtype, scaling=spec.rope_scaling
        )
        cos_q, sin_q = rope_cos_sin(
            q_rel[None], spec.head_dim, spec.rope_theta, dtype=x.dtype,
            scaling=spec.rope_scaling,
        )

    def body(x, inputs):
        p, r_true, ck_l, cv_l = inputs
        pre_ln = spec.do_layer_norm_before
        residual = x
        x_ln = (
            _norm(x, p["attn_norm"], spec.norm, spec.norm_eps)
            if (pre_ln and spec.pre_norms)
            else x
        )
        q = _linear(x_ln, p["q"])
        k = _linear(x_ln, p["k"])
        v = _linear(x_ln, p["v"])
        if spec.flat_qk_norm:
            from modegpt_tpu.ops.rope import masked_flat_rms_norm

            rm_ = p.get("rotary_mask")
            q = masked_flat_rms_norm(
                q, p["q_norm"]["scale"], rm_, H, spec.head_dim,
                spec.group_size, spec.norm_eps, true_dim=H * r_true,
            )
            k = masked_flat_rms_norm(
                k, p["k_norm"]["scale"], rm_, Hk, spec.head_dim, 1,
                spec.norm_eps, true_dim=Hk * r_true,
            )
        q = q.reshape(B, 1, H, Rq)
        k = k.reshape(B, 1, Hk, Rq)
        v = v.reshape(B, 1, Hk, Rv)
        if spec.qk_norm:
            from modegpt_tpu.models.padded import _masked_rms_norm_truerank

            rm = p.get("rotary_mask")
            q = _masked_rms_norm_truerank(
                q, p["q_norm"]["scale"], rm, spec.group_size, spec.norm_eps, r_true
            )
            k = _masked_rms_norm_truerank(
                k, p["k_norm"]["scale"], rm, 1, spec.norm_eps, r_true
            )
        q = q.transpose(0, 2, 1, 3)  # [B, H, 1, Rq]
        k = k.transpose(0, 2, 1, 3)  # [B, Hk, 1, Rq]
        v = v.transpose(0, 2, 1, 3)

        # write PRE-rope k and v at the ring slot
        ck_l = lax.dynamic_update_slice(
            ck_l, k.astype(ck_l.dtype), (jnp.int32(0), jnp.int32(0), slot, jnp.int32(0))
        )
        cv_l = lax.dynamic_update_slice(
            cv_l, v.astype(cv_l.dtype), (jnp.int32(0), jnp.int32(0), slot, jnp.int32(0))
        )

        k_all, v_all = ck_l, cv_l  # [B, Hk, C, r]
        if spec.uses_rope:
            # q at its relative position; the whole PRE-rope cache
            # re-roped at its CURRENT relative positions
            rm = p.get("rotary_mask")
            q, _ = apply_rope(q, k, cos_q, sin_q, rm)
            _, k_all = apply_rope(k_all, k_all, cos_k, sin_k, rm)
        q_scale = (
            jnp.asarray(spec.query_pre_attn_scalar, jnp.float32)
            if spec.query_pre_attn_scalar is not None
            else r_true
        )
        q = q * lax.rsqrt(q_scale).astype(q.dtype)
        # grouped contraction — K/V stay at Hk heads (forward.gqa_scores)
        from modegpt_tpu.models.forward import _softcap, gqa_attend, gqa_scores

        scores = gqa_scores(q, k_all)

        scores = _softcap(scores.astype(jnp.float32), spec.attn_logit_softcap)
        v_mask = valid
        win = p.get("window")  # per-layer scanned window (mixed stacks)
        if win is not None:
            v_mask = v_mask & jnp.where(win > 0, g - p_global < win, True)
        scores = jnp.where(v_mask[None, None, None, :], scores, -jnp.inf)
        probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
        attn = gqa_attend(probs, v_all)
        attn = attn.transpose(0, 2, 1, 3).reshape(B, 1, H * Rv)
        a_out = _linear(attn, p["o"])
        if spec.post_norms:
            a_out = _norm(a_out, p["post_attn_norm"], spec.norm, spec.norm_eps)
        x = residual + a_out
        if not pre_ln:
            x = _norm(x, p["attn_norm"], spec.norm, spec.norm_eps)

        residual = x
        x_ln2 = (
            _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)
            if (pre_ln and spec.pre_norms)
            else x
        )
        def _moe_out(x_in):
            from modegpt_tpu.models.forward import _moe_mlp

            y, _, _ = _moe_mlp(spec, p, x_in, False)
            return y

        def _dense_out(x_in):
            if spec.gated_mlp:
                h = _act(_linear(x_in, p["gate"]), spec.act) * _linear(x_in, p["up"])
            else:
                h = _act(_linear(x_in, p["up"]), spec.act)
            m_out = _linear(h, p["down"])
            if spec.post_norms:
                m_out = _norm(m_out, p["post_mlp_norm"], spec.norm, spec.norm_eps)
            return m_out

        is_moe_leaf = p.get("is_moe")
        if spec.n_experts and is_moe_leaf is not None:
            # mixed dense/MoE stack (padded.py pad_to_uniform): the
            # scanned flag picks the live branch per layer
            x = residual + lax.cond(is_moe_leaf, _moe_out, _dense_out, x_ln2)
        elif spec.is_moe_layer(0):
            x = residual + _moe_out(x_ln2)
        else:
            x = residual + _dense_out(x_ln2)
        if not pre_ln:
            x = _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)
        return x, (ck_l, cv_l)

    x, (ck, cv) = lax.scan(body, x, (layers, q_hd_true, ck, cv))
    logits = _unembed(spec, other, x)
    return logits[:, -1, :], ck, cv


@partial(jax.jit, static_argnames=("spec", "max_new_tokens", "window", "n_sink"))
def _streaming_generate_jit(
    spec, layers, other, q_hd_true, prompt_ids, max_new_tokens: int,
    window: int, n_sink: int, eos_token_id,
):
    B, P = prompt_ids.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    C = window
    Rq = spec.q_ranks[0] // H
    Rv = spec.v_ranks[0] // Hk
    dtype = other["embed_tokens"].dtype
    L = spec.n_layers
    ck0 = jnp.zeros((L, B, Hk, C, Rq), dtype)
    cv0 = jnp.zeros((L, B, Hk, C, Rv), dtype)

    # prompt feeds one token at a time through the SAME step program
    # (streaming has no fixed prefill shape — the prompt may exceed the
    # window, in which case its head is evicted like any other token).
    def feed(carry, tok):
        ck, cv, g, _ = carry
        logits, ck, cv = _stream_step(
            spec, layers, other, q_hd_true, tok, ck, cv, g, n_sink
        )
        return (ck, cv, g + 1, logits), None

    (ck, cv, g, logits), _ = lax.scan(
        feed,
        (ck0, cv0, jnp.asarray(0, jnp.int32), jnp.zeros((B, spec.vocab_size), dtype)),
        prompt_ids.T,
    )

    def step(carry, _):
        ck, cv, g, logits, done = carry
        token = jnp.argmax(logits, axis=-1).astype(prompt_ids.dtype)
        if eos_token_id is not None:
            token = jnp.where(done, eos_token_id, token)
            done = done | (token == eos_token_id)
        logits, ck, cv = _stream_step(
            spec, layers, other, q_hd_true, token, ck, cv, g, n_sink
        )
        return (ck, cv, g + 1, logits, done), token

    done0 = jnp.zeros((B,), bool)
    (_, _, _, _, _), tokens = lax.scan(
        step, (ck, cv, g, logits, done0), None, length=max_new_tokens
    )
    return tokens.T  # [B, max_new_tokens]


def streaming_generate(
    pm: PaddedModel,
    prompt_ids,
    max_new_tokens: int = 32,
    window: int = 256,
    n_sink: int = 4,
    eos_token_id: Optional[int] = None,
):
    """Greedy generation with O(window) memory for unbounded streams.

    Within the window (prompt + new <= window) the output equals plain
    greedy decoding exactly; beyond it, the oldest non-sink tokens are
    evicted (StreamingLLM semantics — lossy by design). One compiled
    dispatch for the whole stream.
    """
    prompt_ids = jnp.asarray(prompt_ids)
    if n_sink >= window:
        raise ValueError(f"n_sink ({n_sink}) must be < window ({window})")
    if window > pm.spec.max_position_embeddings:
        raise ValueError(
            f"window ({window}) exceeds max_position_embeddings "
            f"({pm.spec.max_position_embeddings})"
        )
    if not pm.spec.uses_rope and prompt_ids.shape[1] + max_new_tokens > window:
        # RoPE caches are position-free (keys re-roped at cache-relative
        # positions each step), so eviction keeps one consistent frame.
        # Learned-position archs (opt/gpt2) bake absolute positions into
        # the cached activations at feed time; after eviction the cache
        # would mix position frames. Exact within the window, so only
        # streams that can evict are rejected.
        raise ValueError(
            f"streaming beyond the window is unsupported for learned-position "
            f"arch {pm.spec.arch!r}: cached activations embed absolute "
            f"positions, which cannot be re-based after eviction "
            f"(prompt {prompt_ids.shape[1]} + max_new_tokens {max_new_tokens} "
            f"> window {window})"
        )
    eos = None if eos_token_id is None else jnp.asarray(eos_token_id, prompt_ids.dtype)
    tokens = _streaming_generate_jit(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, prompt_ids,
        max_new_tokens, window, n_sink, eos,
    )
    return np.asarray(jnp.concatenate([prompt_ids, tokens], axis=1))
