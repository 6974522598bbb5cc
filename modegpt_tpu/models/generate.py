"""Autoregressive generation with a KV cache for compressed models.

The reference relies on HF `generate` through its vendored Rebuild
classes (reference: src/patchers/LlamaRebuild.py:343-348 KV-cache update
inside the compressed attention; OPTRebuild likewise). Here generation is
a jitted single-token decode step over a preallocated static-shape KV
cache — per-layer cache shapes follow the heterogeneous compressed ranks,
and masked RoPE is applied at the decode position through each layer's
rotary mask.

Design notes (TPU):
* static cache of max_len, updated with `lax.dynamic_update_slice` —
  no shape changes across steps, so the decode step compiles once;
* prefill runs the full forward once and writes the cache in one shot;
* sampling is greedy or temperature/top-k with a threaded PRNG key.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from modegpt_tpu.models.forward import _act, _linear, _norm
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.rope import masked_head_rms_norm, rope_cos_sin

__all__ = ["KVCache", "init_cache", "prefill", "decode_step", "generate"]


class KVCache(NamedTuple):
    """Per-layer key/value caches, lists of [B, Hk, max_len, r]."""

    k: Tuple[jax.Array, ...]
    v: Tuple[jax.Array, ...]
    length: jax.Array  # current filled length (scalar int32)


def init_cache(spec: ModelSpec, batch: int, max_len: int, dtype=jnp.float32) -> KVCache:
    ks, vs = [], []
    for l in range(spec.n_layers):
        r_k = spec.k_ranks[l] // spec.n_kv_heads
        r_v = spec.v_ranks[l] // spec.n_kv_heads
        ks.append(jnp.zeros((batch, spec.n_kv_heads, max_len, r_k), dtype=dtype))
        vs.append(jnp.zeros((batch, spec.n_kv_heads, max_len, r_v), dtype=dtype))
    return KVCache(k=tuple(ks), v=tuple(vs), length=jnp.asarray(0, jnp.int32))


def _rope_at(cos, sin, rotary_mask, q, k, group):
    """Apply (masked) RoPE given per-position cos/sin [T, hd]."""
    from modegpt_tpu.ops.rope import apply_rope

    return apply_rope(q, k, cos, sin, rotary_mask)


def _layer_step(spec, layer_idx, p, x, cos, sin, cache_k, cache_v, pos, max_len):
    """One decoder layer over new tokens x [B, S, d], reading/writing the
    cache at offset `pos`. Returns (x_out, new_cache_k, new_cache_v)."""
    B, S, _ = x.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[layer_idx] // H
    v_hd = spec.v_ranks[layer_idx] // Hk
    rotary_mask = p.get("rotary_mask")

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

        q = masked_flat_rms_norm(
            q, p["q_norm"]["scale"], rotary_mask, H, spec.head_dim,
            spec.group_size, spec.norm_eps,
        )
        k = masked_flat_rms_norm(
            k, p["k_norm"]["scale"], rotary_mask, Hk, spec.head_dim, 1, spec.norm_eps
        )
    q = q.reshape(B, S, H, q_hd)
    k = k.reshape(B, S, Hk, q_hd)
    v = v.reshape(B, S, Hk, v_hd)

    if spec.qk_norm:
        q = masked_head_rms_norm(q, p["q_norm"]["scale"], rotary_mask, spec.group_size, spec.norm_eps)
        k = masked_head_rms_norm(k, p["k_norm"]["scale"], rotary_mask, 1, spec.norm_eps)

    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if spec.uses_rope:
        q, k = _rope_at(cos, sin, rotary_mask, q, k, spec.group_size)

    zero = jnp.asarray(0, pos.dtype)
    cache_k = lax.dynamic_update_slice(cache_k, k.astype(cache_k.dtype), (zero, zero, pos, zero))
    cache_v = lax.dynamic_update_slice(cache_v, v.astype(cache_v.dtype), (zero, zero, pos, zero))

    # Attend over the filled prefix [0, pos+S). K/V stay at Hk heads —
    # grouped contraction, no repeated cache copy (forward.gqa_scores).
    k_all = cache_k
    v_all = cache_v
    scaling = (
        spec.query_pre_attn_scalar**-0.5
        if spec.query_pre_attn_scalar is not None
        else q_hd**-0.5
    )
    from modegpt_tpu.models.forward import _softcap, gqa_attend, gqa_scores

    scores = gqa_scores(q, k_all) * scaling

    scores = _softcap(scores.astype(jnp.float32), spec.attn_logit_softcap)
    t_ids = jnp.arange(max_len, dtype=jnp.int32)[None, :]
    s_ids = pos + jnp.arange(S, dtype=jnp.int32)[:, None]
    mask = t_ids <= s_ids  # causal within cache coordinates
    if spec.layer_types and spec.layer_types[layer_idx] == "sliding_attention":
        mask = mask & (t_ids > s_ids - spec.sliding_window)
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    attn = gqa_attend(probs, v_all)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, H * v_hd)
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
    if spec.is_moe_layer(layer_idx):
        from modegpt_tpu.models.forward import _moe_mlp

        y, _, _ = _moe_mlp(spec, p, x_ln2, False)
        x = residual + y
    else:
        if spec.gated_mlp:
            h = _act(_linear(x_ln2, p["gate"]), spec.act) * _linear(x_ln2, p["up"])
        else:
            h = _act(_linear(x_ln2, p["up"]), spec.act)
        m_out = _linear(h, p["down"])
        if spec.post_norms:
            m_out = _norm(m_out, p["post_mlp_norm"], spec.norm, spec.norm_eps)
        x = residual + m_out
    if not pre_ln:
        x = _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)
    return x, cache_k, cache_v


@partial(jax.jit, static_argnames=("spec", "max_len"), donate_argnames=("cache",))
def _model_step(spec: ModelSpec, params: Dict, tokens: jax.Array, cache: KVCache, max_len: int):
    """Run new tokens [B, S] through the model, updating the cache."""
    B, S = tokens.shape
    pos = cache.length
    from modegpt_tpu.models.forward import _scale_embed

    x = _scale_embed(spec, params["embed_tokens"][tokens])
    if spec.arch in ("opt", "gpt2"):
        if "project_in" in params:
            x = _linear(x, params["project_in"])
        positions = pos + jnp.arange(S, dtype=jnp.int32) + spec.position_offset
        x = x + params["embed_positions"][positions][None, :, :]

    cos = sin = None
    if spec.uses_rope:
        cos, sin = rope_cos_sin(
            pos + jnp.arange(S, dtype=jnp.int32), spec.head_dim, spec.rope_theta, dtype=x.dtype,
            scaling=spec.rope_scaling,
        )

    new_k, new_v = [], []
    for l in range(spec.n_layers):
        x, ck, cv = _layer_step(
            spec, l, params["layers"][l], x, cos, sin, cache.k[l], cache.v[l], pos, max_len
        )
        new_k.append(ck)
        new_v.append(cv)

    if params.get("final_norm") is not None:
        x = _norm(x, params["final_norm"], spec.norm, spec.norm_eps)
    if "project_out" in params:
        x = _linear(x, params["project_out"])
    if params.get("lm_head") is not None:
        logits = _linear(x, params["lm_head"])
    else:
        logits = x @ params["embed_tokens"].T
    from modegpt_tpu.models.forward import _softcap

    logits = _softcap(logits, spec.final_logit_softcap)
    return logits, KVCache(k=tuple(new_k), v=tuple(new_v), length=pos + S)


def prefill(spec, params, prompt_ids, cache):
    """Process the prompt; returns (last-position logits, cache)."""
    max_len = cache.k[0].shape[2]
    logits, cache = _model_step(spec, params, prompt_ids, cache, max_len)
    return logits[:, -1, :], cache


def decode_step(spec, params, token, cache):
    """One-token decode. token: [B, 1]."""
    max_len = cache.k[0].shape[2]
    logits, cache = _model_step(spec, params, token, cache, max_len)
    return logits[:, -1, :], cache


def apply_repetition_penalty(logits, presence, penalty: float):
    """CTRL-style repetition penalty (HF RepetitionPenaltyLogitsProcessor):
    for tokens marked in `presence` [..., V], positive logits divide by
    the penalty and negative ones multiply — both push the probability
    down for penalty > 1. Applied BEFORE temperature, like HF."""
    penalised = jnp.where(logits > 0, logits / penalty, logits * penalty)
    return jnp.where(presence, penalised, logits)


def sample_rows(logits, key, samp, presence=None, keys=None, gen_counts=None):
    """Per-ROW sampling for mixed-request serving: `samp` [S, 5] (or
    [S, 7]) f32 carries (temperature, top_k, top_p, min_p,
    repetition_penalty[, presence_penalty, frequency_penalty]) for
    each row, all TRACED — one compiled program serves any mix of
    greedy and sampled requests (``_sample``'s knobs are static, so it
    compiles one program per knob combination instead).

    With the 7-column form and `gen_counts` [S, V] (per-row GENERATED
    token counts — prompt tokens excluded, the OpenAI definition),
    rows apply the additive OpenAI penalties after the multiplicative
    repetition penalty: ``logits - presence_penalty * (count > 0)
    - frequency_penalty * count``. Off-sentinel 0.0 for both.

    With `keys` [S] (a PRNG key array) each row draws from its OWN key
    instead of the shared `key` — per-request seeded sampling: a row's
    stream then depends only on its key and its logits, not on which
    other requests share the batch.

    Row semantics match ``_sample`` exactly (same HF LogitsProcessor
    order: repetition penalty -> temperature -> top-k -> top-p ->
    min-p; identical tie-inclusive thresholds). Off-sentinels:
    temperature == 0 -> greedy argmax (penalty still applies, as in the
    serving decode step); top_k <= 0, top_p >= 1, min_p <= 0,
    penalty == 1 -> filter disabled for that row. All three filters
    keep a PREFIX of the probability-sorted vocabulary, so one shared
    descending sort serves them; when no row enables any filter the
    sort is skipped entirely (lax.cond), leaving greedy-only serving
    at argmax cost."""
    V = logits.shape[-1]
    logits = logits.astype(jnp.float32)
    temp = samp[:, 0:1]
    top_k, top_p, min_p, rep = samp[:, 1:2], samp[:, 2:3], samp[:, 3:4], samp[:, 4:5]
    if presence is not None:
        # penalty == 1 rows: divide/multiply by 1 is the identity; the
        # cond skips the two full-vocab passes when NO row penalises
        logits = lax.cond(
            jnp.any(rep != 1.0),
            lambda x: apply_repetition_penalty(x, presence, rep),
            lambda x: x,
            logits,
        )
    if samp.shape[-1] >= 7 and gen_counts is not None:
        pp, fp = samp[:, 5:6], samp[:, 6:7]
        counts = gen_counts.astype(jnp.float32)
        logits = lax.cond(
            jnp.any((pp != 0.0) | (fp != 0.0)),
            lambda x: x - pp * (counts > 0.0) - fp * counts,
            lambda x: x,
            logits,
        )
    greedy = jnp.argmax(logits, axis=-1)
    scaled = logits / jnp.maximum(temp, 1e-6)

    def _filtered(x):
        sorted_desc = jnp.flip(jnp.sort(x, axis=-1), axis=-1)
        rank = jnp.arange(V, dtype=jnp.float32)[None, :]
        # every filter keeps at least the top sorted token (rank 0),
        # like HF's min_tokens_to_keep=1 — degenerate knobs (top_p=0,
        # min_p>=1) reduce to argmax instead of an all--inf row
        first = rank == 0
        valid = jnp.where(top_k > 0, (rank < top_k) | first, True)
        probs = jax.nn.softmax(jnp.where(valid, sorted_desc, -jnp.inf), axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        valid = valid & jnp.where(top_p < 1.0, ((cum - probs) < top_p) | first, True)
        probs = jax.nn.softmax(jnp.where(valid, sorted_desc, -jnp.inf), axis=-1)
        # sorted descending => probs[:, :1] is each row's max prob
        valid = valid & jnp.where(
            min_p > 0.0, (probs >= min_p * probs[:, :1]) | first, True
        )
        thr = jnp.min(jnp.where(valid, sorted_desc, jnp.inf), axis=-1, keepdims=True)
        return jnp.where(x < thr, -jnp.inf, x)

    any_filter = jnp.any((top_k > 0) | (top_p < 1.0) | (min_p > 0.0))
    final = lax.cond(any_filter, _filtered, lambda x: x, scaled)
    if keys is not None:
        sampled = jax.vmap(lambda k, lg: jax.random.categorical(k, lg))(keys, final)
    else:
        sampled = jax.random.categorical(key, final, axis=-1)
    return jnp.where(temp[:, 0] == 0.0, greedy, sampled).astype(jnp.int32)


def _sample(
    logits,
    key,
    temperature: float,
    top_k: Optional[int],
    top_p: Optional[float] = None,
    min_p: Optional[float] = None,
):
    """Sample (or argmax) next tokens from [..., V] logits.

    Filter order matches HF's LogitsProcessor chain: temperature ->
    top-k -> top-p (nucleus: smallest set with cumulative probability
    >= top_p) -> min-p (drop tokens below min_p * max-prob). All knobs
    are static, so each combination is its own compiled program.
    """
    if temperature == 0.0:
        return jnp.argmax(logits, axis=-1)
    logits = logits.astype(jnp.float32) / temperature
    if top_k is not None:
        vals, _ = lax.top_k(logits, top_k)
        logits = jnp.where(logits < vals[..., -1:], -jnp.inf, logits)
    if top_p is not None and top_p < 1.0:
        sorted_desc = jnp.flip(jnp.sort(logits, axis=-1), axis=-1)
        probs = jax.nn.softmax(sorted_desc, axis=-1)
        cum = jnp.cumsum(probs, axis=-1)
        # keep a token if the cumulative mass BEFORE it is < top_p (the
        # minimal prefix whose mass reaches top_p survives); the top
        # token always survives (HF min_tokens_to_keep=1 — top_p=0
        # degenerates to argmax, not an all--inf row)
        keep = (cum - probs) < top_p
        keep = keep | (jnp.arange(keep.shape[-1]) == 0)
        thr = jnp.min(
            jnp.where(keep, sorted_desc, jnp.inf), axis=-1, keepdims=True
        )
        logits = jnp.where(logits < thr, -jnp.inf, logits)
    if min_p is not None and min_p > 0.0:
        probs = jax.nn.softmax(logits, axis=-1)
        pmax = jnp.max(probs, axis=-1, keepdims=True)
        # tokens tied at pmax always survive (min_p >= 1 -> argmax)
        logits = jnp.where((probs < min_p * pmax) & (probs < pmax),
                           -jnp.inf, logits)
    return jax.random.categorical(key, logits, axis=-1)


def generate(
    spec: ModelSpec,
    params: Dict,
    prompt_ids,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    eos_token_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
    max_len: Optional[int] = None,
    top_p: Optional[float] = None,
    min_p: Optional[float] = None,
    repetition_penalty: Optional[float] = None,
):
    """Batched autoregressive generation. Returns [B, prompt+new] tokens.

    Sampling surface: temperature / top_k / top_p (nucleus) / min_p /
    repetition_penalty (CTRL-style over prompt + generated tokens; the
    presence mask lives on device — no host round-trips)."""
    prompt_ids = jnp.asarray(prompt_ids)
    B, P = prompt_ids.shape
    if max_len is None:
        max_len = P + max_new_tokens
    if key is None:
        key = jax.random.key(0)

    cache = init_cache(spec, B, max_len, dtype=params["embed_tokens"].dtype)
    logits, cache = prefill(spec, params, prompt_ids, cache)

    presence = None
    if repetition_penalty is not None and repetition_penalty != 1.0:
        presence = (
            jnp.zeros((B, spec.vocab_size), bool)
            .at[jnp.arange(B)[:, None], prompt_ids]
            .set(True)
        )

    out = [prompt_ids]
    done = jnp.zeros((B,), dtype=bool)
    token = None
    for _ in range(max_new_tokens):
        key, sub = jax.random.split(key)
        step_logits = logits
        if presence is not None:
            step_logits = apply_repetition_penalty(
                logits, presence, repetition_penalty
            )
        token = _sample(step_logits, sub, temperature, top_k, top_p, min_p)
        if eos_token_id is not None:
            token = jnp.where(done, eos_token_id, token)
            done = done | (token == eos_token_id)
        if presence is not None:
            presence = presence.at[jnp.arange(B), token].set(True)
        out.append(token[:, None])
        if eos_token_id is not None and bool(done.all()):
            break
        logits, cache = decode_step(spec, params, token[:, None], cache)
    return jnp.concatenate(out, axis=1)


@partial(jax.jit, static_argnames=("spec", "max_new_tokens", "temperature", "top_k"))
def generate_scan(
    spec: ModelSpec,
    params: Dict,
    prompt_ids: jax.Array,
    cache: KVCache,
    max_new_tokens: int,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    eos_token_id: Optional[jax.Array] = None,
    key: Optional[jax.Array] = None,
):
    """Whole-generation-in-one-dispatch: prefill + `lax.scan` over decode
    steps. The Python-loop `generate` dispatches one program per token —
    fine locally, but per-dispatch latency dominates on remote/tunneled
    hosts and in serving; this compiles once and runs the entire decode
    on-device. Post-eos positions emit eos (compute continues, masked).

    Returns [B, max_new_tokens] generated tokens.
    """
    max_len = cache.k[0].shape[2]
    if key is None:
        key = jax.random.key(0)

    logits, cache = _model_step(spec, params, prompt_ids, cache, max_len)
    logits = logits[:, -1, :]

    def step(carry, _):
        logits, cache, key, done = carry
        key, sub = jax.random.split(key)
        token = _sample(logits, sub, temperature, top_k)
        if eos_token_id is not None:
            token = jnp.where(done, eos_token_id, token)
            done = done | (token == eos_token_id)
        logits, cache = _model_step(spec, params, token[:, None], cache, max_len)
        return (logits[:, -1, :], cache, key, done), token

    B = prompt_ids.shape[0]
    done0 = jnp.zeros((B,), dtype=bool)
    (_, cache, _, _), tokens = jax.lax.scan(
        step, (logits, cache, key, done0), None, length=max_new_tokens
    )
    return tokens.T  # [B, max_new_tokens]
