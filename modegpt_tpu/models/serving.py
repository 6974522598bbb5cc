"""Serving core: ragged KV cache + continuous batching.

The reference has no serving stack at all (generation goes through HF
`generate` on the rebuilt checkpoint). This module provides the
TPU-native serving shape for compressed models:

* a SLOT-table KV cache — one fixed-shape cache pool
  ``[L, slots, Hk, max_len, R]`` over the padded-uniform stack
  (models/padded.py), with a per-slot length vector. Slots are the TPU
  answer to a paged cache: admission/eviction only flips host-side slot
  state and a length entry; no device reallocation ever happens, so the
  decode step compiles exactly once for the lifetime of the server;
* RAGGED batched decode — every active slot decodes one token per step
  at its own position (per-row `dynamic_update_slice` under `vmap`,
  per-row RoPE phases, per-row causal masks driven by the length
  vector). Finished/empty slots run masked (their compute is discarded),
  which keeps shapes static — the XLA tradeoff for zero recompilation;
* PREFILL into a slot — prompts are right-padded to a fixed bucket
  length so admission reuses one compiled program per bucket.

`ContinuousBatcher` wraps these into the standard serving loop: admit
from a queue into free slots, step all active slots together, emit
finished sequences. Greedy or temperature sampling.

Speculative serving (greedy-exact) runs INSIDE the batcher: with
``spec_decode="prompt_lookup"`` each slot drafts from its own history
(host n-gram match, no draft model); with ``spec_decode="draft"`` a
second slot-table pool runs a draft model (typically the
MoDeGPT-compressed child of the served dense model) with k scanned
draft steps per round. Either way one ragged (k+1)-position verify
forward commits 1..k+1 tokens per active slot per step — greedy-exact
at the logic level: every committed token is the argmax of a verify
forward over the same cache state, so CPU f32 output is identical to
plain greedy serving (tested). On TPU the verify program's bf16
matmuls ([slots, k+1] shapes) can flip near-tie argmaxes vs the
[slots, 1] decode program — same caveat as every cross-program greedy
comparison on bf16 hardware. Per-request acceptance telemetry lands
in ``batcher.stats``.

Cache sharding over a mesh follows the params: with Megatron TP the
Hk axis of the pool shards over "model" like the K/V projections, and
GSPMD propagates it through the decode step.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from modegpt_tpu.models.padded import PaddedModel, _model_step_padded
from modegpt_tpu.models.spec import ModelSpec

__all__ = [
    "ServeState",
    "init_serve_state",
    "prefill_slot",
    "decode_slots",
    "lookup_draft",
    "ContinuousBatcher",
]


class ServeState(NamedTuple):
    cache_k: jax.Array  # [L, slots, Hk, max_len, Rq] (int8 codes when quantized)
    cache_v: jax.Array  # [L, slots, Hk, max_len, Rv]
    lengths: jax.Array  # [slots] int32 — tokens currently in each slot
    last_token: jax.Array  # [slots] int32 — newest token per slot (undefined if empty)
    # int8 KV mode: per-(layer, slot, head, position) symmetric scales;
    # None = full-precision cache (the default).
    k_scale: Optional[jax.Array] = None  # [L, slots, Hk, max_len]
    v_scale: Optional[jax.Array] = None

    @property
    def scales(self):
        return None if self.k_scale is None else (self.k_scale, self.v_scale)


# Pool-row count at/below which "auto" uses the ragged kernel for PURE
# decode too. The r04 controlled sweep (bench_results/r04/decode_sweep,
# 6 pool sizes 4k..131k at 0.25 occupancy, fused decode steps) settled
# what the r03 two-point interpolation guessed at 32k: the XLA full-pool
# contraction wins PURE decode at EVERY measured pool size (ragged/xla
# step-time ratio 1.09 at 4k rising to 2.36 at 131k), at 0.85 occupancy
# (r03 serving_ab: 10.3 vs 27.4 ms) and with int8 KV as well — the
# ragged kernel's live-row-read advantage never overcomes its DMA-issue
# cost when every slot contributes exactly one query row. The r03
# serving_load 16k pair that suggested small-pool ragged decode was a
# CONFOUNDED end-to-end test (scheduler mix, most dispatches carried
# prefill); the controlled sweep overrides it. Ragged still wins
# multi-position prefill/mixed dispatches decisively (both measured
# load regimes), so auto remains a per-dispatch-type hybrid. 0 disables
# ragged pure decode entirely (the measured-best policy).
#
# This constant is the FALLBACK policy only: at serve start on TPU the
# batcher re-derives the pure-decode choice by timing the real fused
# decode program on this host (models/decode_probe.py), recorded per
# (device, pool geometry) — the constant applies when measurement is
# disabled, fails, or the serving is meshed.
AUTO_RAGGED_DECODE_POOL_ROWS = 0


def resolve_auto_decode_attn(slots: int, max_len: int, on_tpu: bool):
    """Resolve decode_attn='auto' to per-dispatch-type backends.

    Returns ``(decode_attn, prefill_attn)``. On TPU, the ragged-always
    rule applies to the SCHEDULER's prefill/mixed dispatches (they read
    only live cache rows; won the serving_load A/B in both measured
    regimes), while pure decode uses xla at every measured pool size
    (see AUTO_RAGGED_DECODE_POOL_ROWS and the r04 decode sweep).
    Speculative draft/verify dispatches are NOT scheduler prefill: the
    (k+1)-position verify attends the full pool exactly like decode, so
    both follow the decode rule (``decode_attn``), not the prefill
    rule. Off-TPU both resolve to xla — the interpret-mode kernel
    exists for tests, not speed."""
    if not on_tpu:
        return "xla", "xla"
    decode = "ragged" if slots * max_len <= AUTO_RAGGED_DECODE_POOL_ROWS else "xla"
    return decode, "ragged"


def init_serve_state(pm: PaddedModel, slots: int, max_len: int, dtype=jnp.float32,
                     kv_dtype: str = "model") -> ServeState:
    """kv_dtype: "model" (cache in `dtype`) or "int8" (quantized KV —
    halves cache HBM CAPACITY so 2x the slots/context fit; measured on
    v5e it does not speed decode, because the per-layer dequantised
    slab temp costs what the smaller reads save
    (bench_results/r02/serving_carry.json). ~0.4% per-vector rounding
    error; outputs no longer bit-exact vs full precision)."""
    spec = pm.spec
    Rq = spec.q_ranks[0] // spec.n_heads
    Rv = spec.v_ranks[0] // spec.n_kv_heads
    L, Hk = spec.n_layers, spec.n_kv_heads
    quant = kv_dtype == "int8"
    cdt = jnp.int8 if quant else dtype
    return ServeState(
        cache_k=jnp.zeros((L, slots, Hk, max_len, Rq), dtype=cdt),
        cache_v=jnp.zeros((L, slots, Hk, max_len, Rv), dtype=cdt),
        lengths=jnp.zeros((slots,), jnp.int32),
        last_token=jnp.zeros((slots,), jnp.int32),
        k_scale=jnp.zeros((L, slots, Hk, max_len), jnp.float32) if quant else None,
        v_scale=jnp.zeros((L, slots, Hk, max_len), jnp.float32) if quant else None,
    )


def _step_cache(spec, layers, other, q_hd_true, tokens, lengths,
                cache_k, cache_v, scales, **kw):
    """_model_step_padded with optional int8-KV scales; returns
    (logits, ck, cv, ks, vs) with ks/vs None in full precision."""
    out = _model_step_padded.__wrapped__(
        spec, layers, other, q_hd_true, tokens, cache_k, cache_v, lengths,
        cache_scales=scales, **kw,
    )
    if scales is None:
        logits, ck, cv, _ = out
        return logits, ck, cv, None, None
    logits, ck, cv, _, (ks, vs) = out
    return logits, ck, cv, ks, vs


def _chosen_logprob(raw_logits, nxt, want_lp: bool):
    """Log-probability of the chosen tokens under the RAW model
    distribution (before penalty/temperature/filters — what the model
    believed, not what the sampler drew from). raw_logits [..., V],
    nxt [...] (any leading shape). Gated by the static `want_lp` so
    the full-vocab log_softmax pass (a real HBM cost at large V) only
    exists in programs serving a logprobs request."""
    if not want_lp:
        return jnp.zeros(nxt.shape, jnp.float32)
    lp = jax.nn.log_softmax(raw_logits.astype(jnp.float32), axis=-1)
    return jnp.take_along_axis(lp, nxt[..., None], axis=-1)[..., 0]


# device-side top-logprobs width: one static size keeps this a single
# program variant (like want_lp); OpenAI caps top_logprobs at 20 and
# the host slices each request's smaller k out of the fetched rows
TOP_LP_K = 20


def _top_logprobs(raw_logits, top_lp: bool):
    """Top-TOP_LP_K raw-model (token, logprob) rows per position —
    OpenAI `top_logprobs`. Gated by the static `top_lp` flag exactly
    like want_lp; off returns zero-width arrays so the pytree shape is
    stable. raw_logits [..., V] -> (ids [..., K] i32, lps [..., K])."""
    if not top_lp:
        shape = raw_logits.shape[:-1] + (0,)
        return (jnp.zeros(shape, jnp.int32), jnp.zeros(shape, jnp.float32))
    k = min(TOP_LP_K, raw_logits.shape[-1])
    lp = jax.nn.log_softmax(raw_logits.astype(jnp.float32), axis=-1)
    top_lps, top_ids = lax.top_k(lp, k)
    return top_ids.astype(jnp.int32), top_lps


@partial(
    jax.jit,
    static_argnames=(
        "spec", "temperature", "moe", "moe_capacity", "top_p", "min_p", "rep_penalty",
        "want_lp", "top_lp", "decode_attn", "tp",
    ),
    donate_argnames=("state",),
)
def _prefill_chunk_jit(spec, layers, other, q_hd_true, state: ServeState, slot: jax.Array,
                       chunk: jax.Array, pos0: jax.Array, real_len: jax.Array,
                       commit: jax.Array, temperature: float, key: jax.Array,
                       moe: str = "dense", moe_capacity: float = 2.0,
                       top_p=None, min_p=None, rep_penalty=None, presence=None,
                       samp=None, want_lp: bool = False, top_lp: bool = False,
                       seed_keys=None,
                       allow=None, bias=None, decode_attn: str = "xla", tp=None):
    """Run one prompt chunk [1, bucket] through `slot` at offset pos0
    (traced slot index — one compiled program serves every slot and every
    chunk). When `commit` is set (final chunk), the next token is sampled
    from the chunk's last REAL position (same temperature policy as the
    decode steps). With `samp` [slots, 5] (per-request sampling mode)
    the slot's own traced knob row drives the commit sample instead of
    the static knobs — see generate.sample_rows. With `allow`
    [slots, V] bool (guided decoding, models/guided.py) the slot's row
    masks disallowed tokens to -inf before the commit sample; logprobs
    stay raw-model (pre-mask).

    Returns (state, lp, tids, tlps) — lp is the committed token's
    raw-model logprob (zeros unless want_lp); tids/tlps [K] its
    top-TOP_LP_K alternatives (zero-width unless top_lp)."""
    from modegpt_tpu.models.generate import _sample, sample_rows

    ck = lax.dynamic_slice_in_dim(state.cache_k, slot, 1, axis=1)
    cv = lax.dynamic_slice_in_dim(state.cache_v, slot, 1, axis=1)
    scales = None
    if state.k_scale is not None:
        scales = (
            lax.dynamic_slice_in_dim(state.k_scale, slot, 1, axis=1),
            lax.dynamic_slice_in_dim(state.v_scale, slot, 1, axis=1),
        )
    # padded tail positions beyond the chunk's real length must not claim
    # dispatch-MoE expert capacity
    tail_valid = (jnp.arange(chunk.shape[1], dtype=jnp.int32) < real_len)[None, :]
    logits, ck, cv, ks, vs = _step_cache(
        spec, layers, other, q_hd_true, chunk, pos0, ck, cv, scales,
        moe=moe, moe_capacity=moe_capacity, token_valid=tail_valid,
        decode_attn=decode_attn, tp=tp,
    )
    last_logits = logits[0, real_len - 1][None]
    raw_logits = last_logits
    if allow is not None:
        row_allow = lax.dynamic_slice_in_dim(allow, slot, 1, axis=0)
        last_logits = jnp.where(row_allow, last_logits, -jnp.inf)
    if bias is not None:
        row_bias = lax.dynamic_slice_in_dim(bias, slot, 1, axis=0)
        last_logits = last_logits + row_bias.astype(last_logits.dtype)
    if samp is not None:
        row_samp = lax.dynamic_slice_in_dim(samp, slot, 1, axis=0)
        row_pres = (
            None if presence is None
            else lax.dynamic_index_in_dim(presence, slot, axis=0, keepdims=True)
        )
        rk = None
        if seed_keys is not None:
            # the prefill commit is the request's draw #0
            rk = _row_keys(seed_keys[slot][None], jnp.zeros((1,), jnp.int32))
        nxt = sample_rows(last_logits, key, row_samp, row_pres, keys=rk)[0]
    else:
        if rep_penalty is not None:
            from modegpt_tpu.models.generate import apply_repetition_penalty

            row = lax.dynamic_index_in_dim(presence, slot, axis=0, keepdims=True)
            last_logits = apply_repetition_penalty(last_logits, row, rep_penalty)
        nxt = _sample(
            logits=last_logits, key=key, temperature=temperature, top_k=None,
            top_p=top_p, min_p=min_p,
        )[0].astype(jnp.int32)
    lp = _chosen_logprob(raw_logits, nxt[None], want_lp)[0]
    tids, tlps = _top_logprobs(raw_logits, top_lp)
    return ServeState(
        cache_k=lax.dynamic_update_index_in_dim(state.cache_k, ck[:, 0], slot, axis=1),
        cache_v=lax.dynamic_update_index_in_dim(state.cache_v, cv[:, 0], slot, axis=1),
        lengths=state.lengths.at[slot].set(pos0 + real_len),
        last_token=jnp.where(
            commit, state.last_token.at[slot].set(nxt), state.last_token
        ),
        k_scale=None if ks is None else lax.dynamic_update_index_in_dim(
            state.k_scale, ks[:, 0], slot, axis=1
        ),
        v_scale=None if vs is None else lax.dynamic_update_index_in_dim(
            state.v_scale, vs[:, 0], slot, axis=1
        ),
    ), lp, tids[0], tlps[0]


@partial(
    jax.jit,
    static_argnames=(
        "spec", "temperature", "moe", "moe_capacity", "top_p", "min_p", "rep_penalty",
        "want_lp", "top_lp", "decode_attn", "tp",
    ),
    donate_argnames=("state", "presence", "gen_counts"),
)
def _prefill_slots_jit(spec, layers, other, q_hd_true, state: ServeState,
                       chunks: jax.Array, pos0: jax.Array, real_len: jax.Array,
                       commit: jax.Array, prefill_mask: jax.Array,
                       temperature: float, key: jax.Array,
                       moe: str = "dense", moe_capacity: float = 2.0,
                       top_p=None, min_p=None, rep_penalty=None, presence=None,
                       samp=None, want_lp: bool = False, top_lp: bool = False,
                       seed_keys=None, counts=None, gen_counts=None,
                       allow=None, bias=None, decode_attn: str = "xla", tp=None):
    """One prompt chunk for EVERY admitting slot in a single ragged
    dispatch: chunks [slots, bucket] at per-slot offsets pos0, with
    prefill_mask selecting the rows that are actually prefilling.

    This is ALSO the mixed prefill+decode program (Sarathi-style
    chunked-prefill piggyback, Batcher._mixed_round): a decode-active
    slot rides the same dispatch as a 1-token "chunk" (its last
    committed token at pos0 = its length, commit=True), so admission
    rounds never cost a second dispatch and decode never stalls behind
    long prompts. Committed rows' sampled tokens update the
    presence/gen_counts penalty pools ON DEVICE (masked by `commit`) —
    identical bookkeeping to _one_decode_step — and seeded rows fold
    their key with `counts` (each row's generated-so-far; still-
    prefilling rows are at draw #0).

    Per-slot-per-chunk dispatches cost a fixed host/tunnel latency
    each; an admission burst of N slots pays it N times per chunk
    round. This runs the whole slot table through one [slots, bucket]
    forward instead — non-prefilling rows are masked out of MoE
    capacity via token_valid and their cache writes land at/after
    their current length, which every later decode/verify step
    rewrites before attending (the same invariant _decode_slots_jit
    relies on for inactive rows). Greedy commits are identical to the
    per-slot path at the logic level (CPU f32 tested; TPU bf16 program
    variants can flip near-tie argmaxes — module docstring); sampled
    commits draw one shared key per round instead of one per slot
    (equally valid stream).

    moe="dispatch" caveat: expert capacity is derived from the
    dispatch's token count (forward._moe_mlp_dispatch), so the batched
    forward pools capacity ACROSS admitting slots where the per-slot
    path gave each slot its own pool — under capacity pressure the
    drop pattern (and thus output) can differ between the two prefill
    modes. Both are valid capacity-dispatch executions; use
    moe="dense" when exactness matters.

    Returns (state, next_token [slots], lp [slots], tids/tlps
    [slots, K], presence, gen_counts) — next_token/lp are meaningful
    for rows with commit set (their prompt finished this round, or
    they are decode piggyback rows); lp is the committed token's
    raw-model logprob (zeros unless want_lp), tids/tlps its
    top-TOP_LP_K alternatives (zero-width unless top_lp)."""
    from modegpt_tpu.models.generate import _sample, sample_rows

    S = chunks.shape[1]
    pos_arg = jnp.where(prefill_mask, pos0, state.lengths)
    tail_valid = (
        prefill_mask[:, None]
        & (jnp.arange(S, dtype=jnp.int32)[None, :] < real_len[:, None])
    )
    logits, ck, cv, ks, vs = _step_cache(
        spec, layers, other, q_hd_true, chunks, pos_arg,
        state.cache_k, state.cache_v, state.scales,
        moe=moe, moe_capacity=moe_capacity, token_valid=tail_valid,
        decode_attn=decode_attn, tp=tp,
    )
    idx = jnp.maximum(real_len - 1, 0)
    last_logits = jnp.take_along_axis(logits, idx[:, None, None], axis=1)[:, 0]
    raw_logits = last_logits
    if allow is not None:
        last_logits = jnp.where(allow, last_logits, -jnp.inf)
    if bias is not None:
        last_logits = last_logits + bias.astype(last_logits.dtype)
    if samp is not None:
        rk = None
        if seed_keys is not None:
            # each row's own draw index: generated-so-far for decode
            # piggyback rows, 0 for prefill commits (their first draw)
            cnt = jnp.zeros(commit.shape, jnp.int32) if counts is None else counts
            rk = _row_keys(seed_keys, cnt)
        nxt = sample_rows(last_logits, key, samp, presence, keys=rk,
                          gen_counts=gen_counts)
    else:
        if rep_penalty is not None:
            from modegpt_tpu.models.generate import apply_repetition_penalty

            last_logits = apply_repetition_penalty(last_logits, presence, rep_penalty)
        nxt = _sample(
            logits=last_logits, key=key, temperature=temperature, top_k=None,
            top_p=top_p, min_p=min_p,
        ).astype(jnp.int32)
    lp = _chosen_logprob(raw_logits, nxt, want_lp)
    tids, tlps = _top_logprobs(raw_logits, top_lp)
    # committed rows' tokens enter the penalty pools exactly like a
    # decode step's (_one_decode_step) — `commit` is the active mask
    if presence is not None:
        n = nxt.shape[0]
        presence = presence.at[jnp.arange(n), nxt].set(
            commit | presence[jnp.arange(n), nxt]
        )
    if gen_counts is not None:
        n = nxt.shape[0]
        gen_counts = gen_counts.at[jnp.arange(n), nxt].add(
            commit.astype(jnp.int32)
        )
    return ServeState(
        cache_k=ck, cache_v=cv,
        lengths=jnp.where(prefill_mask, pos0 + real_len, state.lengths),
        last_token=jnp.where(commit, nxt, state.last_token),
        k_scale=ks, v_scale=vs,
    ), nxt, lp, tids, tlps, presence, gen_counts


@partial(jax.jit, donate_argnames=("state",))
def _adopt_prefix_jit(state: ServeState, src: jax.Array, dst: jax.Array,
                      new_len: jax.Array) -> ServeState:
    """Copy slot `src`'s whole cache row onto slot `dst` and set
    `dst`'s length to the adopted prefix length (prefix caching).

    Copying the FULL row instead of exactly `new_len` positions keeps
    this a single compiled program for every prefix length; positions
    >= new_len are stale garbage, but every later prefill/decode write
    for `dst` lands at >= new_len (its length is set here, before any
    masked-row write can use a stale smaller length), so they are
    rewritten before anything attends to them — the same invariant the
    batched prefill relies on for non-prefilling rows. src == dst
    (re-admitting a slot whose own previous prompt shares the prefix)
    is a harmless self-copy. One slot row is a tiny slice of the pool,
    so the copy is bandwidth-trivial next to the prefill compute it
    replaces."""
    row_k = lax.dynamic_index_in_dim(state.cache_k, src, axis=1)
    row_v = lax.dynamic_index_in_dim(state.cache_v, src, axis=1)
    return ServeState(
        cache_k=lax.dynamic_update_index_in_dim(state.cache_k, row_k, dst, axis=1),
        cache_v=lax.dynamic_update_index_in_dim(state.cache_v, row_v, dst, axis=1),
        lengths=state.lengths.at[dst].set(new_len),
        last_token=state.last_token,
        k_scale=None if state.k_scale is None else lax.dynamic_update_index_in_dim(
            state.k_scale, lax.dynamic_index_in_dim(state.k_scale, src, axis=1),
            dst, axis=1,
        ),
        v_scale=None if state.v_scale is None else lax.dynamic_update_index_in_dim(
            state.v_scale, lax.dynamic_index_in_dim(state.v_scale, src, axis=1),
            dst, axis=1,
        ),
    )


@partial(
    jax.jit,
    static_argnames=(
        "spec", "temperature", "top_k", "moe", "moe_capacity",
        "top_p", "min_p", "rep_penalty", "want_lp", "top_lp",
        "decode_attn", "tp",
    ),
    donate_argnames=("state", "presence", "gen_counts"),
)
def _decode_slots_jit(spec, layers, other, q_hd_true, state: ServeState, active: jax.Array,
                      temperature: float, top_k, key,
                      moe: str = "dense", moe_capacity: float = 2.0,
                      top_p=None, min_p=None, rep_penalty=None, presence=None,
                      samp=None, want_lp: bool = False, top_lp: bool = False,
                      seed_keys=None, counts=None, allow=None, bias=None,
                      gen_counts=None, decode_attn: str = "xla", tp=None):
    """One ragged decode step for ALL slots; inactive rows are masked
    (their length does not advance and their cache write lands at their
    current position, to be overwritten on reuse)."""
    return _one_decode_step(spec, layers, other, q_hd_true, state, active,
                            temperature, top_k, key, moe, moe_capacity,
                            top_p, min_p, rep_penalty, presence, samp, want_lp,
                            top_lp, seed_keys, counts, allow, bias, gen_counts,
                            decode_attn, tp)


def _row_keys(seed_keys, counts):
    """Per-row sampling keys for seeded serving: row s draws from
    fold_in(seed_keys[s], counts[s]) — a seeded request's stream
    depends only on its own seed and generated-token count, never on
    batch-mates or dispatch grouping."""
    return jax.vmap(jax.random.fold_in)(seed_keys, counts)


def _one_decode_step(spec, layers, other, q_hd_true, state: ServeState,
                     active: jax.Array, temperature: float, top_k, key,
                     moe: str, moe_capacity: float,
                     top_p=None, min_p=None, rep_penalty=None, presence=None,
                     samp=None, want_lp: bool = False, top_lp: bool = False,
                     seed_keys=None, counts=None, allow=None, bias=None,
                     gen_counts=None, decode_attn: str = "xla", tp=None):
    """THE decode step, shared by the single-dispatch and fused-scan
    programs so their step math cannot drift apart. With a repetition
    penalty, `presence` [slots, V] marks each slot's seen tokens; the
    step reads it for the penalty and records the sampled token. With
    `samp` [slots, 5] (per-request sampling mode) each row's traced
    knob row replaces the static knobs — one compiled program serves
    any mix of greedy and sampled slots (generate.sample_rows). With
    `allow` [slots, V] bool (guided decoding) each row's disallowed
    tokens are masked to -inf before sampling; the host computes the
    rows from every guided slot's automaton state BEFORE the step
    (models/guided.py), so the device sees a plain traced operand.
    With `bias` [slots, V] f32 (OpenAI logit_bias; also -inf EOS
    suppression for min_tokens) the row is ADDED to the logits before
    sampling. `gen_counts` [slots, V] int32 counts each slot's
    GENERATED tokens (prompt excluded) for the additive OpenAI
    presence/frequency penalties (sample_rows 7-column form); the step
    updates it like the presence pool. Logprobs stay raw-model
    (pre-mask, pre-bias). Returns (state, nxt, lp, tids, tlps,
    presence, gen_counts) — lp is the chosen token's raw-model logprob
    (zeros unless want_lp); tids/tlps are the top-TOP_LP_K raw-model
    alternatives (zero-width unless top_lp)."""
    from modegpt_tpu.models.generate import _sample, apply_repetition_penalty, sample_rows

    tokens = state.last_token[:, None]
    # [L, slots, ...] pools are the padded step's cache layout; per-row
    # lengths make the step ragged (models/padded.py _model_step_padded);
    # inactive slots' rows must not claim dispatch-MoE expert capacity
    logits, ck, cv, ks, vs = _step_cache(
        spec, layers, other, q_hd_true, tokens, state.lengths,
        state.cache_k, state.cache_v, state.scales,
        moe=moe, moe_capacity=moe_capacity, token_valid=active[:, None],
        decode_attn=decode_attn, tp=tp,
    )
    last_logits = logits[:, -1, :]
    raw_logits = last_logits
    if allow is not None:
        last_logits = jnp.where(allow, last_logits, -jnp.inf)
    if bias is not None:
        last_logits = last_logits + bias.astype(last_logits.dtype)
    if samp is not None:
        rk = None if seed_keys is None else _row_keys(seed_keys, counts)
        nxt = sample_rows(last_logits, key, samp, presence, keys=rk,
                          gen_counts=gen_counts)
    else:
        if rep_penalty is not None:
            last_logits = apply_repetition_penalty(last_logits, presence, rep_penalty)
        nxt = _sample(
            logits=last_logits, key=key, temperature=temperature, top_k=top_k,
            top_p=top_p, min_p=min_p,
        ).astype(jnp.int32)
    lp = _chosen_logprob(raw_logits, nxt, want_lp)
    tids, tlps = _top_logprobs(raw_logits, top_lp)
    if presence is not None:
        S = nxt.shape[0]
        presence = presence.at[jnp.arange(S), nxt].set(
            active | presence[jnp.arange(S), nxt]
        )
    if gen_counts is not None:
        S = nxt.shape[0]
        gen_counts = gen_counts.at[jnp.arange(S), nxt].add(
            active.astype(jnp.int32)
        )
    new_len = jnp.where(active, state.lengths + 1, state.lengths)
    new_last = jnp.where(active, nxt, state.last_token)
    return ServeState(cache_k=ck, cache_v=cv, lengths=new_len, last_token=new_last,
                      k_scale=ks, v_scale=vs), nxt, lp, tids, tlps, presence, gen_counts


@partial(
    jax.jit,
    static_argnames=("spec", "n_steps", "temperature", "top_k", "has_eos",
                     "moe", "moe_capacity", "top_p", "min_p", "rep_penalty",
                     "want_lp", "top_lp", "decode_attn", "tp"),
    donate_argnames=("state", "presence", "gen_counts"),
)
def _decode_slots_multi_jit(spec, layers, other, q_hd_true, state: ServeState,
                            active: jax.Array, budgets: jax.Array, eos: jax.Array,
                            n_steps: int, temperature: float, top_k, key,
                            has_eos: bool = False,
                            moe: str = "dense", moe_capacity: float = 2.0,
                            top_p=None, min_p=None, rep_penalty=None, presence=None,
                            samp=None, want_lp: bool = False, top_lp: bool = False,
                            seed_keys=None, counts=None, bias=None,
                            gen_counts=None, decode_attn: str = "xla", tp=None):
    """`n_steps` ragged decode steps in ONE dispatch (lax.scan over
    steps). Each step runs the same `_one_decode_step` the
    single-dispatch program uses; the per-slot active/budget/EOS
    bookkeeping the batcher does on the host between single steps runs
    on device instead: a slot stops advancing the moment it emits EOS
    or exhausts its budget, so fusing never over-decodes.

    Output-equality caveat (same as every cross-program greedy
    comparison in this module, see the module docstring): the step
    LOGIC is identical to steps_per_dispatch=1 and CPU f32 outputs
    match exactly (tested), but on TPU this is a different compiled
    program whose bf16 matmul schedules can flip near-tie argmaxes vs
    the single-step program.

    Why fuse: every dispatch through a remote/tunneled host costs a
    fixed enqueue+sync latency that can exceed the decode step's device
    time severalfold; N steps per dispatch amortise it to 1/N per token
    (the host loop stays in charge of admission — it just runs every N
    tokens instead of every token).

    Returns (state, toks [n_steps, slots], lps [n_steps, slots],
    tids/tlps [n_steps, slots, K], emitted [n_steps, slots]):
    `emitted[i, s]` marks tokens the host should append; tokens after
    a slot's EOS/budget stop are garbage and masked False; lps are
    raw-model logprobs (zeros unless want_lp), tids/tlps the
    top-TOP_LP_K alternatives (zero-width unless top_lp)."""

    def body(carry, i):
        st, act, bud, k2, pres, gcnt = carry
        k2, sub = jax.random.split(k2)
        # seeded rows fold their own key with (generated count + step):
        # the stream advances one draw per emitted token, independent
        # of how steps are grouped into dispatches
        step_counts = None if counts is None else counts + i
        # `bias` is constant across fused steps — safe for logit_bias
        # (per-request constants); the batcher drops to single-step
        # rounds while any min_tokens suppression could EXPIRE mid-run.
        # gen_counts rides the carry, so additive penalties evolve
        # per step exactly like single-step dispatches
        st, nxt, lp, tids, tlps, pres, gcnt = _one_decode_step(
            spec, layers, other, q_hd_true, st, act,
            temperature, top_k, sub, moe, moe_capacity,
            top_p, min_p, rep_penalty, pres, samp,
            want_lp, top_lp, seed_keys, step_counts, None, bias, gcnt,
            decode_attn, tp)
        emitted = act
        bud = jnp.where(act, bud - 1, bud)
        act = act & (bud > 0)
        if has_eos:
            act = act & (nxt != eos)
        return (st, act, bud, k2, pres, gcnt), (nxt, lp, tids, tlps, emitted)

    (state, _, _, _, presence, gen_counts), (toks, lps, tids, tlps, emitted) = lax.scan(
        body, (state, active, budgets, key, presence, gen_counts),
        jnp.arange(n_steps, dtype=jnp.int32)
    )
    return state, toks, lps, tids, tlps, emitted, presence, gen_counts


@partial(
    jax.jit,
    static_argnames=("spec", "moe", "moe_capacity", "want_lp", "top_lp",
                     "decode_attn", "tp"),
    donate_argnames=("state",),
)
def _verify_slots_jit(spec, layers, other, q_hd_true, state: ServeState, active: jax.Array,
                      drafts: jax.Array, max_adv: jax.Array, eos,
                      moe: str = "dense", moe_capacity: float = 2.0,
                      want_lp: bool = False, top_lp: bool = False, allow=None,
                      decode_attn: str = "xla", tp=None):
    """One speculative VERIFY step for all slots: each active slot checks
    its k drafted tokens in a single ragged (k+1)-position forward
    (greedy; the accepted prefix is exactly what plain decode would have
    emitted, so serving output is unchanged — only steps/token drops).

    drafts [slots, k]; max_adv [slots] caps the commit at the slot's
    remaining budget. With `allow` [slots, k+1, V] bool (guided
    speculative serving) position j's logits are masked with the
    automaton state the HOST walked for the draft prefix drafts[:j] —
    the masked argmax at every accepted position equals what plain
    guided decode would emit, so guided output stays greedy-exact
    under speculation (logprobs stay raw-model, pre-mask). Returns
    (state, ttoks [slots, k+1], lps [slots, k+1], adv [slots],
    acc [slots]) — lps are the verify forward's raw-model logprobs of
    ttoks (zeros unless want_lp).
    Inactive slots do not advance; their cache writes land
    beyond their length and are overwritten before ever being attended
    (same argument as _decode_slots_jit)."""
    k = drafts.shape[1]
    window = jnp.concatenate([state.last_token[:, None], drafts], axis=1)  # [S, k+1]
    logits, ck, cv, ks, vs = _step_cache(
        spec, layers, other, q_hd_true, window, state.lengths,
        state.cache_k, state.cache_v, state.scales,
        moe=moe, moe_capacity=moe_capacity,
        token_valid=jnp.broadcast_to(active[:, None], window.shape),
        decode_attn=decode_attn, tp=tp,
    )
    raw_logits = logits
    if allow is not None:
        logits = jnp.where(allow, logits, -jnp.inf)
    ttoks = jnp.argmax(logits, axis=-1).astype(jnp.int32)  # [S, k+1]
    lps = _chosen_logprob(raw_logits, ttoks, want_lp)
    tids, tlps = _top_logprobs(raw_logits, top_lp)  # [S, k+1, K]
    match = drafts == ttoks[:, :k]
    acc = jnp.sum(jnp.cumprod(match.astype(jnp.int32), axis=1), axis=1)  # [S]
    adv = acc + 1
    if eos is not None:
        is_eos = ttoks == eos
        eos_pos = jnp.argmax(is_eos, axis=1).astype(jnp.int32)
        in_prefix = jnp.any(
            is_eos & (jnp.arange(k + 1, dtype=jnp.int32)[None, :] < adv[:, None]), axis=1
        )
        adv = jnp.where(in_prefix, jnp.minimum(adv, eos_pos + 1), adv)
    adv = jnp.where(active, jnp.minimum(adv, max_adv), 0)
    last = jnp.take_along_axis(ttoks, jnp.maximum(adv - 1, 0)[:, None], axis=1)[:, 0]
    return (
        ServeState(
            cache_k=ck, cache_v=cv,
            lengths=state.lengths + adv,
            last_token=jnp.where(adv > 0, last, state.last_token),
            k_scale=ks, v_scale=vs,
        ),
        ttoks, lps, tids, tlps, adv, jnp.where(active, acc, 0),
    )


@partial(
    jax.jit,
    static_argnames=("spec", "k", "moe", "moe_capacity", "decode_attn", "tp"),
    donate_argnames=("state",),
)
def _draft_slots_jit(spec, layers, other, q_hd_true, state: ServeState, active: jax.Array,
                     k: int, moe: str = "dense", moe_capacity: float = 2.0,
                     decode_attn: str = "xla", tp=None):
    """k greedy draft steps for all slots (lax.scan over the slot table)
    plus one cache-fill step so every drafted token's K/V is present
    (speculative.py invariant). Returns (state', dtoks [slots, k]) with
    state'.lengths UNCHANGED (= len0); the caller commits len0 + adv
    after verification."""
    len0 = state.lengths

    def step(carry, _):
        tok, ck, cv, scales, lens = carry
        logits, ck, cv, ks, vs = _step_cache(
            spec, layers, other, q_hd_true, tok[:, None], lens, ck, cv, scales,
            moe=moe, moe_capacity=moe_capacity, token_valid=active[:, None],
            decode_attn=decode_attn, tp=tp,
        )
        nxt = jnp.argmax(logits[:, -1, :], axis=-1).astype(jnp.int32)
        new_scales = None if ks is None else (ks, vs)
        return (nxt, ck, cv, new_scales, lens + 1), nxt

    carry = (state.last_token, state.cache_k, state.cache_v, state.scales, len0)
    (last, ck, cv, scales, lens), dtoks = lax.scan(step, carry, None, length=k)
    _, ck, cv, ks, vs = _step_cache(
        spec, layers, other, q_hd_true, last[:, None], lens, ck, cv, scales,
        moe=moe, moe_capacity=moe_capacity, token_valid=active[:, None],
        decode_attn=decode_attn, tp=tp,
    )
    return (
        ServeState(cache_k=ck, cache_v=cv, lengths=len0, last_token=state.last_token,
                   k_scale=ks, v_scale=vs),
        dtoks.T,
    )


@partial(jax.jit, donate_argnames=("state",))
def _commit_draft_cache_jit(state: ServeState, adv: jax.Array, last: jax.Array):
    """Roll the draft pool forward to the verified commit point."""
    return state._replace(
        lengths=state.lengths + adv,
        last_token=jnp.where(adv > 0, last, state.last_token),
    )


def lookup_draft(history, k: int, ngram: int) -> np.ndarray:
    """Host-side prompt-lookup drafting (Saxena 2023) over one slot's
    committed history: continuation after the most recent earlier match
    of the last `ngram` tokens; repeats of the last token when no match
    (the verify round then degenerates to one ordinary decode step)."""
    h = np.asarray(history, dtype=np.int32)
    n = h.shape[0]
    out = np.full((k,), h[-1] if n else 0, dtype=np.int32)
    if n <= ngram:
        return out
    tail = h[n - ngram :]
    for j in range(n - ngram - 1, -1, -1):
        if np.array_equal(h[j : j + ngram], tail):
            cont = h[j + ngram : j + ngram + k]
            out[: cont.shape[0]] = cont
            break
    return out


def prefill_slot(pm: PaddedModel, state: ServeState, slot: int, prompt_ids: np.ndarray,
                 bucket: int, temperature: float = 0.0,
                 key: Optional[jax.Array] = None, moe: str = "dense",
                 moe_capacity: float = 2.0) -> ServeState:
    """Admit a prompt into `slot`. Prompts longer than `bucket` are
    CHUNKED: each bucket-sized piece runs through the same compiled
    program at its offset, so arbitrarily long prompts reuse one program
    (chunked prefill)."""
    prompt_ids = np.asarray(prompt_ids, dtype=np.int32).reshape(-1)
    P = prompt_ids.shape[0]
    max_len = state.cache_k.shape[3]
    if P >= max_len:
        raise ValueError(f"prompt ({P} tokens) does not fit the cache (max_len {max_len})")
    if key is None:
        key = jax.random.key(0)
    slot_i = jnp.asarray(slot, jnp.int32)
    n_chunks = max(1, -(-P // bucket))
    for c in range(n_chunks):
        piece = prompt_ids[c * bucket : (c + 1) * bucket]
        real = piece.shape[0]
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :real] = piece
        state, _, _, _ = _prefill_chunk_jit(
            pm.spec, pm.layers, pm.other, pm.q_hd_true, state, slot_i,
            jnp.asarray(padded), jnp.asarray(c * bucket, jnp.int32),
            jnp.asarray(real, jnp.int32), jnp.asarray(c == n_chunks - 1),
            temperature, key, moe=moe, moe_capacity=moe_capacity,
        )
    return state


def decode_slots(pm: PaddedModel, state: ServeState, active: np.ndarray,
                 temperature: float = 0.0, top_k=None, key=None,
                 moe: str = "dense", moe_capacity: float = 2.0,
                 top_p=None, min_p=None):
    """One decode step across all slots. Returns (state, tokens [slots])."""
    if key is None:
        key = jax.random.key(0)
    state, nxt, _, _, _, _, _ = _decode_slots_jit(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, state,
        jnp.asarray(active), temperature, top_k, key, moe=moe,
        moe_capacity=moe_capacity, top_p=top_p, min_p=min_p,
    )
    return state, nxt


class ContinuousBatcher:
    """Host-side continuous batching over the slot table.

    submit() enqueues prompts; run() admits them into free slots, steps
    all active slots each iteration, and returns finished sequences.
    The device programs (one prefill per bucket + one decode step) are
    compiled once and reused for the server's lifetime.

    Prefill OVERLAPS decode: admission only records a slot's pending
    prompt chunks; each run() iteration processes at most
    ``prefill_chunks_per_step`` chunks (round-robin across admitting
    slots) before the decode step for already-active slots. A long
    prompt therefore never head-of-line-blocks decoding — the classic
    chunked-prefill scheduling (Sarathi/vLLM) on the slot table.

    Two dispatch-amortisation knobs (both greedy-output-identical,
    tested; both matter most when per-dispatch host latency is large):
    ``steps_per_dispatch=N`` fuses N decode steps into one device
    program with on-device budget/EOS stopping, and
    ``prefill_exec="batched"`` prefills every admitting slot's next
    chunk in one ragged [slots, bucket] dispatch per round.
    """

    def __init__(self, pm: PaddedModel, slots: int = 8, max_len: int = 512,
                 prefill_bucket: int = 64, eos_token_id: Optional[int] = None,
                 temperature: float = 0.0, moe: str = "dense",
                 moe_capacity: float = 2.0, prefill_chunks_per_step: int = 1,
                 spec_decode: str = "off", n_draft: int = 4,
                 lookup_ngram: int = 3, draft_pm: Optional[PaddedModel] = None,
                 kv_dtype: str = "model", steps_per_dispatch: int = 1,
                 prefill_exec: str = "per_slot",
                 top_p: Optional[float] = None, min_p: Optional[float] = None,
                 repetition_penalty: Optional[float] = None,
                 mesh=None, prefix_cache: bool = False,
                 per_request_sampling: bool = False,
                 decode_attn: str = "auto",
                 mixed_prefill_decode: bool = True,
                 a8_prefill: bool = False):
        self.pm = pm
        self.slots = slots
        self.max_len = max_len
        self.bucket = prefill_bucket
        self.eos = eos_token_id
        self.temperature = temperature
        # Sampling surface beyond temperature: nucleus (top_p), min-p,
        # and CTRL-style repetition penalty over each slot's prompt +
        # generated tokens (presence pool [slots, V] lives on device and
        # is updated inside the decode programs — no per-token host
        # traffic).
        self.top_p = top_p
        self.min_p = min_p
        self.rep_penalty = (
            None if repetition_penalty in (None, 1.0) else float(repetition_penalty)
        )
        # Per-REQUEST sampling: each submit() may carry its own
        # temperature/top_k/top_p/min_p/repetition_penalty (falling back
        # to the constructor knobs). Knobs live in a traced [slots, 5]
        # table (generate.sample_rows), so one compiled decode/prefill
        # program serves any mix of greedy and sampled requests — the
        # static-knob mode compiles one program per knob combination
        # instead. The presence pool is always allocated here because
        # any request may enable a penalty.
        self.per_request = per_request_sampling
        # columns: temperature, top_k, top_p, min_p, repetition_penalty,
        # presence_penalty, frequency_penalty (the last two are the
        # additive OpenAI penalties over GENERATED tokens, driven by the
        # gen_counts pool; per-request only)
        self._samp_default = np.asarray(
            [temperature, 0.0, top_p if top_p is not None else 1.0,
             min_p if min_p is not None else 0.0,
             self.rep_penalty if self.rep_penalty is not None else 1.0,
             0.0, 0.0],
            np.float32,
        )
        # off-sentinel rows (greedy, no filters) for idle slots so a
        # stale sampled row can't force the filter path on greedy steps
        self._samp_off = np.asarray([0.0, 0.0, 1.0, 0.0, 1.0, 0.0, 0.0],
                                    np.float32)
        self.samp = np.tile(self._samp_off, (slots, 1)) if per_request_sampling else None
        self.presence = (
            jnp.zeros((slots, pm.spec.vocab_size), bool)
            if self.rep_penalty is not None or per_request_sampling
            else None
        )
        # generated-token counts for the additive penalties (device-
        # resident, updated inside the decode programs like presence)
        self.gen_counts = (
            jnp.zeros((slots, pm.spec.vocab_size), jnp.int32)
            if per_request_sampling else None
        )
        if spec_decode != "off" and (top_p or min_p or self.rep_penalty
                                     or per_request_sampling):
            raise ValueError(
                "speculative serving is greedy-only: top_p/min_p/"
                "repetition_penalty/per_request_sampling are sampling "
                "knobs it cannot honour"
            )
        # MoE execution: "dense" (all experts on all tokens; exact) or
        # "dispatch" (capacity-based token dispatch; per-expert FLOPs
        # scale with capacity — see forward._moe_mlp_dispatch).
        self.moe = moe
        self.moe_capacity = moe_capacity
        self.prefill_chunks_per_step = prefill_chunks_per_step
        # Speculative decode inside the batcher: "prompt_lookup" drafts
        # from each slot's own history (no draft model), "draft" runs a
        # second slot-table pool for draft_pm. Greedy-exact: each verify
        # round commits exactly the tokens plain decode would have
        # emitted, it just commits up to n_draft+1 of them per step.
        if spec_decode not in ("off", "prompt_lookup", "draft"):
            raise ValueError(f"spec_decode must be off/prompt_lookup/draft, got {spec_decode!r}")
        if spec_decode != "off" and temperature != 0.0:
            raise ValueError("speculative serving is greedy-only (temperature 0)")
        if spec_decode == "draft" and draft_pm is None:
            raise ValueError("spec_decode='draft' needs draft_pm")
        self.spec_decode = spec_decode
        self.n_draft = n_draft
        self.lookup_ngram = lookup_ngram
        self.draft_pm = draft_pm
        if kv_dtype not in ("model", "int8"):
            raise ValueError(f"kv_dtype must be model or int8, got {kv_dtype!r}")
        self.kv_dtype = kv_dtype
        # Fused decode: >1 runs that many decode steps per device
        # dispatch (_decode_slots_multi_jit) whenever no slot is
        # prefilling — amortises per-dispatch host latency. Greedy
        # output matches steps_per_dispatch=1 at the logic level (the
        # programs share _one_decode_step; CPU f32 identical, TPU bf16
        # program variants can flip near-tie argmaxes); sampled runs
        # draw a different (equally valid) key stream. Admission and
        # prefill interleaving happen every dispatch, so a large value
        # trades new-request latency for decode throughput.
        if steps_per_dispatch < 1:
            raise ValueError(f"steps_per_dispatch must be >= 1, got {steps_per_dispatch}")
        if steps_per_dispatch > 1 and spec_decode != "off":
            raise ValueError("steps_per_dispatch > 1 requires spec_decode='off' "
                             "(speculative rounds already batch tokens per dispatch)")
        self.steps_per_dispatch = steps_per_dispatch
        # "batched" prefill runs ONE [slots, bucket] dispatch per chunk
        # round covering every admitting slot (vs one dispatch per slot
        # per chunk); prefill_chunks_per_step then counts ROUNDS, not
        # chunks. Greedy output matches per_slot at the logic level
        # (CPU f32 tested; TPU bf16 program variants can flip near-tie
        # argmaxes), EXCEPT under moe="dispatch" where expert capacity
        # pools across admitting slots — see _prefill_slots_jit.
        if prefill_exec not in ("per_slot", "batched"):
            raise ValueError(f"prefill_exec must be per_slot or batched, got {prefill_exec!r}")
        self.prefill_exec = prefill_exec
        # Mixed prefill+decode rounds (Sarathi-style piggyback): while
        # prompts are prefilling under prefill_exec="batched" (and
        # spec_decode is off), decode-active slots advance one token
        # INSIDE each batched prefill dispatch instead of in a separate
        # decode dispatch — halves the per-round dispatch floor during
        # admission and decode never stalls behind long prompts. Token
        # semantics are the single-step decode's (same sampling/pool
        # bookkeeping, per-row exact for seeded requests); only
        # scheduling changes.
        self.mixed_prefill_decode = mixed_prefill_decode
        # Decode attention: "xla" contracts each step over the FULL
        # [slots, Hk, max_len, R] pool (masked); "ragged" uses the
        # Pallas flash attention kernel whose cache reads scale with
        # each slot's live length (kernels/ragged_decode.py; covers
        # bf16 + int8 caches, sliding windows, softcap, and every
        # slot-table dispatch: decode, draft, prefill chunks and the
        # speculative multi-position verify).
        # "auto" resolves from the round-3 hardware captures — see
        # resolve_auto_decode_attn for the measured evidence and the
        # policy. Numerics differ in reduction order only; explicit
        # "xla"/"ragged" still forces one backend for every dispatch.
        if decode_attn not in ("auto", "xla", "ragged"):
            raise ValueError(f"decode_attn must be auto/xla/ragged, got {decode_attn!r}")
        if decode_attn == "auto":
            on_tpu = jax.default_backend() == "tpu"
            self.decode_attn, self.prefill_attn = resolve_auto_decode_attn(
                slots, max_len, on_tpu=on_tpu)
            # De-baked constant (VERDICT r4 weak-6): on TPU the pure-
            # decode choice comes from a per-environment MEASUREMENT of
            # the real fused decode program — recorded once per (device,
            # pool geometry), so later serve starts resolve in <1 ms
            # (models/decode_probe.py). The swept constant stays as the
            # fallback (probe failure, MODEGPT_DECODE_AUTO=policy) and
            # as the answer for meshed serving (the TP shard_map program
            # differs from what the probe times).
            if on_tpu and mesh is None:
                from modegpt_tpu.models.decode_probe import (
                    resolve_decode_attn_measured,
                )

                measured = resolve_decode_attn_measured(
                    pm, slots, max_len, kv_dtype)
                if measured is not None:
                    self.decode_attn = measured
        else:
            self.decode_attn = self.prefill_attn = decode_attn
        self.state = init_serve_state(pm, slots, max_len,
                                      dtype=pm.other["embed_tokens"].dtype,
                                      kv_dtype=kv_dtype)
        self.draft_state = (
            init_serve_state(draft_pm, slots, max_len,
                             dtype=draft_pm.other["embed_tokens"].dtype,
                             kv_dtype=kv_dtype)
            if spec_decode == "draft" else None
        )
        # Tensor-parallel serving: commit Megatron shardings on the
        # padded stack and the KV pools (cache Hk axis over "model");
        # the jitted step programs are unchanged — GSPMD propagates the
        # input shardings and inserts one psum per block.
        self.mesh = mesh
        if mesh is not None:
            from modegpt_tpu.parallel.mesh import shard_serving

            self.pm, self.state = shard_serving(mesh, self.pm, self.state)
            if self.draft_state is not None:
                self.draft_pm, self.draft_state = shard_serving(
                    mesh, self.draft_pm, self.draft_state
                )
        # W8A8 prefill: a zero-copy execution VIEW of the int8 model
        # whose projections re-key kernel_q -> kernel_qa, compiling the
        # prefill programs to dynamic-per-token-int8 activations and
        # int8 x int8 -> int32 MXU dots (2x the bf16 peak on v5e).
        # Prefill is the compute-bound half of serving; decode keeps the
        # weight-only program (memory-bound — both modes already share
        # the halved weight read). Under mixed_prefill_decode the
        # piggybacked decode rows inside a prefill dispatch execute W8A8
        # too — an explicit part of this opt-in's quality contract.
        # Identity on unquantized models (no kernel_q keys to re-key).
        self.a8_prefill = bool(a8_prefill)
        if self.a8_prefill:
            from modegpt_tpu.models.quantize import with_act_quant

            self.pm_pf = with_act_quant(self.pm)
            self.draft_pm_pf = (
                with_act_quant(self.draft_pm) if draft_pm is not None else None
            )
        else:
            self.pm_pf = self.pm
            self.draft_pm_pf = self.draft_pm if draft_pm is not None else None
        # ragged decode under TP needs the mesh at trace time: the
        # Pallas kernel is opaque to GSPMD, so _layer_padded wraps it in
        # shard_map over the "model" axis (head-local — no collectives
        # added). Static (mesh, axis) pair; None when single-device, TP
        # width 1, or the xla decode path (which GSPMD propagates fine).
        def _tp_for(attn):
            return (
                (mesh, "model")
                if (attn == "ragged" and mesh is not None
                    and "model" in mesh.axis_names and mesh.shape["model"] > 1)
                else None
            )

        self._tp = _tp_for(self.decode_attn)
        self._tp_prefill = _tp_for(self.prefill_attn)
        # Prefix caching: on admission, the longest bucket-aligned common
        # prefix between the new prompt and any slot's still-resident
        # prefilled prompt is ADOPTED (slot-row cache copy + skipping
        # those prefill chunks) instead of recomputed — the slot-table
        # answer to paged-attention prefix reuse, exact because KV for
        # identical tokens at identical positions is identical
        # (bit-identical on CPU f32 / same-program TPU; cross-program
        # bf16 caveats as in the module docstring). Opt-in.
        self.prefix_cache = prefix_cache
        # tokens whose KV is live in each slot's cache from a COMPLETED
        # prefill of its last prompt (decode appends after them; nothing
        # rewrites them until the slot is re-admitted)
        self.slot_prompt: List[Optional[np.ndarray]] = [None] * slots
        self.prefix_hits = 0  # prefill chunks skipped via adoption
        self.prefix_tokens_reused = 0
        # per-request speculative telemetry {rid: {rounds, drafted, accepted}}
        self.stats: Dict[int, Dict[str, int]] = {}
        # (req_id, prompt, max_new, samp_row-or-None, stop_seqs-or-None)
        self.queue: List[Tuple] = []
        self.slot_req: List[Optional[int]] = [None] * slots
        self.slot_out: List[List[int]] = [[] for _ in range(slots)]
        self.slot_budget = [0] * slots
        # per-request STOP sequences (host-side, exact): generation ends
        # the step the generated tail contains one, and the matched
        # tokens are excluded from the output (OpenAI `stop` semantics)
        self.slot_stop: List[Optional[List[List[int]]]] = [None] * slots
        self.slot_plen = [0] * slots  # prompt length per slot
        self.slot_scanned = [0] * slots  # generated tokens already stop-scanned
        # per-request LOGPROBS: raw-model logprob of each generated
        # token (pre-penalty/temperature — what the model believed).
        # The full-vocab log_softmax only exists in program variants
        # compiled with want_lp=True, selected per dispatch by whether
        # any resident request asked (static flag -> at most 2 cached
        # variants per program, no recompile churn).
        self.slot_want_lp = [False] * slots
        self.slot_lp: List[List[float]] = [[] for _ in range(slots)]
        # per-request TOP-LOGPROBS (OpenAI top_logprobs): requested k
        # per slot (0 = off) and the recorded (ids, lps) pair per
        # generated token; the device computes a fixed TOP_LP_K row in
        # the top_lp=True program variant, the host slices each
        # request's k
        self.slot_top_k = [0] * slots
        self.slot_top: List[List] = [[] for _ in range(slots)]
        # per-request SEED (per_request_sampling only): the row draws
        # from fold_in(key(seed), n_generated) instead of the shared
        # per-dispatch key, so a seeded request's sampled stream is a
        # function of (seed, its own prompt/knobs) alone — identical
        # whether it runs solo or beside arbitrary other traffic
        # (CPU f32 exact; TPU bf16 cross-program caveats as usual)
        self.slot_seed: List[Optional[int]] = [None] * slots
        # finished requests' logprob lists, keyed by rid (only for
        # requests that asked); collect like run() results
        self.logprobs: Dict[int, List[float]] = {}
        # finished requests' top-logprob lists: rid -> [(ids, lps), ...]
        self.top_logprobs: Dict[int, List] = {}
        # pending prompt chunks per slot: list of (piece, pos0, is_last);
        # non-empty = the slot is still PREFILLING (not decode-active)
        self.slot_chunks: List[List] = [[] for _ in range(slots)]
        # GUIDED decoding (models/guided.py): per-slot TokenGuide +
        # automaton state. The host recomputes each guided slot's
        # [V] allow row after every committed token; dispatches carrying
        # any guided slot ship the [slots, V] table as a traced operand
        # (one extra program variant, like presence/samp). The table is
        # allocated lazily on the first guided request.
        self.slot_guide: List[Optional[object]] = [None] * slots
        self.slot_gstate: List[int] = [0] * slots
        self._allow: Optional[np.ndarray] = None
        # per-request LOGIT BIAS (OpenAI logit_bias: {token_id: bias})
        # and MIN_TOKENS (EOS suppressed until that many tokens are
        # generated) ride one [slots, V] f32 bias table ADDED to the
        # logits before sampling; allocated lazily, shipped only in
        # dispatches where a resident request uses it (one program
        # variant, like allow/presence)
        self.slot_bias: List[Optional[Dict[int, float]]] = [None] * slots
        self.slot_min_tokens: List[int] = [0] * slots
        self._bias: Optional[np.ndarray] = None
        self._next_id = 0

    def submit(self, prompt_ids, max_new_tokens: int = 32,
               temperature: Optional[float] = None, top_k: Optional[int] = None,
               top_p: Optional[float] = None, min_p: Optional[float] = None,
               repetition_penalty: Optional[float] = None,
               presence_penalty: Optional[float] = None,
               frequency_penalty: Optional[float] = None,
               stop: Optional[List] = None, logprobs: bool = False,
               top_logprobs: int = 0,
               seed: Optional[int] = None, guide=None,
               logit_bias: Optional[Dict[int, float]] = None,
               min_tokens: int = 0) -> int:
        """Enqueue a prompt. The sampling kwargs are per-REQUEST
        overrides of the constructor knobs and need
        ``per_request_sampling=True`` (they land in the traced knob
        table, so no recompilation — generate.sample_rows). `stop` is
        one token-id sequence or a list of them: generation ends as
        soon as the generated tail contains one, with the matched
        tokens excluded from the output (host-side check — works with
        every execution mode including fused multi-step and
        speculative, which just over-generate into a freed slot).
        `logprobs=True` records each generated token's raw-model
        logprob, collected in ``batcher.logprobs[rid]`` on finish.
        `top_logprobs=k` (1..TOP_LP_K, OpenAI's cap) additionally
        records the top-k raw-model (token, logprob) alternatives per
        generated position, collected in ``batcher.top_logprobs[rid]``
        as a list of (ids, lps) pairs; implies logprobs recording. The
        device always computes TOP_LP_K rows when any resident request
        asks (one extra program variant, like want_lp) and the host
        slices each request's k.
        `seed` makes the request's sampled stream deterministic — a
        function of (seed, prompt, knobs) alone, independent of what
        other requests share the batch. `guide` is a
        models/guided.TokenGuide constraining the output to a grammar
        (regex / JSON schema / choice list): every sampled token is
        drawn from the guide's allowed set for its current automaton
        state, and EOS becomes reachable exactly when the state
        accepts. Guided requests force single-step decode rounds while
        resident (the next mask depends on the previous token); they
        compose with spec_decode='prompt_lookup' (host-repaired drafts
        + per-position verify masks, still guided-greedy-exact) but
        not 'draft'. `logit_bias` is an OpenAI
        {token_id: bias} dict added to the logits before sampling
        (works in both sampling modes — it is not a knob-table field);
        `min_tokens` suppresses EOS until that many tokens are
        generated (stop sequences still apply). Both are incompatible
        with speculative modes (the verify forward argmaxes raw
        logits)."""
        overrides = (temperature, top_k, top_p, min_p, repetition_penalty,
                     presence_penalty, frequency_penalty)
        if not self.per_request and (
            any(v is not None for v in overrides) or seed is not None
        ):
            raise ValueError(
                "per-request sampling kwargs need per_request_sampling=True "
                "(the static-knob mode bakes sampling into the compiled programs)"
            )
        row = None
        if self.per_request:
            row = self._samp_default.copy()
            for i, v in enumerate(overrides):
                if v is not None:
                    row[i] = float(v)
        stop_seqs = None
        if stop is not None:
            if stop and isinstance(stop[0], (int, np.integer)):
                stop = [stop]
            stop_seqs = [[int(t) for t in q] for q in stop if len(q) > 0]
            if not stop_seqs:
                stop_seqs = None
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        # speculative verify windows write n_draft+1 cache positions past
        # the commit point; reserve that margin so writes never clamp
        margin = self.n_draft + 1 if self.spec_decode != "off" else 0
        if prompt.shape[0] + max_new_tokens + margin > self.max_len:
            raise ValueError(
                f"prompt ({prompt.shape[0]}) + max_new_tokens ({max_new_tokens})"
                f"{f' + draft margin ({margin})' if margin else ''} "
                f"exceeds max_len ({self.max_len})"
            )
        if guide is not None:
            if self.spec_decode == "draft":
                raise ValueError(
                    "guided decoding composes with spec_decode='prompt_lookup'"
                    " (host-repaired drafts + per-position verify masks) but "
                    "not 'draft': repairing a draft MODEL's tokens would "
                    "poison its cache with K/V of tokens it never produced"
                )
            if guide.V != self.pm.spec.vocab_size:
                raise ValueError(
                    f"guide vocab ({guide.V}) != model vocab "
                    f"({self.pm.spec.vocab_size}); build the TokenGuide with "
                    f"vocab_size=spec.vocab_size"
                )
            if self.eos is None or guide.eos_id != self.eos:
                raise ValueError(
                    "guided decoding needs the batcher's eos_token_id set and "
                    "equal to the guide's eos_id (EOS is how a completed "
                    "grammar terminates)"
                )
            if guide.dead_end(guide.start):
                raise ValueError("guide grammar admits no token from its "
                                 "start state with this vocabulary")
        min_tokens = int(min_tokens)
        if logit_bias is not None or min_tokens > 0:
            if self.spec_decode != "off":
                raise ValueError(
                    "logit_bias/min_tokens are incompatible with speculative "
                    "serving (the verify forward argmaxes raw logits)"
                )
        if logit_bias is not None:
            V = self.pm.spec.vocab_size
            logit_bias = {int(t): float(v) for t, v in logit_bias.items()}
            bad = [t for t in logit_bias if not 0 <= t < V]
            if bad:
                raise ValueError(f"logit_bias token ids out of range: {bad}")
            if not logit_bias:
                logit_bias = None
        if min_tokens > 0 and self.eos is None:
            raise ValueError("min_tokens needs the batcher's eos_token_id set "
                             "(it works by suppressing EOS)")
        if min_tokens > 0 and guide is not None:
            raise ValueError(
                "min_tokens cannot combine with a guide: the grammar decides "
                "when EOS is reachable (a completed grammar with EOS "
                "suppressed would leave no sampleable token)"
            )
        top_logprobs = int(top_logprobs)
        if not 0 <= top_logprobs <= TOP_LP_K:
            raise ValueError(
                f"top_logprobs must be in [0, {TOP_LP_K}], got {top_logprobs}"
            )
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, prompt, max_new_tokens, row, stop_seqs,
                           bool(logprobs) or top_logprobs > 0, top_logprobs,
                           None if seed is None else int(seed),
                           guide, logit_bias, min_tokens))
        return rid

    def cancel(self, rid: int) -> bool:
        """Abort a request: drop it from the queue, or free its slot
        immediately (the slot is then re-admitted exactly like a
        finished one — prefill rewrites cache/lengths from position 0,
        so no device state needs clearing). Returns False when `rid`
        is unknown or already finished. Host bookkeeping only; safe
        between step() calls."""
        for i, (q_rid, *_rest) in enumerate(self.queue):
            if q_rid == rid:
                del self.queue[i]
                self.stats.pop(rid, None)
                return True
        for s in range(self.slots):
            if self.slot_req[s] == rid:
                self.slot_req[s] = None
                self.slot_chunks[s] = []
                self.slot_budget[s] = 0
                self.slot_want_lp[s] = False
                self.slot_top_k[s] = 0
                self.slot_seed[s] = None
                self._clear_guide(s)
                self._clear_bias(s)
                if self.samp is not None:
                    self.samp[s] = self._samp_off
                self.stats.pop(rid, None)
                return True
        return False

    def _samp_kwargs(self):
        """Sampling kwargs for the jitted prefill/decode programs: the
        traced per-row table in per-request mode, the static knobs
        otherwise (statics are pinned to their off values in per-row
        mode so the program signature never varies with ctor knobs)."""
        if self.per_request:
            return dict(top_p=None, min_p=None, rep_penalty=None,
                        presence=self.presence, samp=jnp.asarray(self.samp))
        return dict(top_p=self.top_p, min_p=self.min_p,
                    rep_penalty=self.rep_penalty, presence=self.presence)

    @property
    def _static_temp(self) -> float:
        return 0.0 if self.per_request else self.temperature

    # -- guided decoding (models/guided.py) -------------------------------

    def _refresh_guide_row(self, s: int) -> None:
        """Recompute slot `s`'s [V] allow row from its automaton state."""
        if self._allow is None:
            self._allow = np.ones((self.slots, self.pm.spec.vocab_size), bool)
        self._allow[s] = self.slot_guide[s].mask_for(self.slot_gstate[s])

    def _clear_guide(self, s: int) -> None:
        if self.slot_guide[s] is not None:
            self.slot_guide[s] = None
            if self._allow is not None:
                self._allow[s] = True

    def _advance_guide(self, s: int, tok: int) -> None:
        """Walk slot `s`'s automaton over a committed token and refresh
        its allow row; a dead end (no token and no EOS reachable —
        possible only when the vocabulary cannot spell a required byte)
        finishes the request host-side."""
        guide = self.slot_guide[s]
        if guide is None or (self.eos is not None and tok == self.eos):
            return
        self.slot_gstate[s] = guide.advance(self.slot_gstate[s], tok)
        if guide.dead_end(self.slot_gstate[s]):
            self.slot_budget[s] = 0
            self._clear_guide(s)
        else:
            self._refresh_guide_row(s)

    def _guided_active(self) -> bool:
        return any(g is not None for g in self.slot_guide)

    # -- logit bias / min_tokens -------------------------------------------

    def _set_bias_row(self, s: int) -> None:
        """Rebuild slot `s`'s [V] bias row: the request's logit_bias
        entries plus -inf EOS suppression while min_tokens remain."""
        if self._bias is None:
            self._bias = np.zeros((self.slots, self.pm.spec.vocab_size),
                                  np.float32)
        row = np.zeros((self.pm.spec.vocab_size,), np.float32)
        if self.slot_bias[s]:
            for t, v in self.slot_bias[s].items():
                row[t] = v
        if self.slot_min_tokens[s] > 0:
            row[self.eos] = -np.inf
        self._bias[s] = row

    def _clear_bias(self, s: int) -> None:
        if self.slot_bias[s] is not None or self.slot_min_tokens[s] > 0:
            self.slot_bias[s] = None
            self.slot_min_tokens[s] = 0
            if self._bias is not None:
                self._bias[s] = 0.0

    def _tick_min_tokens(self, s: int) -> None:
        """One token committed: count down EOS suppression; lift it the
        moment the minimum is reached."""
        if self.slot_min_tokens[s] > 0:
            self.slot_min_tokens[s] -= 1
            if self.slot_min_tokens[s] == 0:
                self._set_bias_row(s)

    def _bias_active(self) -> bool:
        return any(
            self.slot_bias[s] is not None or self.slot_min_tokens[s] > 0
            for s in range(self.slots) if self.slot_req[s] is not None
        )

    def _bias_kwargs(self):
        if not self._bias_active():
            return {}
        return {"bias": jnp.asarray(self._bias)}

    def _guided_kwargs(self):
        """The traced [slots, V] allow table when any resident request
        is guided; {} selects the unmasked program variant (at most 2
        cached variants per program, like want_lp)."""
        if not self._guided_active():
            return {}
        return {"allow": jnp.asarray(self._allow)}

    def _any_want_lp(self) -> bool:
        return any(
            self.slot_want_lp[s] for s in range(self.slots)
            if self.slot_req[s] is not None
        )

    def _top_lp_active(self) -> bool:
        return any(
            self.slot_top_k[s] for s in range(self.slots)
            if self.slot_req[s] is not None
        )

    def _record_top(self, s: int, tids_row, tlps_row) -> None:
        """Record one generated position's top-logprob row for slot `s`
        (sliced to the request's k)."""
        k = self.slot_top_k[s]
        if k:
            self.slot_top[s].append(
                ([int(t) for t in tids_row[:k]],
                 [float(v) for v in tlps_row[:k]])
            )

    def _seed_kwargs(self, sub, with_counts: bool):
        """seed_keys/counts for the jitted programs when any resident
        request is seeded (the per-row-keys program variant); {} selects
        the shared-key variant. Unseeded rows fold the per-dispatch key
        with their slot index — a valid stream that still varies per
        dispatch."""
        if not self.per_request or not any(
            self.slot_seed[s] is not None for s in range(self.slots)
            if self.slot_req[s] is not None
        ):
            return {}
        keys = [
            jax.random.key(self.slot_seed[s])
            if self.slot_req[s] is not None and self.slot_seed[s] is not None
            else jax.random.fold_in(sub, s)
            for s in range(self.slots)
        ]
        kw = {"seed_keys": jnp.stack(keys)}
        if with_counts:
            kw["counts"] = jnp.asarray(
                [max(0, len(self.slot_out[s]) - self.slot_plen[s])
                 for s in range(self.slots)], jnp.int32,
            )
        return kw

    def _slot_finished(self, s: int) -> bool:
        if self.slot_chunks[s]:
            return False  # still prefilling
        return self.slot_budget[s] <= 0 or (
            self.eos is not None
            and bool(self.slot_out[s])
            and self.slot_out[s][-1] == self.eos
        )

    def _admit(self):
        """Assign queued requests to free slots — host bookkeeping only;
        the device work happens chunk-by-chunk in `_prefill_step`."""
        for s in range(self.slots):
            if self.slot_req[s] is None and self.queue:
                (rid, prompt, budget, row, stop_seqs, want_lp, top_k_lp,
                 seed, guide, logit_bias, min_tokens) = self.queue.pop(0)
                self.slot_req[s] = rid
                self.slot_out[s] = list(prompt.tolist())
                self.slot_budget[s] = budget
                self.slot_stop[s] = stop_seqs
                self.slot_plen[s] = int(prompt.shape[0])
                self.slot_scanned[s] = 0
                self.slot_want_lp[s] = want_lp
                self.slot_lp[s] = []
                self.slot_top_k[s] = top_k_lp
                self.slot_top[s] = []
                self.slot_seed[s] = seed
                self.slot_guide[s] = guide
                if guide is not None:
                    self.slot_gstate[s] = guide.start
                    self._refresh_guide_row(s)
                self.slot_bias[s] = logit_bias
                self.slot_min_tokens[s] = min_tokens
                if logit_bias is not None or min_tokens > 0:
                    self._set_bias_row(s)
                if row is not None:
                    self.samp[s] = row
                # the prompt-presence row only matters to a penalising
                # request; skipping it for penalty-free ones saves a
                # host->device vocab-row transfer per admission
                penalising = self.rep_penalty is not None or (
                    row is not None and row[4] != 1.0
                )
                if self.presence is not None and penalising:
                    pres_row = np.zeros((self.pm.spec.vocab_size,), bool)
                    pres_row[prompt] = True
                    self.presence = self.presence.at[s].set(jnp.asarray(pres_row))
                if self.gen_counts is not None:
                    # additive penalties count GENERATED tokens only;
                    # a fresh request starts from zero
                    self.gen_counts = self.gen_counts.at[s].set(0)
                if self.spec_decode != "off":
                    self.stats[rid] = {"rounds": 0, "drafted": 0, "accepted": 0}
                n_chunks = max(1, -(-prompt.shape[0] // self.bucket))
                chunks = [
                    (prompt[c * self.bucket : (c + 1) * self.bucket],
                     c * self.bucket, c == n_chunks - 1)
                    for c in range(n_chunks)
                ]
                if self.prefix_cache:
                    skip, src = self._best_prefix(prompt, n_chunks)
                    if skip > 0:
                        adopted = skip * self.bucket
                        args = (jnp.asarray(src, jnp.int32),
                                jnp.asarray(s, jnp.int32),
                                jnp.asarray(adopted, jnp.int32))
                        self.state = _adopt_prefix_jit(self.state, *args)
                        if self.draft_state is not None:
                            # the draft pool mirrored the same chunks, so
                            # its prefix at the same positions is valid too
                            self.draft_state = _adopt_prefix_jit(
                                self.draft_state, *args
                            )
                        chunks = chunks[skip:]
                        self.prefix_hits += skip
                        self.prefix_tokens_reused += adopted
                        self.slot_prompt[s] = prompt[:adopted]
                    else:
                        self.slot_prompt[s] = prompt[:0]
                self.slot_chunks[s] = chunks

    def _best_prefix(self, prompt: np.ndarray, n_chunks: int):
        """Longest bucket-aligned common prefix between `prompt` and any
        slot's cache-resident prefilled tokens, as (chunks_to_skip,
        source_slot). The final chunk is never skipped (it produces the
        committed first token). Host-side scan over <= slots candidates."""
        best_skip, best_src = 0, 0
        for t in range(self.slots):
            cand = self.slot_prompt[t]
            if cand is None or cand.shape[0] == 0:
                continue
            n = min(cand.shape[0], prompt.shape[0])
            neq = np.nonzero(cand[:n] != prompt[:n])[0]
            lcp = int(neq[0]) if neq.size else n
            skip = min(lcp // self.bucket, n_chunks - 1)
            if skip > best_skip:
                best_skip, best_src = skip, t
        return best_skip, best_src

    def _check_stop(self, s: int) -> None:
        """Scan slot `s`'s newly generated tokens for its stop
        sequences; on the EARLIEST match, truncate the output at the
        match start (stop tokens excluded) and zero the budget so the
        next sweep frees the slot. Incremental: tokens are scanned
        once, minus a (max_stop_len - 1) overlap for straddling
        matches."""
        seqs = self.slot_stop[s]
        if not seqs:
            return
        plen = self.slot_plen[s]
        region = self.slot_out[s][plen:]
        n_gen = len(region)
        if n_gen == 0:
            return
        start = max(0, self.slot_scanned[s] - max(len(q) for q in seqs) + 1)
        earliest = None
        for q in seqs:
            L = len(q)
            for j in range(start, n_gen - L + 1):
                if region[j:j + L] == q:
                    if earliest is None or j < earliest:
                        earliest = j
                    break
        self.slot_scanned[s] = n_gen
        if earliest is not None:
            del self.slot_out[s][plen + earliest:]
            del self.slot_lp[s][earliest:]
            del self.slot_top[s][earliest:]
            self.slot_budget[s] = 0

    def _commit_prefill_token(self, s: int, tok: int,
                              lp: Optional[float] = None,
                              update_pools: bool = True,
                              top=None) -> None:
        """Host bookkeeping for a slot whose prompt just finished.
        update_pools=False when the committing program already recorded
        the token into the presence/gen_counts pools on device (the
        batched/mixed path) — updating here too would double-count.
        `top` is the committed position's (tids_row, tlps_row) when the
        dispatch computed top-logprobs."""
        if self.slot_want_lp[s]:
            self.slot_lp[s].append(float(lp))
        if top is not None:
            self._record_top(s, top[0], top[1])
        if self.prefix_cache:
            # the whole prompt's KV is now cache-resident (slot_out holds
            # exactly the prompt here — the first committed token is
            # appended below) and stays untouched until re-admission:
            # decode / speculative-verify writes land past it
            self.slot_prompt[s] = np.asarray(self.slot_out[s], np.int32)
        self.slot_out[s].append(tok)
        self.slot_budget[s] -= 1
        self._advance_guide(s, tok)
        self._tick_min_tokens(s)
        if update_pools:
            if self.presence is not None:
                self.presence = self.presence.at[s, tok].set(True)
            if self.gen_counts is not None:
                self.gen_counts = self.gen_counts.at[s, tok].add(1)
        if self.eos is not None and tok == self.eos:
            self.slot_budget[s] = 0
        self._check_stop(s)

    def _prefill_step_batched(self, key):
        """One ragged [slots, bucket] dispatch per round consuming the
        HEAD chunk of every prefilling slot (prefill_chunks_per_step
        counts rounds here). Greedy-identical to the per-slot path."""
        for _ in range(self.prefill_chunks_per_step):
            pending = [s for s in range(self.slots) if self.slot_chunks[s]]
            if not pending:
                break
            chunks = np.zeros((self.slots, self.bucket), np.int32)
            pos0 = np.zeros((self.slots,), np.int32)
            real = np.zeros((self.slots,), np.int32)
            commit = np.zeros((self.slots,), bool)
            mask = np.zeros((self.slots,), bool)
            for s in pending:
                piece, p0, is_last = self.slot_chunks[s].pop(0)
                chunks[s, : piece.shape[0]] = piece
                pos0[s], real[s], commit[s], mask[s] = p0, piece.shape[0], is_last, True
            key, sub = jax.random.split(key)
            args = (jnp.asarray(chunks), jnp.asarray(pos0), jnp.asarray(real),
                    jnp.asarray(commit), jnp.asarray(mask))
            want_lp = self._any_want_lp()
            top_lp = self._top_lp_active()
            (self.state, nxt, lps, tids, tlps, self.presence,
             self.gen_counts) = _prefill_slots_jit(
                self.pm_pf.spec, self.pm_pf.layers, self.pm_pf.other,
                self.pm_pf.q_hd_true, self.state, *args, self._static_temp, sub,
                moe=self.moe, moe_capacity=self.moe_capacity,
                want_lp=want_lp, top_lp=top_lp,
                decode_attn=self.prefill_attn, tp=self._tp_prefill,
                gen_counts=self.gen_counts,
                **self._samp_kwargs(),
                **self._seed_kwargs(sub, with_counts=True),
                **self._guided_kwargs(), **self._bias_kwargs(),
            )
            if self.draft_state is not None:
                # mirror into the draft pool; the TARGET decides tokens,
                # so the draft's own commits are suppressed and its
                # last_token copies the target's for committed slots
                self.draft_state, _, _, _, _, _, _ = _prefill_slots_jit(
                    self.draft_pm_pf.spec, self.draft_pm_pf.layers,
                    self.draft_pm_pf.other,
                    self.draft_pm_pf.q_hd_true, self.draft_state, args[0], args[1],
                    args[2], jnp.zeros((self.slots,), bool), args[4],
                    self.temperature, sub, moe=self.moe, moe_capacity=self.moe_capacity,
                    decode_attn=self.prefill_attn, tp=self._tp_prefill,
                )
                self.draft_state = self.draft_state._replace(
                    last_token=jnp.where(
                        jnp.asarray(commit), self.state.last_token,
                        self.draft_state.last_token,
                    )
                )
            nxt = np.asarray(nxt)
            lps = np.asarray(lps) if want_lp else None
            tids = np.asarray(tids) if top_lp else None
            tlps = np.asarray(tlps) if top_lp else None
            for s in pending:
                if commit[s]:
                    self._commit_prefill_token(
                        s, int(nxt[s]), None if lps is None else float(lps[s]),
                        update_pools=False,  # recorded on device
                        top=None if tids is None else (tids[s], tlps[s]),
                    )
        return key

    def _mixed_round(self, key):
        """Chunked-prefill rounds with decode piggyback (one dispatch
        per round — the Sarathi-style schedule; see the
        mixed_prefill_decode ctor comment). Each round, every
        prefilling slot consumes its next chunk and every decode-active
        slot advances one token as a 1-token commit row: its input is
        its last committed token at pos0 = its current length — both
        host-known (slot_out[-1] and len(slot_out) - 1; the last
        committed token's own KV is not yet cache-resident, exactly
        _one_decode_step's input contract) — so the merge adds no
        device fetch. Sampling, penalty-pool, guided, bias, seed and
        logprob semantics are the single-step decode's."""
        for _ in range(self.prefill_chunks_per_step):
            pending = [s for s in range(self.slots) if self.slot_chunks[s]]
            if not pending:
                break
            decode_rows = [
                s for s in range(self.slots)
                if self.slot_req[s] is not None and not self.slot_chunks[s]
                and not self._slot_finished(s)
            ]
            chunks = np.zeros((self.slots, self.bucket), np.int32)
            pos0 = np.zeros((self.slots,), np.int32)
            real = np.zeros((self.slots,), np.int32)
            commit = np.zeros((self.slots,), bool)
            mask = np.zeros((self.slots,), bool)
            for s in pending:
                piece, p0, is_last = self.slot_chunks[s].pop(0)
                chunks[s, : piece.shape[0]] = piece
                pos0[s], real[s], commit[s], mask[s] = (
                    p0, piece.shape[0], is_last, True
                )
            for s in decode_rows:
                chunks[s, 0] = self.slot_out[s][-1]
                pos0[s] = len(self.slot_out[s]) - 1
                real[s], commit[s], mask[s] = 1, True, True
            key, sub = jax.random.split(key)
            want_lp = self._any_want_lp()
            top_lp = self._top_lp_active()
            (self.state, nxt, lps, tids, tlps, self.presence,
             self.gen_counts) = _prefill_slots_jit(
                self.pm_pf.spec, self.pm_pf.layers, self.pm_pf.other,
                self.pm_pf.q_hd_true, self.state,
                jnp.asarray(chunks), jnp.asarray(pos0), jnp.asarray(real),
                jnp.asarray(commit), jnp.asarray(mask),
                self._static_temp, sub,
                moe=self.moe, moe_capacity=self.moe_capacity,
                want_lp=want_lp, top_lp=top_lp,
                decode_attn=self.prefill_attn, tp=self._tp_prefill,
                gen_counts=self.gen_counts,
                **self._samp_kwargs(),
                **self._seed_kwargs(sub, with_counts=True),
                **self._guided_kwargs(), **self._bias_kwargs(),
            )
            nxt = np.asarray(nxt)
            lps = np.asarray(lps) if want_lp else None
            tids = np.asarray(tids) if top_lp else None
            tlps = np.asarray(tlps) if top_lp else None
            for s in pending:
                if commit[s]:
                    self._commit_prefill_token(
                        s, int(nxt[s]), None if lps is None else float(lps[s]),
                        update_pools=False,  # recorded on device
                        top=None if tids is None else (tids[s], tlps[s]),
                    )
            for s in decode_rows:
                self.slot_out[s].append(int(nxt[s]))
                if self.slot_want_lp[s]:
                    self.slot_lp[s].append(float(lps[s]))
                if tids is not None:
                    self._record_top(s, tids[s], tlps[s])
                self.slot_budget[s] -= 1
                self._advance_guide(s, int(nxt[s]))
                self._tick_min_tokens(s)
                self._check_stop(s)
        return key

    def _prefill_step(self, key):
        """Process up to `prefill_chunks_per_step` pending chunks,
        round-robin over prefilling slots. Returns the advanced key."""
        if self.prefill_exec == "batched":
            return self._prefill_step_batched(key)
        done_budget = self.prefill_chunks_per_step
        while done_budget > 0:
            pending = [s for s in range(self.slots) if self.slot_chunks[s]]
            if not pending:
                break
            for s in pending:
                if done_budget <= 0:
                    break
                piece, pos0, is_last = self.slot_chunks[s].pop(0)
                real = piece.shape[0]
                padded = np.zeros((1, self.bucket), np.int32)
                padded[0, :real] = piece
                key, sub = jax.random.split(key)
                self.state, lp, tids, tlps = _prefill_chunk_jit(
                    self.pm_pf.spec, self.pm_pf.layers, self.pm_pf.other,
                    self.pm_pf.q_hd_true,
                    self.state, jnp.asarray(s, jnp.int32), jnp.asarray(padded),
                    jnp.asarray(pos0, jnp.int32), jnp.asarray(real, jnp.int32),
                    jnp.asarray(is_last), self._static_temp, sub,
                    moe=self.moe, moe_capacity=self.moe_capacity,
                    want_lp=self.slot_want_lp[s],
                    top_lp=bool(self.slot_top_k[s]),
                    decode_attn=self.prefill_attn, tp=self._tp_prefill,
                    **self._samp_kwargs(),
                    **self._seed_kwargs(sub, with_counts=False),
                    **self._guided_kwargs(), **self._bias_kwargs(),
                )
                if self.draft_state is not None:
                    # mirror the chunk into the draft pool (its own sampled
                    # commit is discarded — the TARGET decides tokens)
                    self.draft_state, _, _, _ = _prefill_chunk_jit(
                        self.draft_pm_pf.spec, self.draft_pm_pf.layers,
                        self.draft_pm_pf.other,
                        self.draft_pm_pf.q_hd_true, self.draft_state,
                        jnp.asarray(s, jnp.int32), jnp.asarray(padded),
                        jnp.asarray(pos0, jnp.int32), jnp.asarray(real, jnp.int32),
                        jnp.asarray(False), self.temperature, sub,
                        moe=self.moe, moe_capacity=self.moe_capacity,
                        decode_attn=self.prefill_attn, tp=self._tp_prefill,
                    )
                done_budget -= 1
                if is_last:
                    tok = int(self.state.last_token[s])
                    if self.draft_state is not None:
                        self.draft_state = self.draft_state._replace(
                            last_token=self.draft_state.last_token.at[s].set(tok)
                        )
                    self._commit_prefill_token(
                        s, tok, float(lp) if self.slot_want_lp[s] else None,
                        top=(np.asarray(tids), np.asarray(tlps))
                        if self.slot_top_k[s] else None,
                    )
        return key

    def step(self, key) -> Tuple[jax.Array, Dict[int, List[int]], bool]:
        """One scheduler iteration: sweep finished slots, admit queued
        requests, process prefill chunks, take one decode (or
        speculative) round. Returns ``(key, finished, drained)`` where
        `finished` maps req_id -> full token list for requests whose
        slots were swept at the TOP of this iteration (before any
        device work — exactly run()'s order) and `drained` is True when
        the queue and every slot are empty. run() is literally a loop
        over step(); step() exists so long-lived frontends (server.py)
        can admit new requests between iterations."""
        finished: Dict[int, List[int]] = {}
        # sweep finished slots BEFORE admitting (frees capacity)
        for s in range(self.slots):
            if self.slot_req[s] is not None and self._slot_finished(s):
                finished[self.slot_req[s]] = self.slot_out[s]
                if self.slot_want_lp[s]:
                    self.logprobs[self.slot_req[s]] = self.slot_lp[s]
                    self.slot_want_lp[s] = False
                if self.slot_top_k[s]:
                    self.top_logprobs[self.slot_req[s]] = self.slot_top[s]
                    self.slot_top_k[s] = 0
                self.slot_req[s] = None
                self.slot_seed[s] = None
                self._clear_guide(s)
                self._clear_bias(s)
                if self.samp is not None:
                    self.samp[s] = self._samp_off
        self._admit()
        if (self.mixed_prefill_decode and self.prefill_exec == "batched"
                and self.spec_decode == "off" and any(self.slot_chunks)):
            # one mixed dispatch per round serves prefill chunks AND the
            # decode-active slots — no separate decode round this
            # iteration (steady-state iterations take the fused path
            # below the moment the chunks drain)
            key = self._mixed_round(key)
            return key, finished, False
        key = self._prefill_step(key)
        # decode-active: fully prefilled, unfinished slots only (a slot
        # that finished AT prefill — eos first token or budget 1 —
        # must not take a decode step; prefilling slots wait)
        active_mask = np.asarray(
            [
                self.slot_req[s] is not None
                and not self.slot_chunks[s]
                and not self._slot_finished(s)
                for s in range(self.slots)
            ]
        )
        if not active_mask.any():
            drained = (
                not self.queue
                and all(r is None for r in self.slot_req)
                and not any(self.slot_chunks)
            )
            return key, finished, drained
        key, sub = jax.random.split(key)
        if self.spec_decode != "off":
            self._speculative_step(active_mask)
        else:
            self._decode_round(active_mask, sub)
        return key, finished, False

    def _decode_round(self, active_mask: np.ndarray, sub) -> None:
        """One (possibly fused multi-step) decode dispatch over the
        decode-active slots, committing emitted tokens to host state."""
        # fused multi-step decode only when nothing is prefilling
        # (prefill chunks want per-step interleaving), no guided
        # request is resident (each guided step's allow mask depends on
        # the previous token, which only the host-advanced automaton
        # knows — fusing would decode past the mask), and no EOS
        # suppression could expire mid-dispatch (plain logit_bias is
        # constant per request and fuses fine)
        min_pending = any(
            self.slot_min_tokens[s] > 0 for s in range(self.slots)
            if self.slot_req[s] is not None
        )
        n = (self.steps_per_dispatch
             if not any(self.slot_chunks) and not self._guided_active()
             and not min_pending else 1)
        want_lp = self._any_want_lp()
        top_lp = self._top_lp_active()
        if n == 1:
            (self.state, toks, lps, tids, tlps, self.presence,
             self.gen_counts) = _decode_slots_jit(
                self.pm.spec, self.pm.layers, self.pm.other, self.pm.q_hd_true,
                self.state, jnp.asarray(active_mask),
                self._static_temp, None, sub,
                moe=self.moe, moe_capacity=self.moe_capacity,
                want_lp=want_lp, top_lp=top_lp, gen_counts=self.gen_counts,
                decode_attn=self.decode_attn, tp=self._tp,
                **self._samp_kwargs(),
                **self._seed_kwargs(sub, with_counts=True),
                **self._guided_kwargs(), **self._bias_kwargs(),
            )
            toks = np.asarray(toks)
            lps = np.asarray(lps) if want_lp else None
            tids = np.asarray(tids) if top_lp else None
            tlps = np.asarray(tlps) if top_lp else None
            for s in range(self.slots):
                if active_mask[s]:
                    self.slot_out[s].append(int(toks[s]))
                    if self.slot_want_lp[s]:
                        self.slot_lp[s].append(float(lps[s]))
                    if tids is not None:
                        self._record_top(s, tids[s], tlps[s])
                    self.slot_budget[s] -= 1
                    self._advance_guide(s, int(toks[s]))
                    self._tick_min_tokens(s)
                    self._check_stop(s)
        else:
            budgets = jnp.asarray(
                [self.slot_budget[s] if active_mask[s] else 0
                 for s in range(self.slots)], jnp.int32,
            )
            (self.state, toks, lps, tids, tlps, emitted, self.presence,
             self.gen_counts) = _decode_slots_multi_jit(
                self.pm.spec, self.pm.layers, self.pm.other, self.pm.q_hd_true,
                self.state, jnp.asarray(active_mask), budgets,
                jnp.asarray(-1 if self.eos is None else self.eos, jnp.int32),
                n, self._static_temp, None, sub, has_eos=self.eos is not None,
                moe=self.moe, moe_capacity=self.moe_capacity,
                want_lp=want_lp, top_lp=top_lp, gen_counts=self.gen_counts,
                decode_attn=self.decode_attn, tp=self._tp,
                **self._samp_kwargs(),
                **self._seed_kwargs(sub, with_counts=True),
                **self._bias_kwargs(),
            )
            toks, emitted = np.asarray(toks), np.asarray(emitted)
            lps = np.asarray(lps) if want_lp else None
            tids = np.asarray(tids) if top_lp else None
            tlps = np.asarray(tlps) if top_lp else None
            for i in range(n):
                for s in range(self.slots):
                    if emitted[i, s]:
                        self.slot_out[s].append(int(toks[i, s]))
                        if self.slot_want_lp[s]:
                            self.slot_lp[s].append(float(lps[i, s]))
                        if tids is not None:
                            self._record_top(s, tids[i, s], tlps[i, s])
                        self.slot_budget[s] -= 1
            for s in range(self.slots):
                if active_mask[s]:
                    self._check_stop(s)

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Run until the queue and all slots drain; returns {req_id: tokens}."""
        finished: Dict[int, List[int]] = {}
        key = jax.random.key(0)
        for _ in range(max_steps):
            key, fin, drained = self.step(key)
            finished.update(fin)
            if drained:
                return finished
        raise RuntimeError(f"serving loop did not drain in {max_steps} steps")

    def _speculative_step(self, active_mask: np.ndarray) -> None:
        """One draft+verify round across all decode-active slots: commit
        1..n_draft+1 greedy-exact tokens per active slot."""
        k = self.n_draft
        active = jnp.asarray(active_mask)
        if self.spec_decode == "draft":
            self.draft_state, dtoks = _draft_slots_jit(
                self.draft_pm.spec, self.draft_pm.layers, self.draft_pm.other,
                self.draft_pm.q_hd_true, self.draft_state, active, k,
                moe=self.moe, moe_capacity=self.moe_capacity,
                decode_attn=self.decode_attn, tp=self._tp,
            )
            drafts = dtoks
        else:
            drafts = jnp.asarray(
                np.stack([
                    lookup_draft(self.slot_out[s], k, self.lookup_ngram)
                    if active_mask[s] else np.zeros(k, np.int32)
                    for s in range(self.slots)
                ])
            )
        max_adv_np = np.asarray(
            [self.slot_budget[s] if active_mask[s] else 0
             for s in range(self.slots)], np.int32,
        )
        # GUIDED speculative rounds (prompt_lookup only): the host walks
        # each guided slot's drafts through its automaton, repairing the
        # first disallowed token (and everything after it) with an
        # allowed one so every verify position has a live state, and
        # ships per-position [slots, k+1, V] masks. The masked argmax at
        # every committed position is exactly what plain guided decode
        # would emit (same state -> same mask -> same argmax), so the
        # output stays guided-greedy-exact — speculation only changes
        # steps/token.
        allow_kw = {}
        guided_rows = [s for s in range(self.slots)
                       if active_mask[s] and self.slot_guide[s] is not None]
        if guided_rows:
            drafts_np = np.asarray(drafts).copy()
            allow3 = np.ones((self.slots, k + 1, self.pm.spec.vocab_size),
                             bool)
            for s in guided_rows:
                g = self.slot_guide[s]
                st = self.slot_gstate[s]
                valid_upto = k + 1
                for j in range(k + 1):
                    mask = g.mask_for(st)
                    if not mask.any():  # dead end (unspellable byte):
                        valid_upto = j  # never commit at/after j
                        break           # rows j.. stay all-True (garbage,
                    allow3[s, j] = mask  # clamped out by max_adv)
                    if j == k:
                        break
                    content = np.nonzero(mask)[0]
                    content = content[content != g.eos_id]
                    if content.size == 0:
                        # grammar complete: position j's mask is
                        # eos-only, the verify argmax is forced to EOS
                        # there and adv caps at it; later rows are
                        # unreachable
                        valid_upto = j + 1
                        break
                    t = int(drafts_np[s, j])
                    if not mask[t] or t == g.eos_id:
                        t = int(content[0])  # repair the draft
                        drafts_np[s, j] = t
                    st = g.advance(st, t)
                max_adv_np[s] = min(max_adv_np[s], valid_upto)
            drafts = jnp.asarray(drafts_np)
            allow_kw = {"allow": jnp.asarray(allow3)}
        max_adv = jnp.asarray(max_adv_np)
        eos = None if self.eos is None else jnp.asarray(self.eos, jnp.int32)
        want_lp = self._any_want_lp()
        top_lp = self._top_lp_active()
        self.state, ttoks, lps, tids, tlps, adv, acc = _verify_slots_jit(
            self.pm.spec, self.pm.layers, self.pm.other, self.pm.q_hd_true,
            self.state, active, drafts, max_adv, eos,
            moe=self.moe, moe_capacity=self.moe_capacity, want_lp=want_lp,
            top_lp=top_lp, decode_attn=self.decode_attn, tp=self._tp,
            **allow_kw,
        )
        if self.draft_state is not None:
            self.draft_state = _commit_draft_cache_jit(
                self.draft_state, adv, self.state.last_token
            )
        ttoks, adv, acc = np.asarray(ttoks), np.asarray(adv), np.asarray(acc)
        lps = np.asarray(lps) if want_lp else None
        tids = np.asarray(tids) if top_lp else None
        tlps = np.asarray(tlps) if top_lp else None
        for s in range(self.slots):
            if not active_mask[s]:
                continue
            a = int(adv[s])
            committed = [int(t) for t in ttoks[s, :a]]
            self.slot_out[s].extend(committed)
            if self.slot_want_lp[s]:
                self.slot_lp[s].extend(float(x) for x in lps[s, :a])
            if tids is not None:
                for j in range(a):
                    self._record_top(s, tids[s, j], tlps[s, j])
            self.slot_budget[s] -= a
            for t in committed:
                self._advance_guide(s, t)
            self._check_stop(s)
            st = self.stats[self.slot_req[s]]
            st["rounds"] += 1
            st["drafted"] += k
            st["accepted"] += int(acc[s])
