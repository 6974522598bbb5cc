"""Speculative decoding: the compressed model drafts, a target verifies.

A MoDeGPT-compressed model is a cheap, distribution-faithful draft for
its own dense parent (the compression objective minimises per-module
output distortion), which makes self-speculative serving a natural fit:
decode latency approaches the compressed model's, output equals the
TARGET model's greedy decode exactly.

This capability goes beyond the reference (which has no serving stack;
its generation runs through HF `generate` on the rebuilt checkpoint,
reference: src/patchers/LlamaRebuild.py). TPU-native design:

* both models run as padded-uniform stacks (models/padded.py) — one
  scanned layer body each, so the whole speculative loop is a single
  compiled program (`lax.while_loop` over rounds, `lax.scan` over draft
  steps) with NO host round-trips during decode;
* fixed-shape windows everywhere: the draft proposes ``n_draft`` tokens,
  the target verifies ``n_draft + 1`` positions in one forward, and the
  accepted prefix length only moves the cache-length scalars — stale
  cache entries beyond the accepted length are never attended (the
  causal mask is driven by the length scalar) and the next round's
  fixed-size window always overwrites them (the next write spans
  ``[len + a + 1, len + a + k + 1] ⊇ stale [len + a + 1, len + k]``);
* the draft runs one extra cache-fill step per round so every drafted
  token's K/V is present regardless of how many get accepted;
* BATCHED: the per-sequence round loop is `jax.vmap`-ed — JAX's
  `while_loop` batching runs rows in lockstep until every row finishes
  and select-freezes finished rows' carries, so each sequence advances
  at its own acceptance rate with no ragged bookkeeping.

Two verification modes:

* temperature 0 (default): acceptance is exact token match against the
  target's argmax, so the output is identical to the target's own greedy
  decode — tested in tests/test_speculative.py;
* temperature > 0: Leviathan-style rejection sampling (Leviathan et al.
  2023; Chen et al. 2023) — draft token x_i ~ p_i is accepted with
  probability min(1, q_i(x_i)/p_i(x_i)); the first rejection resamples
  from the residual distribution norm(max(q_i - p_i, 0)); a fully
  accepted window earns a bonus sample from q_k. The output is
  distribution-exact: marginally identical to sampling from the target
  alone (tested empirically in tests/test_speculative.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from modegpt_tpu.models.padded import PaddedModel, _model_step_padded

__all__ = ["speculative_generate", "prompt_lookup_generate", "SpecDecodeStats"]


class SpecDecodeStats(NamedTuple):
    """Per-sequence telemetry from one speculative generation call."""

    rounds: jax.Array  # target forwards executed (after prefill)
    drafted: jax.Array  # draft tokens proposed
    accepted: jax.Array  # draft tokens accepted


@partial(
    jax.jit,
    static_argnames=("draft_spec", "target_spec", "max_new_tokens", "n_draft", "max_len"),
)
def _spec_generate_jit(
    draft_spec,
    target_spec,
    draft_arrays,  # (layers, other, q_hd_true)
    target_arrays,
    prompt_ids: jax.Array,  # [B, P]
    max_new_tokens: int,
    n_draft: int,
    max_len: int,
    eos_token_id: Optional[jax.Array],
):
    k = n_draft
    dtype = target_arrays[1]["embed_tokens"].dtype

    def init_cache(spec):
        Rq = spec.q_ranks[0] // spec.n_heads
        Rv = spec.v_ranks[0] // spec.n_kv_heads
        return (
            jnp.zeros((spec.n_layers, 1, spec.n_kv_heads, max_len, Rq), dtype=dtype),
            jnp.zeros((spec.n_layers, 1, spec.n_kv_heads, max_len, Rv), dtype=dtype),
            jnp.asarray(0, jnp.int32),
        )

    def dstep(tokens, cache):
        layers, other, qhd = draft_arrays
        logits, ck, cv, length = _model_step_padded.__wrapped__(
            draft_spec, layers, other, qhd, tokens, *cache
        )
        return logits, (ck, cv, length)

    def tstep(tokens, cache):
        layers, other, qhd = target_arrays
        logits, ck, cv, length = _model_step_padded.__wrapped__(
            target_spec, layers, other, qhd, tokens, *cache
        )
        return logits, (ck, cv, length)

    def one(prompt):  # [P] — one sequence, vmapped over the batch
        prompt = prompt[None]
        dcache = init_cache(draft_spec)
        tcache = init_cache(target_spec)

        # ---- prefill; invariant: each cache holds every committed token
        # EXCEPT the newest one.
        _, dcache = dstep(prompt, dcache)
        tlogits, tcache = tstep(prompt, tcache)
        first = jnp.argmax(tlogits[0, -1, :]).astype(prompt.dtype)

        buf = jnp.zeros((max_new_tokens + k + 1,), prompt.dtype)
        buf = buf.at[0].set(first)
        done0 = (first == eos_token_id) if eos_token_id is not None else jnp.asarray(False)

        def cond(state):
            n_gen, done = state[0], state[1]
            return (n_gen < max_new_tokens) & ~done

        def body(state):
            n_gen, done, last, buf, dcache, tcache, rounds, drafted, accepted = state

            # draft k tokens greedily, plus one cache-fill step
            def draft_step(carry, _):
                tok, dcache = carry
                logits, dcache = dstep(tok[None, None], dcache)
                nxt = jnp.argmax(logits[0, -1, :]).astype(tok.dtype)
                return (nxt, dcache), nxt

            (_, dcache), dtoks = lax.scan(draft_step, (last, dcache), None, length=k)
            _, dcache = dstep(dtoks[-1][None, None], dcache)
            dlen_base = dcache[2] - (k + 1)

            # target verifies [last, d_0..d_{k-1}] in one forward
            window = jnp.concatenate([last[None], dtoks])[None]  # [1, k+1]
            tlogits, tcache = tstep(window, tcache)
            ttoks = jnp.argmax(tlogits[0], axis=-1).astype(last.dtype)  # [k+1]
            tlen_base = tcache[2] - (k + 1)

            match = dtoks == ttoks[:k]
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32)), dtype=jnp.int32)

            adv = a + 1
            if eos_token_id is not None:
                is_eos = ttoks == eos_token_id
                eos_pos = jnp.argmax(is_eos).astype(jnp.int32)
                has_eos = jnp.any(is_eos & (jnp.arange(k + 1, dtype=jnp.int32) < adv))
                adv = jnp.where(has_eos, jnp.minimum(adv, eos_pos + 1), adv)
                done = done | has_eos

            buf = lax.dynamic_update_slice(buf, ttoks, (n_gen,))
            new_last = ttoks[adv - 1]
            dcache = (dcache[0], dcache[1], dlen_base + adv)
            tcache = (tcache[0], tcache[1], tlen_base + adv)
            n_gen = jnp.minimum(n_gen + adv, jnp.asarray(max_new_tokens, jnp.int32))
            return (
                n_gen, done, new_last, buf, dcache, tcache,
                rounds + 1, drafted + k, accepted + a,
            )

        zero = jnp.asarray(0, jnp.int32)
        state = (
            jnp.minimum(jnp.asarray(1, jnp.int32), max_new_tokens),
            done0, first, buf, dcache, tcache, zero, zero, zero,
        )
        n_gen, done, last, buf, dcache, tcache, rounds, drafted, accepted = lax.while_loop(
            cond, body, state
        )

        tokens = buf[:max_new_tokens]
        if eos_token_id is not None:
            has = jnp.any(tokens == eos_token_id)
            first_eos = jnp.argmax(tokens == eos_token_id)
            idx = jnp.arange(max_new_tokens)
            tokens = jnp.where(has & (idx > first_eos), eos_token_id, tokens)
        return tokens, SpecDecodeStats(rounds=rounds, drafted=drafted, accepted=accepted)

    return jax.vmap(one)(prompt_ids)


def residual_sample(q: jax.Array, p: jax.Array, key: jax.Array) -> jax.Array:
    """Sample from norm(max(q - p, 0)) — the Leviathan rejection-sampling
    residual. Degenerates to q when the residual has no mass (p == q up
    to float rounding). q, p: [V] probability vectors."""
    r = jnp.clip(q - p, 0.0, None)
    rs = jnp.sum(r)
    r = jnp.where(rs > 0, r / jnp.maximum(rs, 1e-30), q)
    return jax.random.categorical(key, jnp.log(r + 1e-30))


@partial(
    jax.jit,
    static_argnames=(
        "draft_spec", "target_spec", "max_new_tokens", "n_draft", "max_len",
        "temperature",
    ),
)
def _spec_generate_sampled_jit(
    draft_spec,
    target_spec,
    draft_arrays,
    target_arrays,
    prompt_ids: jax.Array,  # [B, P]
    keys: jax.Array,  # [B] PRNG keys
    max_new_tokens: int,
    n_draft: int,
    max_len: int,
    eos_token_id: Optional[jax.Array],
    temperature: float,
):
    """Sampled speculative decoding: same fixed-shape window machinery as
    `_spec_generate_jit`, with rejection-sampling verification in place
    of argmax matching (module docstring). Distribution-exact w.r.t.
    sampling from the target at this temperature."""
    k = n_draft
    dtype = target_arrays[1]["embed_tokens"].dtype
    inv_t = 1.0 / temperature

    def init_cache(spec):
        Rq = spec.q_ranks[0] // spec.n_heads
        Rv = spec.v_ranks[0] // spec.n_kv_heads
        return (
            jnp.zeros((spec.n_layers, 1, spec.n_kv_heads, max_len, Rq), dtype=dtype),
            jnp.zeros((spec.n_layers, 1, spec.n_kv_heads, max_len, Rv), dtype=dtype),
            jnp.asarray(0, jnp.int32),
        )

    def dstep(tokens, cache):
        layers, other, qhd = draft_arrays
        logits, ck, cv, length = _model_step_padded.__wrapped__(
            draft_spec, layers, other, qhd, tokens, *cache
        )
        return logits, (ck, cv, length)

    def tstep(tokens, cache):
        layers, other, qhd = target_arrays
        logits, ck, cv, length = _model_step_padded.__wrapped__(
            target_spec, layers, other, qhd, tokens, *cache
        )
        return logits, (ck, cv, length)

    def one(prompt, key):  # [P] — one sequence, vmapped over the batch
        prompt = prompt[None]
        dcache = init_cache(draft_spec)
        tcache = init_cache(target_spec)

        _, dcache = dstep(prompt, dcache)
        tlogits, tcache = tstep(prompt, tcache)
        key, sk = jax.random.split(key)
        first = jax.random.categorical(
            sk, tlogits[0, -1, :].astype(jnp.float32) * inv_t
        ).astype(prompt.dtype)

        buf = jnp.zeros((max_new_tokens + k + 1,), prompt.dtype)
        buf = buf.at[0].set(first)
        done0 = (first == eos_token_id) if eos_token_id is not None else jnp.asarray(False)

        def cond(state):
            n_gen, done = state[0], state[1]
            return (n_gen < max_new_tokens) & ~done

        def body(state):
            n_gen, done, last, buf, dcache, tcache, key, rounds, drafted, accepted = state

            # draft k tokens BY SAMPLING at the shared temperature,
            # keeping each step's full distribution for the accept test
            def draft_step(carry, _):
                tok, dcache, key = carry
                logits, dcache = dstep(tok[None, None], dcache)
                lp = logits[0, -1, :].astype(jnp.float32) * inv_t
                p = jax.nn.softmax(lp)
                key, sk = jax.random.split(key)
                nxt = jax.random.categorical(sk, lp).astype(tok.dtype)
                return (nxt, dcache, key), (nxt, p)

            (_, dcache, key), (dtoks, p_all) = lax.scan(
                draft_step, (last, dcache, key), None, length=k
            )
            _, dcache = dstep(dtoks[-1][None, None], dcache)
            dlen_base = dcache[2] - (k + 1)

            window = jnp.concatenate([last[None], dtoks])[None]  # [1, k+1]
            tlogits, tcache = tstep(window, tcache)
            q_all = jax.nn.softmax(
                tlogits[0].astype(jnp.float32) * inv_t, axis=-1
            )  # [k+1, V]
            tlen_base = tcache[2] - (k + 1)

            # accept x_i with prob min(1, q_i(x_i)/p_i(x_i)); first
            # rejection index a via the cumulative-product trick
            key, ku, kr, kb = jax.random.split(key, 4)
            u = jax.random.uniform(ku, (k,))
            idx = jnp.arange(k)
            q_x = q_all[idx, dtoks]
            p_x = p_all[idx, dtoks]
            accept = u * p_x < q_x  # u < min(1, q/p) without the divide
            a = jnp.sum(jnp.cumprod(accept.astype(jnp.int32)), dtype=jnp.int32)

            # replacement token: residual resample at the rejection
            # position, or the bonus sample when everything was accepted
            a_c = jnp.minimum(a, k - 1)
            t_res = residual_sample(q_all[a_c], p_all[a_c], kr)
            t_bonus = jax.random.categorical(kb, jnp.log(q_all[k] + 1e-30))
            repl = jnp.where(a == k, t_bonus, t_res).astype(last.dtype)

            committed = jnp.append(dtoks, jnp.zeros((), last.dtype)).at[a].set(repl)
            adv = a + 1
            if eos_token_id is not None:
                is_eos = committed == eos_token_id
                eos_pos = jnp.argmax(is_eos).astype(jnp.int32)
                has_eos = jnp.any(is_eos & (jnp.arange(k + 1, dtype=jnp.int32) < adv))
                adv = jnp.where(has_eos, jnp.minimum(adv, eos_pos + 1), adv)
                done = done | has_eos

            buf = lax.dynamic_update_slice(buf, committed, (n_gen,))
            new_last = committed[adv - 1]
            dcache = (dcache[0], dcache[1], dlen_base + adv)
            tcache = (tcache[0], tcache[1], tlen_base + adv)
            n_gen = jnp.minimum(n_gen + adv, jnp.asarray(max_new_tokens, jnp.int32))
            return (
                n_gen, done, new_last, buf, dcache, tcache, key,
                rounds + 1, drafted + k, accepted + a,
            )

        zero = jnp.asarray(0, jnp.int32)
        state = (
            jnp.minimum(jnp.asarray(1, jnp.int32), max_new_tokens),
            done0, first, buf, dcache, tcache, key, zero, zero, zero,
        )
        (n_gen, done, last, buf, dcache, tcache, key, rounds, drafted,
         accepted) = lax.while_loop(cond, body, state)

        tokens = buf[:max_new_tokens]
        if eos_token_id is not None:
            has = jnp.any(tokens == eos_token_id)
            first_eos = jnp.argmax(tokens == eos_token_id)
            idx = jnp.arange(max_new_tokens)
            tokens = jnp.where(has & (idx > first_eos), eos_token_id, tokens)
        return tokens, SpecDecodeStats(rounds=rounds, drafted=drafted, accepted=accepted)

    return jax.vmap(one)(prompt_ids, keys)


@partial(
    jax.jit,
    static_argnames=("spec", "max_new_tokens", "n_draft", "ngram", "max_len"),
)
def _prompt_lookup_jit(
    spec,
    arrays,  # (layers, other, q_hd_true)
    prompt_ids: jax.Array,  # [B, P]
    max_new_tokens: int,
    n_draft: int,
    ngram: int,
    max_len: int,
    eos_token_id: Optional[jax.Array],
):
    """Prompt-lookup decoding (Saxena 2023; vLLM/TGI 'prompt lookup'):
    draft tokens are read from the SEQUENCE ITSELF — match the last
    `ngram` committed tokens against earlier positions and propose the
    continuation after the most recent match. No draft model: the only
    cost per round is the target's (k+1)-position verify forward, which
    replaces k+1 single-token decode steps when text repeats (code,
    retrieval-grounded generation, summarisation). Greedy-exact."""
    k, ng = n_draft, ngram
    dtype = arrays[1]["embed_tokens"].dtype
    P = prompt_ids.shape[1]
    H = P + max_new_tokens + k + 1  # history buffer length

    def tstep(tokens, cache):
        layers, other, qhd = arrays
        logits, ck, cv, length = _model_step_padded.__wrapped__(
            spec, layers, other, qhd, tokens, *cache
        )
        return logits, (ck, cv, length)

    def one(prompt):  # [P] — vmapped over the batch
        Rq = spec.q_ranks[0] // spec.n_heads
        Rv = spec.v_ranks[0] // spec.n_kv_heads
        cache = (
            jnp.zeros((spec.n_layers, 1, spec.n_kv_heads, max_len, Rq), dtype=dtype),
            jnp.zeros((spec.n_layers, 1, spec.n_kv_heads, max_len, Rv), dtype=dtype),
            jnp.asarray(0, jnp.int32),
        )
        tlogits, cache = tstep(prompt[None], cache)
        first = jnp.argmax(tlogits[0, -1, :]).astype(prompt.dtype)

        hist = jnp.zeros((H,), prompt.dtype)
        hist = lax.dynamic_update_slice(hist, prompt, (0,))
        hist = hist.at[P].set(first)
        h_len0 = jnp.asarray(P + 1, jnp.int32)
        done0 = (first == eos_token_id) if eos_token_id is not None else jnp.asarray(False)

        pos = jnp.arange(H - ng, dtype=jnp.int32)
        win_idx = pos[:, None] + jnp.arange(ng, dtype=jnp.int32)[None, :]

        def cond(state):
            n_gen, done = state[0], state[1]
            return (n_gen < max_new_tokens) & ~done

        def body(state):
            n_gen, done, last, hist, h_len, cache, rounds, drafted, accepted = state

            # ---- draft from history: most recent earlier match of the
            # last `ng` committed tokens, excluding the window itself.
            window = lax.dynamic_slice(hist, (h_len - ng,), (ng,))
            wins = hist[win_idx]  # [H-ng, ng]
            ok = jnp.all(wins == window[None, :], axis=1)
            valid = ok & (pos < h_len - ng)
            j = jnp.max(jnp.where(valid, pos, -1))
            found = j >= 0
            dtoks = lax.dynamic_slice(hist, (jnp.where(found, j + ng, 0),), (k,))
            # no match: propose repeats of the last token (verify round
            # then degenerates to one ordinary decode step)
            dtoks = jnp.where(found, dtoks, jnp.broadcast_to(last, (k,)))

            # ---- target verifies [last, d_0..d_{k-1}] in one forward
            window_t = jnp.concatenate([last[None], dtoks])[None]
            tlogits, cache = tstep(window_t, cache)
            ttoks = jnp.argmax(tlogits[0], axis=-1).astype(last.dtype)  # [k+1]
            tlen_base = cache[2] - (k + 1)

            match = dtoks == ttoks[:k]
            a = jnp.sum(jnp.cumprod(match.astype(jnp.int32)), dtype=jnp.int32)
            adv = a + 1
            if eos_token_id is not None:
                is_eos = ttoks == eos_token_id
                eos_pos = jnp.argmax(is_eos).astype(jnp.int32)
                has_eos = jnp.any(is_eos & (jnp.arange(k + 1, dtype=jnp.int32) < adv))
                adv = jnp.where(has_eos, jnp.minimum(adv, eos_pos + 1), adv)
                done = done | has_eos

            hist = lax.dynamic_update_slice(hist, ttoks, (h_len,))
            new_last = ttoks[adv - 1]
            cache = (cache[0], cache[1], tlen_base + adv)
            n_gen = jnp.minimum(n_gen + adv, jnp.asarray(max_new_tokens, jnp.int32))
            return (
                n_gen, done, new_last, hist, h_len + adv, cache,
                rounds + 1, drafted + k, accepted + a,
            )

        zero = jnp.asarray(0, jnp.int32)
        state = (
            jnp.minimum(jnp.asarray(1, jnp.int32), max_new_tokens),
            done0, first, hist, h_len0, cache, zero, zero, zero,
        )
        n_gen, done, last, hist, h_len, cache, rounds, drafted, accepted = lax.while_loop(
            cond, body, state
        )
        tokens = lax.dynamic_slice(hist, (P,), (max_new_tokens,))
        if eos_token_id is not None:
            has = jnp.any(tokens == eos_token_id)
            first_eos = jnp.argmax(tokens == eos_token_id)
            idx = jnp.arange(max_new_tokens)
            tokens = jnp.where(has & (idx > first_eos), eos_token_id, tokens)
        return tokens, SpecDecodeStats(rounds=rounds, drafted=drafted, accepted=accepted)

    return jax.vmap(one)(prompt_ids)


def prompt_lookup_generate(
    pm: PaddedModel,
    prompt_ids,
    max_new_tokens: int = 32,
    n_draft: int = 8,
    ngram: int = 3,
    eos_token_id: Optional[int] = None,
    max_len: Optional[int] = None,
    return_stats: bool = False,
):
    """Draft-model-free greedy speculative decoding: drafts come from
    n-gram matches against the sequence's own history (prompt lookup).
    One compiled dispatch, batched; output identical to the model's own
    greedy decode. Shines on repetitive continuations (code, extraction,
    RAG answers quoting context) where acceptance approaches n_draft."""
    prompt_ids = jnp.asarray(prompt_ids)
    B, P = prompt_ids.shape
    if ngram >= P:
        raise ValueError(f"ngram ({ngram}) must be shorter than the prompt ({P})")
    if max_len is None:
        max_len = P + max_new_tokens + n_draft + 1
    eos = None if eos_token_id is None else jnp.asarray(eos_token_id, prompt_ids.dtype)
    tokens, stats = _prompt_lookup_jit(
        pm.spec,
        (pm.layers, pm.other, pm.q_hd_true),
        prompt_ids,
        max_new_tokens,
        n_draft,
        ngram,
        max_len,
        eos,
    )
    out = jnp.concatenate([prompt_ids, tokens], axis=1)
    return (out, stats) if return_stats else out


def speculative_generate(
    draft: PaddedModel,
    target: PaddedModel,
    prompt_ids,
    max_new_tokens: int = 32,
    n_draft: int = 4,
    eos_token_id: Optional[int] = None,
    max_len: Optional[int] = None,
    return_stats: bool = False,
    temperature: float = 0.0,
    key: Optional[jax.Array] = None,
):
    """Speculative decoding in one compiled dispatch, batched over
    sequences (rows advance at their own acceptance rate in lockstep
    rounds; finished rows are frozen by the while_loop batching rule).

    temperature == 0 (default): output is identical to the target
    model's own greedy decode. temperature > 0: rejection-sampling
    verification (module docstring) — output is distributed exactly as
    sampling from the target at this temperature; pass `key`.

    Returns [B, prompt+new] tokens and, with return_stats, per-sequence
    (rounds, drafted, accepted) counters whose acceptance rate predicts
    the speedup.
    """
    prompt_ids = jnp.asarray(prompt_ids)
    B, P = prompt_ids.shape
    if max_len is None:
        max_len = P + max_new_tokens + n_draft + 1
    eos = None if eos_token_id is None else jnp.asarray(eos_token_id, prompt_ids.dtype)
    if temperature > 0.0:
        if key is None:
            raise ValueError("temperature > 0 requires a PRNG `key`")
        tokens, stats = _spec_generate_sampled_jit(
            draft.spec,
            target.spec,
            (draft.layers, draft.other, draft.q_hd_true),
            (target.layers, target.other, target.q_hd_true),
            prompt_ids,
            jax.random.split(key, B),
            max_new_tokens,
            n_draft,
            max_len,
            eos,
            float(temperature),
        )
    else:
        tokens, stats = _spec_generate_jit(
            draft.spec,
            target.spec,
            (draft.layers, draft.other, draft.q_hd_true),
            (target.layers, target.other, target.q_hd_true),
            prompt_ids,
            max_new_tokens,
            n_draft,
            max_len,
            eos,
        )
    out = jnp.concatenate([prompt_ids, tokens], axis=1)
    return (out, stats) if return_stats else out
