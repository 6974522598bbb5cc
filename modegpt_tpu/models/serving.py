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

from modegpt_tpu.models.forward import _act, _linear, _norm
from modegpt_tpu.models.padded import PaddedModel, _unembed
from modegpt_tpu.models.spec import ModelSpec

__all__ = ["ServeState", "init_serve_state", "prefill_slot", "decode_slots", "ContinuousBatcher"]


class ServeState(NamedTuple):
    cache_k: jax.Array  # [L, slots, Hk, max_len, Rq]
    cache_v: jax.Array  # [L, slots, Hk, max_len, Rv]
    lengths: jax.Array  # [slots] int32 — tokens currently in each slot
    last_token: jax.Array  # [slots] int32 — newest token per slot (undefined if empty)


def init_serve_state(pm: PaddedModel, slots: int, max_len: int, dtype=jnp.float32) -> ServeState:
    spec = pm.spec
    Rq = spec.q_ranks[0] // spec.n_heads
    Rv = spec.v_ranks[0] // spec.n_kv_heads
    L, Hk = spec.n_layers, spec.n_kv_heads
    return ServeState(
        cache_k=jnp.zeros((L, slots, Hk, max_len, Rq), dtype=dtype),
        cache_v=jnp.zeros((L, slots, Hk, max_len, Rv), dtype=dtype),
        lengths=jnp.zeros((slots,), jnp.int32),
        last_token=jnp.zeros((slots,), jnp.int32),
    )


def _rope_tables_at(spec: ModelSpec, positions, dtype):
    """cos/sin at per-row positions [B, S] -> [B, S, head_dim]."""
    from modegpt_tpu.ops.rope import rope_cos_sin

    B, S = positions.shape
    cos, sin = rope_cos_sin(positions.reshape(-1), spec.head_dim, spec.rope_theta, dtype=dtype, scaling=spec.rope_scaling)
    return cos.reshape(B, S, -1), sin.reshape(B, S, -1)


def _apply_rope_ragged(q, k, cos, sin, rotary_mask, group: int):
    """RoPE with PER-ROW phase tables. q [B,H,S,R], cos/sin [B,S,head_dim],
    rotary_mask [Hk,R] or None."""
    if rotary_mask is None:
        cos_h = cos[:, None]  # [B,1,S,hd] — R == head_dim here
        sin_h = sin[:, None]
    else:
        # gather kept frequencies per kv head: [B,S,Hk,R] -> [B,Hk,S,R]
        cos_h = jnp.take(cos, rotary_mask, axis=-1).transpose(0, 2, 1, 3)
        sin_h = jnp.take(sin, rotary_mask, axis=-1).transpose(0, 2, 1, 3)

    def rot(x):
        half = x.shape[-1] // 2
        return jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)

    if rotary_mask is None:
        cq, sq, ck, sk = cos_h, sin_h, cos_h, sin_h
    else:
        cq = jnp.repeat(cos_h, group, axis=1)
        sq = jnp.repeat(sin_h, group, axis=1)
        ck, sk = cos_h, sin_h
    return q * cq + rot(q) * sq, k * ck + rot(k) * sk


def _layer_ragged(spec, p, q_hd_true, x, cos, sin, ck, cv, pos):
    """One padded layer over new tokens x [B, S, d] with PER-ROW cache
    offsets pos [B]. ck/cv: [B, Hk, max_len, R]."""
    from modegpt_tpu.models.padded import _masked_rms_norm_truerank

    B, S, _ = x.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    Rq = spec.q_ranks[0] // H
    Rv = spec.v_ranks[0] // Hk
    max_len = ck.shape[2]
    rotary_mask = p.get("rotary_mask")

    pre_ln = spec.do_layer_norm_before
    residual = x
    x_ln = _norm(x, p["attn_norm"], spec.norm, spec.norm_eps) if pre_ln else x
    q = _linear(x_ln, p["q"]).reshape(B, S, H, Rq)
    k = _linear(x_ln, p["k"]).reshape(B, S, Hk, Rq)
    v = _linear(x_ln, p["v"]).reshape(B, S, Hk, Rv)

    if spec.qk_norm:
        q = _masked_rms_norm_truerank(
            q, p["q_norm"]["scale"], rotary_mask, spec.group_size, spec.norm_eps, q_hd_true
        )
        k = _masked_rms_norm_truerank(
            k, p["k_norm"]["scale"], rotary_mask, 1, spec.norm_eps, q_hd_true
        )

    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if spec.uses_rope:
        q, k = _apply_rope_ragged(q, k, cos, sin, rotary_mask, spec.group_size)
    q = q * lax.rsqrt(q_hd_true).astype(q.dtype)

    # per-row cache writes at each row's own offset
    def write(c, new, p_b):
        return lax.dynamic_update_slice(c, new.astype(c.dtype), (jnp.int32(0), p_b, jnp.int32(0)))

    ck = jax.vmap(write)(ck, k, pos)
    cv = jax.vmap(write)(cv, v, pos)

    k_all, v_all = ck, cv
    if Hk != H:
        k_all = jnp.repeat(k_all, H // Hk, axis=1)
        v_all = jnp.repeat(v_all, H // Hk, axis=1)
    scores = jnp.einsum("bhsd,bhtd->bhst", q, k_all)
    t_ids = jnp.arange(max_len, dtype=jnp.int32)[None, None, :]
    s_ids = pos[:, None, None] + jnp.arange(S, dtype=jnp.int32)[None, :, None]
    mask = t_ids <= s_ids  # [B, S, max_len]
    scores = jnp.where(mask[:, None], scores.astype(jnp.float32), -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    attn = jnp.einsum("bhst,bhtd->bhsd", probs, v_all)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, H * Rv)
    x = residual + _linear(attn, p["o"])
    if not pre_ln:
        x = _norm(x, p["attn_norm"], spec.norm, spec.norm_eps)

    residual = x
    x_ln2 = _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps) if pre_ln else x
    if spec.n_experts:
        from modegpt_tpu.models.forward import _moe_mlp

        y, _ = _moe_mlp(spec, p, x_ln2, False)
        x = residual + y
    else:
        if spec.gated_mlp:
            h = _act(_linear(x_ln2, p["gate"]), spec.act) * _linear(x_ln2, p["up"])
        else:
            h = _act(_linear(x_ln2, p["up"]), spec.act)
        x = residual + _linear(h, p["down"])
    if not pre_ln:
        x = _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)
    return x, ck, cv


def _model_ragged(spec, layers, other, q_hd_true, tokens, cache_k, cache_v, pos):
    """Run new tokens [B, S] through the padded stack with per-row
    offsets pos [B]; caches are the [L, B, ...] pools."""
    B, S = tokens.shape
    x = other["embed_tokens"][tokens]
    if spec.arch == "opt":
        if "project_in" in other:
            x = _linear(x, other["project_in"])
        positions = pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :] + 2
        x = x + other["embed_positions"][positions]

    cos = sin = None
    if spec.uses_rope:
        positions = pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        cos, sin = _rope_tables_at(spec, positions, x.dtype)

    def body(x, inputs):
        p, r_true, ck, cv = inputs
        x, ck, cv = _layer_ragged(spec, p, r_true, x, cos, sin, ck, cv, pos)
        return x, (ck, cv)

    x, (cache_k, cache_v) = lax.scan(body, x, (layers, q_hd_true, cache_k, cache_v))
    return _unembed(spec, other, x), cache_k, cache_v


@partial(jax.jit, static_argnames=("spec",), donate_argnames=("state",))
def _prefill_chunk_jit(spec, layers, other, q_hd_true, state: ServeState, slot: jax.Array,
                       chunk: jax.Array, pos0: jax.Array, real_len: jax.Array,
                       commit: jax.Array):
    """Run one prompt chunk [1, bucket] through `slot` at offset pos0
    (traced slot index — one compiled program serves every slot and every
    chunk). When `commit` is set (final chunk), the next token is read
    from the chunk's last REAL position."""
    ck = lax.dynamic_slice_in_dim(state.cache_k, slot, 1, axis=1)
    cv = lax.dynamic_slice_in_dim(state.cache_v, slot, 1, axis=1)
    pos = pos0[None]
    logits, ck, cv = _model_ragged(spec, layers, other, q_hd_true, chunk, ck, cv, pos)
    nxt = jnp.argmax(logits[0, real_len - 1], axis=-1).astype(jnp.int32)
    return ServeState(
        cache_k=lax.dynamic_update_index_in_dim(state.cache_k, ck[:, 0], slot, axis=1),
        cache_v=lax.dynamic_update_index_in_dim(state.cache_v, cv[:, 0], slot, axis=1),
        lengths=state.lengths.at[slot].set(pos0 + real_len),
        last_token=jnp.where(
            commit, state.last_token.at[slot].set(nxt), state.last_token
        ),
    )


@partial(jax.jit, static_argnames=("spec", "temperature", "top_k"), donate_argnames=("state",))
def _decode_slots_jit(spec, layers, other, q_hd_true, state: ServeState, active: jax.Array,
                      temperature: float, top_k, key):
    """One ragged decode step for ALL slots; inactive rows are masked
    (their length does not advance and their cache write lands at their
    current position, to be overwritten on reuse)."""
    from modegpt_tpu.models.generate import _sample

    tokens = state.last_token[:, None]
    # [L, slots, ...] pools are already the batch layout _model_ragged expects
    logits, ck, cv = _model_ragged(
        spec, layers, other, q_hd_true, tokens, state.cache_k, state.cache_v, state.lengths
    )
    nxt = _sample(logits[:, -1, :], key, temperature, top_k).astype(jnp.int32)
    new_len = jnp.where(active, state.lengths + 1, state.lengths)
    new_last = jnp.where(active, nxt, state.last_token)
    return ServeState(cache_k=ck, cache_v=cv, lengths=new_len, last_token=new_last), nxt


def prefill_slot(pm: PaddedModel, state: ServeState, slot: int, prompt_ids: np.ndarray,
                 bucket: int) -> ServeState:
    """Admit a prompt into `slot`. Prompts longer than `bucket` are
    CHUNKED: each bucket-sized piece runs through the same compiled
    program at its offset, so arbitrarily long prompts reuse one program
    (chunked prefill)."""
    prompt_ids = np.asarray(prompt_ids, dtype=np.int32).reshape(-1)
    P = prompt_ids.shape[0]
    max_len = state.cache_k.shape[3]
    if P >= max_len:
        raise ValueError(f"prompt ({P} tokens) does not fit the cache (max_len {max_len})")
    slot_i = jnp.asarray(slot, jnp.int32)
    n_chunks = max(1, -(-P // bucket))
    for c in range(n_chunks):
        piece = prompt_ids[c * bucket : (c + 1) * bucket]
        real = piece.shape[0]
        padded = np.zeros((1, bucket), np.int32)
        padded[0, :real] = piece
        state = _prefill_chunk_jit(
            pm.spec, pm.layers, pm.other, pm.q_hd_true, state, slot_i,
            jnp.asarray(padded), jnp.asarray(c * bucket, jnp.int32),
            jnp.asarray(real, jnp.int32), jnp.asarray(c == n_chunks - 1),
        )
    return state


def decode_slots(pm: PaddedModel, state: ServeState, active: np.ndarray,
                 temperature: float = 0.0, top_k=None, key=None):
    """One decode step across all slots. Returns (state, tokens [slots])."""
    if key is None:
        key = jax.random.key(0)
    return _decode_slots_jit(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, state,
        jnp.asarray(active), temperature, top_k, key,
    )


class ContinuousBatcher:
    """Host-side continuous batching over the slot table.

    submit() enqueues prompts; run() admits them into free slots, steps
    all active slots each iteration, and returns finished sequences.
    The device programs (one prefill per bucket + one decode step) are
    compiled once and reused for the server's lifetime.
    """

    def __init__(self, pm: PaddedModel, slots: int = 8, max_len: int = 512,
                 prefill_bucket: int = 64, eos_token_id: Optional[int] = None,
                 temperature: float = 0.0):
        self.pm = pm
        self.slots = slots
        self.max_len = max_len
        self.bucket = prefill_bucket
        self.eos = eos_token_id
        self.temperature = temperature
        self.state = init_serve_state(pm, slots, max_len, dtype=pm.other["embed_tokens"].dtype)
        self.queue: List[Tuple[int, np.ndarray, int]] = []  # (req_id, prompt, max_new)
        self.slot_req: List[Optional[int]] = [None] * slots
        self.slot_out: List[List[int]] = [[] for _ in range(slots)]
        self.slot_budget = [0] * slots
        self._next_id = 0

    def submit(self, prompt_ids, max_new_tokens: int = 32) -> int:
        prompt = np.asarray(prompt_ids, np.int32).reshape(-1)
        if prompt.shape[0] + max_new_tokens > self.max_len:
            raise ValueError(
                f"prompt ({prompt.shape[0]}) + max_new_tokens ({max_new_tokens}) "
                f"exceeds max_len ({self.max_len})"
            )
        rid = self._next_id
        self._next_id += 1
        self.queue.append((rid, prompt, max_new_tokens))
        return rid

    def _admit(self):
        for s in range(self.slots):
            if self.slot_req[s] is None and self.queue:
                rid, prompt, budget = self.queue.pop(0)
                self.state = prefill_slot(self.pm, self.state, s, prompt, self.bucket)
                tok = int(self.state.last_token[s])
                self.slot_req[s] = rid
                self.slot_out[s] = list(prompt.tolist()) + [tok]
                self.slot_budget[s] = budget - 1
                if (self.eos is not None and tok == self.eos) or self.slot_budget[s] <= 0:
                    self.slot_budget[s] = 0  # finishes on next sweep

    def run(self, max_steps: int = 10_000) -> Dict[int, List[int]]:
        """Run until the queue and all slots drain; returns {req_id: tokens}."""
        finished: Dict[int, List[int]] = {}
        key = jax.random.key(0)
        for _ in range(max_steps):
            # sweep finished slots BEFORE admitting (frees capacity)
            for s in range(self.slots):
                if self.slot_req[s] is not None and (
                    self.slot_budget[s] <= 0
                    or (self.eos is not None and self.slot_out[s][-1] == self.eos)
                ):
                    finished[self.slot_req[s]] = self.slot_out[s]
                    self.slot_req[s] = None
            self._admit()
            active_mask = np.asarray([r is not None for r in self.slot_req])
            if not active_mask.any():
                if not self.queue:
                    return finished
                continue
            key, sub = jax.random.split(key)
            self.state, toks = decode_slots(
                self.pm, self.state, active_mask, self.temperature, None, sub
            )
            toks = np.asarray(toks)
            for s in range(self.slots):
                if self.slot_req[s] is not None:
                    self.slot_out[s].append(int(toks[s]))
                    self.slot_budget[s] -= 1
        raise RuntimeError("max_steps exceeded")
