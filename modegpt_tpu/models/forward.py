"""Pure-functional decoder-only forward pass with calibration taps.

One forward implementation serves all three architectures (OPT, Llama,
Qwen3) and both the dense and the compressed (heterogeneous per-layer
rank) variants — dense vs compressed is purely a matter of the shapes in
the params pytree plus the per-layer rotary masks. This replaces both the
HF forward used at calibration time and the reference's vendored Rebuild
modeling files (reference: src/patchers/*Rebuild.py).

Calibration statistics are functional taps, not hooks (reference
registers forward hooks, src/adapters/LlamaAdapter.py:71-100): when
``stats_layers`` is non-empty the forward also returns

* ``cov_mlp``: Gram of the post-activation MLP intermediate (the input
  the down projection sees; reference: LlamaAdapter.py:127-136 /
  model_adapter.py:546-553 which re-applies the activation to fc1 out),
* ``cov_q`` / ``cov_k``: per-head Grams of the raw q/k projections
  (pre-RoPE, pre-q_norm; reference: LlamaAdapter.py:115-125),
* ``cov_x``: Gram of the attention-input layernorm output (what
  q/k/v projections see; reference: LlamaAdapter.py:138-147 — also the
  fixed semantics for OPT, whose reference hook was dead code, see
  SURVEY.md §2 bit-rot item 1),
* ``bi_acc``: per-layer Block-Influence accumulators
  ``sum_B mean_T (1 - cos(h_in, h_out))`` (reference: calibration.py:118-124).

Gram matmuls run in float32 at HIGHEST precision on the MXU; the
calibration engine accumulates them across batches in float64 on the
host (the reference computes "matmul in f32 then cast up when acc to
f64", LlamaAdapter.py:110-113).
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.rope import apply_rope, masked_head_rms_norm, rope_cos_sin

__all__ = ["forward", "CalibStats"]

_HI = lax.Precision.HIGHEST


class CalibStats(NamedTuple):
    """Per-batch Gram statistics for `stats_layers` (stacked on axis 0)."""

    cov_mlp: jax.Array  # [n_t, D_int, D_int] (MoE: [n_t, E, D, D])
    cov_q: jax.Array  # [n_t, n_heads, hd, hd]
    cov_k: jax.Array  # [n_t, n_kv_heads, hd, hd]
    cov_x: jax.Array  # [n_t, d_model, d_model]
    bi_acc: jax.Array  # [n_layers]
    # Shared-expert intermediate Gram [n_t, Ds, Ds]; None unless the spec
    # has DeepSeek/qwen2_moe-style shared experts (spec.shared_d_int > 0).
    cov_shared: Optional[jax.Array] = None


def _norm(x, p, kind: str, eps: float):
    if kind == "rmsnorm":
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = (xf * lax.rsqrt(var + eps)).astype(x.dtype)
        return out * p["scale"]
    if kind == "rmsnorm_1p":
        # gemma: scale by (1 + weight), everything in f32 before the cast
        # (HF GemmaRMSNorm.forward)
        xf = x.astype(jnp.float32)
        var = jnp.mean(xf * xf, axis=-1, keepdims=True)
        out = xf * lax.rsqrt(var + eps) * (1.0 + p["scale"].astype(jnp.float32))
        return out.astype(x.dtype)
    # layernorm
    xf = x.astype(jnp.float32)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.var(xf, axis=-1, keepdims=True)
    out = ((xf - mean) * lax.rsqrt(var + eps)).astype(x.dtype)
    return out * p["scale"] + p["bias"]


def _act_quant(x):
    """Dynamic symmetric per-token int8 quantization of the LAST axis:
    x [..., d] -> (codes int8 [..., d], scale f32 [..., 1]). max|code| is
    127 by construction (the clip only guards f32 division rounding)."""
    xf = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(xf), axis=-1, keepdims=True)
    s = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(xf / s), -127, 127).astype(jnp.int8)
    return q, s


def _dot_w8a8(x, kq, wscale):
    """W8A8 matmul: int8 activations x int8 weights -> int32 on the MXU
    (2x the bf16 peak on v5e), rescaled by (per-token act scale) x
    (per-out-channel weight scale). Used on compute-bound paths (serving
    prefill); decode stays weight-only int8 (memory-bound — the win
    there is the halved weight read, which both modes share)."""
    xq, xs = _act_quant(x)
    acc = lax.dot_general(
        xq, kq, (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return (acc.astype(jnp.float32) * xs * wscale.astype(jnp.float32)).astype(x.dtype)


def _linear(x, p):
    if "kernel_qa" in p:
        # W8A8 execution view (quantize.with_act_quant): same resident
        # int8 codes as the weight-only path, but the activation is
        # dynamically quantized per token and the dot runs int8 x int8.
        y = _dot_w8a8(x, p["kernel_qa"], p["scale"])
    elif "kernel_q" in p:
        # int8-resident weights: the convert fuses into the dot's operand
        # read (weight HBM traffic stays int8 — decode is memory-bound),
        # and the symmetric per-out-channel scale applies to the OUTPUT,
        # which is mathematically identical and never materialises a
        # dequantized weight.
        y = (x @ p["kernel_q"].astype(x.dtype)) * p["scale"].astype(x.dtype)
    else:
        y = x @ p["kernel"]
    if "bias" in p:
        y = y + p["bias"]
    return y


def _act(x, kind: str):
    if kind == "silu":
        return jax.nn.silu(x)
    if kind == "relu":
        return jax.nn.relu(x)
    if kind == "gelu":
        return jax.nn.gelu(x, approximate=False)  # HF "gelu" is exact erf
    if kind in ("gelu_new", "gelu_pytorch_tanh"):
        return jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unknown activation {kind}")


def _scale_embed(spec: ModelSpec, x: jax.Array) -> jax.Array:
    """gemma/gemma2 scale token embeddings by sqrt(d_model), with the
    normaliser rounded through the model dtype (HF GemmaModel.forward)."""
    if spec.arch in ("gemma", "gemma2"):
        return x * jnp.asarray(spec.d_model**0.5, x.dtype)
    return x


def _softcap(x: jax.Array, cap: Optional[float]) -> jax.Array:
    """gemma2 logit soft-capping: cap * tanh(x / cap); identity when None."""
    if cap is None:
        return x
    return jnp.tanh(x / cap) * cap


def _gram(x2d: jax.Array, prec: str = "highest") -> jax.Array:
    """X^T X with f32 accumulation.

    prec selects the MXU pass count (the speed/precision knob the
    reference lacks — its Grams are f32 torch matmuls, which HIGHEST
    matches bit-for-bit in exponent range):
      * "highest": f32 inputs, 6-pass MXU (default; the parity oracle);
      * "high":    f32 inputs, 3-pass MXU (~2x the gram throughput);
      * "bf16":    bf16 inputs, single pass, f32 accumulate (~6x; also
        halves the HBM read of the tapped activation when the model is
        bf16). Measured factor deviation vs the highest oracle is
        documented in tests/test_calibration.py::test_gram_precision.
    """
    if prec == "bf16":
        xb = x2d.astype(jnp.bfloat16)
        return jnp.einsum("ni,nj->ij", xb, xb, preferred_element_type=jnp.float32)
    p = _HI if prec == "highest" else lax.Precision.HIGH
    xf = x2d.astype(jnp.float32)
    return jnp.einsum("ni,nj->ij", xf, xf, precision=p)


def _head_gram(x: jax.Array, prec: str = "highest") -> jax.Array:
    """[B,T,H,hd] -> per-head Gram [H, hd, hd] (see _gram for prec)."""
    if prec == "bf16":
        xb = x.astype(jnp.bfloat16)
        return jnp.einsum("bthi,bthj->hij", xb, xb, preferred_element_type=jnp.float32)
    p = _HI if prec == "highest" else lax.Precision.HIGH
    xf = x.astype(jnp.float32)
    return jnp.einsum("bthi,bthj->hij", xf, xf, precision=p)


def _moe_mlp(spec: ModelSpec, p: Dict, x: jax.Array, collect: bool):
    """Mixtral-style sparse-MoE MLP (HF semantics: softmax over ALL
    experts, top-k, renormalise over the selected k, weighted sum of
    expert outputs — modeling_mixtral.MixtralSparseMoeBlock).

    TPU-native formulation: every expert runs on every token as one
    batched einsum over the stacked expert kernels [E, d, D] and the
    non-selected experts are zeroed by the routing weights — static
    shapes, no gather/scatter dispatch, exact including tie-breaks
    (lax.top_k and torch.topk both pick the lower index). The E/k FLOP
    overhead is the price of MXU-friendly uniformity; a capacity-based
    dispatch kernel is the serving-scale follow-up.

    DeepSeek-style shared experts (spec.shared_d_int > 0, the qwen2_moe
    family): one dense gated MLP over ALL tokens is added to the routed
    output — scaled by a per-token sigmoid scalar gate when
    spec.shared_expert_gate (HF Qwen2MoeSparseMoeBlock.forward), added
    plainly otherwise (DeepSeek semantics).

    Returns (y, h_routed, h_shared): h_routed [B, T, E, D] is the
    per-expert down-projection input masked to the tokens actually ROUTED
    to that expert (0/1, not weight-scaled) — exactly the rows the
    expert's down projection sees in a sparse execution, which is what
    the per-expert Type-I Gram must accumulate; h_shared [B, T, Ds] is
    the shared expert's down-projection input (all tokens). Both None
    when collect=False (h_shared also None without shared experts).
    """
    E, k = spec.n_experts, spec.experts_per_tok
    logits = _linear(x, p["router"])  # [B, T, E] (int8-resident safe)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    w, idx = lax.top_k(probs, k)  # [B, T, k]
    if spec.norm_topk_prob:  # mixtral always; qwen3_moe behind the flag
        w = w / jnp.sum(w, axis=-1, keepdims=True)
    hot = jax.nn.one_hot(idx, E, dtype=jnp.float32)  # [B, T, k, E]
    w_full = jnp.einsum("btke,btk->bte", hot, w).astype(x.dtype)  # 0 or renormalised weight

    def expert_mm(xx, ep, eq, xs_expand=False):  # [.., d] x [E, d, f]
        if "kernel_qa" in ep:
            # W8A8: per-token act scale broadcasts onto the einsum output
            # (xs_expand adds the new expert axis for btd->btef outputs).
            xq, xs = _act_quant(xx)
            out = jnp.einsum(eq, xq, ep["kernel_qa"], preferred_element_type=jnp.int32)
            s = xs[..., None] if xs_expand else xs
            return (out.astype(jnp.float32) * s
                    * ep["scale"].astype(jnp.float32)).astype(xx.dtype)
        if "kernel_q" in ep:
            out = jnp.einsum(eq, xx, ep["kernel_q"].astype(xx.dtype))
            return out * ep["scale"].astype(xx.dtype)
        return jnp.einsum(eq, xx, ep["kernel"])

    g = expert_mm(x, p["experts"]["gate"], "btd,edf->btef", xs_expand=True)
    u = expert_mm(x, p["experts"]["up"], "btd,edf->btef", xs_expand=True)
    h = _act(g, spec.act) * u  # [B, T, E, D]
    down = p["experts"]["down"]
    if "kernel_qa" in down or "kernel_q" in down:
        y_e = expert_mm(h, down, "btef,efd->bted")
        y = jnp.einsum("bted,bte->btd", y_e, w_full)
    else:
        y = jnp.einsum("btef,efd,bte->btd", h, down["kernel"], w_full)

    h_shared = None
    if "shared" in p:
        ys, hs = _shared_expert(spec, p, x)
        y = y + ys
        if collect:
            h_shared = hs

    if collect:
        routed = jnp.sum(hot, axis=2).astype(h.dtype)  # 0/1 membership [B, T, E]
        return y, h * routed[..., None], h_shared
    return y, None, None


def _shared_expert(spec: ModelSpec, p: Dict, x: jax.Array):
    """DeepSeek/qwen2_moe shared expert: dense gated MLP over all tokens,
    optionally scaled by a per-token sigmoid scalar gate (HF
    Qwen2MoeSparseMoeBlock.forward; sigmoid in f32 — exact for f32
    models, sub-ulp for bf16). Returns (y_shared, h_intermediate)."""
    sp = p["shared"]
    hs = _act(_linear(x, sp["gate"]), spec.act) * _linear(x, sp["up"])
    ys = _linear(hs, sp["down"])
    if "shared_gate" in p:
        gate_logit = _linear(x, p["shared_gate"]).astype(jnp.float32)
        ys = ys * jax.nn.sigmoid(gate_logit).astype(ys.dtype)
    return ys, hs


def _moe_gram(h_routed: jax.Array, prec: str = "highest") -> jax.Array:
    """[B,T,E,D] routed-masked intermediates -> per-expert Gram [E,D,D]."""
    if prec == "bf16":
        hb = h_routed.astype(jnp.bfloat16)
        return jnp.einsum("btef,bteg->efg", hb, hb, preferred_element_type=jnp.float32)
    p = _HI if prec == "highest" else lax.Precision.HIGH
    hf = h_routed.astype(jnp.float32)
    return jnp.einsum("btef,bteg->efg", hf, hf, precision=p)


def _moe_mlp_dispatch(
    spec: ModelSpec,
    p: Dict,
    x: jax.Array,
    capacity_factor: float,
    token_valid: Optional[jax.Array] = None,
):
    """Capacity-based sparse-MoE dispatch — the serving-scale execution of
    the same math as `_moe_mlp` (which runs every expert on every token
    and zeroes non-selected outputs: exact but E/k-times the FLOPs).

    TPU-native token dispatch with STATIC shapes: sort the N*k
    (token, expert) assignments by expert, give each expert a fixed
    capacity C = ceil(capacity_factor * N * k / E) slots, gather its
    tokens into an [E, C, d] buffer, run ONE batched einsum per
    projection over the expert stack, and weighted-scatter the results
    back. Per-expert FLOPs scale with C instead of N — for E=60 experts
    top-4 (Qwen1.5-MoE) at capacity_factor=2 that is ~13% of the
    dense-all-experts cost.

    Assignments beyond an expert's capacity are DROPPED (their routing
    weight contributes nothing — standard capacity-factor semantics,
    e.g. Switch Transformer). capacity_factor >= E/k guarantees no
    drops, making this bit-exact with `_moe_mlp` up to float
    reassociation. Shared experts (qwen2_moe) are dense and unaffected.

    token_valid [B, T] (optional): tokens marked False (masked serving
    slots mid-prefill, padded prefill tails) are routed to a VIRTUAL
    overflow expert — they never compete with real tokens for capacity
    (without this, a batch of mostly-garbage rows could evict a real
    token's assignment and silently corrupt its output).
    """
    B, T, d = x.shape
    N = B * T
    E, k = spec.n_experts, spec.experts_per_tok
    import math

    C = max(1, min(N, int(math.ceil(capacity_factor * N * k / E))))

    xf = x.reshape(N, d)
    logits = _linear(xf, p["router"])  # [N, E] (int8-resident safe)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    w, idx = lax.top_k(probs, k)  # [N, k]
    if spec.norm_topk_prob:
        w = w / jnp.sum(w, axis=-1, keepdims=True)

    expert_of = idx.reshape(-1)  # [N*k]
    if token_valid is not None:
        # invalid tokens -> virtual expert E: sorts after every real
        # expert, scatters out of bounds (dropped), gathers masked.
        tv = jnp.repeat(token_valid.reshape(-1), k)
        expert_of = jnp.where(tv, expert_of, E)
    token_of = jnp.repeat(jnp.arange(N, dtype=jnp.int32), k)
    w_flat = w.reshape(-1).astype(x.dtype)

    # Stable sort by expert id; rank-within-expert = position - segment
    # start. Earlier tokens win capacity slots (deterministic drops).
    order = jnp.argsort(expert_of, stable=True)
    sorted_e = expert_of[order]
    counts = jnp.zeros((E + 1,), jnp.int32).at[expert_of].add(1)
    starts = jnp.cumsum(counts) - counts
    pos = jnp.arange(N * k, dtype=jnp.int32) - starts[sorted_e]
    keep = (pos < C) & (sorted_e < E)
    slot = jnp.clip(pos, 0, C - 1)
    tok_sorted = token_of[order]

    # Scatter-ADD into the dispatch buffer: kept assignments target unique
    # (expert, slot) pairs; dropped/invalid ones add zeros (out-of-bounds
    # scatter indices from the virtual expert are dropped by jax).
    buf = jnp.zeros((E, C, d), x.dtype)
    vals = jnp.where(keep[:, None], xf[tok_sorted], jnp.zeros((), x.dtype))
    buf = buf.at[sorted_e, slot].add(vals)

    def expert_mm(xx, ep, eq):
        if "kernel_qa" in ep:
            # W8A8: xx is [E, C, d] so the per-token act scale [E, C, 1]
            # broadcasts directly onto the [E, C, f] output.
            xq, xs = _act_quant(xx)
            out = jnp.einsum(eq, xq, ep["kernel_qa"], preferred_element_type=jnp.int32)
            scale = ep["scale"]
            scale = scale[:, None, :] if scale.ndim == 2 else scale
            return (out.astype(jnp.float32) * xs
                    * scale.astype(jnp.float32)).astype(xx.dtype)
        if "kernel_q" in ep:
            # int8/int4 scales: per-(expert, out-channel) [E, f] from the
            # in-memory quantizer, or flat [f] from older artifacts —
            # align either to the [E, C, f] output.
            out = jnp.einsum(eq, xx, ep["kernel_q"].astype(xx.dtype))
            scale = ep["scale"]
            scale = scale[:, None, :] if scale.ndim == 2 else scale
            return out * scale.astype(xx.dtype)
        return jnp.einsum(eq, xx, ep["kernel"])

    g = expert_mm(buf, p["experts"]["gate"], "ecd,edf->ecf")
    u = expert_mm(buf, p["experts"]["up"], "ecd,edf->ecf")
    h = _act(g, spec.act) * u  # [E, C, D]
    y_e = expert_mm(h, p["experts"]["down"], "ecf,efd->ecd")

    # Combine: gather each assignment's expert output, weight, scatter-add
    # back to its token (virtual-expert gathers clip but are masked out).
    picked = y_e[jnp.minimum(sorted_e, E - 1), slot]  # [N*k, d]
    picked = jnp.where(keep[:, None], picked * w_flat[order][:, None], jnp.zeros((), x.dtype))
    y = jnp.zeros((N, d), x.dtype).at[tok_sorted].add(picked).reshape(B, T, d)

    if "shared" in p:
        ys, _ = _shared_expert(spec, p, x)
        y = y + ys
    return y


def gqa_scores(q, k, precision=None):
    """q [B, H, S, R] x k [B, Hk, T, R] -> scores [B, H, S, T] WITHOUT
    materialising a repeated-to-H copy of k.

    `jnp.repeat(k, H//Hk, axis=1)` before the einsum is what the HF
    reference does (LlamaRebuild.py repeat_kv) — on TPU that writes and
    re-reads an H/Hk-times-larger K (and V) every step, and decode is
    HBM-bandwidth-bound: at 16 slots x 512 positions it roughly 6x'd the
    decode step's HBM traffic (measured 12.5ms -> ~2ms on a 0.5B shape).
    Instead the query heads are viewed as [Hk, G] groups (repeat
    semantics: query head h reads kv head h//G) and the contraction
    batches over Hk with G as a free dimension — same per-element
    reduction, no repeated operand."""
    B, H, S, R = q.shape
    Hk = k.shape[1]
    if H == Hk:
        return jnp.einsum("bhsd,bhtd->bhst", q, k, precision=precision)
    G = H // Hk
    qg = q.reshape(B, Hk, G, S, R)
    s = jnp.einsum("bkgsd,bktd->bkgst", qg, k, precision=precision)
    return s.reshape(B, H, S, -1)


def gqa_attend(probs, v, precision=None):
    """probs [B, H, S, T] x v [B, Hk, T, Rv] -> [B, H, S, Rv] without
    repeating v to H heads (see gqa_scores)."""
    B, H, S, T = probs.shape
    Hk = v.shape[1]
    if H == Hk:
        return jnp.einsum("bhst,bhtd->bhsd", probs, v, precision=precision)
    G = H // Hk
    pg = probs.reshape(B, Hk, G, S, T)
    a = jnp.einsum("bkgst,bktd->bkgsd", pg, v, precision=precision)
    return a.reshape(B, H, S, -1)


def _attention(
    q, k, v, scaling: float, window: Optional[int], impl: str = "xla",
    softcap: Optional[float] = None, window_arr: Optional[jax.Array] = None,
):
    """Causal (optionally sliding-window) dot-product attention.

    q: [B, H, T, r], k/v: [B, Hk, T, r_k] — kv heads are repeated to H.
    Softmax in float32 (reference: LlamaRebuild.py:241).
    softcap: gemma2 attention-score capping (applied pre-mask, as HF's
    eager path does) — forces the XLA path (the Pallas kernel's online
    softmax has no capping hook).

    impl="flash" routes to the Pallas online-softmax kernel
    (modegpt_tpu/kernels/flash_attention.py) — used on TPU where it
    avoids materialising [T, T] scores in HBM; sliding-window layers and
    tiny shapes fall back to the XLA path.
    """
    T = q.shape[2]
    if impl == "ring":
        # Context-parallel ring attention: ONLY valid inside a shard_map
        # over parallel.ring.CTX_AXIS where q/k/v hold this device's
        # sequence chunk (parallel/ring.py drives it for calibration).
        from modegpt_tpu.parallel.ring import ring_attention

        return ring_attention(q, k, v, scaling, softcap=softcap, window=window)
    if impl == "flash" and T >= 128 and softcap is None and window_arr is None:
        from modegpt_tpu.kernels.flash_attention import flash_attention, flash_attention_hbm

        if T > 8192:
            # Long context: K/V stay in HBM, tiles streamed via
            # double-buffered DMA (the in-VMEM variant holds whole K/V
            # per program — fine to ~8k tokens, wasteful beyond).
            return flash_attention_hbm(q, k, v, scale=scaling, window=window)
        return flash_attention(q, k, v, scale=scaling, window=window)
    scores = gqa_scores(q, k, precision=_HI) * scaling
    scores = _softcap(scores.astype(jnp.float32), softcap)
    qi = jnp.arange(T, dtype=jnp.int32)[:, None]
    ki = jnp.arange(T, dtype=jnp.int32)[None, :]
    mask = ki <= qi
    if window is not None:
        mask = mask & (ki > qi - window)
    if window_arr is not None:
        # traced per-layer window from a scanned stack (0 = full)
        mask = mask & jnp.where(window_arr > 0, ki > qi - window_arr, True)
    scores = jnp.where(mask[None, None], scores, -jnp.inf)
    probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
    return gqa_attend(probs, v, precision=_HI)


def _layer(
    spec: ModelSpec,
    layer_idx: int,
    p: Dict,
    x: jax.Array,
    cos: Optional[jax.Array],
    sin: Optional[jax.Array],
    collect,
    attn_impl: str = "xla",
    gram_precision: str = "highest",
):
    """One decoder layer. Returns (x_out, taps or None).

    collect: False (no taps), True (Gram taps), or "raw" — return the
    RAW tapped tensors (x_ln / q / k / h) instead of their Grams. The
    raw mode costs zero extra FLOPs (the tensors are computed by the
    forward anyway) and lets the caller decide whether to pay for the
    Gram matmuls — the windowed calibration wraps them in a lax.cond so
    only the live window's layers execute them (calibrate_window)."""
    B, T, _ = x.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[layer_idx] // H
    v_hd = spec.v_ranks[layer_idx] // Hk
    rotary_mask = p.get("rotary_mask")

    taps = {}
    pre_ln = spec.do_layer_norm_before  # False = post-LN OPT (e.g. OPT-350m)

    # ---- attention ----
    residual = x
    x_ln = (
        _norm(x, p["attn_norm"], spec.norm, spec.norm_eps)
        if (pre_ln and spec.pre_norms)
        else x
    )
    q = _linear(x_ln, p["q"])  # [B, T, H*q_hd]
    k = _linear(x_ln, p["k"])
    v = _linear(x_ln, p["v"])

    if collect == "raw":
        taps["x_ln"] = x_ln
        taps["q"] = q.reshape(B, T, H, q_hd)
        taps["k"] = k.reshape(B, T, Hk, q_hd)
    elif collect:
        taps["cov_x"] = _gram(x_ln.reshape(-1, spec.d_model), gram_precision)
        taps["cov_q"] = _head_gram(q.reshape(B, T, H, q_hd), gram_precision)
        taps["cov_k"] = _head_gram(k.reshape(B, T, Hk, q_hd), gram_precision)

    if spec.flat_qk_norm:
        # olmo2: one RMSNorm over the whole projection output
        from modegpt_tpu.ops.rope import masked_flat_rms_norm

        q = masked_flat_rms_norm(
            q, p["q_norm"]["scale"], rotary_mask, H, spec.head_dim,
            spec.group_size, spec.norm_eps,
        )
        k = masked_flat_rms_norm(
            k, p["k_norm"]["scale"], rotary_mask, Hk, spec.head_dim, 1, spec.norm_eps
        )

    q = q.reshape(B, T, H, q_hd)
    k = k.reshape(B, T, Hk, q_hd)
    v = v.reshape(B, T, Hk, v_hd)

    if spec.qk_norm:
        q = masked_head_rms_norm(q, p["q_norm"]["scale"], rotary_mask, spec.group_size, spec.norm_eps)
        k = masked_head_rms_norm(k, p["k_norm"]["scale"], rotary_mask, 1, spec.norm_eps)

    q = q.transpose(0, 2, 1, 3)  # [B, H, T, q_hd]
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)

    if spec.uses_rope:
        q, k = apply_rope(q, k, cos, sin, rotary_mask)

    window = None
    if spec.layer_types and spec.layer_types[layer_idx] == "sliding_attention":
        window = spec.sliding_window

    # compressed-head-dim scaling (reference: LlamaRebuild.py:282);
    # gemma2 fixes the scale at query_pre_attn_scalar regardless of dim
    scaling = (
        spec.query_pre_attn_scalar**-0.5
        if spec.query_pre_attn_scalar is not None
        else q_hd**-0.5
    )
    attn = _attention(q, k, v, scaling, window, attn_impl, spec.attn_logit_softcap)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H * v_hd)
    a_out = _linear(attn, p["o"])
    if spec.post_norms:  # gemma2 post-attention sandwich norm
        a_out = _norm(a_out, p["post_attn_norm"], spec.norm, spec.norm_eps)
    x = residual + a_out
    if not pre_ln:
        x = _norm(x, p["attn_norm"], spec.norm, spec.norm_eps)

    # ---- MLP ----
    residual = x
    x_ln2 = (
        _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)
        if (pre_ln and spec.pre_norms)
        else x
    )
    if spec.is_moe_layer(layer_idx):
        y, h_routed, h_shared = _moe_mlp(spec, p, x_ln2, collect)
        if collect == "raw":
            taps["h_moe"] = h_routed
            if h_shared is not None:
                taps["h_shared"] = h_shared
        elif collect:
            taps["cov_mlp"] = _moe_gram(h_routed)
            if h_shared is not None:
                taps["cov_shared"] = _gram(
                    h_shared.reshape(-1, h_shared.shape[-1]), gram_precision
                )
        x = residual + y
    else:
        if spec.gated_mlp:
            h = _act(_linear(x_ln2, p["gate"]), spec.act) * _linear(x_ln2, p["up"])
        else:
            h = _act(_linear(x_ln2, p["up"]), spec.act)
        if collect == "raw":
            taps["h"] = h
        elif collect:
            taps["cov_mlp"] = _gram(h.reshape(-1, h.shape[-1]), gram_precision)
        m_out = _linear(h, p["down"])
        if spec.post_norms:  # gemma2 post-feedforward sandwich norm
            m_out = _norm(m_out, p["post_mlp_norm"], spec.norm, spec.norm_eps)
        x = residual + m_out
    if not pre_ln:
        x = _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)

    return x, (taps if collect else None)


def _bi_piece(h_in: jax.Array, h_out: jax.Array) -> jax.Array:
    """sum_B mean_T (1 - cosine_sim(h_in, h_out)) in f64-ready f32.

    (reference: calibration.py:122-124 — torch.cosine_similarity uses
    eps=1e-8 clamping on the norms.)
    """
    a = h_in.astype(jnp.float32)
    b = h_out.astype(jnp.float32)
    num = jnp.sum(a * b, axis=-1)
    na = jnp.linalg.norm(a, axis=-1)
    nb = jnp.linalg.norm(b, axis=-1)
    cos = num / jnp.maximum(na * nb, 1e-8)
    return jnp.sum(jnp.mean(1.0 - cos, axis=1), axis=0)


@partial(
    jax.jit,
    static_argnames=("spec", "stats_layers", "return_hidden", "attn_impl", "gram_precision"),
)
def forward(
    spec: ModelSpec,
    params: Dict,
    input_ids: jax.Array,
    stats_layers: Tuple[int, ...] = (),
    return_hidden: bool = False,
    attn_impl: str = "auto",
    gram_precision: str = "highest",
):
    """Run the model. Returns (logits, CalibStats | None).

    Args:
      spec: static architecture (hashable; jit static argument).
      params: pytree of weights (kernels in [in, out] layout).
      input_ids: [B, T] int32.
      stats_layers: layer indices for which Gram taps are collected.
        BI accumulators are always computed for every layer when
        stats_layers is non-empty.
    """
    B, T = input_ids.shape
    x = _scale_embed(spec, params["embed_tokens"][input_ids])
    if spec.arch in ("opt", "gpt2"):
        # learned positions: OPT hardcodes offset 2 (HF
        # OPTLearnedPositionalEmbedding; reference: OPTRebuild.py:58-84),
        # GPT-2 none.
        if "project_in" in params:  # OPT-350m-style word_embed_proj_dim
            x = _linear(x, params["project_in"])
        pos = jnp.arange(T, dtype=jnp.int32) + spec.position_offset
        x = x + params["embed_positions"][pos][None, :, :]

    cos = sin = None
    if spec.uses_rope:
        cos, sin = rope_cos_sin(jnp.arange(T, dtype=jnp.int32), spec.head_dim, spec.rope_theta, dtype=x.dtype, scaling=spec.rope_scaling)

    if attn_impl == "auto":
        # Flash on TPU — except under jax_enable_x64, where Pallas grid
        # index-map integer promotion recurses in jax 0.9 (parity mode
        # only needs f64 in the solvers; XLA attention is fine for eval).
        use_flash = jax.default_backend() == "tpu" and not jax.config.jax_enable_x64
        attn_impl = "flash" if use_flash else "xla"

    collect = len(stats_layers) > 0
    taps_by_layer = {}
    bi = []
    hidden = [x] if return_hidden else None

    for l in range(spec.n_layers):
        h_in = x
        x, taps = _layer(
            spec, l, params["layers"][l], x, cos, sin,
            collect and (l in stats_layers), attn_impl, gram_precision,
        )
        if collect:
            bi.append(_bi_piece(h_in, x))
        if taps is not None:
            taps_by_layer[l] = taps
        if return_hidden:
            hidden.append(x)

    if params.get("final_norm") is not None:
        x = _norm(x, params["final_norm"], spec.norm, spec.norm_eps)
    if "project_out" in params:
        x = _linear(x, params["project_out"])

    if params.get("lm_head") is not None:
        logits = _linear(x, params["lm_head"])
    else:
        logits = x @ params["embed_tokens"].T  # tied embeddings
    logits = _softcap(logits, spec.final_logit_softcap)

    stats = None
    if collect:
        has_shared = all("cov_shared" in taps_by_layer[l] for l in stats_layers)
        stats = CalibStats(
            cov_mlp=jnp.stack([taps_by_layer[l]["cov_mlp"] for l in stats_layers]),
            cov_q=jnp.stack([taps_by_layer[l]["cov_q"] for l in stats_layers]),
            cov_k=jnp.stack([taps_by_layer[l]["cov_k"] for l in stats_layers]),
            cov_x=jnp.stack([taps_by_layer[l]["cov_x"] for l in stats_layers]),
            bi_acc=jnp.stack(bi),
            cov_shared=jnp.stack([taps_by_layer[l]["cov_shared"] for l in stats_layers])
            if has_shared
            else None,
        )
    if return_hidden:
        return logits, stats, hidden
    return logits, stats
