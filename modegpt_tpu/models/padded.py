"""Padded-uniform execution for heterogeneous-rank compressed models.

The compressed model has different q/k/v/o/gate dims per layer
(reference: per-layer rank lists written by src/adapters/LlamaAdapter.py:250-302
and consumed by the vendored Rebuild files). The unrolled forward in
`models/forward.py` handles that exactly but compiles one XLA body per
layer — compile time grows linearly in depth, which hurts serving
restarts and large models.

This module trades a small amount of padded FLOPs for layer-count-
independent compile time: every layer's factors are zero-padded to the
stack-wide max rank per module, parameters are stacked to ``[L, ...]``
leaves, and the whole stack runs as ONE ``lax.scan`` body — both for the
full forward and for the KV-cache decode step. With MoDeGPT's smoothed
global allocation the rank spread across layers is modest, so the
padding overhead is typically a few percent (see `padding_overhead`).

Exactness (bit-for-bit vs the unrolled path up to float reassociation):

* Zero-padded projection columns produce zero q/k/v coordinates, which
  contribute nothing to attention scores or outputs; zero-padded o/down
  rows consume those zero coordinates. Biases are zero at pad positions.
* For RoPE architectures, q/k pads use a HALF-SPLIT layout per head —
  ``[first-half | 0.. | second-half | 0..]`` — so ``rotate_half``'s
  pairing of position ``i`` with ``i + R/2`` still pairs true coordinate
  with true coordinate (the rotary mask ordering is ``concat(topk,
  topk + hd/2)``, ops/rope.py). Rotating a (0, 0) pair yields (0, 0).
* Attention scaling uses the TRUE per-layer head dim ``r^-1/2``
  (reference: LlamaRebuild.py:282) — carried as a scanned scalar and
  pre-multiplied into q (softmax(q*s . k) == softmax((q . k) * s)).
* Qwen3's masked per-head q/k RMSNorm divides by the TRUE rank, not the
  padded one: variance is computed as ``sum(x^2) / r_true`` (pads are
  zero, so the sum is unaffected; reference: DenseQwenRebuild.py:262-286).

Verified against the unrolled forward in tests/test_padded.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from modegpt_tpu.models.forward import _act, _attention, _linear, _norm
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.rope import apply_rope, apply_rope_ragged, rope_cos_sin

__all__ = [
    "PaddedModel",
    "pad_to_uniform",
    "padding_overhead",
    "forward_padded",
    "init_cache_padded",
    "prefill_padded",
    "generate_padded",
]


class PaddedModel(NamedTuple):
    """Uniform-shape stacked model: `spec` has the PADDED (uniform) ranks;
    `layers` holds [L, ...] stacked leaves; `meta` carries per-layer true
    dims needed at runtime (everything else is exact through zeros)."""

    spec: ModelSpec  # padded, uniform ranks (hashable, jit-static)
    layers: Dict  # stacked padded per-layer params
    other: Dict  # non-layer params (embed, final norm, lm_head, ...)
    q_hd_true: jax.Array  # [L] f32 — true per-head q/k dim per layer


def _pad_head_axis(x, n_heads: int, r_true: int, R: int, rope: bool, axis: int):
    """Pad a head-major axis of size n_heads*r_true to n_heads*R with
    zeros; `rope=True` uses the half-split layout."""
    if r_true == R:
        return x
    x = jnp.moveaxis(x, axis, -1)
    shape = x.shape[:-1]
    xh = x.reshape(*shape, n_heads, r_true)
    out = jnp.zeros((*shape, n_heads, R), dtype=x.dtype)
    if rope:
        h, Rh = r_true // 2, R // 2
        out = out.at[..., :h].set(xh[..., :h])
        out = out.at[..., Rh : Rh + h].set(xh[..., h:])
    else:
        out = out.at[..., :r_true].set(xh)
    return jnp.moveaxis(out.reshape(*shape, n_heads * R), -1, axis)


def _pad_tail(x, true: int, target: int, axis: int):
    if true == target:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, target - true)
    return jnp.pad(x, pad)


def _pad_linear(p: Dict, pad_in=None, pad_out=None) -> Dict:
    """pad_in/pad_out: None or (fn taking (array, axis))."""
    out = dict(p)
    k = p["kernel"]
    if pad_in is not None:
        k = pad_in(k, 0)
    if pad_out is not None:
        k = pad_out(k, 1)
    out["kernel"] = k
    if "bias" in p and pad_out is not None:
        out["bias"] = pad_out(p["bias"], 0)
    return out


def pad_to_uniform(spec: ModelSpec, params: Dict) -> PaddedModel:
    """Zero-pad every layer to the stack-wide max rank per module and
    stack the layer params into [L, ...] leaves.

    Mixed dense/MoE stacks (qwen3_moe mlp_only_layers): every layer
    carries BOTH MLP branches — zero dense kernels on MoE layers, zero
    expert/router kernels on dense layers — plus a scanned ``is_moe``
    flag; a lax.cond inside the scanned body executes only the live
    branch (no FLOP overhead). The memory cost is the minority kind's
    zero kernels; real qwen3_moe configs have few dense layers, so the
    waste is small — for dense-majority stacks prefer the unrolled path
    (compressed_exec='auto' already does).
    """
    # Mixed sliding/full stacks (gemma2 alternates): the per-layer window
    # becomes a SCANNED leaf ("window", 0 = full attention) consumed by
    # _layer_padded — one scanned body still serves every layer.
    mixed_windows = spec.mixed_windows
    mixed_moe = spec.mixed_moe
    H, Hk = spec.n_heads, spec.n_kv_heads
    L = spec.n_layers
    rope = spec.uses_rope

    Rq = max(spec.q_ranks[l] // H for l in range(L))
    Rv = max(spec.v_ranks[l] // Hk for l in range(L))
    Rg = max(spec.gate_ranks)
    if mixed_moe:
        Rg_dense = max(spec.gate_ranks[l] for l in range(L) if not spec.is_moe_layer(l))
        Rg_moe = max(spec.gate_ranks[l] for l in range(L) if spec.is_moe_layer(l))
        d = spec.d_model
        E = spec.n_experts
        # find a live template of each kind for the zero-filled twin
        tmpl_moe = next(
            params["layers"][l] for l in range(L) if spec.is_moe_layer(l)
        )
        tmpl_dense = next(
            params["layers"][l] for l in range(L) if not spec.is_moe_layer(l)
        )
        pdtype = tmpl_moe["router"]["kernel"].dtype
    # All layers must agree on pytree structure for stacking: if ANY layer
    # carries a rotary mask (or a RoPE layer needs q/k padding), every
    # layer gets one (identity mask for untouched layers).
    need_masks = spec.has_rotary_masks or (
        rope and any(spec.q_ranks[l] // H != Rq for l in range(L))
    )

    padded_layers = []
    for l in range(L):
        p = params["layers"][l]
        rq = spec.q_ranks[l] // H
        rv = spec.v_ranks[l] // Hk
        rg = spec.gate_ranks[l]

        qk_out_q = lambda x, ax: _pad_head_axis(x, H, rq, Rq, rope, ax)
        qk_out_k = lambda x, ax: _pad_head_axis(x, Hk, rq, Rq, rope, ax)
        v_out = lambda x, ax: _pad_head_axis(x, Hk, rv, Rv, False, ax)
        o_in = lambda x, ax: _pad_head_axis(x, H, rv, Rv, False, ax)
        g_out = lambda x, ax: _pad_tail(x, rg, Rg, ax)
        g_in = lambda x, ax: _pad_tail(x, rg, Rg, ax)

        q = {
            **{
                k_: p[k_]
                for k_ in ("attn_norm", "mlp_norm", "post_attn_norm", "post_mlp_norm")
                if k_ in p
            },
            "q": _pad_linear(p["q"], pad_out=qk_out_q),
            "k": _pad_linear(p["k"], pad_out=qk_out_k),
            "v": _pad_linear(p["v"], pad_out=v_out),
            "o": _pad_linear(p["o"], pad_in=o_in),
        }
        if mixed_moe:
            # both branches on every layer (module docstring): the live
            # kind's kernels padded to its own kind-wide max, the other
            # kind zero-filled; lax.cond picks the branch at scan time
            if spec.is_moe_layer(l):
                ek = p["experts"]
                q["router"] = p["router"]
                q["experts"] = {
                    "gate": {"kernel": _pad_tail(ek["gate"]["kernel"], rg, Rg_moe, 2)},
                    "up": {"kernel": _pad_tail(ek["up"]["kernel"], rg, Rg_moe, 2)},
                    "down": {"kernel": _pad_tail(ek["down"]["kernel"], rg, Rg_moe, 1)},
                }
                q["up"] = {"kernel": jnp.zeros((d, Rg_dense), pdtype)}
                q["down"] = {"kernel": jnp.zeros((Rg_dense, d), pdtype)}
                if spec.gated_mlp:
                    q["gate"] = {"kernel": jnp.zeros((d, Rg_dense), pdtype)}
            else:
                q["up"] = _pad_linear(
                    p["up"], pad_out=lambda x, ax: _pad_tail(x, rg, Rg_dense, ax)
                )
                q["down"] = _pad_linear(
                    p["down"], pad_in=lambda x, ax: _pad_tail(x, rg, Rg_dense, ax)
                )
                if spec.gated_mlp:
                    q["gate"] = _pad_linear(
                        p["gate"], pad_out=lambda x, ax: _pad_tail(x, rg, Rg_dense, ax)
                    )
                q["router"] = {"kernel": jnp.zeros((d, E), pdtype)}
                q["experts"] = {
                    "gate": {"kernel": jnp.zeros((E, d, Rg_moe), pdtype)},
                    "up": {"kernel": jnp.zeros((E, d, Rg_moe), pdtype)},
                    "down": {"kernel": jnp.zeros((E, Rg_moe, d), pdtype)},
                }
            if spec.shared_d_int:
                Rs = max(spec.shared_rank(j) for j in range(L) if spec.is_moe_layer(j))
                if spec.has_shared_expert(l):
                    rs = spec.shared_rank(l)
                    q["shared"] = {
                        "gate": _pad_linear(p["shared"]["gate"], pad_out=lambda x, ax: _pad_tail(x, rs, Rs, ax)),
                        "up": _pad_linear(p["shared"]["up"], pad_out=lambda x, ax: _pad_tail(x, rs, Rs, ax)),
                        "down": _pad_linear(p["shared"]["down"], pad_in=lambda x, ax: _pad_tail(x, rs, Rs, ax)),
                    }
                    if "shared_gate" in p:
                        q["shared_gate"] = p["shared_gate"]
                else:
                    q["shared"] = {
                        "gate": {"kernel": jnp.zeros((d, Rs), pdtype)},
                        "up": {"kernel": jnp.zeros((d, Rs), pdtype)},
                        "down": {"kernel": jnp.zeros((Rs, d), pdtype)},
                    }
                    if spec.shared_expert_gate:
                        q["shared_gate"] = {"kernel": jnp.zeros((d, 1), pdtype)}
        elif spec.is_moe_layer(l):
            # stacked expert kernels [E, d, rg]/[E, rg, d]: zero-pad the
            # intermediate axis (exact — pads produce zero h, consume zero)
            ek = p["experts"]
            q["router"] = p["router"]
            q["experts"] = {
                "gate": {"kernel": _pad_tail(ek["gate"]["kernel"], rg, Rg, 2)},
                "up": {"kernel": _pad_tail(ek["up"]["kernel"], rg, Rg, 2)},
                "down": {"kernel": _pad_tail(ek["down"]["kernel"], rg, Rg, 1)},
            }
            if "shared" in p:
                # shared expert: a dense gated MLP — pad its intermediate
                # like the dense path (zero pads are exact)
                rs = spec.shared_rank(l)
                Rs = max(spec.shared_rank(j) for j in range(L))
                q["shared"] = {
                    "gate": _pad_linear(p["shared"]["gate"], pad_out=lambda x, ax: _pad_tail(x, rs, Rs, ax)),
                    "up": _pad_linear(p["shared"]["up"], pad_out=lambda x, ax: _pad_tail(x, rs, Rs, ax)),
                    "down": _pad_linear(p["shared"]["down"], pad_in=lambda x, ax: _pad_tail(x, rs, Rs, ax)),
                }
                if "shared_gate" in p:
                    q["shared_gate"] = p["shared_gate"]
        else:
            q["up"] = _pad_linear(p["up"], pad_out=g_out)
            q["down"] = _pad_linear(p["down"], pad_in=g_in)
            if spec.gated_mlp:
                q["gate"] = _pad_linear(p["gate"], pad_out=g_out)
        if spec.qk_norm or spec.flat_qk_norm:
            q["q_norm"] = p["q_norm"]
            q["k_norm"] = p["k_norm"]
        if "rotary_mask" in p:
            # pad positions keep index 0: the gathered cos/sin multiply a
            # zero coordinate, so the value is irrelevant. Each mask row
            # is one kv head, so pad the last axis with n_heads=1.
            q["rotary_mask"] = _pad_head_axis(p["rotary_mask"], 1, rq, Rq, rope, 1)
        elif need_masks:
            # RoPE layer without an explicit mask (dense/untouched layer
            # inside a compressed stack): identity frequency mask, padded
            # in the same half-split layout.
            half = rq // 2
            ident = jnp.concatenate(
                [
                    jnp.arange(half, dtype=jnp.int32),
                    jnp.arange(half, dtype=jnp.int32) + spec.head_dim // 2,
                ]
            )
            ident = jnp.broadcast_to(ident[None, :], (Hk, rq))
            q["rotary_mask"] = _pad_head_axis(ident, 1, rq, Rq, rope, 1)
        padded_layers.append(q)

    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *padded_layers)
    if mixed_windows:
        stacked["window"] = jnp.asarray(spec.window_per_layer(), jnp.int32)
    if mixed_moe:
        stacked["is_moe"] = jnp.asarray(
            [spec.is_moe_layer(l) for l in range(L)], bool
        )
    other = {k: v for k, v in params.items() if k != "layers"}

    if mixed_moe:
        gate_ranks = tuple(
            Rg_moe if spec.is_moe_layer(l) else Rg_dense for l in range(L)
        )
        shared_max = max(
            (spec.shared_rank(j) for j in range(L) if spec.is_moe_layer(j)),
            default=0,
        )
    else:
        gate_ranks = (Rg,) * L
        shared_max = (
            max(spec.shared_rank(j) for j in range(L)) if spec.shared_d_int else 0
        )
    pspec = spec.with_ranks(
        q_ranks=(H * Rq,) * L,
        k_ranks=(Hk * Rq,) * L,
        v_ranks=(Hk * Rv,) * L,
        o_ranks=(H * Rv,) * L,
        gate_ranks=gate_ranks,
        shared_gate_ranks=(shared_max,) * L if spec.shared_d_int else None,
    )
    q_hd_true = jnp.asarray([spec.q_ranks[l] / H for l in range(L)], jnp.float32)
    return PaddedModel(spec=pspec, layers=stacked, other=other, q_hd_true=q_hd_true)


def padding_overhead(spec: ModelSpec) -> float:
    """FLOP ratio padded/exact for the layer stack's matmuls (embeddings
    and attention quadratic terms excluded — a conservative upper bound)."""
    H, Hk, L, d = spec.n_heads, spec.n_kv_heads, spec.n_layers, spec.d_model
    Rq = max(spec.q_ranks) // H * H
    Rk = max(spec.q_ranks) // H * Hk
    Rv = max(spec.v_ranks) // Hk * Hk
    Ro = max(spec.v_ranks) // Hk * H
    Rg = max(spec.gate_ranks)
    n_g = 2 if spec.gated_mlp else 1
    n_e = max(1, spec.n_experts)  # dense-all-experts MoE formulation
    padded = L * d * (Rq + Rk + Rv + Ro + n_e * (n_g + 1) * Rg)
    exact = sum(
        d
        * (
            spec.q_ranks[l]
            + spec.k_ranks[l]
            + spec.v_ranks[l]
            + spec.o_ranks[l]
            + n_e * (n_g + 1) * spec.gate_ranks[l]
        )
        for l in range(L)
    )
    return padded / max(exact, 1)


def _masked_rms_norm_truerank(x, weight, rotary_mask, group: int, eps: float, r_true):
    """masked_head_rms_norm with the variance over the TRUE rank
    (pads are zero so sum(x^2) is unaffected; r_true is a traced scalar)."""
    dtype = x.dtype
    xf = x.astype(jnp.float32)
    var = jnp.sum(xf * xf, axis=-1, keepdims=True) / r_true
    normed = xf * lax.rsqrt(var + eps)
    if rotary_mask is None:
        w = weight.astype(jnp.float32)[None, None, None, :]
    else:
        mask = jnp.repeat(rotary_mask, group, axis=0) if group > 1 else rotary_mask
        w = weight.astype(jnp.float32)[mask][None, None, :, :]
    return (normed * w).astype(dtype)


def _layer_padded(
    spec: ModelSpec,
    p: Dict,
    q_hd_true,
    x,
    cos,
    sin,
    attn_impl: str,
    cache_kv=None,
    pos=None,
    moe: str = "dense",
    moe_capacity: float = 2.0,
    token_valid=None,
    layer_ix=None,
    tp=None,
):
    """One padded layer. Without a cache: full causal self-attention.
    With cache_kv = the FULL stacked (ck, cv[, k_scale, v_scale]) plus
    pos and a traced layer_ix: incremental step scattering this layer's
    new K/V into its slab at offset pos and attending over the slab.
    Returns (x_out, new_cache or None) — new_cache is the full stack.

    tp: None, or a static ``(Mesh, axis_name)`` pair when the serving
    stack is tensor-parallel AND attn_impl == "ragged": GSPMD cannot
    partition a ``pallas_call`` (it would reshard the operands to
    replicated around an opaque custom call), so the ragged kernel runs
    under ``shard_map`` over the TP axis instead. Attention is
    head-local (each q-head group attends only its own kv head), so
    every device attends its local Hk shard of the cache — the wrap
    adds ZERO collectives; the o-projection row-parallel psum
    downstream is unchanged."""
    B, S, _ = x.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    Rq = spec.q_ranks[0] // H
    Rv = spec.v_ranks[0] // Hk
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
        # olmo2 whole-projection q/k norm: zero pads keep sums exact,
        # the variance divides by the TRUE total dim
        from modegpt_tpu.ops.rope import masked_flat_rms_norm

        q = masked_flat_rms_norm(
            q, p["q_norm"]["scale"], rotary_mask, H, spec.head_dim,
            spec.group_size, spec.norm_eps, true_dim=H * q_hd_true,
        )
        k = masked_flat_rms_norm(
            k, p["k_norm"]["scale"], rotary_mask, Hk, spec.head_dim, 1,
            spec.norm_eps, true_dim=Hk * q_hd_true,
        )
    q = q.reshape(B, S, H, Rq)
    k = k.reshape(B, S, Hk, Rq)
    v = v.reshape(B, S, Hk, Rv)

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
    win_arr = p.get("window")  # traced per-layer window (0 = full) or None
    if win_arr is not None:
        window = None  # masking via win_arr below
    else:
        window = spec.sliding_window if (
            spec.layer_types and spec.layer_types[0] == "sliding_attention"
        ) else None

    # true-rank scaling per layer; gemma2 fixes it at query_pre_attn_scalar
    q_scale = (
        jnp.asarray(spec.query_pre_attn_scalar, jnp.float32)
        if spec.query_pre_attn_scalar is not None
        else q_hd_true
    )
    new_cache = None
    if cache_kv is None:
        if spec.uses_rope:
            q, k = apply_rope(q, k, cos, sin, rotary_mask)
        q = q * lax.rsqrt(q_scale).astype(q.dtype)
        attn = _attention(
            q, k, v, 1.0, window, attn_impl, spec.attn_logit_softcap,
            window_arr=win_arr,
        )
    else:
        # Decode/prefill into the FULL stacked cache [L, B, Hk, T, R] at
        # PER-ROW offsets pos [B] (the serving path; uniform generation
        # passes a broadcast scalar); layer_ix picks this layer's slab.
        # The caches ride the layer scan as CARRIES: writes are point
        # scatters touching only the S new positions per row, and the
        # attention read is a dynamic slice that fuses into the score
        # einsum — the cache is never sliced out and rewritten
        # wholesale. (The previous per-layer xs->ys layout made every
        # decode step copy the entire cache once: at 64 slots x 512
        # positions that was ~2 GB of copy traffic per step, more than
        # the model's weights. Measured 12.3ms -> ~4ms per fused step.)
        # Out-of-window writes DROP — submit() reserves the speculative
        # margin so live requests never reach the edge.
        if spec.uses_rope:
            q, k = apply_rope_ragged(q, k, cos, sin, rotary_mask, spec.group_size)
        q = q * lax.rsqrt(q_scale).astype(q.dtype)
        quantized = len(cache_kv) == 4  # (ck, cv, k_scale, v_scale): int8 KV
        max_len = cache_kv[0].shape[3]
        b_ix = jnp.arange(B, dtype=jnp.int32)[:, None, None]
        h_ix = jnp.arange(Hk, dtype=jnp.int32)[None, :, None]
        t_ix = pos[:, None, None] + jnp.arange(S, dtype=jnp.int32)[None, None, :]

        def scatter(c, new):  # new [B, Hk, S(, R)] into c [L, B, Hk, T(, R)]
            return c.at[layer_ix, b_ix, h_ix, t_ix].set(
                new.astype(c.dtype), mode="drop"
            )

        def slab(c):  # this layer's [B, Hk, T(, R)] view
            return lax.dynamic_index_in_dim(c, layer_ix, 0, keepdims=False)

        use_ragged = attn_impl == "ragged"
        if quantized:
            # int8 KV: per-(head, position) symmetric scales — halves
            # cache HBM CAPACITY (2x slots/context per chip). On the
            # XLA path it does NOT speed decode on v5e: dequantising
            # the slab below materialises a bf16 temp that costs what
            # the smaller reads save (measured, bench_results/r02) —
            # the ragged kernel instead feeds the codes straight to
            # the MXU and folds the scales into score columns /
            # probability rows, so there the halved reads are real.
            # bf16->int8 rounding costs ~0.4% rel error per vector,
            # tested to leave greedy serving outputs intact at small
            # scale and logits within ~1e-2.
            ck, cv, ks, vs = cache_kv

            def quant(x_new):  # [B, Hk, S, R] -> int8 codes + scales
                scale = jnp.max(jnp.abs(x_new.astype(jnp.float32)), axis=-1) / 127.0
                scale = jnp.maximum(scale, 1e-8)
                codes = jnp.clip(
                    jnp.round(x_new.astype(jnp.float32) / scale[..., None]), -127, 127
                ).astype(jnp.int8)
                return codes, scale

            k_codes, k_sc = quant(k)
            v_codes, v_sc = quant(v)
            ck = scatter(ck, k_codes)
            cv = scatter(cv, v_codes)
            ks = scatter(ks, k_sc)
            vs = scatter(vs, v_sc)
            new_cache = (ck, cv, ks, vs)
            if use_ragged:
                k_all, v_all = slab(ck), slab(cv)  # int8 codes
                kv_scales = (slab(ks), slab(vs))
            else:
                k_all = slab(ck).astype(q.dtype) * slab(ks)[..., None].astype(q.dtype)
                v_all = slab(cv).astype(q.dtype) * slab(vs)[..., None].astype(q.dtype)
                kv_scales = (None, None)
        else:
            ck, cv = cache_kv
            ck = scatter(ck, k)
            cv = scatter(cv, v)
            new_cache = (ck, cv)
            k_all, v_all = slab(ck), slab(cv)
            kv_scales = (None, None)
        # grouped-query contraction: k_all/v_all stay at Hk heads (the
        # repeated-to-H copy ~6x'd decode-step HBM traffic; forward.py
        # gqa_scores docstring has the measurement)
        if use_ragged:
            # Pallas flash attention over the slot table: K/V tiles past
            # each slot's live window are never fetched from HBM
            # (clamped block index maps), so cache-read bandwidth
            # scales with actual occupancy instead of max_len; int8
            # caches stream as codes (half the bytes), windows clamp
            # the block range at both ends, softcap applies in-kernel.
            # S == 1 is the decode/draft step; S > 1 serves prefill
            # chunks and the speculative verify (queries causal over
            # the new positions — kernels/ragged_decode.py).
            from modegpt_tpu.kernels.ragged_decode import ragged_gqa_attend

            eff_win = win_arr if win_arr is not None else window
            if tp is None:
                attn = ragged_gqa_attend(
                    q, k_all, v_all, pos,
                    k_scale=kv_scales[0], v_scale=kv_scales[1],
                    window=eff_win, softcap=spec.attn_logit_softcap,
                )
            else:
                # TP: run the kernel per-shard over the "model" axis
                # (see the docstring). Head layout makes this exact:
                # q heads are kv-head-major ([Hk, G] order), so the
                # Megatron column shards of q line up with the cache's
                # Hk shards and each device's local reshape to
                # [Hk/mp, G] groups q heads with their own kv head.
                mesh, ax = tp
                from jax.sharding import PartitionSpec as P
                try:  # jax >= 0.4.35 exports shard_map at the top level
                    from jax import shard_map
                except ImportError:  # pragma: no cover
                    from jax.experimental.shard_map import shard_map

                operands = [q, k_all, v_all, pos]
                specs = [P(None, ax, None, None), P(None, ax, None, None),
                         P(None, ax, None, None), P()]
                have_sc = kv_scales[0] is not None
                if have_sc:
                    operands += [kv_scales[0], kv_scales[1]]
                    specs += [P(None, ax, None), P(None, ax, None)]
                win_traced = eff_win is not None and not isinstance(
                    eff_win, (int, float)
                )
                if win_traced:
                    operands.append(jnp.asarray(eff_win, jnp.int32).reshape(()))
                    specs.append(P())
                softcap = spec.attn_logit_softcap

                def _local(q_, k_, v_, p_, *rest):
                    ksl = vsl = None
                    i = 0
                    if have_sc:
                        ksl, vsl = rest[0], rest[1]
                        i = 2
                    w = rest[i] if win_traced else eff_win
                    return ragged_gqa_attend(
                        q_, k_, v_, p_, k_scale=ksl, v_scale=vsl,
                        window=w, softcap=softcap,
                    )

                attn = shard_map(
                    _local, mesh=mesh, in_specs=tuple(specs),
                    out_specs=P(None, ax, None, None), check_vma=False,
                )(*operands)
        else:
            from modegpt_tpu.models.forward import _softcap, gqa_attend, gqa_scores

            scores = gqa_scores(q, k_all)

            scores = _softcap(scores.astype(jnp.float32), spec.attn_logit_softcap)
            t_ids = jnp.arange(max_len, dtype=jnp.int32)[None, None, :]
            s_ids = pos[:, None, None] + jnp.arange(S, dtype=jnp.int32)[None, :, None]
            mask = t_ids <= s_ids  # [B, S, max_len]
            if window is not None:
                mask = mask & (t_ids > s_ids - window)
            if win_arr is not None:
                mask = mask & jnp.where(win_arr > 0, t_ids > s_ids - win_arr, True)
            scores = jnp.where(mask[:, None], scores, -jnp.inf)
            probs = jax.nn.softmax(scores, axis=-1).astype(q.dtype)
            attn = gqa_attend(probs, v_all)

    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, H * Rv)
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
        from modegpt_tpu.models.forward import _moe_mlp, _moe_mlp_dispatch

        if moe == "dispatch":
            # Capacity-based token dispatch: per-expert FLOPs scale with
            # capacity instead of every-token (the serving-scale MoE path;
            # see forward._moe_mlp_dispatch for drop semantics and the
            # token_valid masking contract).
            return _moe_mlp_dispatch(
                spec, p, x_in, moe_capacity, token_valid=token_valid
            )
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
        # mixed dense/MoE stack: one scanned body, the per-layer flag
        # picks the live branch (only it executes — lax.cond)
        y = lax.cond(is_moe_leaf, _moe_out, _dense_out, x_ln2)
        x = residual + y
    elif spec.n_experts:
        x = residual + _moe_out(x_ln2)
    else:
        x = residual + _dense_out(x_ln2)
    if not pre_ln:
        x = _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)
    return x, new_cache


def _embed(spec: ModelSpec, other: Dict, tokens, pos0=None):
    """pos0: None, a scalar offset, or a per-row [B] offset vector."""
    from modegpt_tpu.models.forward import _scale_embed

    x = _scale_embed(spec, other["embed_tokens"][tokens])
    if spec.arch in ("opt", "gpt2"):
        off = spec.position_offset
        if "project_in" in other:
            x = _linear(x, other["project_in"])
        S = tokens.shape[1]
        if pos0 is not None and jnp.ndim(pos0) == 1:
            pos = pos0[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :] + off
            return x + other["embed_positions"][pos]
        pos = jnp.arange(S, dtype=jnp.int32) + off
        if pos0 is not None:
            pos = pos + pos0
        x = x + other["embed_positions"][pos][None, :, :]
    return x


def _unembed(spec: ModelSpec, other: Dict, x):
    from modegpt_tpu.models.forward import _softcap

    if other.get("final_norm") is not None:
        x = _norm(x, other["final_norm"], spec.norm, spec.norm_eps)
    if "project_out" in other:
        x = _linear(x, other["project_out"])
    if other.get("lm_head") is not None:
        return _softcap(_linear(x, other["lm_head"]), spec.final_logit_softcap)
    return _softcap(x @ other["embed_tokens"].T, spec.final_logit_softcap)


def _resolve_attn_impl(attn_impl: str) -> str:
    if attn_impl == "auto":
        use_flash = jax.default_backend() == "tpu" and not jax.config.jax_enable_x64
        return "flash" if use_flash else "xla"
    return attn_impl


@partial(jax.jit, static_argnames=("spec", "attn_impl", "moe", "moe_capacity"))
def forward_padded(
    spec: ModelSpec,
    layers: Dict,
    other: Dict,
    q_hd_true: jax.Array,
    input_ids: jax.Array,
    attn_impl: str = "auto",
    moe: str = "dense",
    moe_capacity: float = 2.0,
):
    """Full causal forward over the padded stack; returns logits.
    Same numerics as `forward(orig_spec, orig_params, ...)`."""
    T = input_ids.shape[1]
    attn_impl = _resolve_attn_impl(attn_impl)

    x = _embed(spec, other, input_ids)
    cos = sin = None
    if spec.uses_rope:
        cos, sin = rope_cos_sin(
            jnp.arange(T, dtype=jnp.int32), spec.head_dim, spec.rope_theta, dtype=x.dtype,
            scaling=spec.rope_scaling,
        )

    def body(x, inputs):
        p, r_true = inputs
        x, _ = _layer_padded(spec, p, r_true, x, cos, sin, attn_impl, moe=moe,
                             moe_capacity=moe_capacity)
        return x, None

    x, _ = lax.scan(body, x, (layers, q_hd_true))
    return _unembed(spec, other, x)


def init_cache_padded(pm: PaddedModel, batch: int, max_len: int, dtype=jnp.float32):
    """Stacked KV cache [L, B, Hk, max_len, R]; returns (k, v, length)."""
    spec = pm.spec
    Rq = spec.q_ranks[0] // spec.n_heads
    Rv = spec.v_ranks[0] // spec.n_kv_heads
    L = spec.n_layers
    k = jnp.zeros((L, batch, spec.n_kv_heads, max_len, Rq), dtype=dtype)
    v = jnp.zeros((L, batch, spec.n_kv_heads, max_len, Rv), dtype=dtype)
    return k, v, jnp.asarray(0, jnp.int32)


@partial(
    jax.jit,
    static_argnames=("spec", "moe", "moe_capacity", "decode_attn", "tp"),
    donate_argnames=("cache_k", "cache_v", "cache_scales"),
)
def _model_step_padded(
    spec: ModelSpec, layers, other, q_hd_true, tokens, cache_k, cache_v, length,
    moe: str = "dense", moe_capacity: float = 2.0, token_valid=None,
    cache_scales=None, decode_attn: str = "xla", tp=None,
):
    """New tokens [B, S] through the padded stack with a stacked cache.

    `length` is a scalar (all rows at the same offset — plain generation)
    or a [B] vector (per-row offsets — the ragged serving path); the
    returned length has the same shape, advanced by S.

    token_valid [B, S]: rows/positions whose compute is masked out by the
    caller (inactive serving slots, padded prefill tails) — consumed by
    the dispatch-MoE path so garbage tokens never claim expert capacity.

    decode_attn: "xla" (masked full-pool contraction) or "ragged" (the
    Pallas flash attention kernel whose cache reads scale with per-slot
    live lengths; covers bf16 AND int8 caches, sliding windows, logit
    softcap, and BOTH single-position decode steps and multi-position
    prefill/verify chunks — kernels/ragged_decode.py).
    """
    B, S = tokens.shape
    pos = jnp.broadcast_to(jnp.atleast_1d(length), (B,)).astype(jnp.int32)
    x = _embed(spec, other, tokens, pos0=pos)
    cos = sin = None
    if spec.uses_rope:
        positions = pos[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
        cos, sin = rope_cos_sin(
            positions.reshape(-1), spec.head_dim, spec.rope_theta, dtype=x.dtype,
            scaling=spec.rope_scaling,
        )
        cos = cos.reshape(B, S, -1)
        sin = sin.reshape(B, S, -1)

    # The caches are scan CARRIES (full [L, ...] stacks scatter-updated
    # in place), NOT xs->ys slices — see _layer_padded's cached branch
    # for the bandwidth argument. Weights stay xs: scan reads xs slabs
    # directly (measured at the HBM roofline), it is only per-iteration
    # OUTPUT slices that would force whole-buffer copies.
    l_ix = jnp.arange(cache_k.shape[0], dtype=jnp.int32)
    if cache_scales is not None:
        # int8 KV cache (see _layer_padded's quantized branch):
        # cache_scales = (k_scale, v_scale), each [L, B, Hk, max_len].
        def body_q(carry, inputs):
            x, ck, cv, ks, vs = carry
            p, r_true, li = inputs
            x, (ck, cv, ks, vs) = _layer_padded(
                spec, p, r_true, x, cos, sin, decode_attn,
                cache_kv=(ck, cv, ks, vs), pos=pos, layer_ix=li,
                moe=moe, moe_capacity=moe_capacity, token_valid=token_valid,
                tp=tp,
            )
            return (x, ck, cv, ks, vs), None

        (x, cache_k, cache_v, ks, vs), _ = lax.scan(
            body_q, (x, cache_k, cache_v, *cache_scales), (layers, q_hd_true, l_ix)
        )
        return _unembed(spec, other, x), cache_k, cache_v, length + S, (ks, vs)

    def body(carry, inputs):
        x, ck, cv = carry
        p, r_true, li = inputs
        x, (ck, cv) = _layer_padded(
            spec, p, r_true, x, cos, sin, decode_attn, cache_kv=(ck, cv), pos=pos,
            layer_ix=li, moe=moe, moe_capacity=moe_capacity, token_valid=token_valid,
            tp=tp,
        )
        return (x, ck, cv), None

    (x, cache_k, cache_v), _ = lax.scan(
        body, (x, cache_k, cache_v), (layers, q_hd_true, l_ix)
    )
    return _unembed(spec, other, x), cache_k, cache_v, length + S


def prefill_padded(pm: PaddedModel, prompt_ids, cache):
    ck, cv, length = cache
    logits, ck, cv, length = _model_step_padded(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, prompt_ids, ck, cv, length
    )
    return logits[:, -1, :], (ck, cv, length)


@partial(jax.jit, static_argnames=("spec", "max_new_tokens", "temperature", "top_k"))
def _generate_padded_jit(
    spec: ModelSpec,
    layers,
    other,
    q_hd_true,
    prompt_ids,
    cache_k,
    cache_v,
    length,
    max_new_tokens: int,
    temperature: float,
    top_k: Optional[int],
    eos_token_id: Optional[jax.Array],
    key: jax.Array,
):
    from modegpt_tpu.models.generate import _sample

    logits, cache_k, cache_v, length = _model_step_padded.__wrapped__(
        spec, layers, other, q_hd_true, prompt_ids, cache_k, cache_v, length
    )
    logits = logits[:, -1, :]

    def step(carry, _):
        logits, ck, cv, length, key, done = carry
        key, sub = jax.random.split(key)
        token = _sample(logits, sub, temperature, top_k)
        if eos_token_id is not None:
            token = jnp.where(done, eos_token_id, token)
            done = done | (token == eos_token_id)
        logits, ck, cv, length = _model_step_padded.__wrapped__(
            spec, layers, other, q_hd_true, token[:, None], ck, cv, length
        )
        return (logits[:, -1, :], ck, cv, length, key, done), token

    B = prompt_ids.shape[0]
    done0 = jnp.zeros((B,), dtype=bool)
    (_, *_rest), tokens = lax.scan(
        step, (logits, cache_k, cache_v, length, key, done0), None, length=max_new_tokens
    )
    return tokens.T


def generate_padded(
    pm: PaddedModel,
    prompt_ids,
    max_new_tokens: int = 32,
    temperature: float = 0.0,
    top_k: Optional[int] = None,
    eos_token_id: Optional[int] = None,
    key: Optional[jax.Array] = None,
    max_len: Optional[int] = None,
):
    """One-dispatch generation over the padded stack: prefill + scanned
    decode, compile time independent of both depth and token count.
    Returns [B, prompt+new] tokens (same contract as models.generate.generate)."""
    prompt_ids = jnp.asarray(prompt_ids)
    B, P = prompt_ids.shape
    if max_len is None:
        max_len = P + max_new_tokens
    if key is None:
        key = jax.random.key(0)
    ck, cv, length = init_cache_padded(pm, B, max_len, dtype=pm.other["embed_tokens"].dtype)
    eos = None if eos_token_id is None else jnp.asarray(eos_token_id, prompt_ids.dtype)
    tokens = _generate_padded_jit(
        pm.spec, pm.layers, pm.other, pm.q_hd_true, prompt_ids, ck, cv, length,
        max_new_tokens, temperature, top_k, eos, key,
    )
    return jnp.concatenate([prompt_ids, tokens], axis=1)
