"""Scan-based forward for uniform (dense) models.

The unrolled forward in `models/forward.py` compiles one body per layer
— for a 32-layer model through XLA that's 32x the compile time, which
can rival the compute itself for one-shot compression jobs. For UNIFORM
layer stacks (the dense model being calibrated — heterogeneous-rank
compressed models stay on the unrolled path) this module runs the layers
as a single `lax.scan` over stacked parameters: compile time becomes
layer-count independent.

Calibration statistics are accumulated inside the scan carry: Gram taps
are computed only for the contiguous `stats_layers` window (a
`lax.cond` guards the heavy einsums, so non-target layers pay nothing)
and written into fixed `[n_target, ...]` accumulators with
`dynamic_update_index`. BI pieces are scan outputs for every layer.

Numerically identical to the unrolled forward (same ops, same order) —
tested in tests/test_scan_forward.py.
"""

from __future__ import annotations

from functools import partial
from typing import Dict, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from modegpt_tpu.models.forward import (
    CalibStats,
    _attention,
    _act,
    _bi_piece,
    _gram,
    _head_gram,
    _linear,
    _moe_gram,
    _moe_mlp,
    _norm,
)
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.rope import rope_cos_sin, apply_rope, masked_head_rms_norm

__all__ = ["stack_layer_params", "forward_scan", "supports_scan"]


def supports_scan(spec: ModelSpec, stats_layers: Tuple[int, ...]) -> bool:
    """Scan path requires uniform layer SHAPES (rotary masks and
    per-layer attention windows are fine — both become scanned inputs)
    and a contiguous stats window."""
    uniform_shapes = all(
        len(set(r)) <= 1
        for r in (
            spec.q_ranks,
            spec.k_ranks,
            spec.v_ranks,
            spec.o_ranks,
            spec.gate_ranks,
            spec.shared_gate_ranks,
        )
    )
    if not uniform_shapes:
        return False
    if spec.n_experts and spec.moe_layers:
        return False  # mixed dense/MoE stacks run unrolled
    # mixed sliding/full layer_types are fine: the per-layer window is a
    # scanned input (see forward_scan)
    if stats_layers:
        if spec.has_rotary_masks:
            return False  # calibration runs on the dense model only
        lo, hi = min(stats_layers), max(stats_layers)
        if tuple(range(lo, hi + 1)) != tuple(sorted(stats_layers)):
            return False
    return True


def stack_layer_params(params: Dict) -> Dict:
    """List-of-dicts layers -> dict of stacked [L, ...] leaves."""
    layers = params["layers"]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *layers)


def _one_layer(spec: ModelSpec, p: Dict, x, cos, sin, attn_impl: str, win_arr=None):
    """Uniform layer (mirrors forward._layer; per-layer rotary masks and
    windows are scanned inputs when present)."""
    B, T, _ = x.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[0] // H
    v_hd = spec.v_ranks[0] // Hk
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

    taps_src = (x_ln, q, k)

    if spec.flat_qk_norm:
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
    q = q.transpose(0, 2, 1, 3)
    k = k.transpose(0, 2, 1, 3)
    v = v.transpose(0, 2, 1, 3)
    if spec.uses_rope:
        q, k = apply_rope(q, k, cos, sin, rotary_mask)

    if win_arr is not None:
        window = None  # traced per-layer window masks inside _attention
    else:
        window = spec.sliding_window if (
            spec.layer_types and spec.layer_types[0] == "sliding_attention"
        ) else None
    scaling = (
        spec.query_pre_attn_scalar**-0.5
        if spec.query_pre_attn_scalar is not None
        else q_hd**-0.5
    )
    attn = _attention(
        q, k, v, scaling, window, attn_impl, spec.attn_logit_softcap,
        window_arr=win_arr,
    )
    attn = attn.transpose(0, 2, 1, 3).reshape(B, T, H * v_hd)
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
    h_shared = None
    if spec.n_experts:
        # h is the routed-masked per-expert intermediate [B, T, E, D] —
        # exactly what the per-expert Type-I Gram accumulates; h_shared
        # [B, T, Ds] is the shared expert's down input when present.
        y, h, h_shared = _moe_mlp(spec, p, x_ln2, True)
        x = residual + y
    elif spec.gated_mlp:
        h = _act(_linear(x_ln2, p["gate"]), spec.act) * _linear(x_ln2, p["up"])
        m_out = _linear(h, p["down"])
        if spec.post_norms:
            m_out = _norm(m_out, p["post_mlp_norm"], spec.norm, spec.norm_eps)
        x = residual + m_out
    else:
        h = _act(_linear(x_ln2, p["up"]), spec.act)
        m_out = _linear(h, p["down"])
        if spec.post_norms:
            m_out = _norm(m_out, p["post_mlp_norm"], spec.norm, spec.norm_eps)
        x = residual + m_out
    if not pre_ln:
        x = _norm(x, p["mlp_norm"], spec.norm, spec.norm_eps)
    return x, taps_src, (h, h_shared)


@partial(jax.jit, static_argnames=("spec", "stats_layers", "attn_impl", "gram_precision"))
def forward_scan(
    spec: ModelSpec,
    params: Dict,
    input_ids: jax.Array,
    stats_layers: Tuple[int, ...] = (),
    attn_impl: str = "auto",
    gram_precision: str = "highest",
):
    """Scan-over-layers forward. Same contract as `forward` (returns
    (logits, CalibStats | None)); requires `supports_scan(spec, ...)`."""
    assert supports_scan(spec, stats_layers), "spec not scan-compatible"
    B, T = input_ids.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[0] // H

    from modegpt_tpu.models.forward import _scale_embed

    x = _scale_embed(spec, params["embed_tokens"][input_ids])
    if spec.arch in ("opt", "gpt2"):
        if "project_in" in params:
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

    stacked = stack_layer_params(params)
    collect = len(stats_layers) > 0
    if collect:
        start = min(stats_layers)
        n_t = len(stats_layers)
        mlp_shape = (
            (n_t, spec.n_experts, spec.d_int, spec.d_int)
            if spec.n_experts
            else (n_t, spec.d_int, spec.d_int)
        )
        acc0 = CalibStats(
            cov_mlp=jnp.zeros(mlp_shape, jnp.float32),
            cov_q=jnp.zeros((n_t, H, q_hd, q_hd), jnp.float32),
            cov_k=jnp.zeros((n_t, Hk, q_hd, q_hd), jnp.float32),
            cov_x=jnp.zeros((n_t, spec.d_model, spec.d_model), jnp.float32),
            bi_acc=jnp.zeros((spec.n_layers,), jnp.float32),
            cov_shared=jnp.zeros((n_t, spec.shared_d_int, spec.shared_d_int), jnp.float32)
            if (spec.n_experts and spec.shared_d_int)
            else None,
        )
    else:
        acc0 = None

    mixed_windows = spec.mixed_windows
    window_leaf = (
        jnp.asarray(spec.window_per_layer(), jnp.int32)
        if mixed_windows
        else jnp.zeros((spec.n_layers,), jnp.int32)
    )

    def body(carry, inputs):
        x, acc = carry
        p, l_idx, win = inputs
        h_in = x
        x_out, taps_src, (h_mlp, h_shared) = _one_layer(
            spec, p, x, cos, sin, attn_impl,
            win_arr=win if mixed_windows else None,
        )
        if acc is not None:
            x_ln, q, k = taps_src
            within = (l_idx >= start) & (l_idx < start + n_t)
            slot = jnp.clip(l_idx - start, 0, n_t - 1)

            def with_taps(a):
                gp = gram_precision
                mlp_gram = (
                    _moe_gram(h_mlp, gp)
                    if spec.n_experts
                    else _gram(h_mlp.reshape(-1, spec.d_int), gp)
                )
                return CalibStats(
                    cov_mlp=a.cov_mlp.at[slot].add(mlp_gram),
                    cov_q=a.cov_q.at[slot].add(_head_gram(q.reshape(B, T, H, q_hd), gp)),
                    cov_k=a.cov_k.at[slot].add(_head_gram(k.reshape(B, T, Hk, q_hd), gp)),
                    cov_x=a.cov_x.at[slot].add(_gram(x_ln.reshape(-1, spec.d_model), gp)),
                    bi_acc=a.bi_acc,
                    cov_shared=a.cov_shared.at[slot].add(
                        _gram(h_shared.reshape(-1, spec.shared_d_int), gp)
                    )
                    if a.cov_shared is not None
                    else None,
                )

            acc = lax.cond(within, with_taps, lambda a: a, acc)
            acc = acc._replace(bi_acc=acc.bi_acc.at[l_idx].add(_bi_piece(h_in, x_out)))
        return (x_out, acc), None

    (x, acc), _ = lax.scan(
        body,
        (x, acc0),
        (stacked, jnp.arange(spec.n_layers, dtype=jnp.int32), window_leaf),
    )

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
    return logits, acc
