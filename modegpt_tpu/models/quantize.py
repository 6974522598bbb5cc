"""Weight-only int8 execution: quantize resident weights, dequantize
inside the matmul.

Decode is memory-bound: each generated token reads every weight once, so
HBM traffic is the speed limit. Storing projection kernels as symmetric
per-out-channel int8 halves that traffic vs bf16 (4x vs f32); the
convert fuses into the dot's operand read and the scale applies to the
matmul OUTPUT (mathematically identical for per-out-channel scales), so
no dequantized weight copy ever exists in HBM.

Works on plain params pytrees and on `PaddedModel` stacks (quantize
AFTER padding — zero pad rows quantize to zero exactly). Norm scales,
biases, embeddings (gathers, not matmuls) and rotary masks stay as-is.
Consumed transparently by `forward._linear` / `forward._moe_mlp`, i.e.
every execution path: unrolled, scanned, padded, generation, serving,
speculative decoding.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from modegpt_tpu.models.padded import PaddedModel

__all__ = [
    "quantize_linear",
    "quantize_params",
    "quantize_padded",
    "with_act_quant",
]


def quantize_linear(p: Dict) -> Dict:
    """{"kernel": [..., in, out]} -> {"kernel_q": int8, "scale": [..., out]}.
    The reduction (max-abs) runs over the IN axis only, so leading layer/
    expert stack axes keep their own scales."""
    if "kernel" not in p or p["kernel"].dtype == jnp.int8:
        return p
    k = p["kernel"].astype(jnp.float32)
    amax = jnp.max(jnp.abs(k), axis=-2, keepdims=True)
    scale = jnp.where(amax == 0.0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(k / scale), -127, 127).astype(jnp.int8)
    out = {k2: v for k2, v in p.items() if k2 != "kernel"}
    out["kernel_q"] = q
    out["scale"] = jnp.squeeze(scale, axis=-2)
    return out


def _quantize_layer(lp: Dict) -> Dict:
    out = {}
    for name, sub in lp.items():
        if name in ("q", "k", "v", "o", "up", "gate", "down"):
            out[name] = quantize_linear(sub)
        elif name in ("experts", "shared"):
            out[name] = {k: quantize_linear(v) for k, v in sub.items()}
        else:
            out[name] = sub  # norms, router, shared_gate, rotary_mask
    return out


def quantize_params(params: Dict) -> Dict:
    """Quantize every projection kernel of a plain params pytree (list of
    per-layer dicts). lm_head quantizes too; embeddings stay full
    precision (token gathers only touch the looked-up rows)."""
    out = dict(params)
    out["layers"] = [_quantize_layer(lp) for lp in params["layers"]]
    if params.get("lm_head") is not None:
        out["lm_head"] = quantize_linear(params["lm_head"])
    return out


def quantize_padded(pm: PaddedModel) -> PaddedModel:
    """Quantize a padded-uniform stack (the serving/speculative layout).
    Stacked [L, ...] kernels get per-(layer, out-channel) scales."""
    layers = _quantize_layer(pm.layers)
    other = dict(pm.other)
    if pm.other.get("lm_head") is not None:
        other["lm_head"] = quantize_linear(pm.other["lm_head"])
    return PaddedModel(spec=pm.spec, layers=layers, other=other, q_hd_true=pm.q_hd_true)


def _qa_view_linear(p: Dict) -> Dict:
    # Rename kernel_q -> kernel_qa; the int8 codes array is SHARED, only
    # the pytree structure (and thus the compiled program) changes. int4
    # codes stay weight-only: the MXU has no int4 x int8 dot.
    if "kernel_q" in p and p["kernel_q"].dtype == jnp.int8:
        q = {k: v for k, v in p.items() if k != "kernel_q"}
        q["kernel_qa"] = p["kernel_q"]
        return q
    return p


def _qa_view_layer(lp: Dict) -> Dict:
    out = {}
    for name, sub in lp.items():
        if name in ("q", "k", "v", "o", "up", "gate", "down"):
            out[name] = _qa_view_linear(sub)
        elif name in ("experts", "shared"):
            out[name] = {k: _qa_view_linear(v) for k, v in sub.items()}
        else:
            out[name] = sub
    return out


def with_act_quant(pm):
    """W8A8 execution VIEW of an int8-quantized model: every projection's
    codes are re-keyed ``kernel_q`` -> ``kernel_qa`` so ``forward._linear``
    dynamically quantizes the activation per token and runs the dot
    int8 x int8 -> int32 on the MXU (2x the bf16 peak on v5e — the win on
    COMPUTE-bound paths, i.e. prefill; decode is memory-bound and keeps
    the weight-only program). Zero-copy: both views share the resident
    int8 buffers, they just compile to different programs. lm_head stays
    weight-only (the logit matmul is the most quantization-sensitive).

    Accepts a PaddedModel or a plain params pytree; non-int8 (int4/bf16)
    projections pass through unchanged.
    """
    if isinstance(pm, PaddedModel):
        return PaddedModel(
            spec=pm.spec,
            layers=_qa_view_layer(pm.layers),
            other=pm.other,
            q_hd_true=pm.q_hd_true,
        )
    out = dict(pm)
    out["layers"] = [_qa_view_layer(lp) for lp in pm["layers"]]
    return out
