"""Pure-functional model surgery.

Replaces the reference's in-place nn.Linear swapping + config patching +
vendored Rebuild classes (reference: src/adapters/model_adapter.py:193-237
`convert_model`, LlamaAdapter.py:250-302 `patch_config`,
src/patchers/*.py) with a single pure function: dense (spec, params) +
solver factors -> compressed (spec, params). The compressed spec carries
the per-layer rank lists; the compressed params carry the new weights and
per-layer rotary masks. Nothing is mutated.

Factor layout convention: solvers emit HF [out, in] weights (see
modegpt_tpu/ops/*); forward kernels are [in, out] — the transposition
happens here, exactly once.
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp
import numpy as np

from modegpt_tpu.models.spec import ModelSpec

__all__ = ["compress_ranks_for_layer", "apply_factors"]


def compress_ranks_for_layer(spec: ModelSpec, keep_ratio: float, kind: str) -> int:
    """Per-layer rank from a keep ratio, with the reference's rounding rules.

    kind='mlp':  rank = int(d_int * keep)            (compress_mlp.py:37)
    kind='shared': same rule on the shared expert's own intermediate dim
    kind='qk':   per-head, even for RoPE archs       (compress_qk.py:177-182)
    kind='vo':   per-head, even for RoPE archs       (compress_vo.py:36-41)
    """
    if kind == "mlp":
        return max(1, int(spec.d_int * keep_ratio))
    if kind == "shared":
        return max(1, int(spec.shared_d_int * keep_ratio))
    rank = int(spec.head_dim * keep_ratio)
    rank = max(1, min(rank, spec.head_dim))
    if spec.uses_rope:
        rank -= rank % 2
        rank = max(2, min(rank, spec.head_dim))
    return rank


def _as_kernel(w, dtype) -> jnp.ndarray:
    """HF [out, in] weight -> [in, out] kernel in the model's dtype.
    Device factors (solve_chunk_batched fetch='device') transpose on
    device — the compress-then-serve path never touches the host."""
    import jax

    if isinstance(w, jax.Array):
        return jnp.swapaxes(w, -1, -2).astype(dtype)
    return jnp.asarray(np.swapaxes(np.asarray(w), -1, -2), dtype=dtype)


def apply_factors(
    spec: ModelSpec,
    params: Dict,
    mlp_factors: Optional[Dict[int, Dict]] = None,
    qk_factors: Optional[Dict[int, Dict]] = None,
    vo_factors: Optional[Dict[int, Dict]] = None,
    release_dense: bool = False,
):
    """Build the compressed (spec, params) from per-layer solver factors.

    Each factors dict maps layer_idx -> dict of HF-layout arrays:
      mlp: {"up", "gate"?, "down"}             (reference save: compress_mlp.py:97)
      qk:  {"q", "k", "rotary_mask"?, "q_bias"?, "k_bias"?}
                                               (reference save: compress_qk.py:301)
      vo:  {"v", "o"}                          (reference save: compress_vo.py:92)

    Layers absent from a dict keep their dense weights (partial-order
    support, reference: run_modegpt.py:128-151 honours config.order).
    Compressed projections drop biases except OPT q/k which carry sliced
    biases (reference: convert_model builds bias-free Linears,
    model_adapter.py:199-207; OPT qk biases via compress_head_opt).

    release_dense: MUTATES the caller's ``params`` — pops each replaced
    dense projection leaf as its compressed kernel is built, so the
    device can free the dense weight once nothing else references it.
    Required to fit surgery on one chip when dense + compressed weights
    together exceed HBM (7B bf16 on a 16 GB v5e: 11.8 + ~8 GB).
    """
    mlp_factors = mlp_factors or {}
    qk_factors = qk_factors or {}
    vo_factors = vo_factors or {}

    q_ranks = list(spec.q_ranks)
    k_ranks = list(spec.k_ranks)
    v_ranks = list(spec.v_ranks)
    o_ranks = list(spec.o_ranks)
    gate_ranks = list(spec.gate_ranks)
    shared_ranks = [spec.shared_rank(l) for l in range(spec.n_layers)]
    any_shared_change = bool(spec.shared_gate_ranks)

    model_dtype = params["embed_tokens"].dtype

    new_layers = []
    any_mask = False
    for l in range(spec.n_layers):
        lp = dict(params["layers"][l])  # shallow copy; replaced leaves are new

        if l in mlp_factors:
            f = mlp_factors[l]
            if spec.is_moe_layer(l):
                if f["up"].ndim != 3:
                    raise ValueError(
                        f"layer {l}: MoE spec but 2D MLP factors — the factor "
                        "store was solved for a different (dense) model"
                    )
                # MoE: stacked per-expert HF factors [E, r, d]/[E, d, r]
                # -> stacked kernels [E, d, r]/[E, r, d] (router untouched).
                def _ek(w):
                    return _as_kernel(w, model_dtype)

                lp["experts"] = {
                    "gate": {"kernel": _ek(f["gate"])},
                    "up": {"kernel": _ek(f["up"])},
                    "down": {"kernel": _ek(f["down"])},
                }
                gate_ranks[l] = int(f["up"].shape[1])
                if f.get("shared_up") is not None:
                    # DeepSeek/qwen2_moe shared expert: its own Type-I
                    # factors (the sigmoid scalar gate is untouched).
                    lp["shared"] = {
                        "gate": {"kernel": _as_kernel(f["shared_gate"], model_dtype)},
                        "up": {"kernel": _as_kernel(f["shared_up"], model_dtype)},
                        "down": {"kernel": _as_kernel(f["shared_down"], model_dtype)},
                    }
                    shared_ranks[l] = int(f["shared_up"].shape[0])
                    any_shared_change = True
            else:
                lp["up"] = {"kernel": _as_kernel(f["up"], model_dtype)}
                if spec.gated_mlp:
                    lp["gate"] = {"kernel": _as_kernel(f["gate"], model_dtype)}
                lp["down"] = {"kernel": _as_kernel(f["down"], model_dtype)}
                if f.get("up_bias") is not None:
                    lp["up"]["bias"] = jnp.asarray(np.asarray(f["up_bias"]), dtype=model_dtype)
                if f.get("down_bias") is not None:
                    lp["down"]["bias"] = jnp.asarray(
                        np.asarray(f["down_bias"]), dtype=model_dtype
                    )
                gate_ranks[l] = int(f["up"].shape[0])

        if l in qk_factors:
            f = qk_factors[l]
            lp["q"] = {"kernel": _as_kernel(f["q"], model_dtype)}
            lp["k"] = {"kernel": _as_kernel(f["k"], model_dtype)}
            if f.get("q_bias") is not None:
                lp["q"]["bias"] = jnp.asarray(np.asarray(f["q_bias"]), dtype=model_dtype)
                lp["k"]["bias"] = jnp.asarray(np.asarray(f["k_bias"]), dtype=model_dtype)
            if f.get("rotary_mask") is not None:
                lp["rotary_mask"] = jnp.asarray(np.asarray(f["rotary_mask"]), dtype=jnp.int32)
                any_mask = True
            q_ranks[l] = int(f["q"].shape[0])
            k_ranks[l] = int(f["k"].shape[0])

        if l in vo_factors:
            f = vo_factors[l]
            lp["v"] = {"kernel": _as_kernel(f["v"], model_dtype)}
            lp["o"] = {"kernel": _as_kernel(f["o"], model_dtype)}
            if f.get("o_bias") is not None:
                lp["o"]["bias"] = jnp.asarray(np.asarray(f["o_bias"]), dtype=model_dtype)
            v_ranks[l] = int(f["v"].shape[0])
            o_ranks[l] = int(f["o"].shape[1])

        if release_dense:
            src = params["layers"][l]
            if l in mlp_factors:
                keys = ("experts", "shared") if spec.is_moe_layer(l) else ("up", "gate", "down")
                for key in keys:
                    if key in lp and lp[key] is not src.get(key):
                        src.pop(key, None)
            if l in qk_factors:
                src.pop("q", None)
                src.pop("k", None)
            if l in vo_factors:
                src.pop("v", None)
                src.pop("o", None)

        new_layers.append(lp)

    new_params = dict(params)
    new_params["layers"] = new_layers
    new_spec = spec.with_ranks(
        q_ranks=q_ranks,
        k_ranks=k_ranks,
        v_ranks=v_ranks,
        o_ranks=o_ranks,
        gate_ranks=gate_ranks,
        has_rotary_masks=any_mask or spec.has_rotary_masks,
        shared_gate_ranks=shared_ranks if any_shared_change else None,
    )
    return new_spec, new_params
