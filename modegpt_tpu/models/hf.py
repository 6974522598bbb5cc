"""HuggingFace checkpoint ingestion: torch state dict -> JAX param pytree.

Replaces the reference's reliance on `AutoModelForCausalLM` for the dense
model (reference: src/model_utils.py:63-80). Works from a live
transformers model, a local `from_pretrained` directory, or a raw state
dict; torch stays on CPU and is only used as a weight container.

Layout conversion: HF Linear weights are [out, in]; our kernels are
[in, out] so the forward is a plain ``x @ kernel`` (row-major friendly on
TPU). The compression solvers in `modegpt_tpu.ops` operate on the HF
[out, in] layout to keep factor-level parity with the reference; the
surgery module handles the transposition.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from modegpt_tpu.models.spec import ModelSpec, spec_from_hf_config

__all__ = ["params_from_hf_model", "params_from_state_dict", "load_hf_model"]


def _t2n(t, dtype) -> np.ndarray:
    """torch tensor or numpy array -> numpy in the requested dtype."""
    if isinstance(t, np.ndarray):
        return t.astype(dtype)
    import torch

    with torch.no_grad():
        return t.detach().to(torch.float32).cpu().numpy().astype(dtype)


def params_from_state_dict(
    spec: ModelSpec, sd: Dict, dtype=np.float32, rotary_masks: Optional[Dict] = None
) -> Dict:
    """Build the params pytree from an HF state dict."""

    def W(name):  # linear kernel: [out, in] -> [in, out]
        return jnp.asarray(_t2n(sd[name], dtype).T)

    def V(name):  # vector / embedding: as-is
        return jnp.asarray(_t2n(sd[name], dtype))

    def has(name):
        return name in sd

    params: Dict = {}
    if spec.arch == "gpt2":
        # GPT-2 Conv1D weights are ALREADY [in, out] — no transposes; the
        # fused c_attn [d, 3d] splits by the spec's rank lists (so
        # compressed re-imports work), c_fc/c_proj are up/down.
        pre = "transformer."
        params["embed_tokens"] = V(pre + "wte.weight")
        params["embed_positions"] = V(pre + "wpe.weight")
        params["final_norm"] = {
            "scale": V(pre + "ln_f.weight"),
            "bias": V(pre + "ln_f.bias"),
        }
        layers = []
        for l in range(spec.n_layers):
            b = f"{pre}h.{l}."
            ca = _t2n(sd[b + "attn.c_attn.weight"], dtype)
            cb = _t2n(sd[b + "attn.c_attn.bias"], dtype)
            qd, kd = spec.q_ranks[l], spec.k_ranks[l]
            lp = {
                "attn_norm": {"scale": V(b + "ln_1.weight"), "bias": V(b + "ln_1.bias")},
                "mlp_norm": {"scale": V(b + "ln_2.weight"), "bias": V(b + "ln_2.bias")},
                "q": {"kernel": jnp.asarray(ca[:, :qd]), "bias": jnp.asarray(cb[:qd])},
                "k": {
                    "kernel": jnp.asarray(ca[:, qd : qd + kd]),
                    "bias": jnp.asarray(cb[qd : qd + kd]),
                },
                "v": {
                    "kernel": jnp.asarray(ca[:, qd + kd :]),
                    "bias": jnp.asarray(cb[qd + kd :]),
                },
                "o": {
                    "kernel": jnp.asarray(_t2n(sd[b + "attn.c_proj.weight"], dtype)),
                    "bias": V(b + "attn.c_proj.bias"),
                },
                "up": {
                    "kernel": jnp.asarray(_t2n(sd[b + "mlp.c_fc.weight"], dtype)),
                    "bias": V(b + "mlp.c_fc.bias"),
                },
                "down": {
                    "kernel": jnp.asarray(_t2n(sd[b + "mlp.c_proj.weight"], dtype)),
                    "bias": V(b + "mlp.c_proj.bias"),
                },
            }
            layers.append(lp)
        params["layers"] = layers
    elif spec.arch == "opt":
        pre = "model.decoder."
        params["embed_tokens"] = V(pre + "embed_tokens.weight")
        params["embed_positions"] = V(pre + "embed_positions.weight")
        if has(pre + "project_in.weight"):
            params["project_in"] = {"kernel": W(pre + "project_in.weight")}
            params["project_out"] = {"kernel": W(pre + "project_out.weight")}
        if has(pre + "final_layer_norm.weight"):
            params["final_norm"] = {
                "scale": V(pre + "final_layer_norm.weight"),
                "bias": V(pre + "final_layer_norm.bias"),
            }
        else:
            # post-LN OPT variants (do_layer_norm_before=False) have no
            # final decoder LayerNorm.
            params["final_norm"] = None
        layers = []
        for l in range(spec.n_layers):
            b = f"{pre}layers.{l}."
            lp = {
                "attn_norm": {
                    "scale": V(b + "self_attn_layer_norm.weight"),
                    "bias": V(b + "self_attn_layer_norm.bias"),
                },
                "mlp_norm": {
                    "scale": V(b + "final_layer_norm.weight"),
                    "bias": V(b + "final_layer_norm.bias"),
                },
                "q": {"kernel": W(b + "self_attn.q_proj.weight")},
                "k": {"kernel": W(b + "self_attn.k_proj.weight")},
                "v": {"kernel": W(b + "self_attn.v_proj.weight")},
                "o": {"kernel": W(b + "self_attn.out_proj.weight")},
                "up": {"kernel": W(b + "fc1.weight")},
                "down": {"kernel": W(b + "fc2.weight")},
            }
            for ours, theirs in [
                ("q", "self_attn.q_proj"),
                ("k", "self_attn.k_proj"),
                ("v", "self_attn.v_proj"),
                ("o", "self_attn.out_proj"),
                ("up", "fc1"),
                ("down", "fc2"),
            ]:
                if has(b + theirs + ".bias"):
                    lp[ours]["bias"] = V(b + theirs + ".bias")
            layers.append(lp)
        params["layers"] = layers
    else:  # llama / qwen3 / mixtral
        pre = "model."
        params["embed_tokens"] = V(pre + "embed_tokens.weight")
        params["final_norm"] = {"scale": V(pre + "norm.weight")}
        if has(pre + "norm.bias"):  # starcoder2: biased LayerNorm
            params["final_norm"]["bias"] = V(pre + "norm.bias")
        layers = []
        for l in range(spec.n_layers):
            b = f"{pre}layers.{l}."
            if spec.post_norms and not spec.pre_norms:
                # olmo2: ONLY post-sublayer norms (before the residual add)
                norms = {
                    "post_attn_norm": {"scale": V(b + "post_attention_layernorm.weight")},
                    "post_mlp_norm": {"scale": V(b + "post_feedforward_layernorm.weight")},
                }
            elif spec.post_norms:
                # gemma2 sandwich norms: post_attention_layernorm normalises
                # the attention OUTPUT; the MLP gets pre+post norms.
                norms = {
                    "attn_norm": {"scale": V(b + "input_layernorm.weight")},
                    "post_attn_norm": {"scale": V(b + "post_attention_layernorm.weight")},
                    "mlp_norm": {"scale": V(b + "pre_feedforward_layernorm.weight")},
                    "post_mlp_norm": {"scale": V(b + "post_feedforward_layernorm.weight")},
                }
            else:
                norms = {
                    "attn_norm": {"scale": V(b + "input_layernorm.weight")},
                    "mlp_norm": {"scale": V(b + "post_attention_layernorm.weight")},
                }
                if has(b + "input_layernorm.bias"):  # starcoder2 LayerNorm
                    norms["attn_norm"]["bias"] = V(b + "input_layernorm.bias")
                    norms["mlp_norm"]["bias"] = V(b + "post_attention_layernorm.bias")
            if spec.arch == "phi3":
                # phi3 fuses q/k/v into qkv_proj [(H+2Hk)*hd, d] — split by
                # the spec's rank lists so compressed re-imports work too
                qkv = _t2n(sd[b + "self_attn.qkv_proj.weight"], dtype)
                qd, kd = spec.q_ranks[l], spec.k_ranks[l]
                lp = {
                    **norms,
                    "q": {"kernel": jnp.asarray(qkv[:qd].T)},
                    "k": {"kernel": jnp.asarray(qkv[qd : qd + kd].T)},
                    "v": {"kernel": jnp.asarray(qkv[qd + kd :].T)},
                    "o": {"kernel": W(b + "self_attn.o_proj.weight")},
                }
            else:
                lp = {
                    **norms,
                    "q": {"kernel": W(b + "self_attn.q_proj.weight")},
                    "k": {"kernel": W(b + "self_attn.k_proj.weight")},
                    "v": {"kernel": W(b + "self_attn.v_proj.weight")},
                    "o": {"kernel": W(b + "self_attn.o_proj.weight")},
                }
            if spec.is_moe_layer(l):
                # Stack the per-expert kernels into [E, in, out] (one
                # batched einsum per projection on-device). Key layouts:
                # mixtral: block_sparse_moe.gate + experts.{e}.w1/w3/w2;
                # qwen3_moe/qwen2_moe: mlp.gate + mlp.experts.{e}.
                # {gate,up,down}_proj (+ qwen2_moe's mlp.shared_expert.* and
                # mlp.shared_expert_gate).
                if spec.arch in ("qwen3_moe", "qwen2_moe"):
                    moe = b + "mlp."
                    names = ("gate_proj", "up_proj", "down_proj")
                else:
                    moe = b + "block_sparse_moe."
                    names = ("w1", "w3", "w2")
                lp["router"] = {"kernel": W(moe + "gate.weight")}

                def EW(name):
                    return jnp.stack(
                        [
                            jnp.asarray(_t2n(sd[f"{moe}experts.{e}.{name}.weight"], dtype).T)
                            for e in range(spec.n_experts)
                        ]
                    )

                lp["experts"] = {
                    "gate": {"kernel": EW(names[0])},
                    "up": {"kernel": EW(names[1])},
                    "down": {"kernel": EW(names[2])},
                }
                if spec.shared_d_int:
                    lp["shared"] = {
                        "gate": {"kernel": W(moe + "shared_expert.gate_proj.weight")},
                        "up": {"kernel": W(moe + "shared_expert.up_proj.weight")},
                        "down": {"kernel": W(moe + "shared_expert.down_proj.weight")},
                    }
                    if spec.shared_expert_gate:
                        lp["shared_gate"] = {"kernel": W(moe + "shared_expert_gate.weight")}
            elif spec.arch == "phi3":
                # phi3 fuses [gate; up] into gate_up_proj [2*D, d]
                gu = _t2n(sd[b + "mlp.gate_up_proj.weight"], dtype)
                gd = spec.gate_ranks[l]
                lp["gate"] = {"kernel": jnp.asarray(gu[:gd].T)}
                lp["up"] = {"kernel": jnp.asarray(gu[gd:].T)}
                lp["down"] = {"kernel": W(b + "mlp.down_proj.weight")}
            elif spec.arch == "starcoder2":
                # non-gated MLP under GPT-2-style names (biases follow
                # use_bias, like the attention projections)
                lp["up"] = {"kernel": W(b + "mlp.c_fc.weight")}
                lp["down"] = {"kernel": W(b + "mlp.c_proj.weight")}
                if has(b + "mlp.c_fc.bias"):
                    lp["up"]["bias"] = V(b + "mlp.c_fc.bias")
                    lp["down"]["bias"] = V(b + "mlp.c_proj.bias")
            else:
                lp["gate"] = {"kernel": W(b + "mlp.gate_proj.weight")}
                lp["up"] = {"kernel": W(b + "mlp.up_proj.weight")}
                lp["down"] = {"kernel": W(b + "mlp.down_proj.weight")}
            if spec.attention_bias:
                # o bias is absent in the dense archs but appears in our
                # compressed exports (the v bias folds into it — see
                # compress/pipeline.py VO bias handling).
                for ours, theirs in [
                    ("q", "self_attn.q_proj"),
                    ("k", "self_attn.k_proj"),
                    ("v", "self_attn.v_proj"),
                    ("o", "self_attn.o_proj"),
                ]:
                    if has(b + theirs + ".bias"):
                        lp[ours]["bias"] = V(b + theirs + ".bias")
            if spec.qk_norm or spec.flat_qk_norm:
                lp["q_norm"] = {"scale": V(b + "self_attn.q_norm.weight")}
                lp["k_norm"] = {"scale": V(b + "self_attn.k_norm.weight")}
            if rotary_masks is not None and l in rotary_masks:
                lp["rotary_mask"] = jnp.asarray(rotary_masks[l], dtype=jnp.int32)
            layers.append(lp)
        params["layers"] = layers

    if spec.tie_word_embeddings or "lm_head.weight" not in sd:
        params["lm_head"] = None
    else:
        params["lm_head"] = {"kernel": W("lm_head.weight")}
    return params


def params_from_hf_model(model, dtype=np.float32) -> Tuple[ModelSpec, Dict]:
    """Convert a live transformers CausalLM model to (spec, params)."""
    spec = spec_from_hf_config(model.config)
    sd = dict(model.state_dict())
    return spec, params_from_state_dict(spec, sd, dtype=dtype)


def load_hf_model(model_name_or_path: str, dtype=np.float32):
    """Load a dense HF checkpoint from disk and return (spec, params, tokenizer)."""
    from transformers import AutoConfig, AutoModelForCausalLM, AutoTokenizer
    import torch

    spec = params = None
    try:
        # Torch-free fast path: read safetensors shards directly (half the
        # peak RAM, no module instantiation — matters at 7B+).
        from modegpt_tpu.models.safetensors_io import load_hf_checkpoint_safetensors

        spec, params = load_hf_checkpoint_safetensors(model_name_or_path, dtype=dtype)
    except (FileNotFoundError, KeyError):
        pass

    config = AutoConfig.from_pretrained(model_name_or_path)
    if params is None:
        model = AutoModelForCausalLM.from_pretrained(
            model_name_or_path, torch_dtype=torch.float32, low_cpu_mem_usage=True
        )
    try:
        tokenizer = AutoTokenizer.from_pretrained(model_name_or_path)
        if tokenizer.pad_token is None:
            tokenizer.pad_token = tokenizer.eos_token
    except Exception:
        # Checkpoint without tokenizer files — fine for the synthetic
        # dataset and for pre-tokenized local corpora.
        tokenizer = None
    if params is None:
        spec, params = params_from_hf_model(model, dtype=dtype)
        del model
    return spec, params, tokenizer
