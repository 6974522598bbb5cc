"""Export a (compressed) model to HuggingFace checkpoint format.

Migration interop: the reference's compressed checkpoints are HF
directories whose config carries per-layer rank lists and whose weights
follow HF naming (reference: LlamaAdapter.py:250-302 `patch_config`,
model_utils.py:83-126 `save_compressed_model`). This exporter writes the
same layout from our (spec, params):

* ``config.json`` with the arch's standard fields plus
  ``q_ranks/k_ranks/v_ranks/o_ranks/gate_ranks`` and ``mask_path``;
* ``model.safetensors`` with HF parameter names ([out, in] weights);
* ``rotary_masks.pt`` (torch format) when rotary masks are present;
* ``tokenizer_source.txt``.

A user holding the reference's Rebuild modeling files can point
``trust_remote_code`` at this directory; conversely our importer
round-trips it (tested).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional

import numpy as np

from modegpt_tpu.models.spec import ModelSpec

__all__ = ["export_to_hf"]


def _hf_config_dict(spec: ModelSpec) -> Dict:
    if spec.arch == "opt":
        cfg = {
            "model_type": "opt",
            "architectures": ["OPTForCausalLM"],
            "vocab_size": spec.vocab_size,
            "hidden_size": spec.d_model,
            "ffn_dim": spec.d_int,
            "num_hidden_layers": spec.n_layers,
            "num_attention_heads": spec.n_heads,
            "max_position_embeddings": spec.max_position_embeddings,
            "activation_function": spec.act,
            "do_layer_norm_before": spec.do_layer_norm_before,
            "enable_bias": spec.attention_bias,
            "word_embed_proj_dim": spec.word_embed_proj_dim or spec.d_model,
            "tie_word_embeddings": spec.tie_word_embeddings,
        }
    else:
        cfg = {
            "model_type": spec.arch,
            "architectures": [
                "LlamaForCausalLM" if spec.arch == "llama" else "Qwen3ForCausalLM"
            ],
            "vocab_size": spec.vocab_size,
            "hidden_size": spec.d_model,
            "intermediate_size": spec.d_int,
            "num_hidden_layers": spec.n_layers,
            "num_attention_heads": spec.n_heads,
            "num_key_value_heads": spec.n_kv_heads,
            "head_dim": spec.head_dim,
            "max_position_embeddings": spec.max_position_embeddings,
            "hidden_act": spec.act,
            "rms_norm_eps": spec.norm_eps,
            "rope_theta": spec.rope_theta,
            "attention_bias": spec.attention_bias,
            "mlp_bias": spec.mlp_bias,
            "tie_word_embeddings": spec.tie_word_embeddings,
        }
        if spec.layer_types:
            cfg["layer_types"] = list(spec.layer_types)
            cfg["sliding_window"] = spec.sliding_window
            cfg["use_sliding_window"] = spec.sliding_window is not None
    # Compressed rank lists (reference: LlamaAdapter.py:286-292) + the
    # ffn_dim=-1 canary the reference sets (LlamaAdapter.py:287).
    cfg["q_ranks"] = list(spec.q_ranks)
    cfg["k_ranks"] = list(spec.k_ranks)
    cfg["v_ranks"] = list(spec.v_ranks)
    cfg["o_ranks"] = list(spec.o_ranks)
    cfg["gate_ranks"] = list(spec.gate_ranks)
    cfg["torch_dtype"] = "bfloat16"
    return cfg


def export_to_hf(
    spec: ModelSpec,
    params: Dict,
    out_dir: str,
    tokenizer_source: str = "",
    dtype=np.float32,
) -> str:
    """Write an HF-layout checkpoint directory from (spec, params)."""
    if spec.n_experts:
        raise NotImplementedError(
            "HF export covers the reference's archs (opt/llama/qwen3); "
            "MoE artifacts load via modegpt_tpu.compress.artifact"
        )
    from safetensors.numpy import save_file

    os.makedirs(out_dir, exist_ok=True)

    def W(p):  # kernel [in, out] -> HF [out, in]
        return np.ascontiguousarray(np.asarray(p["kernel"], dtype=dtype).T)

    def V(a):
        return np.ascontiguousarray(np.asarray(a, dtype=dtype))

    sd: Dict[str, np.ndarray] = {}
    masks = {}
    if spec.arch == "opt":
        pre = "model.decoder."
        sd[pre + "embed_tokens.weight"] = V(params["embed_tokens"])
        sd[pre + "embed_positions.weight"] = V(params["embed_positions"])
        if "project_in" in params:
            sd[pre + "project_in.weight"] = W(params["project_in"])
            sd[pre + "project_out.weight"] = W(params["project_out"])
        if params.get("final_norm") is not None:
            sd[pre + "final_layer_norm.weight"] = V(params["final_norm"]["scale"])
            sd[pre + "final_layer_norm.bias"] = V(params["final_norm"]["bias"])
        names = {
            "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
            "o": "self_attn.out_proj", "up": "fc1", "down": "fc2",
        }
        norm_names = {"attn_norm": "self_attn_layer_norm", "mlp_norm": "final_layer_norm"}
    else:
        pre = "model."
        sd[pre + "embed_tokens.weight"] = V(params["embed_tokens"])
        sd[pre + "norm.weight"] = V(params["final_norm"]["scale"])
        names = {
            "q": "self_attn.q_proj", "k": "self_attn.k_proj", "v": "self_attn.v_proj",
            "o": "self_attn.o_proj", "gate": "mlp.gate_proj", "up": "mlp.up_proj",
            "down": "mlp.down_proj",
        }
        norm_names = {"attn_norm": "input_layernorm", "mlp_norm": "post_attention_layernorm"}

    for l, lp in enumerate(params["layers"]):
        b = f"{pre}layers.{l}."
        for ours, theirs in names.items():
            if ours not in lp:
                continue
            sd[b + theirs + ".weight"] = W(lp[ours])
            if "bias" in lp[ours]:
                sd[b + theirs + ".bias"] = V(lp[ours]["bias"])
        for ours, theirs in norm_names.items():
            sd[b + theirs + ".weight"] = V(lp[ours]["scale"])
            if "bias" in lp[ours]:
                sd[b + theirs + ".bias"] = V(lp[ours]["bias"])
        if "q_norm" in lp:
            sd[b + "self_attn.q_norm.weight"] = V(lp["q_norm"]["scale"])
            sd[b + "self_attn.k_norm.weight"] = V(lp["k_norm"]["scale"])
        if "rotary_mask" in lp:
            masks[l] = np.asarray(lp["rotary_mask"])

    if params.get("lm_head") is not None:
        sd["lm_head.weight"] = W(params["lm_head"])

    save_file(sd, os.path.join(out_dir, "model.safetensors"))

    cfg = _hf_config_dict(spec)
    if masks:
        mask_path = os.path.abspath(os.path.join(out_dir, "rotary_masks.pt"))
        cfg["mask_path"] = mask_path  # reference: model_utils.py:105-109
        import torch

        torch.save(
            [torch.tensor(masks[l], dtype=torch.int64) for l in range(spec.n_layers)],
            mask_path,
        )
    else:
        cfg["mask_path"] = None
    with open(os.path.join(out_dir, "config.json"), "w") as f:
        json.dump(cfg, f, indent=2)
    with open(os.path.join(out_dir, "tokenizer_source.txt"), "w") as f:
        f.write(tokenizer_source.strip())
    return out_dir
