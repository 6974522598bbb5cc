"""Random parameter initialisation for a ModelSpec (no HF dependency).

Used by benches, the graft entry, and multi-chip dry runs where a real
checkpoint is unnecessary. Initialisation is a plain scaled normal — the
numerics of the compression pipeline do not depend on the init scheme.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from modegpt_tpu.models.spec import ModelSpec

__all__ = ["init_params"]


def init_params(spec: ModelSpec, key: jax.Array, dtype=jnp.float32, scale: float = 0.02) -> Dict:
    keys = iter(jax.random.split(key, 16 + 16 * spec.n_layers))

    def dense(shape):
        return jax.random.normal(next(keys), shape, dtype=dtype) * scale

    def norm_p():
        p = {"scale": jnp.ones((spec.d_model,), dtype=dtype)}
        if spec.norm == "layernorm":
            p["bias"] = jnp.zeros((spec.d_model,), dtype=dtype)
        return p

    def linear(shape, bias: bool):
        p = {"kernel": dense(shape)}
        if bias:
            p["bias"] = jnp.zeros((shape[1],), dtype=dtype)
        return p

    params: Dict = {
        "embed_tokens": dense((spec.vocab_size, spec.d_model)),
        "final_norm": norm_p(),
        "lm_head": None if spec.tie_word_embeddings else {
            "kernel": dense((spec.d_model, spec.vocab_size))
        },
    }
    if spec.arch == "opt":
        params["embed_positions"] = dense((spec.max_position_embeddings + 2, spec.d_model))
    elif spec.arch == "gpt2":
        params["embed_positions"] = dense((spec.max_position_embeddings, spec.d_model))

    layers = []
    for l in range(spec.n_layers):
        ab = spec.attention_bias
        lp = {
            **({"attn_norm": norm_p(), "mlp_norm": norm_p()} if spec.pre_norms or not spec.do_layer_norm_before else {}),
            **({"post_attn_norm": norm_p(), "post_mlp_norm": norm_p()} if spec.post_norms else {}),
            "q": linear((spec.d_model, spec.q_ranks[l]), ab),
            "k": linear((spec.d_model, spec.k_ranks[l]), ab),
            "v": linear((spec.d_model, spec.v_ranks[l]), ab),
            "o": linear(
                (spec.o_ranks[l], spec.d_model),
                ab and spec.arch in ("opt", "gpt2", "starcoder2"),
            ),
        }
        if spec.is_moe_layer(l):
            E, rg = spec.n_experts, spec.gate_ranks[l]
            lp["router"] = {"kernel": dense((spec.d_model, E))}
            lp["experts"] = {
                "gate": {"kernel": dense((E, spec.d_model, rg))},
                "up": {"kernel": dense((E, spec.d_model, rg))},
                "down": {"kernel": dense((E, rg, spec.d_model))},
            }
            if spec.shared_d_int:
                rs = spec.shared_rank(l)
                lp["shared"] = {
                    "gate": {"kernel": dense((spec.d_model, rs))},
                    "up": {"kernel": dense((spec.d_model, rs))},
                    "down": {"kernel": dense((rs, spec.d_model))},
                }
                if spec.shared_expert_gate:
                    lp["shared_gate"] = {"kernel": dense((spec.d_model, 1))}
        else:
            mb = spec.mlp_bias or spec.arch in ("opt", "gpt2")
            lp["up"] = linear((spec.d_model, spec.gate_ranks[l]), mb)
            lp["down"] = linear((spec.gate_ranks[l], spec.d_model), mb)
            if spec.gated_mlp:
                lp["gate"] = linear((spec.d_model, spec.gate_ranks[l]), spec.mlp_bias)
        if spec.qk_norm:
            lp["q_norm"] = {"scale": jnp.ones((spec.head_dim,), dtype=dtype)}
            lp["k_norm"] = {"scale": jnp.ones((spec.head_dim,), dtype=dtype)}
        elif spec.flat_qk_norm:
            lp["q_norm"] = {"scale": jnp.ones((spec.n_heads * spec.head_dim,), dtype=dtype)}
            lp["k_norm"] = {"scale": jnp.ones((spec.n_kv_heads * spec.head_dim,), dtype=dtype)}
        layers.append(lp)
    params["layers"] = layers
    return params
