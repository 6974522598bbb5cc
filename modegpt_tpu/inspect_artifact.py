"""Artifact inspection CLI: `python -m modegpt_tpu.inspect_artifact <dir>`.

Prints the compressed architecture summary — per-layer ranks, rotary
masks, parameter counts and achieved compression vs the dense shape.
"""

from __future__ import annotations

import json
import sys


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m modegpt_tpu.inspect_artifact <artifact-dir>")
        return 1
    from modegpt_tpu.compress.artifact import load_compressed_model
    from modegpt_tpu.compress.pipeline import count_params
    from modegpt_tpu.models.init import init_params
    from modegpt_tpu.models.spec import ModelSpec
    import dataclasses
    import jax

    spec, params, tok_src = load_compressed_model(argv[0])
    n = count_params(params)

    dense_spec = dataclasses.replace(
        spec,
        q_ranks=(spec.n_heads * spec.head_dim,) * spec.n_layers,
        k_ranks=(spec.n_kv_heads * spec.head_dim,) * spec.n_layers,
        v_ranks=(spec.n_kv_heads * spec.head_dim,) * spec.n_layers,
        o_ranks=(spec.n_heads * spec.head_dim,) * spec.n_layers,
        gate_ranks=(spec.d_int,) * spec.n_layers,
        shared_gate_ranks=(),  # dense = shared_d_int on every MoE layer
        has_rotary_masks=False,
    )
    with jax.default_device(jax.devices("cpu")[0]):
        n_dense = count_params(init_params(dense_spec, jax.random.key(0)))

    info = {
        "arch": spec.arch,
        "n_layers": spec.n_layers,
        "d_model": spec.d_model,
        "heads": f"{spec.n_heads}q/{spec.n_kv_heads}kv x {spec.head_dim}",
        "d_int": spec.d_int,
        "tokenizer_source": tok_src,
        "params": n,
        "dense_params": n_dense,
        "achieved_compression": round(1 - n / max(n_dense, 1), 4),
        "has_rotary_masks": spec.has_rotary_masks,
        **(
            {"n_experts": spec.n_experts, "experts_per_tok": spec.experts_per_tok}
            if spec.n_experts
            else {}
        ),
        "per_layer": [
            {
                "layer": l,
                "q": spec.q_ranks[l],
                "k": spec.k_ranks[l],
                "v": spec.v_ranks[l],
                "o": spec.o_ranks[l],
                "mlp": spec.gate_ranks[l],
                **(
                    {"shared": spec.shared_rank(l)}
                    if spec.has_shared_expert(l)
                    else {}
                ),
            }
            for l in range(spec.n_layers)
        ],
    }
    print(json.dumps(info, indent=2))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
