"""PPL-vs-ratio quality curve: standing end-to-end compression-quality
evidence (committed to bench_results/r03/quality.json).

The reference's de-facto correctness check is the baseline-vs-compressed
PPL delta of a full pipeline run (reference: run_modegpt.py:91-98,
184-194). Factor-level golden parity (tests/test_reference_golden.py) is
necessary but not sufficient — this script runs the FULL pipeline
(calibrate -> allocate -> solve -> surgery -> artifact -> eval) at
ratios {0.1, 0.3, 0.5} on three architectures and records the curve:

* a 0.45B synthetic Llama (GQA, gated silu MLP) — the flagship shape;
* an OPT-125m-geometry model (post-LN lineage, biases, learned
  positions) built through HF so the adapter path is the tested one;
* a Qwen3-shaped model (per-head q/k RMSNorm through the rotary mask).

Models are random-init (zero-egress environment), so absolute PPL sits
near vocab-uniform; the signal is the DELTA vs the same model's dense
baseline, which measures exactly the functional distortion compression
introduces. tests/test_pipeline.py's quality gate is calibrated from
this curve.

Run:  JAX_PLATFORMS=cpu python scripts/quality_curve.py [--out PATH]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

# This host's sitecustomize force-registers the tunneled TPU platform,
# overriding JAX_PLATFORMS from the environment — and default_backend()
# would INITIALIZE it (hanging if the tunnel is down). Honour an explicit
# CPU request before any backend touch.
if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
    jax.config.update("jax_platforms", "cpu")

import numpy as np

RATIOS = (0.1, 0.3, 0.5)


def llama_0p45b():
    from modegpt_tpu.models.init import init_params
    from modegpt_tpu.models.spec import ModelSpec

    D, H, Hk, hd, di, L, V = 1280, 20, 10, 64, 3456, 20, 32000
    spec = ModelSpec(
        arch="llama", vocab_size=V, d_model=D, n_layers=L, n_heads=H,
        n_kv_heads=Hk, head_dim=hd, d_int=di, max_position_embeddings=2048,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(H * hd,) * L, k_ranks=(Hk * hd,) * L,
        v_ranks=(Hk * hd,) * L, o_ranks=(H * hd,) * L, gate_ranks=(di,) * L,
    )
    return spec, init_params(spec, jax.random.key(0))


def opt_125m():
    import torch
    import transformers

    from modegpt_tpu.models import params_from_hf_model

    cfg = transformers.OPTConfig(
        vocab_size=8192, hidden_size=768, ffn_dim=3072, num_hidden_layers=12,
        num_attention_heads=12, max_position_embeddings=512,
        do_layer_norm_before=True, word_embed_proj_dim=768,
    )
    torch.manual_seed(0)
    return params_from_hf_model(transformers.OPTForCausalLM(cfg).eval())


def qwen3_0p1b():
    import torch
    import transformers

    from modegpt_tpu.models import params_from_hf_model

    cfg = transformers.Qwen3Config(
        vocab_size=8192, hidden_size=768, intermediate_size=2048,
        num_hidden_layers=12, num_attention_heads=12, num_key_value_heads=4,
        head_dim=64, max_position_embeddings=1024, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return params_from_hf_model(transformers.Qwen3ForCausalLM(cfg).eval())


def mixtral_moe():
    import torch
    import transformers

    from modegpt_tpu.models import params_from_hf_model

    cfg = transformers.MixtralConfig(
        vocab_size=8192, hidden_size=512, intermediate_size=1024,
        num_hidden_layers=8, num_attention_heads=8, num_key_value_heads=4,
        num_local_experts=4, num_experts_per_tok=2,
        max_position_embeddings=1024,
    )
    torch.manual_seed(0)
    return params_from_hf_model(transformers.MixtralForCausalLM(cfg).eval())


MODELS = {
    "llama_0.45b": (llama_0p45b, 512),
    "opt_125m": (opt_125m, 256),
    "qwen3_0.1b": (qwen3_0p1b, 256),
    "mixtral_moe": (mixtral_moe, 256),
}


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="bench_results/r03/quality.json")
    ap.add_argument("--models", default=",".join(MODELS))
    args = ap.parse_args(argv)

    from modegpt_tpu.compress.pipeline import count_params, run_compression
    from modegpt_tpu.config import CompressionConfig

    curve = {}
    for name in args.models.split(","):
        build, seq = MODELS[name]
        spec, params = build()
        n_params = count_params(params)
        rows = []
        for ratio in RATIOS:
            root = tempfile.mkdtemp(prefix=f"quality_{name}_")
            config = CompressionConfig(
                model=name, dataset="synthetic", compression_ratio=ratio,
                calib_size=8, calibs_batch_size=4, seq_len=seq,
                eval_batch_size=4, eval_max_samples=16,
                sparsity_smoothing=0.5, solver_precision="f32_device",
                output_dir=os.path.join(root, "out"),
                temp_storage_dir=os.path.join(root, "layers"),
                metrics_dir=os.path.join(root, "metrics"),
            )
            t0 = time.time()
            res = run_compression(config, spec=spec, params=params)
            rows.append({
                "ratio": ratio,
                "baseline_ppl": float(res["baseline_ppl"]),
                "compressed_ppl": float(res["compressed_ppl"]),
                "ppl_delta": float(res["compressed_ppl"] / res["baseline_ppl"]),
                "achieved_compression": round(
                    1.0 - res["params_after"] / res["params_before"], 4
                ),
                "seconds": round(time.time() - t0, 1),
            })
            print(name, rows[-1], flush=True)
        curve[name] = {"params": int(n_params), "seq_len": seq, "curve": rows}

    out = {
        "what": "full-pipeline PPL-vs-ratio on synthetic-init models "
                "(delta vs dense baseline = compression distortion)",
        "dataset": "synthetic", "calib": "8 seqs", "eval": "16 samples",
        "backend": jax.default_backend(),
        "models": curve,
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    if os.path.exists(args.out):
        # --models subset re-runs merge into the standing file
        with open(args.out) as f:
            prev = json.load(f)
        merged = dict(prev.get("models", {}))
        merged.update(curve)
        out["models"] = merged
    with open(args.out, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({m: [r["ppl_delta"] for r in v["curve"]] for m, v in curve.items()}))


if __name__ == "__main__":
    main()
