"""Execute the hyperparameter search on the 0.1B synthetic preset and
commit the study to metrics/search_0p1b.json.

The reference demonstrably ran optuna sweeps over
nystrom_ridge / sparsity_smoothing / ridge_vo / ridge_qk (reference:
src/analysis/optuna.py:16-35; the tuned values it committed at
tests.sh:96-105 came out of such a study). This script is the executed
equivalent on this repo's machinery: `staged_search` scores a
population of trials with a cheap proxy (short-context PPL, in-memory
compression) and re-scores the finalists at 4x context/samples.

Run:  JAX_PLATFORMS=cpu python scripts/run_search.py [--n_trials 16]
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

from modegpt_tpu.analysis.search import SEARCH_SPACE, staged_search
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models.init import init_params
from modegpt_tpu.models.spec import ModelSpec


def preset_0p1b() -> ModelSpec:
    """The bench small preset's geometry (bench.py): ~0.1B Llama-style."""
    D, H, Hk, hd, di, L, V = 1024, 16, 8, 64, 2816, 4, 8192
    return ModelSpec(
        arch="llama", vocab_size=V, d_model=D, n_layers=L, n_heads=H,
        n_kv_heads=Hk, head_dim=hd, d_int=di, max_position_embeddings=2048,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(H * hd,) * L, k_ranks=(Hk * hd,) * L,
        v_ranks=(Hk * hd,) * L, o_ranks=(H * hd,) * L, gate_ranks=(di,) * L,
    )


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n_trials", type=int, default=16)
    ap.add_argument("--top_k", type=int, default=3)
    ap.add_argument("--seed", type=int, default=1234)
    ap.add_argument("--out", default="metrics/search_0p1b.json")
    args = ap.parse_args(argv)

    spec = preset_0p1b()
    params = init_params(spec, jax.random.key(0))
    base = CompressionConfig(
        model="synthetic-0.1b", dataset="synthetic",
        compression_ratio=0.3, calib_size=8, calibs_batch_size=4, seq_len=512,
        solver_precision="f32_device",
        temp_storage_dir=tempfile.mkdtemp(prefix="search_"),
    )

    t0 = time.time()
    best_params, best_val, history = staged_search(
        base, spec, params, n_trials=args.n_trials, top_k=args.top_k,
        seed=args.seed,
    )
    elapsed = time.time() - t0

    study = {
        "preset": "0.1b-synthetic-llama",
        "space": {k: list(v) for k, v in SEARCH_SPACE.items()},
        "objective": "compressed PPL (proxy: seq 256 x 32 samples; "
                     "finalists re-scored at seq 1024 x 128 samples)",
        "base_config": {
            "compression_ratio": base.compression_ratio,
            "calib_size": base.calib_size, "seq_len": base.seq_len,
            "dataset": base.dataset,
        },
        "n_trials": args.n_trials, "top_k": args.top_k, "seed": args.seed,
        "trials": [
            {"params": {k: float(v) for k, v in p.items()}, "proxy_ppl": float(v)}
            for p, v in history
        ],
        "best_params": {k: float(v) for k, v in best_params.items()},
        "best_full_ppl": float(best_val),
        "elapsed_s": round(elapsed, 1),
        "backend": jax.default_backend(),
    }
    os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(study, f, indent=1)
    print(json.dumps({"best_params": study["best_params"],
                      "best_full_ppl": study["best_full_ppl"],
                      "elapsed_s": study["elapsed_s"]}))


if __name__ == "__main__":
    main()
