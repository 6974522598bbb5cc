"""Batched solver path must be bit-identical to the per-layer path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.calib.data import load_calibration_batches
from modegpt_tpu.calib.engine import calibrate
from modegpt_tpu.compress.batched import solve_chunk_batched
from modegpt_tpu.compress.pipeline import solve_layer
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import params_from_hf_model


def _calib_and_params(make_cfg, seed):
    torch.manual_seed(seed)
    model = make_cfg()
    spec, params = params_from_hf_model(model)
    batches = load_calibration_batches(None, "synthetic", 4, 2, 48, vocab_size=spec.vocab_size)
    calib = calibrate(spec, params, batches, list(range(spec.n_layers)))
    return spec, params, calib


@pytest.mark.parametrize(
    "arch",
    ["llama_gqa", "opt"],
)
def test_batched_equals_per_layer(arch):
    if arch == "llama_gqa":
        mk = lambda: transformers.LlamaForCausalLM(
            transformers.LlamaConfig(
                vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            )
        ).eval()
    else:
        mk = lambda: transformers.OPTForCausalLM(
            transformers.OPTConfig(
                vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
                num_attention_heads=4, max_position_embeddings=128, word_embed_proj_dim=48,
            )
        ).eval()

    spec, params, calib = _calib_and_params(mk, seed=0)
    config = CompressionConfig(solver_precision="f64_cpu")
    keep = [0.6, 0.8]
    order = "mlp,qk,vo"

    batched = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, order)
    for l in (0, 1):
        per_layer = solve_layer(spec, params["layers"][l], l, keep[l], calib, config, order)
        for s in ("mlp", "qk", "vo"):
            for key, val in per_layer[s].items():
                got = batched[s][l][key]
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(val), rtol=1e-9, atol=1e-11,
                    err_msg=f"{arch} layer {l} {s}/{key}",
                )


def test_device_accumulation_matches_host():
    """device (f32 scan) accumulation must match host f64 accumulation to
    f32 tolerance, including the single-dispatch scan path."""
    mk = lambda: transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        )
    ).eval()
    torch.manual_seed(1)
    model = mk()
    spec, params = params_from_hf_model(model)
    batches = load_calibration_batches(None, "synthetic", 6, 2, 48, vocab_size=spec.vocab_size)
    host = calibrate(spec, params, batches, [0, 1], accumulate="host")
    dev = calibrate(spec, params, batches, [0, 1], accumulate="device")
    for l in (0, 1):
        np.testing.assert_allclose(
            np.asarray(dev.cov_mlp[l]), host.cov_mlp[l], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(np.asarray(dev.cov_x[l]), host.cov_x[l], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dev.cov_q[l]), host.cov_q[l], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dev.bi_scores, host.bi_scores, rtol=1e-5)
