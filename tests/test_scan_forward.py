"""Scan-based forward must be numerically identical to the unrolled one."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.models.scan_forward import forward_scan, supports_scan


def _model(arch, seed=0):
    torch.manual_seed(seed)
    if arch == "llama":
        return transformers.LlamaForCausalLM(
            transformers.LlamaConfig(
                vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=3,
                num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            )
        ).eval()
    if arch == "opt":
        return transformers.OPTForCausalLM(
            transformers.OPTConfig(
                vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=3,
                num_attention_heads=4, max_position_embeddings=128, word_embed_proj_dim=48,
            )
        ).eval()
    return transformers.Qwen3ForCausalLM(
        transformers.Qwen3Config(
            vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=3,
            num_attention_heads=4, num_key_value_heads=2, head_dim=16,
            max_position_embeddings=128,
        )
    ).eval()


@pytest.mark.parametrize("arch", ["llama", "opt", "qwen3"])
def test_scan_matches_unrolled(arch, rng):
    spec, params = params_from_hf_model(_model(arch))
    assert supports_scan(spec, (0, 1))
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))

    ref_logits, ref_stats = forward(spec, params, ids, stats_layers=(1, 2))
    got_logits, got_stats = forward_scan(spec, params, ids, stats_layers=(1, 2))

    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits), rtol=5e-5, atol=5e-5)
    for field in ("cov_mlp", "cov_q", "cov_k", "cov_x"):
        np.testing.assert_allclose(
            np.asarray(getattr(got_stats, field)), np.asarray(getattr(ref_stats, field)),
            rtol=1e-4, atol=1e-4, err_msg=field,
        )
    # scan bi covers all layers; unrolled returns the same full vector
    np.testing.assert_allclose(
        np.asarray(got_stats.bi_acc), np.asarray(ref_stats.bi_acc), rtol=1e-4, atol=1e-5
    )


def test_scan_rejects_heterogeneous():
    spec, params = params_from_hf_model(_model("llama"))
    cspec = spec.with_ranks(gate_ranks=[96, 80, 96])
    assert not supports_scan(cspec, ())
    assert not supports_scan(spec, (0, 2))  # non-contiguous stats window


def test_scan_uniform_compressed_with_masks(tmp_path, rng):
    """Uniform-rank compressed models (large sparsity_smoothing) run via
    scan — rotary masks become scanned inputs — matching the unrolled
    forward exactly."""
    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.config import CompressionConfig

    spec, params = params_from_hf_model(_model("llama", seed=9))
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=1e9,  # uniform allocation
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = r["compressed_spec"], r["compressed_params"]
    assert len(set(cspec.q_ranks)) == 1 and cspec.has_rotary_masks
    assert supports_scan(cspec, ())

    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))
    ref, _ = forward(cspec, cparams, ids)
    got, _ = forward_scan(cspec, cparams, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5)
