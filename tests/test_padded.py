"""Padded-uniform (scan) execution must match the exact unrolled forward
for heterogeneous-rank compressed models — logits and generation."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.models.generate import generate
from modegpt_tpu.models.padded import (
    forward_padded,
    generate_padded,
    pad_to_uniform,
    padding_overhead,
)


def _tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def _tiny_opt():
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=3,
        num_attention_heads=4, max_position_embeddings=128, word_embed_proj_dim=48,
    )
    torch.manual_seed(0)
    return transformers.OPTForCausalLM(cfg).eval()


def _tiny_qwen3():
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    return transformers.Qwen3ForCausalLM(cfg).eval()


def _compress(tmp_path, spec, params, ratio=0.3, smoothing=0.08):
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=ratio, sparsity_smoothing=smoothing,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    return results["compressed_spec"], results["compressed_params"]


def _force_hetero(cspec):
    """The padded path must be exercised with genuinely different ranks
    across layers; the tiny calibration usually produces that, but guard
    against an accidentally uniform allocation."""
    hetero = any(
        len(set(r)) > 1
        for r in (cspec.q_ranks, cspec.k_ranks, cspec.v_ranks, cspec.o_ranks, cspec.gate_ranks)
    )
    return hetero


@pytest.mark.parametrize("mk", [_tiny_llama, _tiny_opt, _tiny_qwen3])
def test_forward_padded_matches_unrolled(tmp_path, rng, mk):
    spec, params = params_from_hf_model(mk())
    cspec, cparams = _compress(tmp_path, spec, params)
    if not _force_hetero(cspec):
        pytest.skip("allocation came out uniform; padded path not exercised")

    pm = pad_to_uniform(cspec, cparams)
    assert padding_overhead(cspec) >= 1.0
    assert pm.spec.is_uniform or pm.spec.has_rotary_masks

    ids = jnp.asarray(rng.integers(0, cspec.vocab_size, size=(2, 24)).astype(np.int32))
    ref, _ = forward(cspec, cparams, ids)
    got = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_forward_padded_dense_identity(rng):
    """A uniform dense model padded is a no-op numerically."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    assert padding_overhead(spec) == 1.0
    ids = jnp.asarray(rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32))
    ref, _ = forward(spec, params, ids)
    got = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_perplexity_padded_matches_unrolled(tmp_path, rng):
    from modegpt_tpu.evals.perplexity import compute_perplexity

    spec, params = params_from_hf_model(_tiny_llama())
    cspec, cparams = _compress(tmp_path, spec, params)
    tokens = rng.integers(0, cspec.vocab_size, size=(4, 32)).astype(np.int32)
    ppl_u = compute_perplexity(cspec, cparams, tokens, 2, progress=False, exec_mode="unrolled")
    ppl_p = compute_perplexity(cspec, cparams, tokens, 2, progress=False, exec_mode="padded")
    np.testing.assert_allclose(ppl_p, ppl_u, rtol=1e-5)


@pytest.mark.parametrize("mk", [_tiny_llama, _tiny_qwen3])
def test_generate_padded_matches_unrolled(tmp_path, rng, mk):
    spec, params = params_from_hf_model(mk())
    cspec, cparams = _compress(tmp_path, spec, params)
    pm = pad_to_uniform(cspec, cparams)

    ids = rng.integers(0, cspec.vocab_size, size=(2, 5)).astype(np.int32)
    ref = np.asarray(generate(cspec, cparams, ids, max_new_tokens=6, temperature=0.0))
    got = np.asarray(generate_padded(pm, ids, max_new_tokens=6, temperature=0.0))
    np.testing.assert_array_equal(got, ref)


def _tiny_qwen3_moe_mixed():
    """qwen3_moe with mlp_only_layers: a mixed dense/MoE stack."""
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, moe_intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, max_position_embeddings=128,
        mlp_only_layers=[0], norm_topk_prob=True,
    )
    torch.manual_seed(3)
    return transformers.Qwen3MoeForCausalLM(cfg).eval()


def test_forward_padded_mixed_moe_matches_unrolled(rng):
    """Mixed dense/MoE stack (previously NotImplementedError at
    pad_to_uniform): both-branch padding + scanned is_moe cond must
    reproduce the unrolled forward exactly."""
    spec, params = params_from_hf_model(_tiny_qwen3_moe_mixed())
    assert spec.mixed_moe and 0 not in spec.moe_layers
    pm = pad_to_uniform(spec, params)
    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    ref, _ = forward(spec, params, ids)
    got = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_generate_padded_mixed_moe_matches(rng):
    spec, params = params_from_hf_model(_tiny_qwen3_moe_mixed())
    pm = pad_to_uniform(spec, params)
    ids = rng.integers(0, spec.vocab_size, size=(2, 6)).astype(np.int32)
    ref = np.asarray(generate(spec, params, ids, max_new_tokens=8, temperature=0.0))
    got = np.asarray(generate_padded(pm, ids, max_new_tokens=8))
    np.testing.assert_array_equal(got, ref)


def test_compressed_mixed_moe_serves(tmp_path, rng):
    """Compress a mixed stack end to end, then serve it through the
    batcher (pad_to_uniform is serving's entry requirement)."""
    from modegpt_tpu.models.serving import ContinuousBatcher

    spec, params = params_from_hf_model(_tiny_qwen3_moe_mixed())
    cspec, cparams = _compress(tmp_path, spec, params)
    assert cspec.mixed_moe
    pm = pad_to_uniform(cspec, cparams)
    ref = np.asarray(
        generate(cspec, cparams, rng.integers(0, 128, size=(1, 5)).astype(np.int32),
                 max_new_tokens=6, temperature=0.0)
    )
    b = ContinuousBatcher(pm, slots=2, max_len=48, prefill_bucket=8)
    rid = b.submit(ref[0, :5], max_new_tokens=6)
    out = b.run()[rid]
    np.testing.assert_array_equal(np.asarray(out), ref[0])
