"""KV-cache generation must agree with the full (no-cache) forward."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.models.generate import decode_step, generate, init_cache, prefill


def _tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def _tiny_opt():
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, word_embed_proj_dim=48,
    )
    torch.manual_seed(0)
    return transformers.OPTForCausalLM(cfg).eval()


def _tiny_qwen3():
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    return transformers.Qwen3ForCausalLM(cfg).eval()


def _incremental_vs_full(spec, params, rng):
    B, P, steps = 2, 6, 4
    ids = rng.integers(0, spec.vocab_size, size=(B, P)).astype(np.int32)
    cache = init_cache(spec, B, P + steps, dtype=params["embed_tokens"].dtype)
    logits_inc, cache = prefill(spec, params, jnp.asarray(ids), cache)

    seq = ids
    for _ in range(steps):
        full_logits, _ = forward(spec, params, jnp.asarray(seq))
        np.testing.assert_allclose(
            np.asarray(logits_inc), np.asarray(full_logits[:, -1, :]), rtol=2e-4, atol=2e-4
        )
        nxt = np.asarray(jnp.argmax(logits_inc, axis=-1))[:, None].astype(np.int32)
        seq = np.concatenate([seq, nxt], axis=1)
        logits_inc, cache = decode_step(spec, params, jnp.asarray(nxt), cache)


@pytest.mark.parametrize("mk", [_tiny_llama, _tiny_opt, _tiny_qwen3])
def test_dense_incremental_matches_full(rng, mk):
    spec, params = params_from_hf_model(mk())
    _incremental_vs_full(spec, params, rng)


@pytest.mark.parametrize("mk", [_tiny_llama, _tiny_qwen3])
def test_compressed_incremental_matches_full(tmp_path, rng, mk):
    spec, params = params_from_hf_model(mk())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.5,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = results["compressed_spec"], results["compressed_params"]
    assert cspec.has_rotary_masks
    _incremental_vs_full(cspec, cparams, rng)


def test_generate_api(rng):
    spec, params = params_from_hf_model(_tiny_llama())
    ids = rng.integers(0, 128, size=(2, 5)).astype(np.int32)
    out = generate(spec, params, ids, max_new_tokens=6, temperature=0.0)
    assert out.shape == (2, 11)
    np.testing.assert_array_equal(np.asarray(out)[:, :5], ids)
    # greedy is deterministic
    out2 = generate(spec, params, ids, max_new_tokens=6, temperature=0.0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))
    # sampled path runs and respects shapes
    out3 = generate(spec, params, ids, max_new_tokens=3, temperature=0.8, top_k=10,
                    key=jax.random.key(1))
    assert out3.shape == (2, 8)


def test_generate_scan_matches_python_loop(rng):
    """One-dispatch scan generation == the Python-loop greedy path."""
    from modegpt_tpu.models.generate import generate_scan, init_cache

    spec, params = params_from_hf_model(_tiny_llama())
    ids = rng.integers(0, 128, size=(2, 5)).astype(np.int32)
    ref = np.asarray(generate(spec, params, ids, max_new_tokens=6, temperature=0.0))

    cache = init_cache(spec, 2, 5 + 6, dtype=params["embed_tokens"].dtype)
    got = np.asarray(
        generate_scan(spec, params, jnp.asarray(ids), cache, max_new_tokens=6)
    )
    np.testing.assert_array_equal(got, ref[:, 5:])


def test_sliding_window_decode_matches_full_forward(rng):
    """KV-cache decode must apply the sliding-window mask: incremental
    logits == full-forward logits once context exceeds the window."""
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=2,
        num_experts_per_tok=1, max_position_embeddings=128, sliding_window=8,
    )
    torch.manual_seed(0)
    m = transformers.MixtralForCausalLM(cfg).eval()
    from modegpt_tpu.models import params_from_hf_model as _p

    spec, params = _p(m)
    assert spec.sliding_window == 8 and spec.layer_types[0] == "sliding_attention"
    # context 20 >> window 8, so a missing window mask diverges
    _incremental_vs_full(spec, params, rng=np.random.default_rng(0))


def test_sliding_window_padded_decode_matches(rng):
    """Padded one-dispatch generation applies the window too."""
    from modegpt_tpu.models.padded import generate_padded, pad_to_uniform

    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128, use_sliding_window=True, sliding_window=6,
        max_window_layers=0,
    )
    torch.manual_seed(1)
    m = transformers.Qwen3ForCausalLM(cfg).eval()
    from modegpt_tpu.models import params_from_hf_model as _p

    spec, params = _p(m)
    if not spec.sliding_window or len(set(spec.layer_types)) > 1:
        pytest.skip("config did not produce a uniform sliding-window stack")
    pm = pad_to_uniform(spec, params)
    ids = rng.integers(0, 128, size=(1, 12)).astype(np.int32)
    ref = np.asarray(generate(spec, params, ids, max_new_tokens=8, temperature=0.0))
    got = np.asarray(generate_padded(pm, ids, max_new_tokens=8, temperature=0.0))
    np.testing.assert_array_equal(got, ref)
