"""Streaming generation (attention-sink ring cache, models/streaming.py):
within the window it must equal plain greedy decoding exactly; beyond it
the ring evicts and the stream keeps going with O(window) memory."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import params_from_hf_model
from modegpt_tpu.models.generate import generate
from modegpt_tpu.models.padded import pad_to_uniform
from modegpt_tpu.models.streaming import streaming_generate


def _tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
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


@pytest.mark.parametrize("mk", [_tiny_llama, _tiny_opt])
def test_streaming_within_window_exact(rng, mk):
    spec, params = params_from_hf_model(mk())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(2, 10)).astype(np.int32)
    ref = np.asarray(generate(spec, params, prompt, max_new_tokens=8, temperature=0.0))
    got = streaming_generate(pm, prompt, max_new_tokens=8, window=64, n_sink=4)
    np.testing.assert_array_equal(got, ref)


def test_streaming_compressed_with_rotary_masks(tmp_path, rng):
    """Compressed stacks (rotary masks, heterogeneous ranks padded to
    uniform) stream exactly within the window."""
    spec, params = params_from_hf_model(_tiny_llama())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.1,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = r["compressed_spec"], r["compressed_params"]
    pm = pad_to_uniform(cspec, cparams)
    prompt = rng.integers(1, cspec.vocab_size, size=(1, 8)).astype(np.int32)
    ref = np.asarray(generate(cspec, cparams, prompt, max_new_tokens=6, temperature=0.0))
    got = streaming_generate(pm, prompt, max_new_tokens=6, window=48, n_sink=4)
    np.testing.assert_array_equal(got, ref)


def test_streaming_beyond_window(rng):
    """Past the window the ring evicts: the stream continues for an
    unbounded number of tokens with a fixed-size cache and stays finite;
    eos handling still works."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(2, 12)).astype(np.int32)
    out = streaming_generate(pm, prompt, max_new_tokens=40, window=16, n_sink=4)
    assert out.shape == (2, 52)
    assert np.isfinite(out).all()
    # same stream truncated earlier agrees on the prefix (deterministic)
    out2 = streaming_generate(pm, prompt, max_new_tokens=20, window=16, n_sink=4)
    np.testing.assert_array_equal(out[:, :32], out2)


def test_streaming_validations(rng):
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, 128, size=(1, 4)).astype(np.int32)
    with pytest.raises(ValueError, match="n_sink"):
        streaming_generate(pm, prompt, window=8, n_sink=8)
    with pytest.raises(ValueError, match="max_position_embeddings"):
        streaming_generate(pm, prompt, window=4096, n_sink=4)


def test_streaming_respects_model_sliding_window(rng):
    """A model with its OWN sliding window (mistral) must stream exactly
    like plain generation within the cache window: the ring attention
    masks by GLOBAL distance, not just cache validity."""
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        sliding_window=8, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.MistralForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.layer_types and spec.layer_types[0] == "sliding_attention"
    pm = pad_to_uniform(spec, params)
    # prompt longer than the model's window so the mask actually bites
    prompt = rng.integers(1, spec.vocab_size, size=(1, 14)).astype(np.int32)
    ref = np.asarray(generate(spec, params, prompt, max_new_tokens=8, temperature=0.0))
    got = streaming_generate(pm, prompt, max_new_tokens=8, window=64, n_sink=4)
    np.testing.assert_array_equal(got, ref)


def test_streaming_rejects_learned_position_eviction(rng):
    """Learned-position archs (OPT) bake absolute positions into cached
    activations; eviction would mix position frames, so streams that can
    evict are rejected (within-window streams stay exact — tested above)."""
    spec, params = params_from_hf_model(_tiny_opt())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(1, 12)).astype(np.int32)
    with pytest.raises(ValueError, match="learned-position"):
        streaming_generate(pm, prompt, max_new_tokens=40, window=16, n_sink=4)
