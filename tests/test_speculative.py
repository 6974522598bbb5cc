"""Greedy speculative decoding must reproduce the target model's own
greedy decode exactly, for any draft."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import params_from_hf_model
from modegpt_tpu.models.generate import generate
from modegpt_tpu.models.padded import pad_to_uniform
from modegpt_tpu.models.speculative import speculative_generate


def _tiny_llama(n_layers=2):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=n_layers,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def _compressed(tmp_path, spec, params):
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.1,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    res = run_compression(config, spec=spec, params=params, tokenizer=None)
    return res["compressed_spec"], res["compressed_params"]


def test_speculative_matches_target_greedy(tmp_path, rng):
    spec, params = params_from_hf_model(_tiny_llama())
    cspec, cparams = _compressed(tmp_path, spec, params)

    target = pad_to_uniform(spec, params)
    draft = pad_to_uniform(cspec, cparams)

    ids = rng.integers(0, spec.vocab_size, size=(1, 6)).astype(np.int32)
    ref = np.asarray(generate(spec, params, ids, max_new_tokens=12, temperature=0.0))

    out, stats = speculative_generate(
        draft, target, ids, max_new_tokens=12, n_draft=3, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert int(stats.accepted.sum()) <= int(stats.drafted.sum())
    assert int(stats.rounds.sum()) >= 1


def test_speculative_self_draft_accepts_everything(rng):
    """Draft == target: every proposal is accepted, rounds ~= N/(k+1)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    ids = rng.integers(0, spec.vocab_size, size=(1, 5)).astype(np.int32)

    ref = np.asarray(generate(spec, params, ids, max_new_tokens=11, temperature=0.0))
    out, stats = speculative_generate(
        pm, pm, ids, max_new_tokens=11, n_draft=4, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert int(stats.accepted.sum()) == int(stats.drafted.sum())
    # 1 token from prefill, then 5 per round (k + 1 bonus): 2 rounds for 10.
    assert int(stats.rounds[0]) == 2


def test_speculative_eos_stops(rng):
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    ids = rng.integers(0, spec.vocab_size, size=(1, 5)).astype(np.int32)

    # find the greedy continuation's 3rd token and use it as "eos"
    ref = np.asarray(generate(spec, params, ids, max_new_tokens=8, temperature=0.0))
    eos = int(ref[0, 5 + 2])

    out = np.asarray(
        speculative_generate(pm, pm, ids, max_new_tokens=8, n_draft=3, eos_token_id=eos)
    )
    # up to and including eos, the output matches the greedy decode
    np.testing.assert_array_equal(out[0, : 5 + 3], ref[0, : 5 + 3])
    # positions after eos emit eos
    assert (out[0, 5 + 3 :] == eos).all()


def test_speculative_batched_matches_per_row(tmp_path, rng):
    """Batched speculative decode: every row equals the target's greedy
    decode of that row, even with different per-row acceptance rates."""
    spec, params = params_from_hf_model(_tiny_llama())
    cspec, cparams = _compressed(tmp_path, spec, params)
    target = pad_to_uniform(spec, params)
    draft = pad_to_uniform(cspec, cparams)

    ids = rng.integers(0, spec.vocab_size, size=(3, 6)).astype(np.int32)
    ref = np.asarray(generate(spec, params, ids, max_new_tokens=10, temperature=0.0))
    out, stats = speculative_generate(
        draft, target, ids, max_new_tokens=10, n_draft=3, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert stats.accepted.shape == (3,)


def test_prompt_lookup_matches_greedy(tmp_path, rng):
    """Prompt-lookup decoding (no draft model) emits exactly the model's
    greedy continuation; on a repetitive prompt it accepts drafts."""
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import pad_to_uniform
    from modegpt_tpu.models.speculative import prompt_lookup_generate

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)

    # repetitive prompt: the continuation repeats the cycle, so n-gram
    # lookup should accept aggressively
    cycle = rng.integers(1, spec.vocab_size, size=(6,)).astype(np.int32)
    prompt = np.concatenate([cycle, cycle, cycle])[None]
    ref = np.asarray(generate(spec, params, prompt, max_new_tokens=10, temperature=0.0))
    out, stats = prompt_lookup_generate(
        pm, prompt, max_new_tokens=10, n_draft=6, ngram=3, return_stats=True
    )
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert int(stats.rounds[0]) >= 1 and int(stats.drafted[0]) > 0

    # random prompt: still exact, just low acceptance
    prompt2 = rng.integers(1, spec.vocab_size, size=(1, 9)).astype(np.int32)
    ref2 = np.asarray(generate(spec, params, prompt2, max_new_tokens=7, temperature=0.0))
    out2 = prompt_lookup_generate(pm, prompt2, max_new_tokens=7, n_draft=4, ngram=3)
    np.testing.assert_array_equal(np.asarray(out2), ref2)


def test_prompt_lookup_batched_and_eos(rng):
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import pad_to_uniform
    from modegpt_tpu.models.speculative import prompt_lookup_generate

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = rng.integers(1, spec.vocab_size, size=(3, 8)).astype(np.int32)
    ref = np.asarray(generate(spec, params, prompts, max_new_tokens=6, temperature=0.0,
                              eos_token_id=5))
    out = prompt_lookup_generate(pm, prompts, max_new_tokens=6, n_draft=4, ngram=3,
                                 eos_token_id=5)
    np.testing.assert_array_equal(np.asarray(out), ref)
