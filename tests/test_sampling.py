"""Sampling surface: top-p / min-p filtering, CTRL-style repetition
penalty, and their serving-stack integration (new capability vs the
reference, whose generation is HF `generate` on the rebuilt checkpoint).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.models.generate import _sample, apply_repetition_penalty, generate
from modegpt_tpu.models.padded import pad_to_uniform
from modegpt_tpu.models.serving import ContinuousBatcher


def _tiny_llama(n_layers=2):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=n_layers,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def _logits_for(probs):
    return jnp.log(jnp.asarray(probs, jnp.float32))[None, :]


def test_top_p_keeps_minimal_nucleus():
    """top_p keeps the smallest prefix of descending-prob tokens whose
    mass reaches top_p — everything else must never be sampled."""
    logits = _logits_for([0.5, 0.3, 0.15, 0.05])
    keys = jax.random.split(jax.random.key(0), 512)
    draws = np.asarray(
        jax.vmap(lambda k: _sample(logits, k, 1.0, None, top_p=0.5)[0])(keys)
    )
    assert set(draws) == {0}  # 0.5 mass reached by token 0 alone
    draws = np.asarray(
        jax.vmap(lambda k: _sample(logits, k, 1.0, None, top_p=0.79)[0])(keys)
    )
    assert set(draws) == {0, 1}
    # renormalised nucleus frequencies ~ 0.5/0.8, 0.3/0.8
    freq0 = (draws == 0).mean()
    assert abs(freq0 - 0.625) < 0.08


def test_min_p_scales_with_top_prob():
    logits = _logits_for([0.5, 0.3, 0.15, 0.05])
    keys = jax.random.split(jax.random.key(1), 512)
    # min_p=0.5: threshold 0.25 -> tokens {0, 1} survive
    draws = np.asarray(
        jax.vmap(lambda k: _sample(logits, k, 1.0, None, min_p=0.5)[0])(keys)
    )
    assert set(draws) == {0, 1}
    # min_p=0.2: threshold 0.1 -> tokens {0, 1, 2}
    draws = np.asarray(
        jax.vmap(lambda k: _sample(logits, k, 1.0, None, min_p=0.2)[0])(keys)
    )
    assert set(draws) == {0, 1, 2}


def test_repetition_penalty_unit():
    """HF RepetitionPenaltyLogitsProcessor semantics: seen tokens'
    positive logits divide by the penalty, negative multiply."""
    logits = jnp.asarray([[2.0, -1.0, 3.0, 0.5]])
    presence = jnp.asarray([[True, True, False, False]])
    out = np.asarray(apply_repetition_penalty(logits, presence, 2.0))
    np.testing.assert_allclose(out, [[1.0, -2.0, 3.0, 0.5]])


def test_generate_repetition_penalty_matches_manual():
    """generate(repetition_penalty=...) at temperature 0 must equal a
    step-by-step manual loop applying the HF penalty rule to forward()
    logits (presence over prompt + generated)."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    rng = np.random.default_rng(0)
    prompt = rng.integers(0, spec.vocab_size, size=(1, 6)).astype(np.int32)
    penalty, T_new = 1.7, 8

    out = np.asarray(
        generate(spec, params, prompt, max_new_tokens=T_new, temperature=0.0,
                 repetition_penalty=penalty)
    )

    # manual reference: full re-forward each step (no cache)
    seq = prompt.copy()
    seen = np.zeros(spec.vocab_size, bool)
    seen[prompt[0]] = True
    for _ in range(T_new):
        logits, _ = forward(spec, params, seq)
        lg = np.asarray(logits[0, -1], np.float64)
        lg_p = np.where(lg > 0, lg / penalty, lg * penalty)
        lg = np.where(seen, lg_p, lg)
        tok = int(np.argmax(lg))
        seen[tok] = True
        seq = np.concatenate([seq, [[tok]]], axis=1).astype(np.int32)
    np.testing.assert_array_equal(out, seq)


def test_batcher_repetition_penalty_matches_generate():
    """Serving-stack penalty: a single greedy request through the
    batcher (penalty applied inside the decode programs, presence pool
    on device) equals generate() with the same penalty (CPU f32)."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    rng = np.random.default_rng(1)
    prompt = rng.integers(0, spec.vocab_size, size=(6,)).astype(np.int32)

    ref = np.asarray(
        generate(spec, params, prompt[None], max_new_tokens=8, temperature=0.0,
                 repetition_penalty=1.5)
    )[0]
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          temperature=0.0, repetition_penalty=1.5)
    rid = b.submit(prompt, max_new_tokens=8)
    out = b.run()[rid]
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_batcher_sampled_knobs_smoke():
    """top_p/min_p/penalty through the batcher's sampled path (fused
    multi-step decode included) produce valid tokens and drain."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    rng = np.random.default_rng(2)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          temperature=0.9, top_p=0.9, min_p=0.02,
                          repetition_penalty=1.3, steps_per_dispatch=4)
    rids = [b.submit(rng.integers(0, 128, size=(5,)).astype(np.int32), 10)
            for _ in range(3)]
    out = b.run()
    for rid in rids:
        assert len(out[rid]) == 5 + 10
        assert all(0 <= t < 128 for t in out[rid])


def test_batcher_rejects_sampling_knobs_with_spec_decode():
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousBatcher(pm, slots=2, spec_decode="prompt_lookup",
                          repetition_penalty=2.0)
