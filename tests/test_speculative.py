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


# ---------------------------------------------------------------------------
# temperature > 0: rejection-sampling verification (Leviathan-style)
# ---------------------------------------------------------------------------


def test_sampled_first_token_distribution(rng):
    """The first generated token must be distributed exactly as sampling
    from the TARGET at the given temperature — the distribution-exactness
    guarantee of rejection-sampling speculative decoding, checked
    empirically against the analytic softmax."""
    import jax
    import jax.numpy as jnp

    from modegpt_tpu.models import forward

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    temp = 0.8
    prompt = rng.integers(0, spec.vocab_size, size=(1, 6)).astype(np.int32)

    logits, _ = forward(spec, params, prompt)
    q = np.asarray(
        jax.nn.softmax(jnp.asarray(logits[0, -1], jnp.float32) / temp)
    ).astype(np.float64)

    N = 2048
    ids = np.repeat(prompt, N, axis=0)
    out = np.asarray(
        speculative_generate(
            pm, pm, ids, max_new_tokens=1, n_draft=3, temperature=temp,
            key=jax.random.key(7),
        )
    )
    first = out[:, prompt.shape[1]]
    emp = np.bincount(first, minlength=spec.vocab_size) / N
    tv = 0.5 * np.abs(emp - q).sum()
    # E[TV] for N=2048 iid draws over this support is ~0.1; 0.15 is a
    # deterministic-seed pass with headroom that still catches a wrong
    # residual/acceptance rule (which shifts TV to O(1)).
    assert tv < 0.15, f"total variation {tv:.3f} vs analytic target distribution"


def test_sampled_matches_plain_sampling_marginals(tmp_path, rng):
    """Multi-token check: per-position marginals of sampled speculative
    decoding (compressed draft, dense target) match plain sampling from
    the target — the draft must not bias the output distribution."""
    import jax

    spec, params = params_from_hf_model(_tiny_llama())
    cspec, cparams = _compressed(tmp_path, spec, params)
    target = pad_to_uniform(spec, params)
    draft = pad_to_uniform(cspec, cparams)
    temp = 0.9
    P, T_new, N = 5, 3, 1024
    prompt = rng.integers(0, spec.vocab_size, size=(1, P)).astype(np.int32)
    ids = np.repeat(prompt, N, axis=0)

    spec_out = np.asarray(
        speculative_generate(
            draft, target, ids, max_new_tokens=T_new, n_draft=2, temperature=temp,
            key=jax.random.key(3),
        )
    )
    plain_out = np.asarray(
        generate(spec, params, ids, max_new_tokens=T_new, temperature=temp,
                 key=jax.random.key(11))
    )
    for t in range(T_new):
        a = np.bincount(spec_out[:, P + t], minlength=spec.vocab_size) / N
        b = np.bincount(plain_out[:, P + t], minlength=spec.vocab_size) / N
        tv = 0.5 * np.abs(a - b).sum()
        # two independent 1024-sample empiricals of the same law: E[TV]
        # ~0.14 on this support; 0.25 catches an O(1) distribution bias
        assert tv < 0.25, f"position {t}: empirical TV {tv:.3f}"


def test_sampled_self_draft_high_acceptance(rng):
    """Draft == target: q == p up to program-level float noise, so the
    acceptance rate must be ~1 and stats must stay consistent."""
    import jax

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    ids = rng.integers(0, spec.vocab_size, size=(4, 5)).astype(np.int32)
    out, stats = speculative_generate(
        pm, pm, ids, max_new_tokens=12, n_draft=4, temperature=0.7,
        key=jax.random.key(5), return_stats=True,
    )
    assert out.shape == (4, 5 + 12)
    acc_rate = float(stats.accepted.sum()) / float(stats.drafted.sum())
    assert acc_rate > 0.95
    assert int(stats.rounds.sum()) >= 4


def test_sampled_requires_key(rng):
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    ids = rng.integers(0, spec.vocab_size, size=(1, 5)).astype(np.int32)
    with pytest.raises(ValueError, match="requires a PRNG"):
        speculative_generate(pm, pm, ids, max_new_tokens=4, temperature=0.5)


def test_residual_sample_law(rng):
    """residual_sample draws from norm(max(q - p, 0)) exactly (unit-level
    check of the rejection-sampling correction distribution)."""
    import jax
    import jax.numpy as jnp

    from modegpt_tpu.models.speculative import residual_sample

    q = np.asarray([0.5, 0.3, 0.15, 0.05])
    p = np.asarray([0.1, 0.6, 0.25, 0.05])
    r = np.clip(q - p, 0, None)
    r = r / r.sum()
    keys = jax.random.split(jax.random.key(0), 4096)
    draws = np.asarray(
        jax.vmap(lambda k: residual_sample(jnp.asarray(q), jnp.asarray(p), k))(keys)
    )
    emp = np.bincount(draws, minlength=4) / draws.size
    np.testing.assert_allclose(emp, r, atol=0.03)
    assert emp[1] == 0.0 and emp[3] == 0.0  # no mass where q <= p
