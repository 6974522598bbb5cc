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
from modegpt_tpu.models.generate import (
    _sample,
    apply_repetition_penalty,
    generate,
    sample_rows,
)
from modegpt_tpu.models.padded import pad_to_uniform
from modegpt_tpu.models.serving import ContinuousBatcher

# knob combos spanning every filter: (temperature, top_k, top_p, min_p, rep)
_COMBOS = [
    (0.0, None, None, None, None),
    (1.0, None, None, None, None),
    (0.7, 10, None, None, None),
    (1.0, None, 0.9, None, None),
    (1.3, None, None, 0.05, None),
    (0.8, 20, 0.95, 0.02, None),
    (0.9, None, 0.8, None, 1.5),
    (0.0, None, None, None, 2.0),
]


def _samp_row(t, k, p, mp, rep):
    return [t, float(k or 0), float(p if p is not None else 1.0),
            float(mp or 0.0), float(rep or 1.0)]


def _static_ref(logits, key, presence, combo):
    """What the static path computes for `combo` over the full batch."""
    t, k, p, mp, rep = combo
    lg = logits.astype(jnp.float32)
    if rep is not None:
        lg = apply_repetition_penalty(lg, presence, rep)
    return np.asarray(_sample(lg, key, t, k, top_p=p, min_p=mp))


def test_sample_rows_uniform_matches_static():
    """Uniform knob rows must reproduce the static `_sample` path
    token-for-token (same key => same Gumbel noise tensor)."""
    rng = np.random.default_rng(0)
    S, V = 8, 97
    logits = jnp.asarray(rng.normal(size=(S, V)) * 3.0, jnp.float32)
    presence = jnp.asarray(rng.random((S, V)) < 0.1)
    key = jax.random.key(42)
    for combo in _COMBOS:
        samp = jnp.asarray([_samp_row(*combo)] * S, jnp.float32)
        got = np.asarray(sample_rows(logits, key, samp, presence))
        np.testing.assert_array_equal(got, _static_ref(logits, key, presence, combo))


def test_sample_rows_mixed_rows_exact_per_row():
    """categorical's Gumbel noise depends only on (key, shape), so row i
    of a MIXED-knob sample_rows call must equal row i of a full-batch
    static `_sample` call with row i's knobs — exact, not statistical."""
    rng = np.random.default_rng(1)
    S, V = len(_COMBOS), 131
    logits = jnp.asarray(rng.normal(size=(S, V)) * 3.0, jnp.float32)
    presence = jnp.asarray(rng.random((S, V)) < 0.1)
    key = jax.random.key(7)
    samp = jnp.asarray([_samp_row(*c) for c in _COMBOS], jnp.float32)
    got = np.asarray(sample_rows(logits, key, samp, presence))
    for i, combo in enumerate(_COMBOS):
        assert got[i] == _static_ref(logits, key, presence, combo)[i], (i, combo)


def test_sample_rows_no_filter_path():
    """All-off filter sentinels take the cond's identity branch and must
    still match plain temperature sampling."""
    rng = np.random.default_rng(2)
    logits = jnp.asarray(rng.normal(size=(4, 64)), jnp.float32)
    key = jax.random.key(3)
    samp = jnp.asarray([_samp_row(1.0, None, None, None, None)] * 4, jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(sample_rows(logits, key, samp, None)),
        np.asarray(_sample(logits, key, 1.0, None)),
    )


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


def test_batcher_per_request_all_greedy_matches_global():
    """per_request_sampling with default (greedy) rows must reproduce
    the static greedy batcher exactly — the traced knob table changes
    the program, not the math."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    rng = np.random.default_rng(3)
    prompts = [rng.integers(0, 128, size=(n,)).astype(np.int32) for n in (5, 9, 6)]
    ref = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8)
    r1 = [ref.submit(p, 8) for p in prompts]
    out1 = ref.run()
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          per_request_sampling=True)
    r2 = [b.submit(p, 8) for p in prompts]
    out2 = b.run()
    for a, c in zip(r1, r2):
        assert out1[a] == out2[c]


def test_batcher_per_request_mixed_greedy_row_exact():
    """A greedy+penalty request must match generate() exactly while
    sampled requests share the same decode dispatches (CPU f32), across
    both the single-step and fused multi-step programs."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    rng = np.random.default_rng(4)
    p_greedy = rng.integers(0, 128, size=(5,)).astype(np.int32)
    p_samp = rng.integers(0, 128, size=(9,)).astype(np.int32)
    ref = np.asarray(
        generate(spec, params, p_greedy[None], max_new_tokens=8, temperature=0.0,
                 repetition_penalty=1.5)
    )[0]
    for steps, pexec in ((1, "per_slot"), (4, "batched")):
        b = ContinuousBatcher(pm, slots=3, max_len=64, prefill_bucket=8,
                              per_request_sampling=True,
                              steps_per_dispatch=steps, prefill_exec=pexec)
        rid_g = b.submit(p_greedy, 8, repetition_penalty=1.5)
        rid_s = b.submit(p_samp, 8, temperature=0.9, top_p=0.9)
        rid_k = b.submit(p_samp, 8, temperature=1.2, top_k=12, min_p=0.02)
        out = b.run()
        np.testing.assert_array_equal(np.asarray(out[rid_g]), ref)
        for rid in (rid_s, rid_k):
            assert len(out[rid]) == 9 + 8
            assert all(0 <= t < 128 for t in out[rid])


def test_batcher_rejects_per_request_kwargs_without_mode():
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8)
    with pytest.raises(ValueError, match="per_request_sampling"):
        b.submit(np.arange(4, dtype=np.int32), 4, temperature=0.5)


def test_batcher_rejects_sampling_knobs_with_spec_decode():
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousBatcher(pm, slots=2, spec_decode="prompt_lookup",
                          repetition_penalty=2.0)


def test_degenerate_knobs_keep_top_token():
    """top_p=0 / min_p>=1 / top_k=0-after-penalty must degenerate to
    argmax (HF min_tokens_to_keep=1), never an all--inf row that
    categorical silently resolves to token 0 — in BOTH the static and
    per-row samplers."""
    logits = _logits_for([0.5, 0.3, 0.15, 0.05])
    keys = jax.random.split(jax.random.key(5), 64)
    for kw in (dict(top_p=0.0), dict(min_p=1.0), dict(min_p=5.0),
               dict(top_p=0.0, min_p=1.0)):
        draws = np.asarray(
            jax.vmap(lambda k: _sample(logits, k, 1.0, None, **kw)[0])(keys)
        )
        assert set(draws) == {0}, kw
        samp = jnp.asarray([_samp_row(1.0, None, kw.get("top_p"),
                                      kw.get("min_p"), None)], jnp.float32)
        draws = np.asarray(
            jax.vmap(lambda k: sample_rows(logits, k, samp, None)[0])(keys)
        )
        assert set(draws) == {0}, kw


def test_per_request_mode_single_decode_program():
    """The point of the traced knob table: serving a mix of greedy and
    differently-knobbed sampled requests must add exactly ONE decode
    program (static mode compiles one per knob combination)."""
    from modegpt_tpu.models.serving import _decode_slots_jit

    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    rng = np.random.default_rng(6)
    b = ContinuousBatcher(pm, slots=4, max_len=64, prefill_bucket=8,
                          per_request_sampling=True)
    before = _decode_slots_jit._cache_size()
    prompts = [rng.integers(0, 128, size=(5,)).astype(np.int32) for _ in range(4)]
    b.submit(prompts[0], 6)
    b.submit(prompts[1], 6, temperature=0.9, top_p=0.9)
    b.submit(prompts[2], 6, temperature=1.2, top_k=7, min_p=0.05)
    b.submit(prompts[3], 6, repetition_penalty=1.4)
    b.run()
    assert _decode_slots_jit._cache_size() - before == 1


def test_per_request_seed_deterministic_across_traffic_and_grouping():
    """A seeded request's sampled stream must be a function of
    (seed, prompt, knobs) alone: identical when run solo, beside
    different traffic, in a different slot, and under a different
    steps_per_dispatch grouping — and different seeds must diverge."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    rng = np.random.default_rng(7)
    prompt = rng.integers(0, 128, size=(5,)).astype(np.int32)
    other = rng.integers(0, 128, size=(9,)).astype(np.int32)

    def run_seeded(seed, extra_traffic, steps, occupy_first=False):
        b = ContinuousBatcher(pm, slots=3, max_len=64, prefill_bucket=8,
                              per_request_sampling=True,
                              steps_per_dispatch=steps)
        pre = []
        if occupy_first:  # push the seeded request into a later slot
            pre.append(b.submit(other, 8, temperature=0.7))
        rid = b.submit(prompt, 8, temperature=0.9, top_p=0.95, seed=seed)
        extras = [b.submit(p, 8, temperature=t)
                  for p, t in extra_traffic]
        out = b.run()
        return out[rid]

    base = run_seeded(123, [], 1)
    assert base != run_seeded(124, [], 1)  # seed actually matters
    # solo == beside mixed traffic == different slot == fused grouping
    assert base == run_seeded(123, [(other, 0.0), (other, 1.1)], 1)
    assert base == run_seeded(123, [(other, 0.8)], 4)
    assert base == run_seeded(123, [], 4, occupy_first=True)

    # unseeded kwargs still rejected without the mode; seed too
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8)
    with pytest.raises(ValueError, match="per_request_sampling"):
        b.submit(prompt, 4, seed=1)


# ---------------------------------------------------------------------------
# additive OpenAI penalties (presence_penalty / frequency_penalty)
# ---------------------------------------------------------------------------


def test_sample_rows_additive_penalties_exact():
    """7-column rows + gen_counts apply the OpenAI formula
    (logits - pp*(count>0) - fp*count) per row; 5-column rows and rows
    with pp=fp=0 are untouched (back-compat)."""
    logits = jnp.asarray([[2.0, -1.0, 3.0, 0.5],
                          [2.0, -1.0, 3.0, 0.5],
                          [2.0, -1.0, 3.0, 0.5]])
    counts = jnp.asarray([[2, 0, 1, 0],
                          [2, 0, 1, 0],
                          [0, 0, 0, 0]], jnp.int32)
    samp7 = jnp.asarray([
        [0.0, 0, 1.0, 0.0, 1.0, 0.9, 0.4],   # greedy + both penalties
        [0.0, 0, 1.0, 0.0, 1.0, 0.0, 0.0],   # penalties off
        [0.0, 0, 1.0, 0.0, 1.0, 5.0, 5.0],   # on, but zero counts
    ], jnp.float32)
    key = jax.random.key(0)
    got = np.asarray(sample_rows(logits, key, samp7, None, gen_counts=counts))
    # row 0: token 2 penalised by 0.9 + 0.4 -> 1.7; token 0 by 0.9+0.8
    # -> 0.3; argmax moves to token 2 still (1.7 > 0.5 > 0.3)? compute:
    row0 = np.asarray([2.0 - 0.9 - 0.8, -1.0, 3.0 - 0.9 - 0.4, 0.5])
    assert got[0] == int(np.argmax(row0))
    assert got[1] == 2 and got[2] == 2  # unpenalised argmax
    # 5-column form still accepted (no gen_counts)
    got5 = np.asarray(sample_rows(logits, key, samp7[:, :5], None))
    assert list(got5) == [2, 2, 2]


def test_batcher_additive_penalties_match_manual(rng):
    """Greedy serving with presence/frequency penalties equals a manual
    forward loop applying the OpenAI formula over GENERATED tokens only
    (prompt excluded, unlike the multiplicative repetition penalty)."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(0, spec.vocab_size, size=(1, 5)).astype(np.int32)
    pp, fp, T_new = 1.1, 0.6, 8

    seq = prompt.copy()
    counts = np.zeros(spec.vocab_size, np.float64)
    for _ in range(T_new):
        logits, _ = forward(spec, params, seq)
        lg = np.asarray(logits[0, -1], np.float64)
        lg = lg - pp * (counts > 0) - fp * counts
        tok = int(np.argmax(lg))
        counts[tok] += 1
        seq = np.concatenate([seq, [[tok]]], axis=1).astype(np.int32)

    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          per_request_sampling=True)
    rid = b.submit(prompt[0], max_new_tokens=T_new,
                   presence_penalty=pp, frequency_penalty=fp)
    out = b.run()[rid]
    np.testing.assert_array_equal(np.asarray(out), seq[0])


def test_batcher_additive_penalties_fused_and_isolated(rng):
    """Penalised decoding under steps_per_dispatch=4 equals single-step
    (gen_counts rides the fused carry); an unpenalised batch-mate is
    unaffected; slot reuse resets the counts."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    pm = pad_to_uniform(spec, params)
    rng2 = np.random.default_rng(9)
    p1 = rng2.integers(0, spec.vocab_size, size=(5,)).astype(np.int32)
    p2 = rng2.integers(0, spec.vocab_size, size=(6,)).astype(np.int32)
    kw = dict(max_new_tokens=8, frequency_penalty=0.8)

    b1 = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           per_request_sampling=True)
    r_pen = b1.submit(p1, **kw)
    r_free = b1.submit(p2, max_new_tokens=8)
    done1 = b1.run()
    # unpenalised mate matches its solo greedy decode
    ref_free = np.asarray(
        generate(spec, params, p2[None], max_new_tokens=8, temperature=0.0)
    )[0].tolist()
    assert done1[r_free] == ref_free

    b4 = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           per_request_sampling=True, steps_per_dispatch=4)
    r4 = b4.submit(p1, **kw)
    assert b4.run()[r4] == done1[r_pen]

    # slot reuse: an identical follow-up request gets identical output
    # (stale counts would change the penalties)
    r_again = b1.submit(p1, **kw)
    assert b1.run()[r_again] == done1[r_pen]
