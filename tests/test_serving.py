"""Continuous-batching serving core: ragged decode must reproduce
per-sequence greedy generation exactly, across mixed prompt lengths,
slot reuse, and compressed models."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import params_from_hf_model
from modegpt_tpu.models.generate import generate
from modegpt_tpu.models.padded import pad_to_uniform
from modegpt_tpu.models.serving import ContinuousBatcher


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


def _tiny_opt(seed=0):
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256, word_embed_proj_dim=48,
    )
    torch.manual_seed(seed)
    return transformers.OPTForCausalLM(cfg).eval()


@pytest.mark.parametrize("mk", [_tiny_llama, _tiny_opt])
def test_batcher_matches_per_sequence_greedy(rng, mk):
    """Mixed prompt lengths, more requests than slots — every finished
    sequence equals the standalone greedy decode of its own prompt."""
    spec, params = params_from_hf_model(mk())
    pm = pad_to_uniform(spec, params)

    prompts = [
        rng.integers(1, spec.vocab_size, size=(p,)).astype(np.int32)
        for p in (3, 7, 5, 9, 4)
    ]
    n_new = 6
    refs = {
        i: np.asarray(
            generate(spec, params, p[None, :], max_new_tokens=n_new, temperature=0.0)
        )[0].tolist()
        for i, p in enumerate(prompts)
    }

    batcher = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    ids = [batcher.submit(p, max_new_tokens=n_new) for p in prompts]
    done = batcher.run()
    assert set(done) == set(ids)
    for i, rid in enumerate(ids):
        assert done[rid] == refs[i], f"request {i} diverged"


def test_chunked_prefill_long_prompt(rng):
    """Prompts longer than the prefill bucket are processed in chunks
    through the same compiled program — output still greedy-exact."""
    spec, params = params_from_hf_model(_tiny_llama(seed=5))
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(21,)).astype(np.int32)  # 3 chunks of 8
    ref = np.asarray(
        generate(spec, params, prompt[None, :], max_new_tokens=6, temperature=0.0)
    )[0].tolist()

    batcher = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8)
    rid = batcher.submit(prompt, max_new_tokens=6)
    assert batcher.run()[rid] == ref

    with pytest.raises(ValueError, match="exceeds max_len"):
        batcher.submit(np.zeros(60, np.int32), max_new_tokens=10)


def test_batcher_eos_and_slot_reuse(rng):
    spec, params = params_from_hf_model(_tiny_llama(seed=2))
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(5,)).astype(np.int32)
    ref = np.asarray(
        generate(spec, params, prompt[None, :], max_new_tokens=10, temperature=0.0)
    )[0].tolist()
    eos = ref[5 + 2]  # greedy 3rd generated token acts as eos

    batcher = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8, eos_token_id=eos)
    r1 = batcher.submit(prompt, max_new_tokens=10)
    r2 = batcher.submit(prompt, max_new_tokens=10)  # waits for the slot
    done = batcher.run()
    # both stop at eos, both correct, the single slot was reused
    assert done[r1] == ref[: 5 + 3] and done[r2] == ref[: 5 + 3]


def test_batcher_compressed_model(tmp_path, rng):
    spec, params = params_from_hf_model(_tiny_llama(seed=3))
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.1,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    res = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = res["compressed_spec"], res["compressed_params"]
    pm = pad_to_uniform(cspec, cparams)

    prompt = rng.integers(1, cspec.vocab_size, size=(6,)).astype(np.int32)
    ref = np.asarray(
        generate(cspec, cparams, prompt[None, :], max_new_tokens=5, temperature=0.0)
    )[0].tolist()
    batcher = ContinuousBatcher(pm, slots=2, max_len=32, prefill_bucket=8)
    rid = batcher.submit(prompt, max_new_tokens=5)
    done = batcher.run()
    assert done[rid] == ref


def test_batcher_max_new_tokens_one(rng):
    """A budget of 1 must yield exactly one generated token (the request
    finishes at prefill and must not take a decode step)."""
    spec, params = params_from_hf_model(_tiny_llama(seed=7))
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(4,)).astype(np.int32)
    ref = np.asarray(
        generate(spec, params, prompt[None], max_new_tokens=1, temperature=0.0)
    )[0].tolist()
    b = ContinuousBatcher(pm, slots=2, max_len=32, prefill_bucket=8)
    rid = b.submit(prompt, max_new_tokens=1)
    done = b.run()
    assert done[rid] == ref and len(done[rid]) == len(prompt) + 1


def test_batcher_eos_at_prefill(rng):
    """EOS produced by the prefill itself must end the request with no
    extra token appended."""
    spec, params = params_from_hf_model(_tiny_llama(seed=8))
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(4,)).astype(np.int32)
    ref = np.asarray(
        generate(spec, params, prompt[None], max_new_tokens=1, temperature=0.0)
    )[0].tolist()
    eos = ref[-1]  # greedy FIRST generated token acts as eos
    b = ContinuousBatcher(pm, slots=1, max_len=32, prefill_bucket=8, eos_token_id=eos)
    rid = b.submit(prompt, max_new_tokens=10)
    done = b.run()
    assert done[rid] == ref  # prompt + eos, nothing after


def test_chunked_prefill_overlaps_decode(rng):
    """A long (multi-chunk) prompt admitted while another slot is
    decoding must not corrupt either sequence: decode steps interleave
    with prefill chunks (the masked decode write at a prefilling slot's
    position is overwritten by its next chunk). Both outputs stay
    greedy-exact."""
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import pad_to_uniform
    from modegpt_tpu.models.serving import ContinuousBatcher

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)

    short = rng.integers(1, spec.vocab_size, size=(5,)).astype(np.int32)
    long = rng.integers(1, spec.vocab_size, size=(29,)).astype(np.int32)  # 4 chunks @ 8

    ref_short = np.asarray(
        generate(spec, params, short[None], max_new_tokens=8, temperature=0.0)
    )[0].tolist()
    ref_long = np.asarray(
        generate(spec, params, long[None], max_new_tokens=6, temperature=0.0)
    )[0].tolist()

    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          prefill_chunks_per_step=1)
    r1 = b.submit(short, max_new_tokens=8)
    r2 = b.submit(long, max_new_tokens=6)
    done = b.run()
    assert done[r1] == ref_short
    assert done[r2] == ref_long


# ---- speculative decoding inside the batcher (ROADMAP item 4) ----


def test_batcher_prompt_lookup_matches_plain(rng):
    """Slots decoding with prompt-lookup drafts must emit EXACTLY the
    plain batcher's greedy output, with acceptance telemetry per request
    and fewer verify rounds than tokens on repetitive prompts."""
    spec, params = params_from_hf_model(_tiny_llama(seed=11))
    pm = pad_to_uniform(spec, params)
    prompts = [
        np.tile(rng.integers(1, 100, size=4).astype(np.int32), 5),  # repetitive
        rng.integers(1, 128, size=(12,)).astype(np.int32),
        np.tile(rng.integers(1, 100, size=3).astype(np.int32), 6),
    ]

    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16)
    ids_plain = [plain.submit(p, max_new_tokens=14) for p in prompts]
    ref = plain.run()

    spec_b = ContinuousBatcher(
        pm, slots=2, max_len=96, prefill_bucket=16,
        spec_decode="prompt_lookup", n_draft=4, lookup_ngram=3,
    )
    ids_spec = [spec_b.submit(p, max_new_tokens=14) for p in prompts]
    got = spec_b.run()

    for rp, rs in zip(ids_plain, ids_spec):
        assert got[rs] == ref[rp]
    for rid in ids_spec:
        st = spec_b.stats[rid]
        assert st["rounds"] >= 1 and st["drafted"] == st["rounds"] * 4
        assert 0 <= st["accepted"] <= st["drafted"]
    # the repetitive prompts must actually accept drafts (fewer verify
    # rounds than emitted tokens)
    assert spec_b.stats[ids_spec[0]]["accepted"] > 0
    assert spec_b.stats[ids_spec[0]]["rounds"] < 14


def test_batcher_draft_model_spec_matches_plain(tmp_path, rng):
    """A compressed draft model speculating for its dense parent inside
    the batcher: outputs equal plain serving of the TARGET; per-slot
    acceptance telemetry is recorded."""
    spec, params = params_from_hf_model(_tiny_llama(seed=13))
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.2, sparsity_smoothing=0.5,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    target_pm = pad_to_uniform(spec, params)
    draft_pm = pad_to_uniform(r["compressed_spec"], r["compressed_params"])

    prompts = [
        rng.integers(1, 128, size=(10,)).astype(np.int32),
        rng.integers(1, 128, size=(21,)).astype(np.int32),
        rng.integers(1, 128, size=(6,)).astype(np.int32),
    ]
    plain = ContinuousBatcher(target_pm, slots=2, max_len=96, prefill_bucket=16)
    ids_plain = [plain.submit(p, max_new_tokens=12) for p in prompts]
    ref = plain.run()

    spec_b = ContinuousBatcher(
        target_pm, slots=2, max_len=96, prefill_bucket=16,
        spec_decode="draft", n_draft=3, draft_pm=draft_pm,
    )
    ids_spec = [spec_b.submit(p, max_new_tokens=12) for p in prompts]
    got = spec_b.run()

    for rp, rs in zip(ids_plain, ids_spec):
        assert got[rs] == ref[rp]
    for rid in ids_spec:
        st = spec_b.stats[rid]
        assert st["rounds"] >= 1 and st["drafted"] == st["rounds"] * 3


def test_batcher_selfdraft_full_acceptance(rng):
    """Target drafting for itself must accept every draft (greedy
    determinism): rounds == ceil(tokens / (n_draft+1)) exactly."""
    spec, params = params_from_hf_model(_tiny_llama(seed=17))
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, 128, size=(8,)).astype(np.int32)
    b = ContinuousBatcher(
        pm, slots=1, max_len=96, prefill_bucket=16,
        spec_decode="draft", n_draft=3, draft_pm=pm,
    )
    rid = b.submit(prompt, max_new_tokens=13)
    out = b.run()
    st = b.stats[rid]
    assert len(out[rid]) == 8 + 13
    # 1 token at prefill, then 12 tokens at up to 4/round, all accepted
    assert st["rounds"] == -(-12 // 4)
    assert st["accepted"] == st["drafted"] or st["accepted"] >= 12 - 4


def test_batcher_spec_eos_stops(rng):
    """EOS inside an accepted draft prefix must stop the request there,
    matching the plain batcher's eos behavior."""
    spec, params = params_from_hf_model(_tiny_llama(seed=19))
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, 128, size=(9,)).astype(np.int32)
    plain = ContinuousBatcher(pm, slots=1, max_len=96, prefill_bucket=16)
    rp = plain.submit(prompt, max_new_tokens=20)
    ref = plain.run()[rp]
    # pick the token the model actually emits mid-stream as the eos
    eos = ref[len(prompt) + 4]
    plain2 = ContinuousBatcher(pm, slots=1, max_len=96, prefill_bucket=16,
                               eos_token_id=int(eos))
    r2 = plain2.submit(prompt, max_new_tokens=20)
    want = plain2.run()[r2]
    b = ContinuousBatcher(pm, slots=1, max_len=96, prefill_bucket=16,
                          eos_token_id=int(eos), spec_decode="prompt_lookup", n_draft=4)
    rs = b.submit(prompt, max_new_tokens=20)
    got = b.run()[rs]
    assert got == want


def test_batcher_fused_decode_matches_single_step(rng):
    """steps_per_dispatch > 1 (N decode steps fused into one dispatch,
    device-side budget/EOS stopping) must emit EXACTLY the single-step
    batcher's greedy output across admission churn (more requests than
    slots), ragged budgets, and mid-window EOS stops."""
    spec, params = params_from_hf_model(_tiny_llama(seed=29))
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32)
               for n in (5, 12, 3, 21, 8)]
    budgets = [14, 3, 9, 1, 17]

    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16)
    ids_p = [plain.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    ref = plain.run()

    fused = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                              steps_per_dispatch=5)
    ids_f = [fused.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    got = fused.run()
    for rp, rf in zip(ids_p, ids_f):
        assert got[rf] == ref[rp]

    # EOS chosen from a real mid-stream token: the fused window must cut
    # at EOS exactly where the single-step batcher does
    eos = ref[ids_p[0]][len(prompts[0]) + 4]
    p2 = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                           eos_token_id=int(eos))
    ids_p2 = [p2.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    want = p2.run()
    f2 = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                           eos_token_id=int(eos), steps_per_dispatch=4)
    ids_f2 = [f2.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    got2 = f2.run()
    for rp, rf in zip(ids_p2, ids_f2):
        assert got2[rf] == want[rp]


def test_batcher_batched_prefill_matches_per_slot(rng):
    """prefill_exec='batched' (one ragged [slots, bucket] dispatch per
    chunk round for every admitting slot) must emit EXACTLY the
    per-slot path's greedy output — multi-chunk prompts, admission
    churn, EOS, and composition with fused decode dispatches."""
    spec, params = params_from_hf_model(_tiny_llama(seed=31))
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32)
               for n in (21, 4, 33, 9, 17)]
    budgets = [8, 13, 5, 11, 2]

    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16)
    ids_p = [plain.submit(p, max_new_tokens=b) for p, b in zip(prompts, budgets)]
    ref = plain.run()

    b = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                          prefill_exec="batched", steps_per_dispatch=4)
    ids_b = [b.submit(p, max_new_tokens=n) for p, n in zip(prompts, budgets)]
    got = b.run()
    for rp, rb in zip(ids_p, ids_b):
        assert got[rb] == ref[rp]

    # with an EOS the model actually emits (incl. possibly at prefill)
    eos = ref[ids_p[0]][len(prompts[0]) + 2]
    p2 = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                           eos_token_id=int(eos))
    ids_p2 = [p2.submit(p, max_new_tokens=n) for p, n in zip(prompts, budgets)]
    want = p2.run()
    b2 = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                           eos_token_id=int(eos), prefill_exec="batched")
    ids_b2 = [b2.submit(p, max_new_tokens=n) for p, n in zip(prompts, budgets)]
    got2 = b2.run()
    for rp, rb in zip(ids_p2, ids_b2):
        assert got2[rb] == want[rp]


def test_mixed_round_decode_piggyback(rng):
    """Mixed prefill+decode rounds (the default under
    prefill_exec='batched'): while one slot prefills a multi-chunk
    prompt, decode-active slots advance one token PER ROUND inside the
    same dispatch — with mixed off they advance once per step, after
    the prefill dispatches."""
    import jax

    spec, params = params_from_hf_model(_tiny_llama(seed=41))
    pm = pad_to_uniform(spec, params)
    short = rng.integers(1, 128, size=(5,)).astype(np.int32)
    long_p = rng.integers(1, 128, size=(60,)).astype(np.int32)  # 4 chunks of 16

    def run(mixed):
        b = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                              prefill_exec="batched",
                              prefill_chunks_per_step=2,
                              mixed_prefill_decode=mixed)
        key = jax.random.key(0)
        ra = b.submit(short, max_new_tokens=20)
        key, _, _ = b.step(key)  # A prefills + commits its first token
        a_len0 = len(b.slot_out[0])
        b.submit(long_p, max_new_tokens=4)
        key, _, _ = b.step(key)  # B's first 2 chunk rounds
        return len(b.slot_out[0]) - a_len0, b, ra, key

    gained_mixed, bm, ra, key = run(True)
    gained_plain, *_ = run(False)
    assert gained_mixed == 2, gained_mixed  # one decode per chunk round
    assert gained_plain == 1, gained_plain  # one decode round per step
    # and the mixed batcher still drains to the exact per-slot output
    done = bm.run()
    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16)
    r2 = plain.submit(short, max_new_tokens=20)
    assert done[ra] == plain.run()[r2]


def test_mixed_round_matches_unmixed_features(rng):
    """Seeded sampled + greedy + stop + logprobs traffic through mixed
    rounds equals the unmixed batched-prefill batcher exactly (seeded
    streams are schedule-independent by design; greedy rows are
    deterministic)."""
    spec, params = params_from_hf_model(_tiny_llama(seed=43))
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32)
               for n in (25, 6, 18)]

    def run(mixed):
        b = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                              prefill_exec="batched",
                              per_request_sampling=True,
                              mixed_prefill_decode=mixed)
        rids = [
            b.submit(prompts[0], max_new_tokens=8, temperature=0.9,
                     top_p=0.9, seed=11),
            b.submit(prompts[1], max_new_tokens=8, logprobs=True),
            b.submit(prompts[2], max_new_tokens=8, temperature=0.7,
                     seed=5, repetition_penalty=1.3),
        ]
        out = b.run()
        return [out[r] for r in rids], [b.logprobs.get(r) for r in rids]

    ref, ref_lp = run(False)
    got, got_lp = run(True)
    for a, g in zip(ref, got):
        assert g == a
    assert got_lp[1] == ref_lp[1]


def test_batcher_batched_prefill_with_draft_spec(tmp_path, rng):
    """Batched prefill mirrors chunks into the draft pool; speculative
    serving output still equals plain serving of the target."""
    spec, params = params_from_hf_model(_tiny_llama(seed=37))
    target_pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32) for n in (19, 7)]

    plain = ContinuousBatcher(target_pm, slots=2, max_len=96, prefill_bucket=16)
    ids_p = [plain.submit(p, max_new_tokens=10) for p in prompts]
    ref = plain.run()

    b = ContinuousBatcher(
        target_pm, slots=2, max_len=96, prefill_bucket=16,
        prefill_exec="batched", spec_decode="draft", n_draft=3,
        draft_pm=target_pm,  # self-draft: full acceptance, still exact
    )
    ids_b = [b.submit(p, max_new_tokens=10) for p in prompts]
    got = b.run()
    for rp, rb in zip(ids_p, ids_b):
        assert got[rb] == ref[rp]


def test_batcher_spec_validations():
    spec, params = params_from_hf_model(_tiny_llama(seed=23))
    pm = pad_to_uniform(spec, params)
    with pytest.raises(ValueError, match="greedy-only"):
        ContinuousBatcher(pm, spec_decode="prompt_lookup", temperature=0.7)
    with pytest.raises(ValueError, match="draft_pm"):
        ContinuousBatcher(pm, spec_decode="draft")
    b = ContinuousBatcher(pm, slots=1, max_len=32, spec_decode="prompt_lookup", n_draft=4)
    with pytest.raises(ValueError, match="draft margin"):
        b.submit(np.arange(1, 20, dtype=np.int32), max_new_tokens=10)
    with pytest.raises(ValueError, match="steps_per_dispatch"):
        ContinuousBatcher(pm, steps_per_dispatch=0)
    with pytest.raises(ValueError, match="spec_decode"):
        ContinuousBatcher(pm, steps_per_dispatch=4, spec_decode="prompt_lookup")
    with pytest.raises(ValueError, match="prefill_exec"):
        ContinuousBatcher(pm, prefill_exec="chunked")


# ---- int8 KV cache (opt-in serving residency) ----


def test_int8_kv_cache_serves_and_tracks_full_precision(rng):
    """kv_dtype='int8': the cache holds int8 codes + per-vector scales;
    serving runs end to end and (for this fixed tiny model) reproduces
    the full-precision greedy output — per-vector symmetric rounding is
    ~0.4% relative, far below the tiny model's logit gaps."""
    import jax.numpy as jnp

    spec, params = params_from_hf_model(_tiny_llama(seed=29))
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32) for n in (9, 14, 5)]

    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16)
    ids_plain = [plain.submit(p, max_new_tokens=10) for p in prompts]
    ref = plain.run()

    q = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16, kv_dtype="int8")
    assert q.state.cache_k.dtype == jnp.int8 and q.state.k_scale is not None
    ids_q = [q.submit(p, max_new_tokens=10) for p in prompts]
    got = q.run()
    for rp, rq in zip(ids_plain, ids_q):
        assert got[rq] == ref[rp]


def test_int8_kv_with_fused_decode_and_batched_prefill(rng):
    """int8 KV composes with both dispatch-amortisation knobs: fused
    multi-step decode and batched prefill thread the quantized-cache
    scales through the same scatter/slab path, so output equals int8
    single-step serving exactly."""
    spec, params = params_from_hf_model(_tiny_llama(seed=41))
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, 128, size=(n,)).astype(np.int32) for n in (9, 19, 5)]

    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                              kv_dtype="int8")
    ids_p = [plain.submit(p, max_new_tokens=9) for p in prompts]
    ref = plain.run()

    b = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=16,
                          kv_dtype="int8", steps_per_dispatch=4,
                          prefill_exec="batched")
    ids_b = [b.submit(p, max_new_tokens=9) for p in prompts]
    got = b.run()
    for rp, rb in zip(ids_p, ids_b):
        assert got[rb] == ref[rp]


def test_int8_kv_with_speculative(rng):
    """int8 KV composes with in-batcher prompt-lookup speculation: the
    verify/decode paths share one quantized-cache semantics, so spec
    output equals the int8 plain-decode output exactly."""
    spec, params = params_from_hf_model(_tiny_llama(seed=31))
    pm = pad_to_uniform(spec, params)
    prompt = np.tile(rng.integers(1, 100, size=4).astype(np.int32), 5)

    plain = ContinuousBatcher(pm, slots=1, max_len=96, prefill_bucket=16,
                              kv_dtype="int8")
    rp = plain.submit(prompt, max_new_tokens=12)
    want = plain.run()[rp]

    b = ContinuousBatcher(pm, slots=1, max_len=96, prefill_bucket=16,
                          kv_dtype="int8", spec_decode="prompt_lookup", n_draft=4)
    rs = b.submit(prompt, max_new_tokens=12)
    assert b.run()[rs] == want


# ---------------------------------------------------------------------------
# tensor-parallel serving on a virtual mesh (parallel/mesh.shard_serving)
# ---------------------------------------------------------------------------


def _serving_mesh(data=4, model=2):
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < data * model:
        pytest.skip(f"needs {data * model} devices")
    return Mesh(np.asarray(devs[: data * model]).reshape(data, model), ("data", "model"))


def test_batcher_tp_mesh_matches_single_device(rng):
    """A 4x2 virtual mesh batcher (cache Hk axis sharded over 'model',
    Megatron projections) must emit the same greedy tokens as the
    unsharded batcher (CPU f32)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, spec.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 9, 3)]

    def run(mesh):
        b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8, mesh=mesh)
        rids = [b.submit(p, max_new_tokens=8) for p in prompts]
        out = b.run()
        return [out[r] for r in rids]

    ref = run(None)
    got = run(_serving_mesh())
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_batcher_tp_mesh_fused_and_batched_prefill(rng):
    """Mesh serving composes with the dispatch-amortisation knobs
    (batched prefill + fused multi-step decode)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompts = [rng.integers(1, spec.vocab_size, size=(p,)).astype(np.int32)
               for p in (5, 7)]

    ref_b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8)
    rids = [ref_b.submit(p, max_new_tokens=6) for p in prompts]
    out = ref_b.run()
    ref = [out[r] for r in rids]

    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          mesh=_serving_mesh(), prefill_exec="batched",
                          steps_per_dispatch=3)
    rids = [b.submit(p, max_new_tokens=6) for p in prompts]
    out = b.run()
    got = [out[r] for r in rids]
    for a, b_ in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b_))


def test_fused_compress_dp_mesh_matches_single_device(rng):
    """Fused compression under a dp mesh: Gram stacks psum-reduced over
    the data shards must yield the same compressed kernels."""
    import jax

    from modegpt_tpu.calib.data import load_calibration_batches
    from modegpt_tpu.compress.fused import fused_compress

    spec, params = params_from_hf_model(_tiny_llama())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=8, calibs_batch_size=4,
        seq_len=32, compression_ratio=0.3, sparsity_smoothing=0.5,
        solver_precision="f32_device",
    )
    batches = load_calibration_batches(None, "synthetic", 8, 4, 32, vocab_size=128)
    cspec_ref, cparams_ref = fused_compress(spec, params, batches, config)
    cspec_got, cparams_got = fused_compress(
        spec, params, batches, config, mesh=_serving_mesh(data=4, model=2)
    )
    assert cspec_got.gate_ranks == cspec_ref.gate_ranks
    for l in range(spec.n_layers):
        for name in ("up", "down", "q", "v", "o"):
            np.testing.assert_allclose(
                np.asarray(cparams_got["layers"][l][name]["kernel"]),
                np.asarray(cparams_ref["layers"][l][name]["kernel"]),
                rtol=2e-4, atol=2e-5, err_msg=f"layer {l} {name}",
            )


def _shared_prefix_prompts(rng, bucket=8):
    """A 33-token shared system prefix (4 full chunks of 8) + varied
    suffixes, one prompt diverging at token 0 (must never adopt), and
    one sharing only the first 11 tokens (adopts exactly 1 chunk)."""
    sysp = rng.integers(1, 128, size=(33,)).astype(np.int32)
    prompts = [
        np.concatenate([sysp, rng.integers(1, 128, size=(k,)).astype(np.int32)])
        for k in (3, 9, 5, 7)
    ]
    div = prompts[0].copy()
    div[0] = int(div[0]) % 126 + 1
    if div[0] == prompts[0][0]:
        div[0] = (div[0] % 126) + 2
    prompts.append(div)
    prompts.append(
        np.concatenate([sysp[:11], rng.integers(1, 128, size=(10,)).astype(np.int32)])
    )
    return prompts


def test_prefix_cache_matches_plain(rng):
    """prefix_cache=True must emit exactly the no-cache outputs while
    actually adopting: later sharers skip the 4 aligned prefix chunks
    (the KV copied slot-to-slot instead of re-prefilled), the
    token-0-divergent prompt adopts nothing."""
    spec, params = params_from_hf_model(_tiny_llama(seed=23))
    pm = pad_to_uniform(spec, params)
    prompts = _shared_prefix_prompts(rng)

    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=8)
    ids_p = [plain.submit(p, max_new_tokens=7) for p in prompts]
    ref = plain.run()

    b = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=8,
                          prefix_cache=True)
    ids = [b.submit(p, max_new_tokens=7) for p in prompts]
    got = b.run()
    for rp, rc in zip(ids_p, ids):
        assert got[rc] == ref[rp]
    # deterministic schedule: two full-prefix sharers adopt 4 chunks each
    # (the first two prompts prefill concurrently, nothing resident yet),
    # the 11-token sharer adopts 1; the divergent prompt adopts 0
    assert b.prefix_hits == 9
    assert b.prefix_tokens_reused == 72
    assert plain.prefix_hits == 0  # knob off: no adoption bookkeeping


def test_prefix_cache_self_adoption_single_slot(rng):
    """With one slot every sharer adopts from the slot it is itself
    re-admitted into (src == dst self-copy), still greedy-exact."""
    spec, params = params_from_hf_model(_tiny_llama(seed=23))
    pm = pad_to_uniform(spec, params)
    prompts = _shared_prefix_prompts(rng)[:3]

    plain = ContinuousBatcher(pm, slots=1, max_len=96, prefill_bucket=8)
    ids_p = [plain.submit(p, max_new_tokens=5) for p in prompts]
    ref = plain.run()

    b = ContinuousBatcher(pm, slots=1, max_len=96, prefill_bucket=8,
                          prefix_cache=True)
    ids = [b.submit(p, max_new_tokens=5) for p in prompts]
    got = b.run()
    for rp, rc in zip(ids_p, ids):
        assert got[rc] == ref[rp]
    assert b.prefix_hits == 8  # prompts 2 and 3 adopt 4 chunks each


def test_prefix_cache_with_draft_speculation(rng):
    """Prefix adoption must mirror into the DRAFT cache pool too: a
    self-drafting speculative batcher with prefix_cache on equals plain
    serving (any draft-pool staleness would surface as rejected drafts
    at wrong positions or wrong tokens)."""
    spec, params = params_from_hf_model(_tiny_llama(seed=23))
    pm = pad_to_uniform(spec, params)
    prompts = _shared_prefix_prompts(rng)

    plain = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=8)
    ids_p = [plain.submit(p, max_new_tokens=7) for p in prompts]
    ref = plain.run()

    b = ContinuousBatcher(pm, slots=2, max_len=96, prefill_bucket=8,
                          spec_decode="draft", n_draft=3, draft_pm=pm,
                          prefix_cache=True)
    ids = [b.submit(p, max_new_tokens=7) for p in prompts]
    got = b.run()
    for rp, rc in zip(ids_p, ids):
        assert got[rc] == ref[rp]
    assert b.prefix_hits == 8  # spec rounds shift admission timing by one adoption


def test_stop_sequences_across_execution_modes(rng):
    """Per-request stop sequences: generation must end at the EARLIEST
    match with the matched tokens excluded, identically across plain,
    fused multi-step, batched-prefill, and speculative execution (all
    greedy, CPU f32)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(5,)).astype(np.int32)
    n_new = 12
    full = np.asarray(
        generate(spec, params, prompt[None], max_new_tokens=n_new, temperature=0.0)
    )[0].tolist()
    gen = full[len(prompt):]
    # stop on a 2-token subsequence mid-generation -> truncate before it
    j = 5
    stop = [gen[j:j + 2]]
    expect = full[: len(prompt) + j]

    modes = [
        dict(),
        dict(steps_per_dispatch=4),
        dict(prefill_exec="batched", steps_per_dispatch=3),
        dict(spec_decode="prompt_lookup", n_draft=3),
        dict(per_request_sampling=True),
    ]
    for kw in modes:
        b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16, **kw)
        rid = b.submit(prompt, max_new_tokens=n_new, stop=stop)
        out = b.run()[rid]
        assert out == expect, (kw, out, expect)
    # a never-matching stop changes nothing
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    rid = b.submit(prompt, max_new_tokens=n_new,
                   stop=[[spec.vocab_size - 1] * 3])
    assert b.run()[rid] == full
    # flat single-sequence form + earliest-of-several semantics
    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16)
    rid = b.submit(prompt, max_new_tokens=n_new,
                   stop=[gen[j + 2:j + 4], gen[j:j + 2]])
    assert b.run()[rid] == expect


def test_stop_sequence_first_token(rng):
    """A stop matching at the FIRST generated token (committed by the
    prefill program) yields an empty generation."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(4,)).astype(np.int32)
    full = np.asarray(
        generate(spec, params, prompt[None], max_new_tokens=4, temperature=0.0)
    )[0].tolist()
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=16)
    rid = b.submit(prompt, max_new_tokens=4, stop=[[full[len(prompt)]]])
    assert b.run()[rid] == prompt.tolist()


def test_logprobs_match_forward_log_softmax(rng):
    """`logprobs=True` must record each generated token's raw-model
    logprob (log_softmax of the forward logits at its position), across
    plain, fused+batched, speculative, and per-request-sampling modes —
    with a non-logprobs request sharing the dispatches untouched."""
    import jax.numpy as jnp
    import jax.nn

    from modegpt_tpu.models import forward

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(5,)).astype(np.int32)
    n_new = 8
    full = np.asarray(
        generate(spec, params, prompt[None], max_new_tokens=n_new, temperature=0.0)
    )[0].tolist()
    lgs, _ = forward(spec, params, np.asarray(full, np.int32)[None])
    lp_ref = jax.nn.log_softmax(jnp.asarray(lgs[0], jnp.float32), axis=-1)
    want = [float(lp_ref[i - 1, full[i]]) for i in range(len(prompt), len(full))]

    modes = [
        dict(),
        dict(steps_per_dispatch=3, prefill_exec="batched"),
        dict(spec_decode="prompt_lookup", n_draft=3),
        dict(per_request_sampling=True),
    ]
    for kw in modes:
        b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16, **kw)
        rid = b.submit(prompt, max_new_tokens=n_new, logprobs=True)
        rid2 = b.submit(prompt, max_new_tokens=n_new)
        out = b.run()
        assert out[rid] == full and out[rid2] == full, kw
        assert rid2 not in b.logprobs
        got = b.logprobs[rid]
        assert len(got) == n_new, kw
        np.testing.assert_allclose(got, want, atol=2e-4)

    # a stop-sequence truncation trims the logprob list in lockstep
    gen = full[len(prompt):]
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=16)
    rid = b.submit(prompt, max_new_tokens=n_new, logprobs=True, stop=[gen[4:6]])
    assert b.run()[rid] == full[: len(prompt) + 4]
    np.testing.assert_allclose(b.logprobs[rid], want[:4], atol=2e-4)


def test_top_logprobs_match_forward(rng):
    """`top_logprobs=k` records the top-k raw-model (token, logprob)
    alternatives per generated position — equal to sorting the forward
    log_softmax — across plain, mixed batched-prefill, fused, and
    speculative modes; a batch-mate without the flag is untouched and
    stop truncation trims the list in lockstep."""
    import jax.nn
    import jax.numpy as jnp

    from modegpt_tpu.models import forward

    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, spec.vocab_size, size=(5,)).astype(np.int32)
    n_new, k = 7, 4
    full = np.asarray(
        generate(spec, params, prompt[None], max_new_tokens=n_new, temperature=0.0)
    )[0].tolist()
    lgs, _ = forward(spec, params, np.asarray(full, np.int32)[None])
    lp_ref = np.asarray(
        jax.nn.log_softmax(jnp.asarray(lgs[0], jnp.float32), axis=-1)
    )

    def want_row(pos):  # top-k of the distribution that produced full[pos]
        row = lp_ref[pos - 1]
        ids = np.argsort(-row)[:k]
        return ids.tolist(), row[ids].tolist()

    modes = [
        dict(),
        dict(prefill_exec="batched"),  # mixed rounds
        dict(steps_per_dispatch=3),
        dict(spec_decode="prompt_lookup", n_draft=3),
    ]
    for kw in modes:
        b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=16, **kw)
        rid = b.submit(prompt, max_new_tokens=n_new, top_logprobs=k)
        rid2 = b.submit(prompt, max_new_tokens=n_new)
        out = b.run()
        assert out[rid] == full and out[rid2] == full, kw
        assert rid2 not in b.top_logprobs
        got = b.top_logprobs[rid]
        assert len(got) == n_new, kw
        # top_logprobs implies chosen-logprob recording too
        assert len(b.logprobs[rid]) == n_new, kw
        for j in range(n_new):
            w_ids, w_lps = want_row(len(prompt) + j)
            g_ids, g_lps = got[j]
            assert g_ids == w_ids, (kw, j)
            np.testing.assert_allclose(g_lps, w_lps, atol=2e-4)

    with pytest.raises(ValueError, match="top_logprobs"):
        b.submit(prompt, max_new_tokens=2, top_logprobs=99)

    # stop truncation trims top rows in lockstep with tokens/logprobs
    gen = full[len(prompt):]
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=16)
    rid = b.submit(prompt, max_new_tokens=n_new, top_logprobs=k,
                   stop=[gen[3:5]])
    assert b.run()[rid] == full[: len(prompt) + 3]
    assert len(b.top_logprobs[rid]) == 3


# ---------------------------------------------------------------------------
# logit_bias / min_tokens
# ---------------------------------------------------------------------------


def test_logit_bias_forces_and_bans_tokens(rng):
    """OpenAI logit_bias: +100 makes a token dominate every greedy step;
    -100 bans the token greedy would otherwise pick. Logprobs stay
    raw-model (pre-bias)."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, 100, size=(5,)).astype(np.int32)

    b = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                          eos_token_id=127)
    rid = b.submit(prompt, max_new_tokens=6)
    plain = b.run()[rid][5:]

    rid = b.submit(prompt, max_new_tokens=6, logit_bias={42: 100.0})
    forced = b.run()[rid][5:]
    assert forced == [42] * 6

    first = plain[0]
    rid = b.submit(prompt, max_new_tokens=6, logit_bias={int(first): -100.0})
    banned = b.run()[rid][5:]
    assert first not in banned

    # raw-model logprobs are pre-bias: the forced token's logprob is
    # its unbiased log_softmax mass, not ~0
    rid = b.submit(prompt, max_new_tokens=3, logit_bias={42: 100.0},
                   logprobs=True)
    b.run()
    assert all(lp < -1.0 for lp in b.logprobs[rid])


def test_min_tokens_suppresses_eos(rng):
    """min_tokens: with EOS biased to dominate (+100), the output still
    carries exactly min_tokens non-EOS tokens before EOS lands."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, 100, size=(4,)).astype(np.int32)
    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8,
                          eos_token_id=127)
    rid = b.submit(prompt, max_new_tokens=12, min_tokens=5,
                   logit_bias={127: 100.0})
    out = b.run()[rid][4:]
    assert len(out) == 6
    assert all(t != 127 for t in out[:5]) and out[5] == 127

    # without min_tokens the same bias EOSes immediately
    rid = b.submit(prompt, max_new_tokens=12, logit_bias={127: 100.0})
    out2 = b.run()[rid][4:]
    assert out2 == [127]


def test_logit_bias_fused_matches_single_step(rng):
    """Constant logit_bias is fuse-safe: steps_per_dispatch=4 output
    equals single-step output exactly (CPU f32); min_tokens forces
    single-step rounds while suppression is pending, so its output
    matches too."""
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, 100, size=(5,)).astype(np.int32)
    kw = dict(max_new_tokens=10, logit_bias={7: 3.5, 11: -4.0})

    b1 = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127)
    rid = b1.submit(prompt, **kw)
    ref = b1.run()[rid]
    b4 = ContinuousBatcher(pm, slots=2, max_len=64, prefill_bucket=8,
                           eos_token_id=127, steps_per_dispatch=4)
    rid = b4.submit(prompt, **kw)
    assert b4.run()[rid] == ref

    kw2 = dict(max_new_tokens=8, min_tokens=4, logit_bias={127: 100.0})
    rid = b1.submit(prompt, **kw2)
    r1 = b1.run()[rid]
    rid = b4.submit(prompt, **kw2)
    r4 = b4.run()[rid]
    assert r4 == r1 and len(r1) == 5 + 5  # 4 suppressed + eos


def test_logit_bias_min_tokens_validation(rng):
    spec, params = params_from_hf_model(_tiny_llama())
    pm = pad_to_uniform(spec, params)
    prompt = rng.integers(1, 100, size=(4,)).astype(np.int32)

    b = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8,
                          eos_token_id=127)
    with pytest.raises(ValueError, match="out of range"):
        b.submit(prompt, max_new_tokens=4, logit_bias={128: 1.0})

    b2 = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8)
    with pytest.raises(ValueError, match="min_tokens"):
        b2.submit(prompt, max_new_tokens=4, min_tokens=2)  # no eos set

    b3 = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8,
                           eos_token_id=127, spec_decode="prompt_lookup")
    with pytest.raises(ValueError, match="speculative"):
        b3.submit(prompt, max_new_tokens=4, logit_bias={3: 1.0})

    from modegpt_tpu.models.guided import compile_regex

    tb = [b"" if i == 127 else bytes([i]) for i in range(128)]
    g = compile_regex("ab", tb, 127, vocab_size=128)
    b4 = ContinuousBatcher(pm, slots=1, max_len=64, prefill_bucket=8,
                           eos_token_id=127)
    with pytest.raises(ValueError, match="grammar decides"):
        b4.submit(prompt, max_new_tokens=4, guide=g, min_tokens=2)
