"""Gemma family (beyond the reference's archs): (1+w)-RMSNorm, tanh-GELU,
sqrt(d_model) embedding scaling, decoupled head_dim, MQA, tied embeddings."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model


def _tiny_gemma(n_kv=1):
    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=n_kv, head_dim=32,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    return transformers.GemmaForCausalLM(cfg).eval()


@pytest.mark.parametrize("n_kv", [1, 2])
def test_gemma_forward_matches_hf(rng, n_kv):
    m = _tiny_gemma(n_kv)
    spec, params = params_from_hf_model(m)
    assert spec.arch == "gemma" and spec.norm == "rmsnorm_1p"
    assert spec.act == "gelu_pytorch_tanh" and spec.head_dim == 32
    assert spec.tie_word_embeddings and spec.n_kv_heads == n_kv

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_gemma_compression_end_to_end(tmp_path, rng):
    """MQA compression (group = n_heads): the grouped QK/VO solvers,
    padded execution, generation and scan all handle n_kv_heads=1."""
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import forward_padded, pad_to_uniform
    from modegpt_tpu.models.scan_forward import forward_scan, supports_scan

    spec, params = params_from_hf_model(_tiny_gemma())
    assert supports_scan(spec, (0, 1))
    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    ref, _ = forward(spec, params, ids)
    got, _ = forward_scan(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = results["compressed_spec"], results["compressed_params"]
    assert np.isfinite(results["compressed_ppl"])
    assert max(cspec.gate_ranks) < spec.d_int and cspec.has_rotary_masks

    pm = pad_to_uniform(cspec, cparams)
    ref2, _ = forward(cspec, cparams, ids[:, :12])
    got2 = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids[:, :12])
    np.testing.assert_allclose(np.asarray(got2), np.asarray(ref2), rtol=2e-4, atol=2e-4)

    out = generate(cspec, cparams, ids[:1, :5], max_new_tokens=4, temperature=0.0)
    assert out.shape == (1, 9)


def test_gemma_export_reloads_via_hf(tmp_path, rng):
    from modegpt_tpu.models.hf_export import export_to_hf

    m = _tiny_gemma()
    spec, params = params_from_hf_model(m)
    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    reloaded = transformers.GemmaForCausalLM.from_pretrained(out).eval()
    ids = rng.integers(0, spec.vocab_size, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
        got = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


# ---- gemma2: sandwich norms, softcapping, fixed attention scale ----


def _tiny_gemma2():
    cfg = transformers.Gemma2Config(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        max_position_embeddings=128, sliding_window=8,
        query_pre_attn_scalar=32, attn_logit_softcapping=50.0,
        final_logit_softcapping=30.0,
    )
    torch.manual_seed(0)
    return transformers.Gemma2ForCausalLM(cfg).eval()


def test_gemma2_forward_matches_hf(rng):
    """gemma2: post-attention/pre+post-feedforward norms, attention and
    final-logit soft-capping, query_pre_attn_scalar scale, alternating
    sliding/full layers."""
    m = _tiny_gemma2()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "gemma2" and spec.post_norms
    assert spec.attn_logit_softcap == 50.0 and spec.final_logit_softcap == 30.0
    assert spec.query_pre_attn_scalar == 32.0
    assert spec.layer_types[:2] == ("sliding_attention", "full_attention")
    assert "post_attn_norm" in params["layers"][0]

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_gemma2_compression_and_generation(tmp_path, rng):
    """The softcapped/sandwich-norm stack compresses end to end; the
    KV-cache decode path (softcap + post norms + fixed scale) matches the
    full forward position by position."""
    import jax.numpy as jnp

    from modegpt_tpu.models.generate import decode_step, init_cache, prefill

    spec, params = params_from_hf_model(_tiny_gemma2())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = results["compressed_spec"], results["compressed_params"]
    assert np.isfinite(results["compressed_ppl"])
    assert cspec.attn_logit_softcap == 50.0 and cspec.post_norms

    B, P, steps = 1, 6, 3
    ids = rng.integers(0, cspec.vocab_size, size=(B, P)).astype(np.int32)
    cache = init_cache(cspec, B, P + steps, dtype=cparams["embed_tokens"].dtype)
    logits_inc, cache = prefill(cspec, cparams, jnp.asarray(ids), cache)
    seq = ids
    for _ in range(steps):
        full_logits, _ = forward(cspec, cparams, jnp.asarray(seq))
        np.testing.assert_allclose(
            np.asarray(logits_inc), np.asarray(full_logits[:, -1, :]), rtol=2e-4, atol=2e-4
        )
        nxt = np.asarray(jnp.argmax(logits_inc, axis=-1))[:, None].astype(np.int32)
        seq = np.concatenate([seq, nxt], axis=1)
        logits_inc, cache = decode_step(cspec, cparams, jnp.asarray(nxt), cache)


def test_gemma2_export_reloads_via_hf(tmp_path, rng):
    from modegpt_tpu.models.hf_export import export_to_hf

    m = _tiny_gemma2()
    spec, params = params_from_hf_model(m)
    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    reloaded = transformers.Gemma2ForCausalLM.from_pretrained(out).eval()
    ids = rng.integers(0, spec.vocab_size, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
        got = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_gemma2_padded_serving_streaming(rng):
    """Mixed sliding/full stacks (gemma2 alternates) run on the padded
    scanned stack, the continuous batcher and the streaming ring cache —
    the per-layer window rides the layer pytree as a scanned leaf."""
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import forward_padded, pad_to_uniform
    from modegpt_tpu.models.serving import ContinuousBatcher
    from modegpt_tpu.models.streaming import streaming_generate

    spec, params = params_from_hf_model(_tiny_gemma2())
    assert len(set(spec.layer_types)) > 1
    pm = pad_to_uniform(spec, params)
    assert "window" in pm.layers

    ids = rng.integers(1, spec.vocab_size, size=(2, 24)).astype(np.int32)
    ref, _ = forward(spec, params, ids)
    got = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    refgen = np.asarray(
        generate(spec, params, ids[:1, :14], max_new_tokens=6, temperature=0.0)
    )[0].tolist()
    b = ContinuousBatcher(pm, slots=2, max_len=40, prefill_bucket=8)
    rid = b.submit(ids[0, :14], max_new_tokens=6)
    assert b.run()[rid] == refgen

    s_out = streaming_generate(pm, ids[:1, :14], max_new_tokens=6, window=64, n_sink=4)
    assert np.asarray(s_out)[0].tolist() == refgen


def test_gemma2_scan_calibration_matches_unrolled(rng):
    """Mixed sliding/full stacks scan for calibration too (per-layer
    window as a scanned input): logits and Gram taps match unrolled."""
    from modegpt_tpu.models.scan_forward import forward_scan, supports_scan

    spec, params = params_from_hf_model(_tiny_gemma2())
    assert supports_scan(spec, (0, 1, 2, 3))
    ids = rng.integers(1, spec.vocab_size, size=(2, 24)).astype(np.int32)
    ref, rs = forward(spec, params, ids, stats_layers=(0, 1, 2, 3))
    got, gs = forward_scan(spec, params, ids, stats_layers=(0, 1, 2, 3))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gs.cov_x), np.asarray(rs.cov_x), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(gs.bi_acc), np.asarray(rs.bi_acc), rtol=1e-4, atol=1e-5
    )
