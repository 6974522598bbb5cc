"""Model forward parity vs HuggingFace torch implementations.

Tiny random-init HF models (no network) are the golden oracle for the
dense forward; the compressed forward is validated via identity
properties in test_surgery.py / test_pipeline.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.ops.rope import apply_rope, rope_cos_sin


def _logits_close(hf_model, spec, params, input_ids, atol=2e-3):
    with torch.no_grad():
        ref = hf_model(torch.tensor(input_ids)).logits.numpy()
    got, _ = forward(spec, params, jnp.asarray(input_ids))
    got = np.asarray(got)
    assert got.shape == ref.shape
    # fp32 end-to-end; differences are accumulation order only.
    np.testing.assert_allclose(got, ref, rtol=2e-3, atol=atol)


@pytest.fixture(scope="module")
def tiny_ids(request):
    rng = np.random.default_rng(7)
    return rng.integers(0, 128, size=(2, 24)).astype(np.int32)


def test_llama_dense_parity(tiny_ids):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=4, max_position_embeddings=128,
        rms_norm_eps=1e-6, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.LlamaForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "llama" and spec.is_dense
    _logits_close(m, spec, params, tiny_ids)


def test_llama_gqa_parity(tiny_ids):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=True,
    )
    torch.manual_seed(1)
    m = transformers.LlamaForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.n_kv_heads == 2 and params["lm_head"] is None
    _logits_close(m, spec, params, tiny_ids)


def test_opt_dense_parity(tiny_ids):
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128, word_embed_proj_dim=48,
        do_layer_norm_before=True,
    )
    torch.manual_seed(2)
    m = transformers.OPTForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "opt" and spec.attention_bias
    _logits_close(m, spec, params, tiny_ids)


def test_qwen3_dense_parity(tiny_ids):
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=24,
        max_position_embeddings=128, tie_word_embeddings=False,
    )
    torch.manual_seed(3)
    m = transformers.Qwen3ForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "qwen3" and spec.qk_norm and spec.head_dim == 24
    _logits_close(m, spec, params, tiny_ids)


def test_masked_rope_identity_mask_equals_dense(rng):
    """A full-rank identity-ordered mask must reproduce plain RoPE."""
    B, H, Hk, T, hd = 2, 4, 2, 8, 16
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, hd)), dtype=jnp.float32)
    cos, sin = rope_cos_sin(jnp.arange(T), hd)
    mask = jnp.tile(jnp.arange(hd, dtype=jnp.int32)[None], (Hk, 1))
    q1, k1 = apply_rope(q, k, cos, sin, None)
    q2, k2 = apply_rope(q, k, cos, sin, mask)
    np.testing.assert_allclose(np.asarray(q1), np.asarray(q2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(k1), np.asarray(k2), rtol=1e-6)


def test_masked_rope_gathers_frequencies(rng):
    """A masked head must equal slicing the dense-rope output of a
    permuted input: rope(q_masked)[..., i] pairs frequency mask[i]."""
    B, T, hd, r = 1, 6, 16, 8
    half, rhalf = hd // 2, r // 2
    # mask: keep pairs (5, 2, 7, 1) in descending-score order
    pairs = jnp.asarray([5, 2, 7, 1], dtype=jnp.int32)
    mask = jnp.concatenate([pairs, pairs + half])[None, :]  # [1, r]
    q_full = jnp.asarray(rng.standard_normal((B, 1, T, hd)), dtype=jnp.float32)
    cos, sin = rope_cos_sin(jnp.arange(T), hd)
    # dense rope then gather == gather then masked rope
    qd, _ = apply_rope(q_full, q_full, cos, sin, None)
    q_sliced = jnp.take(q_full, mask[0], axis=-1)
    qm, _ = apply_rope(q_sliced, q_sliced, cos, sin, mask)
    want = jnp.take(qd, mask[0], axis=-1)
    np.testing.assert_allclose(np.asarray(qm), np.asarray(want), rtol=1e-5, atol=1e-6)


def test_flash_attention_matches_xla(rng):
    """Pallas flash kernel (interpret mode on CPU) == XLA attention."""
    from modegpt_tpu.kernels.flash_attention import flash_attention
    from modegpt_tpu.models.forward import _attention

    B, H, Hk, T, hd = 2, 4, 2, 160, 24  # non-aligned T and hd, GQA
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, hd)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, hd)), dtype=jnp.float32)
    scale = hd**-0.5
    ref = _attention(q, k, v, scale, None, impl="xla")
    got = flash_attention(q, k, v, scale=scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_attention_long_causal(rng):
    from modegpt_tpu.kernels.flash_attention import flash_attention
    from modegpt_tpu.models.forward import _attention

    B, H, T, hd = 1, 2, 512, 64
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    ref = _attention(q, k, v, hd**-0.5, None, impl="xla")
    got = flash_attention(q, k, v, block_q=256, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_attention_coprime_tile_coverage(rng):
    """Regression: T where the clamped q/k tiles share no common multiple
    (T=300 -> block_q 256, block_k 384 before realignment) under-covered
    the q grid and returned rows past the last full q-tile as
    uninitialized memory. Both entry points, default blocks."""
    from modegpt_tpu.kernels.flash_attention import (
        flash_attention,
        flash_attention_hbm,
    )
    from modegpt_tpu.models.forward import _attention

    B, H, Hk, hd = 1, 4, 2, 64
    for T, fn in ((300, flash_attention), (300, flash_attention_hbm),
                  (640, flash_attention_hbm)):
        q = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
        k = jnp.asarray(rng.standard_normal((B, Hk, T, hd)), dtype=jnp.float32)
        v = jnp.asarray(rng.standard_normal((B, Hk, T, hd)), dtype=jnp.float32)
        ref = _attention(q, k, v, hd**-0.5, None, impl="xla")
        got = fn(q, k, v)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5,
            err_msg=f"{fn.__name__} T={T}",
        )


def test_safetensors_loader_matches_torch_loader(tmp_path, tiny_ids):
    """Torch-free safetensors ingestion == torch-path ingestion."""
    from modegpt_tpu.models.hf import load_hf_model
    from modegpt_tpu.models.safetensors_io import load_hf_checkpoint_safetensors

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(11)
    m = transformers.LlamaForCausalLM(cfg)
    d = tmp_path / "ckpt"
    m.save_pretrained(d)

    spec_a, params_a, _ = load_hf_model(str(d))
    spec_b, params_b = load_hf_checkpoint_safetensors(str(d))
    assert spec_a == spec_b

    import jax

    leaves_a = jax.tree_util.tree_leaves(params_a)
    leaves_b = jax.tree_util.tree_leaves(params_b)
    assert len(leaves_a) == len(leaves_b)
    for a, b in zip(leaves_a, leaves_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_opt_350m_style_parity(tiny_ids):
    """Post-LN OPT with word_embed_proj_dim != hidden (the OPT-350m
    layout: project_in/out, no final decoder LayerNorm)."""
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=128,
        word_embed_proj_dim=32, do_layer_norm_before=False,
    )
    torch.manual_seed(13)
    m = transformers.OPTForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.word_embed_proj_dim == 32 and not spec.do_layer_norm_before
    assert "project_in" in params and params["final_norm"] is None
    _logits_close(m, spec, params, tiny_ids)

    # scan path must agree too
    from modegpt_tpu.models.scan_forward import forward_scan, supports_scan

    assert supports_scan(spec, ())
    ref, _ = forward(spec, params, jnp.asarray(tiny_ids))
    got, _ = forward_scan(spec, params, jnp.asarray(tiny_ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=5e-5, atol=5e-5)


def test_qwen3_sliding_window_parity(tiny_ids):
    """Mixed full/sliding attention layers must match HF exactly."""
    cfg = transformers.Qwen3Config(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, head_dim=16,
        max_position_embeddings=128, use_sliding_window=True, sliding_window=8,
        max_window_layers=2, tie_word_embeddings=False,
    )
    torch.manual_seed(17)
    m = transformers.Qwen3ForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.sliding_window == 8
    assert spec.layer_types == ("full_attention", "full_attention",
                                "sliding_attention", "sliding_attention")
    # sequence longer than the window so sliding actually bites
    _logits_close(m, spec, params, tiny_ids)


def test_flash_attention_sliding_window(rng):
    from modegpt_tpu.kernels.flash_attention import flash_attention
    from modegpt_tpu.models.forward import _attention

    B, H, T, hd = 1, 2, 320, 32
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    for w in (8, 100):
        ref = _attention(q, k, v, hd**-0.5, w, impl="xla")
        got = flash_attention(q, k, v, scale=hd**-0.5, window=w, block_q=128, block_k=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)


def test_flash_attention_bf16(rng):
    """bf16 inputs: single-pass MXU with f32 accumulators; tolerances at
    bf16 resolution vs the f32 XLA reference."""
    from modegpt_tpu.kernels.flash_attention import flash_attention
    from modegpt_tpu.models.forward import _attention

    B, H, T, hd = 1, 2, 256, 64
    qf = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    kf = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    vf = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    q = jnp.asarray(qf, dtype=jnp.bfloat16)
    k = jnp.asarray(kf, dtype=jnp.bfloat16)
    v = jnp.asarray(vf, dtype=jnp.bfloat16)
    ref = _attention(q, k, v, hd**-0.5, None, impl="xla").astype(jnp.float32)
    got = flash_attention(q, k, v, scale=hd**-0.5, block_q=128, block_k=128).astype(jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-2, atol=2e-2)
    assert flash_attention(q, k, v, scale=hd**-0.5).dtype == jnp.bfloat16


def test_flash_attention_hbm_streaming(rng):
    """HBM-streamed double-buffered kernel == in-VMEM kernel == XLA."""
    from modegpt_tpu.kernels.flash_attention import flash_attention, flash_attention_hbm
    from modegpt_tpu.models.forward import _attention

    B, H, Hk, T, hd = 1, 4, 2, 384, 32
    q = jnp.asarray(rng.standard_normal((B, H, T, hd)), dtype=jnp.float32)
    k = jnp.asarray(rng.standard_normal((B, Hk, T, hd)), dtype=jnp.float32)
    v = jnp.asarray(rng.standard_normal((B, Hk, T, hd)), dtype=jnp.float32)
    scale = hd**-0.5
    ref = _attention(q, k, v, scale, None, impl="xla")
    got = flash_attention_hbm(q, k, v, scale=scale, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-5)
    # sliding window too
    refw = _attention(q, k, v, scale, 64, impl="xla")
    gotw = flash_attention_hbm(q, k, v, scale=scale, window=64, block_q=128, block_k=128)
    np.testing.assert_allclose(np.asarray(gotw), np.asarray(refw), rtol=2e-4, atol=2e-5)


def test_llama31_rope_scaling_matches_hf(rng):
    """Llama-3.1-style rope_scaling (per-wavelength frequency scaling)
    must reproduce HF logits; linear (position-interpolation) too."""
    import torch
    import transformers

    from modegpt_tpu.models import forward, params_from_hf_model

    for rs in (
        {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
         "high_freq_factor": 4.0, "original_max_position_embeddings": 64},
        {"rope_type": "linear", "factor": 2.0},
    ):
        cfg = transformers.LlamaConfig(
            vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=256,
            rope_scaling=dict(rs),
        )
        torch.manual_seed(0)
        m = transformers.LlamaForCausalLM(cfg).eval()
        spec, params = params_from_hf_model(m)
        assert spec.rope_scaling is not None and spec.rope_scaling[0] == rs["rope_type"]

        ids = rng.integers(0, 128, size=(2, 96)).astype(np.int32)  # beyond orig_len
        with torch.no_grad():
            ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
        got, _ = forward(spec, params, jnp.asarray(ids))
        np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

        # generation path uses the same scaled tables
        from modegpt_tpu.models.generate import generate

        out = generate(spec, params, ids[:1, :8], max_new_tokens=4, temperature=0.0)
        full, _ = forward(spec, params, out[:, :-1])
        assert int(out[0, -1]) == int(jnp.argmax(full[0, -1]))


# ---- qwen2 / mistral dense families ----


def test_qwen2_forward_and_compression(tmp_path, rng):
    """qwen2: llama-shaped with hardcoded qkv biases (sliced through the
    rotary mask under QK compression, v folded into o)."""
    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.config import CompressionConfig

    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.Qwen2ForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "qwen2" and spec.attention_bias and not spec.qk_norm

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
    lp0 = r["compressed_params"]["layers"][0]
    assert "bias" in lp0["q"] and "bias" not in lp0["v"] and "bias" in lp0["o"]


def test_mistral_forward_with_sliding_window(rng):
    """mistral: sliding window applies to every layer whenever set."""
    cfg = transformers.MistralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        sliding_window=8, tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.MistralForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "mistral" and spec.sliding_window == 8
    assert set(spec.layer_types) == {"sliding_attention"}

    # long enough that the window actually masks (T > window)
    ids = rng.integers(0, spec.vocab_size, size=(2, 24)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_phi3_forward_compression_and_export(tmp_path, rng):
    """phi3: fused qkv_proj/gate_up_proj split by the spec's rank lists
    on import, re-fused on export (stock-HF reloadable); every-layer
    sliding window when set."""
    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models.hf_export import export_to_hf

    cfg = transformers.Phi3Config(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        sliding_window=8, tie_word_embeddings=False, pad_token_id=0,
        eos_token_id=1, bos_token_id=2,
    )
    torch.manual_seed(0)
    m = transformers.Phi3ForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "phi3" and spec.sliding_window == 8

    ids = rng.integers(0, spec.vocab_size, size=(2, 24)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    # dense export re-fuses and reloads through stock transformers
    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    import json

    c = json.load(open(tmp_path / "export" / "config.json"))
    c["pad_token_id"] = 0
    json.dump(c, open(tmp_path / "export" / "config.json", "w"))
    reloaded = transformers.Phi3ForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        got2 = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got2, ref, rtol=1e-5, atol=1e-5)

    # compression end to end; compressed export splits back via rank lists
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
    cspec, cparams = r["compressed_spec"], r["compressed_params"]

    from modegpt_tpu.models.hf import params_from_state_dict
    from modegpt_tpu.models.spec import spec_from_hf_config
    from safetensors.numpy import load_file
    from transformers import AutoConfig

    d2 = str(tmp_path / "cexport")
    export_to_hf(cspec, cparams, d2, tokenizer_source="src")
    cfgj = json.load(open(d2 + "/config.json"))
    masks = torch.load(cfgj["mask_path"])
    spec2 = spec_from_hf_config(AutoConfig.from_pretrained(d2))
    params2 = params_from_state_dict(
        spec2, load_file(d2 + "/model.safetensors"),
        rotary_masks={i: np.asarray(mk) for i, mk in enumerate(masks)},
    )
    a, _ = forward(cspec, cparams, ids[:1, :12])
    b2, _ = forward(spec2, params2, ids[:1, :12])
    np.testing.assert_allclose(np.asarray(b2), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_gpt2_forward_compression_and_export(tmp_path, rng):
    """gpt2: Conv1D [in, out] weights (no transposes), fused c_attn split
    by rank lists, learned positions WITHOUT OPT's +2 offset, gelu_new,
    biases everywhere — the reference's dead GPT-2 branch implemented."""
    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models.hf import params_from_state_dict
    from modegpt_tpu.models.hf_export import export_to_hf
    from modegpt_tpu.models.spec import spec_from_hf_config

    cfg = transformers.GPT2Config(
        n_layer=2, n_embd=64, n_head=4, vocab_size=128, n_positions=128
    )
    torch.manual_seed(0)
    m = transformers.GPT2LMHeadModel(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "gpt2" and spec.position_offset == 0
    assert spec.act == "gelu_new" and not spec.gated_mlp and spec.tie_word_embeddings

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    # dense export reloads bit-exactly through stock transformers
    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    reloaded = transformers.GPT2LMHeadModel.from_pretrained(out).eval()
    with torch.no_grad():
        got2 = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got2, ref, rtol=1e-6, atol=1e-6)

    # compression (OPT-style solvers: bias slicing, v-bias fold) + roundtrip
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
    cspec, cparams = r["compressed_spec"], r["compressed_params"]
    lp0 = cparams["layers"][0]
    assert "bias" in lp0["q"] and "bias" not in lp0["v"] and "bias" in lp0["o"]

    from safetensors.numpy import load_file
    from transformers import AutoConfig

    d2 = str(tmp_path / "cexport")
    export_to_hf(cspec, cparams, d2, tokenizer_source="src")
    spec2 = spec_from_hf_config(AutoConfig.from_pretrained(d2))
    params2 = params_from_state_dict(spec2, load_file(d2 + "/model.safetensors"))
    a, _ = forward(cspec, cparams, ids[:1, :12])
    b2, _ = forward(spec2, params2, ids[:1, :12])
    np.testing.assert_allclose(np.asarray(b2), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_starcoder2_forward_compression_and_export(tmp_path, rng):
    """starcoder2: the one rotary arch with biased LayerNorm and a
    non-gated biased MLP under GPT-2-style names (c_fc/c_proj)."""
    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models.hf_export import export_to_hf

    cfg = transformers.Starcoder2Config(
        num_hidden_layers=2, hidden_size=64, intermediate_size=256,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    m = transformers.Starcoder2ForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "starcoder2" and spec.norm == "layernorm"
    assert not spec.gated_mlp and spec.attention_bias and spec.uses_rope
    assert "bias" in params["layers"][0]["attn_norm"]

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    reloaded = transformers.Starcoder2ForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        got2 = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got2, ref, rtol=1e-6, atol=1e-6)

    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
    lp0 = r["compressed_params"]["layers"][0]
    # rope qk biases slice through the mask; v folds into o; fc biases kept
    assert "bias" in lp0["q"] and "bias" not in lp0["v"]
    assert "bias" in lp0["o"] and "bias" in lp0["up"] and "bias" in lp0["down"]


def test_olmo2_forward_compression_and_export(tmp_path, rng):
    """olmo2: post-sublayer norms only (no pre-norms), whole-projection
    q/k RMSNorm (gathered through the rotary mask under compression)."""
    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models.hf_export import export_to_hf
    from modegpt_tpu.models.padded import forward_padded, pad_to_uniform

    cfg = transformers.Olmo2Config(
        num_hidden_layers=2, hidden_size=64, intermediate_size=128,
        num_attention_heads=4, num_key_value_heads=2, vocab_size=128,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    m = transformers.Olmo2ForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "olmo2" and not spec.pre_norms and spec.post_norms
    assert spec.flat_qk_norm and not spec.qk_norm
    assert "attn_norm" not in params["layers"][0]
    assert params["layers"][0]["q_norm"]["scale"].shape == (64,)

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)

    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    reloaded = transformers.Olmo2ForCausalLM.from_pretrained(out).eval()
    with torch.no_grad():
        got2 = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got2, ref, rtol=1e-6, atol=1e-6)

    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
    cspec, cparams = r["compressed_spec"], r["compressed_params"]
    # padded execution stays exact with the masked flat norm
    pm = pad_to_uniform(cspec, cparams)
    ref3, _ = forward(cspec, cparams, ids[:, :12])
    got3 = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids[:, :12])
    np.testing.assert_allclose(np.asarray(got3), np.asarray(ref3), rtol=2e-4, atol=2e-4)


def test_qwen2_sliding_window_layer_types_synthesis():
    """Older qwen2 configs (pre-layer_types transformers) carry only
    use_sliding_window/sliding_window/max_window_layers; the spec must
    synthesize HF's per-layer rule (l >= max_window_layers slides)."""
    cfg = transformers.Qwen2Config(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        use_sliding_window=True, sliding_window=8, max_window_layers=2,
    )
    delattr(cfg, "layer_types")  # simulate the older config surface
    from modegpt_tpu.models.spec import spec_from_hf_config

    spec = spec_from_hf_config(cfg)
    assert spec.sliding_window == 8
    assert spec.layer_types == ("full_attention", "full_attention",
                                "sliding_attention", "sliding_attention")
