"""HF export round-trips: dense exports reload via HF; compressed exports
reload via our own importer with identical weights + masks."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax
import jax.numpy as jnp

from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.models.hf import load_hf_model
from modegpt_tpu.models.hf_export import export_to_hf


def _tiny_llama():
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.LlamaForCausalLM(cfg).eval()


def test_dense_export_reloads_via_hf(tmp_path, rng):
    """A dense export is a valid stock-HF checkpoint: logits must match."""
    m = _tiny_llama()
    spec, params = params_from_hf_model(m)
    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    reloaded = transformers.LlamaForCausalLM.from_pretrained(out).eval()
    ids = rng.integers(0, 128, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
        got = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_compressed_export_roundtrip(tmp_path, rng):
    """Compressed export -> our importer: identical weights, ranks, masks."""
    spec, params = params_from_hf_model(_tiny_llama())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.5,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = r["compressed_spec"], r["compressed_params"]

    out = export_to_hf(cspec, cparams, str(tmp_path / "export"), tokenizer_source="src")

    import json

    cfg = json.load(open(tmp_path / "export" / "config.json"))
    assert cfg["gate_ranks"] == list(cspec.gate_ranks)
    assert cfg["q_ranks"] == list(cspec.q_ranks)
    assert cfg["mask_path"] is not None
    masks = torch.load(cfg["mask_path"])
    assert len(masks) == cspec.n_layers

    # Round-trip through our importer: config carries the rank lists, the
    # state dict carries the weights; forward must agree exactly.
    from modegpt_tpu.models.hf import params_from_state_dict
    from modegpt_tpu.models.spec import spec_from_hf_config
    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(out)
    spec2 = spec_from_hf_config(hf_cfg)
    assert spec2.q_ranks == cspec.q_ranks and spec2.gate_ranks == cspec.gate_ranks
    from safetensors.numpy import load_file

    sd = load_file(str(tmp_path / "export" / "model.safetensors"))
    params2 = params_from_state_dict(
        spec2, sd, rotary_masks={l: np.asarray(m) for l, m in enumerate(masks)}
    )
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 16)).astype(np.int32))
    ref_logits, _ = forward(cspec, cparams, ids)
    got_logits, _ = forward(spec2, params2, ids)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )


# ---- MoE export (mixtral / qwen2_moe incl. shared experts) ----


def _tiny_qwen2_moe_export():
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, moe_intermediate_size=48,
        shared_expert_intermediate_size=80, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, num_experts=4, num_experts_per_tok=2,
        max_position_embeddings=128, decoder_sparse_step=1, mlp_only_layers=[],
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    return transformers.Qwen2MoeForCausalLM(cfg).eval()


def test_dense_moe_export_reloads_via_hf(tmp_path, rng):
    """An uncompressed qwen2_moe export is a valid stock-HF checkpoint
    (experts, shared expert and shared gate all named correctly)."""
    m = _tiny_qwen2_moe_export()
    spec, params = params_from_hf_model(m)
    out = export_to_hf(spec, params, str(tmp_path / "export"), tokenizer_source="src")
    reloaded = transformers.Qwen2MoeForCausalLM.from_pretrained(out).eval()
    ids = rng.integers(0, 128, size=(2, 12)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.tensor(ids)).logits.numpy()
        got = reloaded(torch.tensor(ids)).logits.numpy()
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_compressed_moe_export_roundtrip(tmp_path, rng):
    """Compressed qwen2_moe export -> our importer: ranks (incl. shared),
    masks, sliced biases and the folded o bias all survive."""
    spec, params = params_from_hf_model(_tiny_qwen2_moe_export())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.5,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = r["compressed_spec"], r["compressed_params"]
    out = export_to_hf(cspec, cparams, str(tmp_path / "export"), tokenizer_source="src")

    import json

    cfg = json.load(open(tmp_path / "export" / "config.json"))
    assert cfg["gate_ranks"] == list(cspec.gate_ranks)
    assert cfg["shared_gate_ranks"] == list(cspec.shared_gate_ranks)
    assert cfg["num_experts"] == 4 and cfg["shared_expert_intermediate_size"] == 80

    from modegpt_tpu.models.hf import params_from_state_dict
    from modegpt_tpu.models.spec import spec_from_hf_config
    from safetensors.numpy import load_file
    from transformers import AutoConfig

    hf_cfg = AutoConfig.from_pretrained(out)
    spec2 = spec_from_hf_config(hf_cfg)
    assert spec2.shared_gate_ranks == cspec.shared_gate_ranks
    masks = torch.load(cfg["mask_path"])
    sd = load_file(str(tmp_path / "export" / "model.safetensors"))
    params2 = params_from_state_dict(
        spec2, sd, rotary_masks={l: np.asarray(mk) for l, mk in enumerate(masks)}
    )
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 16)).astype(np.int32))
    ref_logits, _ = forward(cspec, cparams, ids)
    got_logits, _ = forward(spec2, params2, ids)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )


def test_compressed_mixtral_export_roundtrip(tmp_path, rng):
    """Mixtral export roundtrip (block_sparse_moe.w1/w3/w2 naming)."""
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, max_position_embeddings=128, sliding_window=None,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    m = transformers.MixtralForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.5, order="mlp",
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = r["compressed_spec"], r["compressed_params"]
    out = export_to_hf(cspec, cparams, str(tmp_path / "export"), tokenizer_source="src")

    from modegpt_tpu.models.hf import params_from_state_dict
    from modegpt_tpu.models.spec import spec_from_hf_config
    from safetensors.numpy import load_file
    from transformers import AutoConfig

    spec2 = spec_from_hf_config(AutoConfig.from_pretrained(out))
    assert spec2.gate_ranks == cspec.gate_ranks
    sd = load_file(str(tmp_path / "export" / "model.safetensors"))
    params2 = params_from_state_dict(spec2, sd)
    ids = jnp.asarray(rng.integers(0, 128, size=(1, 16)).astype(np.int32))
    ref_logits, _ = forward(cspec, cparams, ids)
    got_logits, _ = forward(spec2, params2, ids)
    np.testing.assert_allclose(
        np.asarray(got_logits), np.asarray(ref_logits), rtol=1e-5, atol=1e-5
    )
