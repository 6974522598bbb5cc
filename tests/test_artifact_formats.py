"""Artifact storage variants: int8 weight-only quantization and the
Orbax (tensorstore) backend must round-trip through the loader."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.compress.artifact import load_compressed_model, save_compressed_model
from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


@pytest.mark.parametrize("backend,dtype", [("npz", "int8"), ("orbax", "float32")])
def test_artifact_roundtrip(tmp_path, rng, backend, dtype):
    spec, params = params_from_hf_model(_tiny_llama())
    d = str(tmp_path / f"{backend}_{dtype}")
    save_compressed_model(d, spec, params, tokenizer_source="src", dtype=dtype, backend=backend)
    s2, p2, tok = load_compressed_model(d)
    assert s2 == spec and tok == "src"

    ids = rng.integers(0, 128, size=(2, 16)).astype(np.int32)
    ref, _ = forward(spec, params, ids)
    got, _ = forward(s2, p2, ids)
    tol = 0.05 if dtype == "int8" else 1e-6
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=tol, rtol=tol)


def test_orbax_rejects_int8(tmp_path):
    spec, params = params_from_hf_model(_tiny_llama())
    with pytest.raises(ValueError, match="int8"):
        save_compressed_model(str(tmp_path / "x"), spec, params, dtype="int8", backend="orbax")


def test_pipeline_int8_artifact(tmp_path):
    """Full pipeline with --artifact_dtype int8: the reloaded quantized
    model evaluates to a finite PPL near the unquantized one."""
    spec, params = params_from_hf_model(_tiny_llama(seed=3))

    def cfg(sub, **kw):
        return CompressionConfig(
            model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
            eval_batch_size=4, eval_max_samples=8,
            compression_ratio=0.3, sparsity_smoothing=0.3,
            output_dir=str(tmp_path / sub / "o"), temp_storage_dir=str(tmp_path / sub / "l"),
            metrics_dir=str(tmp_path / sub / "m"), skip_baseline_eval=True, **kw,
        )

    r_f32 = run_compression(cfg("f32"), spec=spec, params=params, tokenizer=None)
    r_int8 = run_compression(
        cfg("int8", artifact_dtype="int8"), spec=spec, params=params, tokenizer=None
    )
    assert np.isfinite(r_int8["compressed_ppl"])
    # weight-only int8 on a tiny random model: PPL within a few percent
    assert abs(r_int8["compressed_ppl"] - r_f32["compressed_ppl"]) < 0.05 * r_f32["compressed_ppl"]


def test_pipeline_orbax_backend(tmp_path):
    spec, params = params_from_hf_model(_tiny_llama(seed=4))
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        eval_batch_size=4, eval_max_samples=8,
        compression_ratio=0.3, sparsity_smoothing=0.3, artifact_backend="orbax",
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True,
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
    s2, p2, _ = load_compressed_model(r["artifact_dir"])
    assert s2 == r["compressed_spec"]


# ---- 4-bit artifacts: int4 (per-channel symmetric) and nf4 (QLoRA) ----


@pytest.mark.parametrize("dtype", ["int4", "nf4"])
def test_artifact_4bit_roundtrip_weight_error(tmp_path, dtype):
    """4-bit kernels reload within their quantization error bound and the
    file is ~8x smaller than f32 weights."""
    import os

    spec, params = params_from_hf_model(_tiny_llama())
    d = str(tmp_path / dtype)
    save_compressed_model(d, spec, params, tokenizer_source="src", dtype=dtype)
    s2, p2, _ = load_compressed_model(d)

    w = np.asarray(params["layers"][0]["q"]["kernel"], np.float32)
    w2 = np.asarray(p2["layers"][0]["q"]["kernel"], np.float32)
    if dtype == "int4":
        # per-out-channel: |err| <= scale/2 = absmax/14 per channel
        bound = np.abs(w).max(axis=0, keepdims=True) / 14.0 + 1e-8
    else:
        # blockwise nf4: |err| <= half the widest codebook gap * absmax
        bound = np.abs(w).max() * 0.16
    assert np.all(np.abs(w2 - w) <= bound)

    d32 = str(tmp_path / "f32")
    save_compressed_model(d32, spec, params, tokenizer_source="src", dtype="float32")
    sz4 = os.path.getsize(os.path.join(d, "params.npz"))
    sz32 = os.path.getsize(os.path.join(d32, "params.npz"))
    assert sz4 < sz32 / 4.5  # weights dominate; norms/scales stay f32


def test_int4_resident_matches_dequantized(tmp_path, rng):
    """resident int4 (native jax int4 kernels consumed inside the matmul)
    must equal the dequantized int4 load."""
    import jax.numpy as jnp

    spec, params = params_from_hf_model(_tiny_llama())
    d = str(tmp_path / "a")
    save_compressed_model(d, spec, params, tokenizer_source="src", dtype="int4")
    s_deq, p_deq, _ = load_compressed_model(d)
    s_res, p_res, _ = load_compressed_model(d, resident_int8=True)
    assert p_res["layers"][0]["q"]["kernel_q"].dtype == jnp.int4

    ids = rng.integers(0, 128, size=(2, 12)).astype(np.int32)
    a, _ = forward(s_deq, p_deq, ids)
    b, _ = forward(s_res, p_res, ids)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-5)


def test_nf4_beats_int4_on_normal_weights(tmp_path):
    """On normally-distributed weights the NF4 codebook's quantile
    spacing gives lower MSE than uniform int4 — the reason to ship it."""
    from modegpt_tpu.compress.artifact import (
        _dequantize_nf4, _quantize_int4, _quantize_nf4, _unpack_nibbles,
    )

    rng = np.random.default_rng(7)
    w = rng.standard_normal((256, 256)).astype(np.float32)
    q4, s4, shape = _quantize_int4(w)
    codes = _unpack_nibbles(q4, w.size).astype(np.int8) - 8
    w_int4 = codes.reshape(shape).astype(np.float32) * s4
    qn, sn, shape_n = _quantize_nf4(w)
    w_nf4 = _dequantize_nf4(qn, sn, shape_n)
    mse_int4 = np.mean((w - w_int4) ** 2)
    mse_nf4 = np.mean((w - w_nf4) ** 2)
    assert mse_nf4 < mse_int4


def test_pipeline_int4_artifact(tmp_path):
    """Full pipeline with --artifact_dtype int4 produces a loadable
    artifact with finite PPL."""
    spec, params = params_from_hf_model(_tiny_llama())
    cfg = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.3, artifact_dtype="int4",
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True,
        eval_batch_size=4, eval_max_samples=4,
    )
    r = run_compression(cfg, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
