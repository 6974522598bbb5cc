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
