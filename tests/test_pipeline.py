"""End-to-end pipeline tests on tiny random-init HF models.

The reference has no unit tests; its verification is the
baseline-vs-compressed PPL delta (SURVEY.md §4). We mirror that as an
integration property — at mild compression the PPL should stay within a
factor of the baseline; at keep=1.0 the pipeline must be a near-identity
— plus artifact round-trip checks.
"""

import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.calib.data import load_calibration_batches, load_eval_tokens
from modegpt_tpu.compress.artifact import load_compressed_model
from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.evals.perplexity import compute_perplexity
from modegpt_tpu.models import forward, params_from_hf_model


def _tiny_llama(seed=0, gqa=True):
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=176,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2 if gqa else 4,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


def _tiny_opt(seed=0):
    cfg = transformers.OPTConfig(
        vocab_size=256,
        hidden_size=48,
        ffn_dim=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        max_position_embeddings=256,
        word_embed_proj_dim=48,
    )
    torch.manual_seed(seed)
    return transformers.OPTForCausalLM(cfg).eval()


def _tiny_qwen3(seed=0):
    cfg = transformers.Qwen3Config(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        head_dim=16,
        max_position_embeddings=256,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    return transformers.Qwen3ForCausalLM(cfg).eval()


def _config(tmp_path, **kw):
    defaults = dict(
        model="in-memory",
        dataset="synthetic",
        calib_size=8,
        calibs_batch_size=4,
        seq_len=64,
        eval_batch_size=4,
        eval_max_samples=8,
        compression_ratio=0.3,
        sparsity_smoothing=0.5,
        max_sparsity=0.8,
        output_dir=str(tmp_path / "out"),
        temp_storage_dir=str(tmp_path / "layers"),
        metrics_dir=str(tmp_path / "metrics"),
        layers_per_step=48,
    )
    defaults.update(kw)
    return CompressionConfig(**defaults)


# Per-ratio PPL-delta envelope, calibrated from the committed
# full-pipeline quality curve (bench_results/r03/quality.json: measured
# deltas are <= 1.02 at ratios 0.1-0.5 across llama/opt/qwen3 at
# 0.1B-0.45B scale; tiny 64-dim test models wobble more, so the bound
# carries headroom while still catching any real solver break — the old
# 3.0x bound would have passed a badly broken solver).
QUALITY_ENVELOPE = {0.1: 1.25, 0.3: 1.3, 0.5: 1.5}


@pytest.mark.parametrize("make_model", [_tiny_llama, _tiny_opt, _tiny_qwen3])
@pytest.mark.parametrize("ratio", [0.3, 0.5])
def test_end_to_end_compression(tmp_path, make_model, ratio):
    model = make_model()
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path, compression_ratio=ratio)
    results = run_compression(config, spec=spec, params=params, tokenizer=None)

    assert "baseline_ppl" in results and "compressed_ppl" in results
    assert np.isfinite(results["compressed_ppl"])
    # Tiny random models barely degrade under compression of random
    # weights; the calibrated envelope catches blow-ups (NaNs, broken
    # shapes, wrong masks, singular-Gram regressions).
    assert results["compressed_ppl"] < results["baseline_ppl"] * QUALITY_ENVELOPE[ratio]

    # Ranks actually shrank.
    cspec = results["compressed_spec"]
    assert sum(cspec.gate_ranks) < sum(spec.gate_ranks)
    assert sum(cspec.q_ranks) < sum(spec.q_ranks)
    assert sum(cspec.v_ranks) < sum(spec.v_ranks)

    # Artifact round-trip: reload and re-eval gives the identical PPL.
    spec2, params2, _ = load_compressed_model(results["artifact_dir"])
    eval_tokens = load_eval_tokens(None, "synthetic", 64, 8, vocab_size=spec.vocab_size)
    ppl2 = compute_perplexity(spec2, params2, eval_tokens, 4, progress=False)
    assert abs(ppl2 - results["compressed_ppl"]) < 1e-6 * max(1.0, ppl2)


def test_full_keep_is_near_identity(tmp_path):
    """compression_ratio=0 (keep everything) must reproduce the dense
    model: QK/MLP selection keeps all columns, VO truncation at full rank
    is exact up to the whitening ridge."""
    model = _tiny_llama(seed=3)
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path, compression_ratio=0.0, ridge_vo=1e-9, nystrom_ridge=1e-9)
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert abs(results["compressed_ppl"] - results["baseline_ppl"]) < 0.02 * results["baseline_ppl"]


def test_partial_order_mlp_only(tmp_path):
    model = _tiny_llama(seed=4)
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path, order="mlp")
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec = results["compressed_spec"]
    assert sum(cspec.gate_ranks) < sum(spec.gate_ranks)
    assert cspec.q_ranks == spec.q_ranks  # untouched
    assert cspec.v_ranks == spec.v_ranks


def test_resume_from_factor_store(tmp_path):
    """Re-running with a populated temp store must skip solving and give
    the same artifact (checkpoint/resume semantics, SURVEY.md §5)."""
    model = _tiny_llama(seed=5)
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path)
    r1 = run_compression(config, spec=spec, params=params, tokenizer=None)
    # second run: factors already on disk; must produce identical ppl
    r2 = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert abs(r1["compressed_ppl"] - r2["compressed_ppl"]) < 1e-9 * max(1.0, r1["compressed_ppl"])


def test_stale_factor_store_is_rejected(tmp_path):
    """Factors solved for a DIFFERENT run (model/ratio/...) must not be
    silently grafted on resume — the fingerprint sidecar makes it loud."""
    import pytest as _pytest

    model = _tiny_llama(seed=5)
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path)
    run_compression(config, spec=spec, params=params, tokenizer=None)

    # same store, different compression ratio -> reject
    config2 = _config(tmp_path, compression_ratio=0.4)
    with _pytest.raises(ValueError, match="different"):
        run_compression(config2, spec=spec, params=params, tokenizer=None)

    # factor files with no fingerprint (foreign/legacy store) -> reject
    import os as _os

    store = str(tmp_path / "legacy")
    _os.makedirs(store)
    open(_os.path.join(store, "layer_0_mlp.npz"), "wb").close()
    config3 = _config(tmp_path)
    config3.temp_storage_dir = store
    with _pytest.raises(ValueError, match="fingerprint"):
        run_compression(config3, spec=spec, params=params, tokenizer=None)


def test_layer_chunking_equivalence(tmp_path):
    """layers_per_step=1 must produce the same factors as all-at-once
    (reference chunks at 48, run_modegpt.py:107)."""
    model = _tiny_llama(seed=6)
    spec, params = params_from_hf_model(model)
    cfg_a = _config(tmp_path / "a")
    cfg_b = _config(tmp_path / "b", layers_per_step=1)
    ra = run_compression(cfg_a, spec=spec, params=params, tokenizer=None)
    rb = run_compression(cfg_b, spec=spec, params=params, tokenizer=None)
    assert abs(ra["compressed_ppl"] - rb["compressed_ppl"]) < 1e-9 * max(1.0, ra["compressed_ppl"])


def test_bfloat16_model_dtype(tmp_path):
    """model_dtype=bfloat16 runs end-to-end and saves a bf16 artifact."""
    model = _tiny_llama(seed=7)
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path, model_dtype="bfloat16", solver_precision="f32_device")
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(results["compressed_ppl"])
    spec2, params2, _ = load_compressed_model(results["artifact_dir"])
    assert params2["embed_tokens"].dtype == jnp.bfloat16
    # bf16 eval stays in the same ballpark as the f32 pipeline
    assert results["compressed_ppl"] < results["baseline_ppl"] * 3.0


def test_debug_diagnostics_logged(tmp_path, caplog):
    import logging as _logging

    model = _tiny_llama(seed=8)
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path, debug=True, skip_baseline_eval=True, skip_final_eval=True)
    with caplog.at_level(_logging.INFO, logger="modegpt_tpu"):
        run_compression(config, spec=spec, params=params, tokenizer=None)
    assert any("cov_mlp" in r.message for r in caplog.records)


def test_opt_qk_svd_method(tmp_path):
    """qk_method=svd end-to-end on OPT (the reference's unused alternative)."""
    model = _tiny_opt(seed=9)
    spec, params = params_from_hf_model(model)
    config = _config(tmp_path, qk_method="svd", order="qk")
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(results["compressed_ppl"])
    cspec = results["compressed_spec"]
    assert sum(cspec.q_ranks) < sum(spec.q_ranks)
    assert not cspec.has_rotary_masks
    assert results["compressed_ppl"] < results["baseline_ppl"] * 3.0


def test_opt_350m_style_end_to_end(tmp_path):
    """Post-LN OPT with word_embed_proj_dim: full pipeline, artifact
    round-trip, finite and sane PPL."""
    cfg = transformers.OPTConfig(
        vocab_size=256, hidden_size=48, ffn_dim=128, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=256,
        word_embed_proj_dim=32, do_layer_norm_before=False,
    )
    torch.manual_seed(21)
    model = transformers.OPTForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(model)
    assert spec.word_embed_proj_dim == 32 and not spec.do_layer_norm_before
    config = _config(tmp_path)
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(results["compressed_ppl"])
    assert results["compressed_ppl"] < results["baseline_ppl"] * 3.0
    spec2, params2, _ = load_compressed_model(results["artifact_dir"])
    assert params2.get("final_norm") is None and "project_in" in params2


def test_windowed_calibration_matches_plain():
    """calibrate_window (one compiled program per layers_per_step sweep,
    traced window start) must produce the same Grams and BI as plain
    calibrate for every window position, including the ragged tail."""
    import transformers
    import torch

    from modegpt_tpu.calib.engine import calibrate, calibrate_window

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(9)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, [0, 1, 2], accumulate="host")

    for start in (0, 2):  # second window is the ragged 1-layer tail
        got = calibrate_window(spec, params, batches, start, width=2)
        for l in got.cov_mlp:
            np.testing.assert_allclose(np.asarray(got.cov_mlp[l]), ref.cov_mlp[l],
                                       rtol=2e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(got.cov_q[l]), ref.cov_q[l],
                                       rtol=2e-5, atol=1e-6)
            np.testing.assert_allclose(np.asarray(got.cov_x[l]), ref.cov_x[l],
                                       rtol=2e-5, atol=1e-6)
        np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=2e-5)
    assert sorted(calibrate_window(spec, params, batches, 2, 2).cov_mlp) == [2]


def test_windowed_pipeline_and_release_dense(tmp_path):
    """--calib_exec window + --release_dense (the big-model-on-one-chip
    plan): chunked windowed calibration produces the same compressed
    model, and release_dense pops each replaced dense projection from
    the input params while norms survive."""
    import transformers
    import torch

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=4,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(11)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())

    def mk(sub, **kw):
        return CompressionConfig(
            model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
            seq_len=32, compression_ratio=0.3, sparsity_smoothing=0.5,
            layers_per_step=2,
            output_dir=str(tmp_path / sub / "o"),
            temp_storage_dir=str(tmp_path / sub / "l"),
            metrics_dir=str(tmp_path / sub / "m"),
            skip_baseline_eval=True, skip_final_eval=True, **kw,
        )

    ref = run_compression(mk("ref"), spec=spec, params=params, tokenizer=None)
    got = run_compression(
        mk("win", calib_exec="window", release_dense=True),
        spec=spec, params=params, tokenizer=None,
    )
    assert got["compressed_spec"].gate_ranks == ref["compressed_spec"].gate_ranks
    for l in range(spec.n_layers):
        np.testing.assert_allclose(
            np.asarray(got["compressed_params"]["layers"][l]["up"]["kernel"]),
            np.asarray(ref["compressed_params"]["layers"][l]["up"]["kernel"]),
            rtol=2e-4, atol=2e-4,
        )
        # release_dense consumed the dense projections, kept the norms
        assert "q" not in params["layers"][l] and "up" not in params["layers"][l]
        assert "attn_norm" in params["layers"][l]
    # Metrics count the DENSE model even though release_dense popped its
    # projections in place during surgery (regression: params_before was
    # once counted post-surgery, reporting a negative "reduction").
    assert got["params_before"] == ref["params_before"]
    assert got["params_after"] == ref["params_after"]
    assert got["params_after"] < got["params_before"]
