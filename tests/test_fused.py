"""Fused (3-dispatch) compression must equal the standard pipeline."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.calib.data import load_calibration_batches
from modegpt_tpu.compress.fused import fused_compress, supports_fused
from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model


def _tiny(seed=0, n_kv=2):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=n_kv, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


@pytest.mark.parametrize("n_kv", [4, 2])  # MHA and GQA
def test_fused_equals_pipeline(tmp_path, rng, n_kv):
    spec, params = params_from_hf_model(_tiny(seed=n_kv, n_kv=n_kv))
    assert supports_fused(spec)
    batches = load_calibration_batches(None, "synthetic", 4, 2, 48,
                                       vocab_size=spec.vocab_size)
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
        seq_len=48, compression_ratio=0.3, sparsity_smoothing=0.5,
        solver_precision="f32_device",
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True,
        skip_final_eval=True,
    )
    ref = run_compression(config, spec=spec, params=params, tokenizer=None,
                          calib_batches=batches)
    rspec, rparams = ref["compressed_spec"], ref["compressed_params"]

    cspec, cparams = fused_compress(spec, params, batches, config)

    assert cspec.gate_ranks == rspec.gate_ranks
    assert cspec.q_ranks == rspec.q_ranks and cspec.v_ranks == rspec.v_ranks
    for l in range(spec.n_layers):
        np.testing.assert_array_equal(
            np.asarray(cparams["layers"][l]["rotary_mask"]),
            np.asarray(rparams["layers"][l]["rotary_mask"]),
        )
        for key in ("up", "gate", "down", "q", "k"):
            # up/gate/q/k are row selections (bit-identical); down comes
            # from a Cholesky solve whose padding block structure differs
            # (pad=d_int here vs chunk-max in the pipeline) — f32
            # accumulation-order noise only.
            np.testing.assert_allclose(
                np.asarray(cparams["layers"][l][key]["kernel"]),
                np.asarray(rparams["layers"][l][key]["kernel"]),
                rtol=2e-3, atol=1e-5, err_msg=f"layer {l} {key}",
            )
        # VO factors carry per-singular-vector sign ambiguity between the
        # vmapped and per-layer SVD runs; compare the functional map.
        v_c = np.asarray(cparams["layers"][l]["v"]["kernel"])  # [d, Hk*r]
        o_c = np.asarray(cparams["layers"][l]["o"]["kernel"])  # [H*r, d]
        v_r = np.asarray(rparams["layers"][l]["v"]["kernel"])
        o_r = np.asarray(rparams["layers"][l]["o"]["kernel"])
        r = cspec.v_ranks[l] // spec.n_kv_heads
        g = spec.n_heads // spec.n_kv_heads
        for h in range(spec.n_kv_heads):
            vc = v_c[:, h * r : (h + 1) * r]
            vr = v_r[:, h * r : (h + 1) * r]
            oc = o_c[h * g * r : (h + 1) * g * r, :]
            or_ = o_r[h * g * r : (h + 1) * g * r, :]
            np.testing.assert_allclose(
                vc @ oc.reshape(g, r, -1)[0], vr @ or_.reshape(g, r, -1)[0],
                rtol=5e-4, atol=5e-5, err_msg=f"layer {l} head {h} V@O",
            )

    # end to end: logits of the two compressed models agree
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))
    ref_logits, _ = forward(rspec, rparams, ids)
    got_logits, _ = forward(cspec, cparams, ids)
    np.testing.assert_allclose(np.asarray(got_logits), np.asarray(ref_logits),
                               rtol=5e-4, atol=5e-4)


def test_fused_rejects_unsupported():
    cfg = transformers.OPTConfig(
        vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
        num_attention_heads=4, max_position_embeddings=64, word_embed_proj_dim=48,
    )
    torch.manual_seed(0)
    spec, params = params_from_hf_model(transformers.OPTForCausalLM(cfg).eval())
    assert not supports_fused(spec)
    with pytest.raises(ValueError, match="fused_compress covers"):
        fused_compress(spec, params, [np.zeros((2, 16), np.int32)],
                       CompressionConfig())


def test_fused_through_pipeline_cli_path(tmp_path, rng):
    """--fused through run_compression: artifact saved, evals run, results
    equal the fused library call."""
    spec, params = params_from_hf_model(_tiny(seed=7, n_kv=2))
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
        seq_len=48, compression_ratio=0.3, sparsity_smoothing=0.5, fused=True,
        solver_precision="f32_device",
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    r = run_compression(config, spec=spec, params=params, tokenizer=None)
    assert np.isfinite(r["compressed_ppl"])
    assert r["compressed_spec"].has_rotary_masks
    import os

    assert os.path.exists(os.path.join(r["artifact_dir"], "spec.json"))
