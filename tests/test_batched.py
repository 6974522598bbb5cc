"""Batched solver path must be bit-identical to the per-layer path."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from modegpt_tpu.calib.data import load_calibration_batches
from modegpt_tpu.calib.engine import calibrate
from modegpt_tpu.compress.batched import solve_chunk_batched
from modegpt_tpu.compress.pipeline import solve_layer
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import params_from_hf_model


def _calib_and_params(make_cfg, seed):
    torch.manual_seed(seed)
    model = make_cfg()
    spec, params = params_from_hf_model(model)
    batches = load_calibration_batches(None, "synthetic", 4, 2, 48, vocab_size=spec.vocab_size)
    calib = calibrate(spec, params, batches, list(range(spec.n_layers)))
    return spec, params, calib


@pytest.mark.parametrize(
    "arch",
    ["llama_gqa", "opt"],
)
def test_batched_equals_per_layer(arch):
    if arch == "llama_gqa":
        mk = lambda: transformers.LlamaForCausalLM(
            transformers.LlamaConfig(
                vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
                num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
            )
        ).eval()
    else:
        mk = lambda: transformers.OPTForCausalLM(
            transformers.OPTConfig(
                vocab_size=128, hidden_size=48, ffn_dim=96, num_hidden_layers=2,
                num_attention_heads=4, max_position_embeddings=128, word_embed_proj_dim=48,
            )
        ).eval()

    spec, params, calib = _calib_and_params(mk, seed=0)
    config = CompressionConfig(solver_precision="f64_cpu")
    keep = [0.6, 0.8]
    order = "mlp,qk,vo"

    batched = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, order)
    for l in (0, 1):
        per_layer = solve_layer(spec, params["layers"][l], l, keep[l], calib, config, order)
        for s in ("mlp", "qk", "vo"):
            for key, val in per_layer[s].items():
                got = batched[s][l][key]
                np.testing.assert_allclose(
                    np.asarray(got), np.asarray(val), rtol=1e-9, atol=1e-11,
                    err_msg=f"{arch} layer {l} {s}/{key}",
                )


def test_device_accumulation_matches_host():
    """device (f32 scan) accumulation must match host f64 accumulation to
    f32 tolerance, including the single-dispatch scan path."""
    mk = lambda: transformers.LlamaForCausalLM(
        transformers.LlamaConfig(
            vocab_size=128, hidden_size=48, intermediate_size=96, num_hidden_layers=2,
            num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        )
    ).eval()
    torch.manual_seed(1)
    model = mk()
    spec, params = params_from_hf_model(model)
    batches = load_calibration_batches(None, "synthetic", 6, 2, 48, vocab_size=spec.vocab_size)
    host = calibrate(spec, params, batches, [0, 1], accumulate="host")
    dev = calibrate(spec, params, batches, [0, 1], accumulate="device")
    for l in (0, 1):
        np.testing.assert_allclose(
            np.asarray(dev.cov_mlp[l]), host.cov_mlp[l], rtol=2e-4, atol=2e-4
        )
        np.testing.assert_allclose(np.asarray(dev.cov_x[l]), host.cov_x[l], rtol=2e-4, atol=2e-4)
        np.testing.assert_allclose(np.asarray(dev.cov_q[l]), host.cov_q[l], rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(dev.bi_scores, host.bi_scores, rtol=1e-5)


def test_device_fetch_matches_host_fetch(tmp_path, rng):
    """fetch='device' (factors stay in HBM for zero-copy surgery) must
    produce the same compressed model as the host-fetch path."""
    import jax.numpy as jnp
    import transformers
    import torch

    from modegpt_tpu.calib.engine import calibrate
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.compress.surgery import apply_factors
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models import forward, params_from_hf_model
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(11)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    batches = [rng.integers(0, 128, size=(2, 32)).astype(np.int32) for _ in range(2)]
    calib = calibrate(spec, params, batches, [0, 1], accumulate="device")
    config = CompressionConfig(compression_ratio=0.3, solver_precision="f32_device",
                               sparsity_smoothing=0.3)
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, 0.3, 0.8)

    f_host = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp,qk,vo")
    f_dev = solve_chunk_batched(
        spec, params, [0, 1], keep, calib, config, "mlp,qk,vo", fetch="device"
    )
    for suffix in ("mlp", "qk", "vo"):
        for l in (0, 1):
            for k, v in f_host[suffix][l].items():
                np.testing.assert_allclose(
                    np.asarray(f_dev[suffix][l][k]), np.asarray(v), rtol=1e-6, atol=1e-7,
                    err_msg=f"{suffix}/{l}/{k}",
                )

    sh, ph = apply_factors(spec, params, f_host["mlp"], f_host["qk"], f_host["vo"])
    sd, pd = apply_factors(spec, params, f_dev["mlp"], f_dev["qk"], f_dev["vo"])
    assert sh == sd
    ids = jnp.asarray(rng.integers(0, 128, size=(2, 16)).astype(np.int32))
    lh, _ = forward(sh, ph, ids)
    ld, _ = forward(sd, pd, ids)
    np.testing.assert_allclose(np.asarray(ld), np.asarray(lh), rtol=1e-5, atol=1e-6)


def test_lowmem_mlp_solve_matches_stacked(tmp_path, monkeypatch, rng):
    """The sequenced low-memory MLP solve (resident-kernel gathers +
    drained phases) must produce bit-equal factors to the stacked padded
    path — bf16 -> f32 upcast is exact."""
    import jax.numpy as jnp
    import modegpt_tpu.compress.batched as B
    import transformers
    import torch

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(21)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    calib = calibrate(spec, params, batches, [0, 1], accumulate="device")
    config = CompressionConfig(solver_precision="f32_device", nystrom_ridge=1e-4)
    layer_params = {l: params["layers"][l] for l in (0, 1)}

    ref = B._solve_mlp_batched(spec, layer_params, [0, 1], [100, 96], calib, config,
                               jnp.float32, True, None, "host")
    monkeypatch.setattr(B, "_LOWMEM_COV_BYTES", 0)
    got = B._solve_mlp_batched(spec, layer_params, [0, 1], [100, 96], calib, config,
                               jnp.float32, True, None, "host")
    for l in (0, 1):
        np.testing.assert_array_equal(got[l]["idx"], ref[l]["idx"])
        # up/gate are gathers (exact); down's Cholesky runs at a
        # 512-grid pad in the lowmem path, and XLA tiles the factor
        # differently per matrix size — f32 accumulation-order drift only
        np.testing.assert_allclose(got[l]["up"], ref[l]["up"], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got[l]["gate"], ref[l]["gate"], rtol=1e-6, atol=1e-7)
        np.testing.assert_allclose(got[l]["down"], ref[l]["down"], rtol=2e-3, atol=1e-5,
                                   err_msg=f"layer {l} down")
