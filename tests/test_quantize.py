"""int8-resident execution: quantized weights through every path must
track the full-precision model closely and run end to end."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.models.generate import generate
from modegpt_tpu.models.padded import pad_to_uniform
from modegpt_tpu.models.quantize import quantize_padded, quantize_params
from modegpt_tpu.models.serving import ContinuousBatcher


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


def _tiny_mixtral():
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, max_position_embeddings=128, sliding_window=None,
    )
    torch.manual_seed(0)
    return transformers.MixtralForCausalLM(cfg).eval()


@pytest.mark.parametrize("mk", [_tiny_llama, _tiny_mixtral])
def test_quantized_forward_close(rng, mk):
    spec, params = params_from_hf_model(mk())
    qparams = quantize_params(params)
    # int8 kernels really are int8
    lp = qparams["layers"][0]
    assert lp["q"]["kernel_q"].dtype == jnp.int8
    if spec.n_experts:
        assert lp["experts"]["up"]["kernel_q"].dtype == jnp.int8

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    ref, _ = forward(spec, params, ids)
    got, _ = forward(spec, qparams, ids)
    # weight-only int8 on tiny random weights: small relative error.
    # MoE gets slack: routing is DISCRETE, so a perturbed router can flip
    # expert selection for borderline tokens (expected for quantized MoE).
    tol = 0.15 if spec.n_experts else 0.05
    denom = np.maximum(np.abs(np.asarray(ref)).max(), 1e-6)
    assert np.abs(np.asarray(got) - np.asarray(ref)).max() / denom < tol


def test_quantized_generation_and_serving(rng):
    spec, params = params_from_hf_model(_tiny_llama(seed=1))
    qparams = quantize_params(params)
    ids = rng.integers(1, spec.vocab_size, size=(1, 5)).astype(np.int32)
    out = generate(spec, qparams, ids, max_new_tokens=6, temperature=0.0)
    assert out.shape == (1, 11)

    pm = quantize_padded(pad_to_uniform(spec, params))
    assert pm.layers["q"]["kernel_q"].dtype == jnp.int8
    batcher = ContinuousBatcher(pm, slots=2, max_len=32, prefill_bucket=8)
    rid = batcher.submit(ids[0], max_new_tokens=6)
    done = batcher.run()
    # quantized padded serving equals quantized unrolled generation
    ref_q = np.asarray(generate(spec, qparams, ids, max_new_tokens=6, temperature=0.0))
    # (both are int8 paths; numerics agree to float reassociation, greedy
    # may only differ on exact logit ties which don't occur here)
    assert done[rid] == ref_q[0].tolist()


def test_int8_artifact_resident_load(tmp_path, rng):
    """Loading an int8 artifact with resident_int8=True keeps kernels as
    int8 leaves; the forward matches the dequantized load exactly."""
    from modegpt_tpu.compress.artifact import load_compressed_model, save_compressed_model

    spec, params = params_from_hf_model(_tiny_llama(seed=4))
    d = str(tmp_path / "a")
    save_compressed_model(d, spec, params, dtype="int8")
    s1, p_deq, _ = load_compressed_model(d)
    s2, p_res, _ = load_compressed_model(d, resident_int8=True)
    assert p_res["layers"][0]["q"]["kernel_q"].dtype == jnp.int8
    ids = rng.integers(0, spec.vocab_size, size=(2, 12)).astype(np.int32)
    a, _ = forward(s1, p_deq, ids)
    b, _ = forward(s2, p_res, ids)
    np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-5, atol=1e-6)


def test_quantize_idempotent_and_preserves_bias(rng):
    spec, params = params_from_hf_model(_tiny_llama(seed=2))
    params["layers"][0]["q"]["bias"] = jnp.zeros(spec.q_ranks[0])
    q1 = quantize_params(params)
    q2 = quantize_params(q1)
    assert "bias" in q1["layers"][0]["q"]
    assert q1["layers"][0]["q"]["kernel_q"] is q2["layers"][0]["q"]["kernel_q"]
