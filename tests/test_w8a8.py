"""W8A8 execution: dynamic per-token int8 activations against
int8-resident weights, accumulated in int32 on the MXU.

New capability vs the reference (whose quantization story is "save
bf16", model_utils.py:111-118): `quantize.with_act_quant` builds a
zero-copy execution VIEW of an int8-quantized model (kernel_q ->
kernel_qa re-key) under which every projection dot runs int8 x int8 ->
int32 — 2x the bf16 MXU peak on v5e. Serving uses it for the
compute-bound prefill programs (`ContinuousBatcher(a8_prefill=True)`);
decode keeps the weight-only program.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modegpt_tpu.models.forward import _act_quant, _dot_w8a8, _linear, forward
from modegpt_tpu.models.init import init_params
from modegpt_tpu.models.quantize import (
    quantize_linear,
    quantize_padded,
    quantize_params,
    with_act_quant,
)
from modegpt_tpu.models.spec import ModelSpec


def _tiny_spec(**kw):
    base = dict(
        arch="llama", vocab_size=211, d_model=64, n_layers=2, n_heads=4,
        n_kv_heads=2, head_dim=16, d_int=96, max_position_embeddings=128,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(64, 64), k_ranks=(32, 32), v_ranks=(32, 32),
        o_ranks=(64, 64), gate_ranks=(96, 96),
    )
    base.update(kw)
    return ModelSpec(**base)


def test_dot_w8a8_exact_on_representable_inputs():
    """Power-of-two scales + int-valued operands: quantization is
    lossless and the int32 accumulation is exact, so the W8A8 dot must
    equal the f64 reference EXACTLY (products sum < 2^24, so even the
    final f32 rescale is exact)."""
    rng = np.random.default_rng(0)
    d_in, d_out, n = 64, 48, 8
    codes = rng.integers(-127, 128, size=(d_in, d_out)).astype(np.int8)
    wscale = 2.0 ** rng.integers(-6, -2, size=(d_out,))
    xcodes = rng.integers(-126, 127, size=(n, d_in)).astype(np.float64)
    xcodes[:, 0] = 127.0  # pin each row's amax so xscale is exact
    xscale = 2.0 ** rng.integers(-4, 0, size=(n, 1))
    x = jnp.asarray(xcodes * xscale, jnp.float32)

    got = np.asarray(
        _dot_w8a8(x, jnp.asarray(codes), jnp.asarray(wscale, jnp.float32))
    )
    want = (xcodes * xscale) @ (codes.astype(np.float64) * wscale)
    np.testing.assert_array_equal(got, want.astype(np.float32))


def test_act_quant_codes_bounded_and_zero_row():
    x = jnp.asarray([[0.0, 0.0, 0.0], [1e-30, -3.0, 2.0]], jnp.float32)
    q, s = _act_quant(x)
    assert q.dtype == jnp.int8
    assert int(jnp.max(jnp.abs(q))) <= 127
    # all-zero rows quantize to zero with scale 1 (no NaNs)
    np.testing.assert_array_equal(np.asarray(q[0]), 0)
    assert float(s[0, 0]) == 1.0


def test_linear_w8a8_close_to_fp():
    """Random gaussian weights/activations: W8A8 output within ~2% rel
    error of the full-precision matmul (per-token + per-channel scales
    bound the quantization noise)."""
    rng = np.random.default_rng(1)
    d_in, d_out, n = 128, 96, 16
    W = rng.standard_normal((d_in, d_out)).astype(np.float32) * 0.05
    x = jnp.asarray(rng.standard_normal((n, d_in)), jnp.float32)
    p = quantize_linear({"kernel": jnp.asarray(W)})
    pa = {"kernel_qa": p["kernel_q"], "scale": p["scale"]}
    got = np.asarray(_linear(x, pa), np.float64)
    want = np.asarray(x, np.float64) @ W.astype(np.float64)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel


def test_with_act_quant_is_zero_copy_view():
    spec = _tiny_spec()
    params = init_params(spec, jax.random.key(0))
    q = quantize_params(params)
    v = with_act_quant(q)
    l0, v0 = q["layers"][0], v["layers"][0]
    for name in ("q", "k", "v", "o", "up", "gate", "down"):
        assert "kernel_qa" in v0[name] and "kernel_q" not in v0[name]
        # the codes array is SHARED, not copied
        assert v0[name]["kernel_qa"] is l0[name]["kernel_q"]
        assert v0[name]["scale"] is l0[name]["scale"]
    # lm_head / embeddings / norms untouched (weight-only stays)
    assert v["lm_head"] is q["lm_head"]
    assert v0["attn_norm"] is l0["attn_norm"]
    # idempotent on unquantized params (no kernel_q anywhere)
    plain = with_act_quant(params)
    assert jax.tree_util.tree_structure(plain) == jax.tree_util.tree_structure(params)


def test_forward_w8a8_close_to_weight_only():
    """Full forward under the W8A8 view stays close to the weight-only
    int8 forward: the only delta is activation quantization noise."""
    spec = _tiny_spec()
    params = init_params(spec, jax.random.key(2))
    tokens = jnp.asarray(
        np.random.default_rng(3).integers(0, spec.vocab_size, (2, 24)), jnp.int32
    )
    q = quantize_params(params)
    lg_w8, _ = forward(spec, q, tokens)
    lg_a8, _ = forward(spec, with_act_quant(q), tokens)
    a, b = np.asarray(lg_w8, np.float64), np.asarray(lg_a8, np.float64)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel


def test_forward_w8a8_moe_dense_close():
    """The dense-all-experts MoE einsum path under the W8A8 view."""
    spec = _tiny_spec(
        arch="mixtral", n_experts=4, experts_per_tok=2, norm_topk_prob=True
    )
    params = init_params(spec, jax.random.key(4))
    tokens = jnp.asarray(
        np.random.default_rng(5).integers(0, spec.vocab_size, (2, 16)), jnp.int32
    )
    q = quantize_params(params)
    lg_w8, _ = forward(spec, q, tokens)
    lg_a8, _ = forward(spec, with_act_quant(q), tokens)
    a, b = np.asarray(lg_w8, np.float64), np.asarray(lg_a8, np.float64)
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel


def _run_batcher(pm, prompts, a8, **kw):
    from modegpt_tpu.models.serving import ContinuousBatcher

    b = ContinuousBatcher(
        pm, slots=4, max_len=64, prefill_bucket=16, temperature=0.0,
        prefill_exec="batched", a8_prefill=a8, **kw,
    )
    rids = [b.submit(p, max_new_tokens=8) for p in prompts]
    done = b.run()
    return [done[r] for r in rids]


def test_serving_a8_prefill_unquantized_is_identity():
    """a8_prefill on an UNQUANTIZED model is a no-op view: greedy
    outputs must be token-identical."""
    spec = _tiny_spec()
    params = init_params(spec, jax.random.key(6))
    from modegpt_tpu.models.padded import pad_to_uniform

    pm = pad_to_uniform(spec, params)
    rng = np.random.default_rng(7)
    prompts = [rng.integers(0, spec.vocab_size, n).tolist() for n in (5, 19, 30)]
    off = _run_batcher(pm, prompts, a8=False)
    on = _run_batcher(pm, prompts, a8=True)
    for a, b in zip(off, on):
        assert a == b


def test_serving_a8_prefill_quantized_generates():
    """W8A8 prefill through the real batcher (batched + mixed rounds):
    requests complete with the full token budget and the decode phase
    continues coherently from the W8A8-built cache."""
    spec = _tiny_spec()
    params = init_params(spec, jax.random.key(8))
    from modegpt_tpu.models.padded import pad_to_uniform

    pm = quantize_padded(pad_to_uniform(spec, params))
    rng = np.random.default_rng(9)
    prompts = [rng.integers(0, spec.vocab_size, n).tolist() for n in (4, 21, 33)]
    outs = _run_batcher(pm, prompts, a8=True)
    for p, o in zip(prompts, outs):
        assert o[: len(p)] == list(p)
        assert len(o) == len(p) + 8
    # and the W8A8-prefill outputs stay close to weight-only-prefill
    # outputs: same model, the first generated token comes from logits
    # that differ only by activation-quant noise — require agreement on
    # a majority of requests (greedy argmax can flip on near-ties)
    base = _run_batcher(pm, prompts, a8=False)
    agree = sum(o[len(p)] == b[len(p)] for p, o, b in zip(prompts, outs, base))
    assert agree >= 2, (outs, base)


def test_serving_a8_prefill_tp_mesh_matches_single_device():
    """W8A8 prefill under tensor parallelism: the int8 x int8 dots ride
    the same Megatron shardings (GSPMD partitions the int8 dot_general
    like any other); a 4x2 virtual-mesh batcher must emit the same
    greedy tokens as the single-device W8A8 batcher."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("data", "model"))

    spec = _tiny_spec()
    params = init_params(spec, jax.random.key(10))
    from modegpt_tpu.models.padded import pad_to_uniform

    pm = quantize_padded(pad_to_uniform(spec, params))
    rng = np.random.default_rng(11)
    prompts = [rng.integers(0, spec.vocab_size, n).tolist() for n in (5, 17)]
    ref = _run_batcher(pm, prompts, a8=True)
    got = _run_batcher(pm, prompts, a8=True, mesh=mesh)
    for a, b in zip(ref, got):
        assert a == b


def test_serving_int8_tp_mesh_matches_single_device():
    """Weight-only int8 under TP (regression: shard_serving used to
    build its sharding tree with plain `kernel` keys and crashed on
    quantized models)."""
    import jax
    from jax.sharding import Mesh

    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 devices")
    mesh = Mesh(np.asarray(devs[:8]).reshape(4, 2), ("data", "model"))

    spec = _tiny_spec()
    params = init_params(spec, jax.random.key(12))
    from modegpt_tpu.models.padded import pad_to_uniform

    pm = quantize_padded(pad_to_uniform(spec, params))
    rng = np.random.default_rng(13)
    prompts = [rng.integers(0, spec.vocab_size, n).tolist() for n in (6, 14)]
    ref = _run_batcher(pm, prompts, a8=False)
    got = _run_batcher(pm, prompts, a8=False, mesh=mesh)
    for a, b in zip(ref, got):
        assert a == b
