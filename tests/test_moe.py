"""Mixtral-family MoE support: HF forward parity, per-expert Type-I
compression end to end, batched-vs-reference solver equality, generation.

MoE is NEW capability relative to the reference, which carries only
vestigial Mixtral/DeepSeek branches (SURVEY.md §2 "dead/vestigial")."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.calib.engine import calibrate
from modegpt_tpu.compress.pipeline import run_compression, solve_layer
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model


def _tiny_mixtral(n_layers=2):
    cfg = transformers.MixtralConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, num_hidden_layers=n_layers,
        num_attention_heads=4, num_key_value_heads=2, num_local_experts=4,
        num_experts_per_tok=2, max_position_embeddings=128, sliding_window=None,
    )
    torch.manual_seed(0)
    return transformers.MixtralForCausalLM(cfg).eval()


def _tiny_qwen3_moe(norm_topk=False):
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, moe_intermediate_size=48,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, max_position_embeddings=128,
        norm_topk_prob=norm_topk,
    )
    torch.manual_seed(0)
    return transformers.Qwen3MoeForCausalLM(cfg).eval()


@pytest.mark.parametrize("norm_topk", [False, True])
def test_qwen3_moe_forward_matches_hf(rng, norm_topk):
    """Qwen3-MoE: qk_norm attention + MoE MLP, norm_topk_prob both ways."""
    m = _tiny_qwen3_moe(norm_topk)
    spec, params = params_from_hf_model(m)
    assert spec.arch == "qwen3_moe" and spec.qk_norm and spec.n_experts == 4
    assert spec.norm_topk_prob == norm_topk and spec.d_int == 48

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_qwen3_moe_compression_end_to_end(tmp_path, rng):
    spec, params = params_from_hf_model(_tiny_qwen3_moe())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec = results["compressed_spec"]
    assert cspec.n_experts == 4 and cspec.qk_norm
    assert max(cspec.gate_ranks) < spec.d_int
    assert np.isfinite(results["compressed_ppl"])


def test_forward_matches_hf(rng):
    m = _tiny_mixtral()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "mixtral" and spec.n_experts == 4 and spec.experts_per_tok == 2

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_moe_gram_covers_only_routed_tokens(rng):
    """Per-expert cov_mlp accumulates exactly the routed tokens: the trace
    sums match a manual HF-side recomputation of routed intermediates."""
    m = _tiny_mixtral(n_layers=1)
    spec, params = params_from_hf_model(m)
    ids = rng.integers(0, spec.vocab_size, size=(1, 12)).astype(np.int32)
    _, stats = forward(spec, params, ids, stats_layers=(0,))
    cov = np.asarray(stats.cov_mlp[0])  # [E, D, D]
    assert cov.shape == (4, 96, 96)

    # HF side: intermediate h = silu(w1 x) * (w3 x) for tokens routed to e.
    moe = m.model.layers[0].block_sparse_moe
    with torch.no_grad():
        hs = m.model.layers[0].post_attention_layernorm(
            _hf_hidden_before_mlp(m, ids)
        ).reshape(-1, spec.d_model)
        logits = moe.gate(hs)
        probs = torch.softmax(logits.float(), dim=-1)
        _, sel = torch.topk(probs, 2, dim=-1)
        for e in range(4):
            routed = (sel == e).any(dim=-1)
            xe = hs[routed]
            he = torch.nn.functional.silu(moe.experts[e].w1(xe)) * moe.experts[e].w3(xe)
            ref = (he.T @ he).numpy()
            np.testing.assert_allclose(cov[e], ref, rtol=1e-3, atol=1e-3)


def _hf_hidden_before_mlp(m, ids):
    """Hidden state entering layer 0's MLP block (post-attention residual)."""
    with torch.no_grad():
        t = torch.from_numpy(np.asarray(ids).astype(np.int64))
        out = m.model(t, output_hidden_states=True)
        h0 = out.hidden_states[0]
        layer = m.model.layers[0]
        pos = torch.arange(t.shape[1])[None, :]
        cos, sin = m.model.rotary_emb(h0, pos)
        attn_out, *_ = layer.self_attn(
            layer.input_layernorm(h0), position_embeddings=(cos, sin), attention_mask=None
        )
        return h0 + attn_out


def test_batched_moe_solver_matches_per_layer(tmp_path, rng):
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    spec, params = params_from_hf_model(_tiny_mixtral())
    batches = [rng.integers(0, 128, size=(2, 32)).astype(np.int32) for _ in range(2)]
    calib = calibrate(spec, params, batches, [0, 1])
    config = CompressionConfig(compression_ratio=0.3, sparsity_smoothing=0.2)
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, smoothing=0.2, max_sparsity=0.8)

    batched = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp")["mlp"]
    for l in (0, 1):
        ref = solve_layer(spec, params["layers"][l], l, keep[l], calib, config, "mlp")["mlp"]
        np.testing.assert_allclose(batched[l]["up"], ref["up"], rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(batched[l]["down"], ref["down"], rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(batched[l]["idx"], ref["idx"])


@pytest.mark.parametrize("family", ["mixtral", "qwen2_moe"])
def test_lowmem_moe_solve_matches_batched(monkeypatch, rng, family):
    """The sequenced low-memory per-(layer, expert) MoE solve (taken when
    one layer's expert stack would not fit beside the resident [E, D, D]
    tap stack — Mixtral geometry on a 16 GB chip) must match the stacked
    batched path: idx/up/gate are exact (same select program + gathers),
    down drifts only by f32 accumulation order (per-expert vs vmapped
    Cholesky tiling)."""
    import modegpt_tpu.compress.batched as B
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    maker = _tiny_mixtral if family == "mixtral" else _tiny_qwen2_moe
    spec, params = params_from_hf_model(maker())
    batches = [rng.integers(0, 128, size=(2, 32)).astype(np.int32) for _ in range(2)]
    calib = calibrate(spec, params, batches, [0, 1], accumulate="device")
    config = CompressionConfig(
        compression_ratio=0.3, sparsity_smoothing=0.2, solver_precision="f32_device"
    )
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, smoothing=0.2, max_sparsity=0.8)

    ref = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp")["mlp"]
    monkeypatch.setattr(B, "_LOWMEM_COV_BYTES", 0)
    # scratch_params=True (the streamed flush's mode) consumes staged
    # up/gate leaves once their factors are solved — run it on container
    # copies (shared leaves) and check the real tree stayed intact.
    import jax

    scratch = jax.tree_util.tree_map(lambda x: x, params)
    got = solve_chunk_batched(
        spec, scratch, [0, 1], keep, calib, config, "mlp", scratch_params=True
    )["mlp"]
    assert scratch["layers"][0]["experts"]["up"] == {}  # consumed
    assert "kernel" in params["layers"][0]["experts"]["up"]  # caller tree intact
    for l in (0, 1):
        assert set(got[l]) == set(ref[l])
        for k, v in ref[l].items():
            if "idx" in k:
                np.testing.assert_array_equal(got[l][k], v, err_msg=f"{l}/{k}")
            elif "down" in k:
                np.testing.assert_allclose(
                    np.asarray(got[l][k]), np.asarray(v), rtol=2e-3, atol=1e-5,
                    err_msg=f"{l}/{k}",
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(got[l][k]), np.asarray(v), rtol=1e-6, atol=1e-7,
                    err_msg=f"{l}/{k}",
                )
    # default (no scratch consent) must not mutate the caller's tree
    got2 = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp")["mlp"]
    assert "kernel" in params["layers"][0]["experts"]["up"]
    for l in (0, 1):
        np.testing.assert_array_equal(got2[l]["idx"], ref[l]["idx"])


def test_moe_compression_end_to_end(tmp_path, rng):
    spec, params = params_from_hf_model(_tiny_mixtral())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = results["compressed_spec"], results["compressed_params"]
    assert cspec.n_experts == 4
    assert results["params_after"] < results["params_before"]
    assert np.isfinite(results["compressed_ppl"])
    # every layer's expert stack is compressed to the layer's shared rank
    for l in range(cspec.n_layers):
        assert cparams["layers"][l]["experts"]["up"]["kernel"].shape == (
            4, cspec.d_model, cspec.gate_ranks[l],
        )
    assert max(cspec.gate_ranks) < spec.d_int


def test_moe_expert_parallel_mesh_matches_single_device(rng):
    """EP+TP mesh forward (experts sharded over the model axis) must match
    the single-device forward; calibration taps survive the sharding."""
    import jax

    from modegpt_tpu.parallel.mesh import make_mesh, param_shardings, shard_batch

    spec, params = params_from_hf_model(_tiny_mixtral())
    mesh = make_mesh("data:2,model:4")
    sparams = jax.device_put(params, param_shardings(mesh, spec, params))
    ids = rng.integers(0, spec.vocab_size, size=(4, 16)).astype(np.int32)
    got, stats = forward(spec, sparams, shard_batch(mesh, ids), stats_layers=(0, 1))
    ref, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    assert stats.cov_mlp.shape == (2, 4, 96, 96)


def test_moe_scan_forward_matches_unrolled(rng):
    """Dense MoE stacks scan (layer-count-independent compile), with
    per-expert Gram taps identical to the unrolled path."""
    from modegpt_tpu.models.scan_forward import forward_scan, supports_scan

    spec, params = params_from_hf_model(_tiny_mixtral())
    assert supports_scan(spec, (0, 1))
    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    ref, ref_stats = forward(spec, params, ids, stats_layers=(0, 1))
    got, got_stats = forward_scan(spec, params, ids, stats_layers=(0, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_stats.cov_mlp), np.asarray(ref_stats.cov_mlp), rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_stats.bi_acc), np.asarray(ref_stats.bi_acc), rtol=1e-4, atol=1e-5
    )


def test_moe_padded_and_serving(tmp_path, rng):
    """Compressed MoE runs on the padded scanned stack and through the
    continuous batcher, matching the unrolled decode exactly."""
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import forward_padded, pad_to_uniform
    from modegpt_tpu.models.serving import ContinuousBatcher

    spec, params = params_from_hf_model(_tiny_mixtral())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.1,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    res = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = res["compressed_spec"], res["compressed_params"]
    pm = pad_to_uniform(cspec, cparams)

    ids = rng.integers(0, cspec.vocab_size, size=(2, 12)).astype(np.int32)
    ref, _ = forward(cspec, cparams, ids)
    got = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    prompt = rng.integers(1, cspec.vocab_size, size=(5,)).astype(np.int32)
    ref_gen = np.asarray(
        generate(cspec, cparams, prompt[None], max_new_tokens=5, temperature=0.0)
    )[0].tolist()
    batcher = ContinuousBatcher(pm, slots=2, max_len=32, prefill_bucket=8)
    rid = batcher.submit(prompt, max_new_tokens=5)
    assert batcher.run()[rid] == ref_gen


def test_moe_generation_incremental_matches_full(tmp_path, rng):
    from modegpt_tpu.models.generate import decode_step, init_cache, prefill

    spec, params = params_from_hf_model(_tiny_mixtral())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.3,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = results["compressed_spec"], results["compressed_params"]

    B, P, steps = 2, 6, 3
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


def _tiny_qwen3_moe_mixed():
    cfg = transformers.Qwen3MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, moe_intermediate_size=48,
        num_hidden_layers=3, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, max_position_embeddings=128,
        mlp_only_layers=[1], norm_topk_prob=True,
    )
    torch.manual_seed(0)
    return transformers.Qwen3MoeForCausalLM(cfg).eval()


def test_qwen3_moe_mixed_forward_matches_hf(rng):
    """Mixed dense/MoE stack (mlp_only_layers): per-layer MoE flags."""
    m = _tiny_qwen3_moe_mixed()
    spec, params = params_from_hf_model(m)
    assert spec.moe_layers == (0, 2)
    assert spec.is_moe_layer(0) and not spec.is_moe_layer(1)
    assert spec.gate_ranks == (48, 96, 48)  # dense layer keeps the dense d_int

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_qwen3_moe_mixed_compression_end_to_end(tmp_path, rng):
    """Mixed stack compresses end to end: per-expert solves on MoE layers,
    plain Type-I on the dense layer, artifact roundtrip, generation."""
    from modegpt_tpu.models.generate import generate

    spec, params = params_from_hf_model(_tiny_qwen3_moe_mixed())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = results["compressed_spec"], results["compressed_params"]
    assert np.isfinite(results["compressed_ppl"])
    assert cspec.moe_layers == (0, 2)
    assert max(cspec.gate_ranks) < 96 and "experts" in cparams["layers"][0]
    assert "experts" not in cparams["layers"][1]  # dense layer stays dense

    out = generate(cspec, cparams, rng.integers(1, 128, size=(1, 5)).astype(np.int32),
                   max_new_tokens=4, temperature=0.0)
    assert out.shape == (1, 9)


# ---- qwen2_moe: DeepSeek-style shared experts (+ sigmoid shared gate) ----


def _tiny_qwen2_moe(n_layers=2, **kw):
    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=96, moe_intermediate_size=48,
        shared_expert_intermediate_size=80, num_hidden_layers=n_layers,
        num_attention_heads=4, num_key_value_heads=2, num_experts=4,
        num_experts_per_tok=2, max_position_embeddings=128, decoder_sparse_step=1,
        mlp_only_layers=[], **kw,
    )
    torch.manual_seed(0)
    return transformers.Qwen2MoeForCausalLM(cfg).eval()


def test_qwen2_moe_forward_matches_hf(rng):
    """qwen2_moe: shared expert + sigmoid gate + qkv biases + GQA RoPE."""
    m = _tiny_qwen2_moe()
    spec, params = params_from_hf_model(m)
    assert spec.arch == "qwen2_moe" and spec.shared_d_int == 80
    assert spec.shared_expert_gate and spec.attention_bias and not spec.qk_norm
    assert not spec.norm_topk_prob  # qwen2_moe default
    assert "shared" in params["layers"][0] and "shared_gate" in params["layers"][0]

    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    with torch.no_grad():
        ref = m(torch.from_numpy(ids.astype(np.int64))).logits.numpy()
    got, _ = forward(spec, params, ids)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_qwen2_moe_shared_gram_covers_all_tokens(rng):
    """cov_shared accumulates the shared expert's intermediate over ALL
    tokens (it is dense): matches an HF-side recomputation exactly."""
    m = _tiny_qwen2_moe(n_layers=1)
    spec, params = params_from_hf_model(m)
    ids = rng.integers(0, spec.vocab_size, size=(1, 12)).astype(np.int32)
    _, stats = forward(spec, params, ids, stats_layers=(0,))
    assert stats.cov_shared.shape == (1, 80, 80)

    moe = m.model.layers[0].mlp
    with torch.no_grad():
        hs = m.model.layers[0].post_attention_layernorm(
            _hf_hidden_before_mlp(m, ids)
        ).reshape(-1, spec.d_model)
        he = torch.nn.functional.silu(moe.shared_expert.gate_proj(hs)) * moe.shared_expert.up_proj(hs)
        ref = (he.T @ he).numpy()
    np.testing.assert_allclose(np.asarray(stats.cov_shared[0]), ref, rtol=1e-3, atol=1e-3)


def test_qwen2_moe_scan_matches_unrolled(rng):
    from modegpt_tpu.models.scan_forward import forward_scan, supports_scan

    spec, params = params_from_hf_model(_tiny_qwen2_moe())
    assert supports_scan(spec, (0, 1))
    ids = rng.integers(0, spec.vocab_size, size=(2, 16)).astype(np.int32)
    ref, ref_stats = forward(spec, params, ids, stats_layers=(0, 1))
    got, got_stats = forward_scan(spec, params, ids, stats_layers=(0, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(got_stats.cov_shared), np.asarray(ref_stats.cov_shared),
        rtol=1e-5, atol=1e-5,
    )


def test_qwen2_moe_compression_end_to_end(tmp_path, rng):
    """Shared expert gets its own Type-I solve; q/k biases slice through
    the rotary mask; the GQA v bias folds into the o bias; artifact
    roundtrip; padded execution and generation on the compressed model."""
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import forward_padded, pad_to_uniform

    spec, params = params_from_hf_model(_tiny_qwen2_moe())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=48,
        compression_ratio=0.3, sparsity_smoothing=0.2,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = results["compressed_spec"], results["compressed_params"]
    assert np.isfinite(results["compressed_ppl"])
    assert cspec.shared_gate_ranks and max(cspec.shared_gate_ranks) < spec.shared_d_int
    lp0 = cparams["layers"][0]
    assert lp0["shared"]["up"]["kernel"].shape[1] == cspec.shared_gate_ranks[0]
    # q/k keep (sliced) biases; v bias folded into o
    assert "bias" in lp0["q"] and lp0["q"]["bias"].shape[0] == cspec.q_ranks[0]
    assert "bias" not in lp0["v"] and "bias" in lp0["o"]

    ids = rng.integers(0, cspec.vocab_size, size=(2, 12)).astype(np.int32)
    ref, _ = forward(cspec, cparams, ids)
    pm = pad_to_uniform(cspec, cparams)
    got = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)

    out = generate(cspec, cparams, ids[:1, :5], max_new_tokens=4, temperature=0.0)
    assert out.shape == (1, 9)


def test_qwen2_moe_batched_solver_matches_per_layer(rng):
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    spec, params = params_from_hf_model(_tiny_qwen2_moe())
    batches = [rng.integers(0, 128, size=(2, 32)).astype(np.int32) for _ in range(2)]
    calib = calibrate(spec, params, batches, [0, 1])
    config = CompressionConfig(compression_ratio=0.3, sparsity_smoothing=0.2)
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, smoothing=0.2, max_sparsity=0.8)

    batched = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp,qk,vo")
    for l in (0, 1):
        ref = solve_layer(spec, params["layers"][l], l, keep[l], calib, config, "mlp,qk,vo")
        for k in ("shared_up", "shared_gate", "shared_down"):
            np.testing.assert_allclose(
                batched["mlp"][l][k], ref["mlp"][k], rtol=1e-6, atol=1e-8
            )
        np.testing.assert_array_equal(batched["mlp"][l]["shared_idx"], ref["mlp"]["shared_idx"])
        for k in ("q_bias", "k_bias"):
            np.testing.assert_allclose(batched["qk"][l][k], ref["qk"][k], rtol=1e-6)
        np.testing.assert_allclose(batched["vo"][l]["o_bias"], ref["vo"]["o_bias"], rtol=1e-6)


# ---- capacity-based MoE dispatch (serving-scale execution) ----


@pytest.mark.parametrize("family", ["mixtral", "qwen2_moe"])
def test_moe_dispatch_matches_dense_at_full_capacity(rng, family):
    """The capacity dispatch runs the same math as dense-all-experts via
    gather/scatter; at capacity_factor >= E/k no assignment is dropped,
    so outputs match to float reassociation."""
    import jax.numpy as jnp

    from modegpt_tpu.models.forward import _moe_mlp, _moe_mlp_dispatch

    m = _tiny_mixtral() if family == "mixtral" else _tiny_qwen2_moe()
    spec, params = params_from_hf_model(m)
    x = jnp.asarray(rng.standard_normal((2, 16, spec.d_model)).astype(np.float32))
    y_dense, _, _ = _moe_mlp(spec, params["layers"][0], x, False)
    full = spec.n_experts / spec.experts_per_tok
    y_disp = _moe_mlp_dispatch(spec, params["layers"][0], x, capacity_factor=full)
    np.testing.assert_allclose(np.asarray(y_disp), np.asarray(y_dense), rtol=1e-5, atol=1e-6)
    # tight capacity drops assignments deterministically but stays finite
    y_tight = _moe_mlp_dispatch(spec, params["layers"][0], x, capacity_factor=1.0)
    assert np.isfinite(np.asarray(y_tight)).all()


def test_moe_dispatch_serving_matches_dense_generate(rng):
    """Serving with moe='dispatch' at no-drop capacity emits exactly the
    dense greedy continuation (int8-resident weights included)."""
    from modegpt_tpu.models.generate import generate
    from modegpt_tpu.models.padded import forward_padded, pad_to_uniform
    from modegpt_tpu.models.quantize import quantize_padded
    from modegpt_tpu.models.serving import ContinuousBatcher

    spec, params = params_from_hf_model(_tiny_qwen2_moe())
    pm = pad_to_uniform(spec, params)
    full = spec.n_experts / spec.experts_per_tok
    ids = rng.integers(1, spec.vocab_size, size=(6,)).astype(np.int32)
    ref = np.asarray(
        generate(spec, params, ids[None], max_new_tokens=5, temperature=0.0)
    )[0].tolist()
    b = ContinuousBatcher(pm, slots=2, max_len=32, prefill_bucket=8,
                          moe="dispatch", moe_capacity=full)
    rid = b.submit(ids, max_new_tokens=5)
    assert b.run()[rid] == ref

    pq = quantize_padded(pm)
    r8 = forward_padded(pq.spec, pq.layers, pq.other, pq.q_hd_true, ids[None])
    g8 = forward_padded(pq.spec, pq.layers, pq.other, pq.q_hd_true, ids[None],
                        moe="dispatch", moe_capacity=full)
    np.testing.assert_allclose(np.asarray(g8), np.asarray(r8), rtol=1e-5, atol=1e-5)


def test_dispatch_masked_rows_do_not_steal_capacity(rng):
    """Invalid rows (masked serving slots, padded prefill tails) must not
    evict real tokens' expert assignments at tight capacity: with
    token_valid set they route to a virtual overflow expert, so the one
    real row's output equals the dense path even when 7 garbage rows
    would otherwise overflow every expert."""
    from modegpt_tpu.models.forward import _moe_mlp, _moe_mlp_dispatch

    spec, params = params_from_hf_model(_tiny_qwen2_moe())
    lp = params["layers"][0]
    x = jnp.asarray(rng.standard_normal((8, 1, spec.d_model)).astype(np.float32))
    valid = jnp.asarray(np.array([False] * 7 + [True])[:, None])

    # capacity C = ceil(1.0 * 8*2/4) = 4: a real row's 2 assignments fit
    # trivially, but 7 garbage rows (14 assignments over 4 experts) would
    # exceed C on some expert and, sorting before row 7, evict it.
    y_dense, _, _ = _moe_mlp(spec, lp, x, False)
    y_masked = _moe_mlp_dispatch(spec, lp, x, capacity_factor=1.0, token_valid=valid)
    np.testing.assert_allclose(
        np.asarray(y_masked[7]), np.asarray(y_dense[7]), rtol=1e-5, atol=1e-6
    )
    # masked rows contribute only the (dense) shared expert — their routed
    # component is exactly zero
    from modegpt_tpu.models.forward import _shared_expert

    ys, _ = _shared_expert(spec, lp, x)
    np.testing.assert_allclose(
        np.asarray(y_masked[:7]), np.asarray(ys[:7]), rtol=1e-5, atol=1e-6
    )


def test_int8_resident_moe_artifact_and_dispatch(tmp_path, rng):
    """int8 MoE artifacts carry per-(expert, channel) scales; loaded
    resident they run the unrolled forward matching the dequantized
    load, and the serve workflow (pad, then quantize in memory) runs
    dispatch == dense on quantized expert kernels."""
    from modegpt_tpu.compress.artifact import load_compressed_model, save_compressed_model
    from modegpt_tpu.models.padded import forward_padded, pad_to_uniform
    from modegpt_tpu.models.quantize import quantize_padded

    spec, params = params_from_hf_model(_tiny_qwen2_moe())
    d = str(tmp_path / "a8")
    save_compressed_model(d, spec, params, dtype="int8")
    s_res, p_res, _ = load_compressed_model(d, resident_int8=True)
    assert p_res["layers"][0]["experts"]["up"]["kernel_q"].dtype == np.int8
    assert p_res["layers"][0]["experts"]["up"]["scale"].shape == (4, 48)
    assert "shared" in p_res["layers"][0] and "kernel_q" in p_res["layers"][0]["shared"]["up"]

    ids = rng.integers(0, 128, size=(2, 12)).astype(np.int32)
    s_deq, p_deq, _ = load_compressed_model(d)
    ref, _ = forward(s_deq, p_deq, ids)
    got, _ = forward(s_res, p_res, ids)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # serve workflow: pad the full-precision params, quantize the padded
    # stack, then dispatch == dense on the int8-resident expert kernels
    pm = quantize_padded(pad_to_uniform(spec, params))
    dense = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids)
    disp = forward_padded(pm.spec, pm.layers, pm.other, pm.q_hd_true, ids,
                          moe="dispatch", moe_capacity=2.0)
    np.testing.assert_allclose(np.asarray(disp), np.asarray(dense), rtol=1e-5, atol=1e-5)


def test_supports_scan_rejects_ragged_shared_ranks():
    """Uniform q/k/v/o/gate but per-layer shared ranks must NOT scan
    (stacking the ragged shared kernels would fail)."""
    import dataclasses

    from modegpt_tpu.models.scan_forward import supports_scan

    spec, _ = params_from_hf_model(_tiny_qwen2_moe())
    ragged = dataclasses.replace(spec, shared_gate_ranks=(60, 64))
    assert not supports_scan(ragged, ())
    uniform = dataclasses.replace(spec, shared_gate_ranks=(64, 64))
    assert supports_scan(uniform, ())


@pytest.mark.parametrize("units", [1, 3])
def test_moe_expert_chunked_solver_matches_unchunked(monkeypatch, rng, units):
    """When one layer's expert stack exceeds the solver memory budget
    (Mixtral geometry on a 16 GB chip), experts are solved e_step at a
    time; factors must equal the whole-stack solve exactly. units=3 also
    exercises a ragged final chunk (E=8 -> 3+3+2)."""
    import modegpt_tpu.compress.batched as batched_mod
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    spec, params = params_from_hf_model(_tiny_mixtral())
    batches = [rng.integers(0, 128, size=(2, 32)).astype(np.int32) for _ in range(2)]
    calib = calibrate(spec, params, batches, [0, 1])
    config = CompressionConfig(compression_ratio=0.3, sparsity_smoothing=0.2)
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, smoothing=0.2, max_sparsity=0.8)

    ref = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp")["mlp"]
    monkeypatch.setattr(batched_mod, "_mlp_layers_per_program", lambda *a, **k: units)
    got = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp")["mlp"]
    for l in (0, 1):
        for k in ("up", "gate", "down"):
            np.testing.assert_allclose(got[l][k], ref[l][k], rtol=1e-6, atol=1e-8)
        np.testing.assert_array_equal(got[l]["idx"], ref[l]["idx"])


@pytest.mark.parametrize("units", [1, 3])
def test_moe_expert_chunked_solver_fetch_device(monkeypatch, rng, units):
    """Expert chunking with fetch='device' (factors stay in HBM) must
    assemble identical per-layer stacks."""
    import modegpt_tpu.compress.batched as batched_mod
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    spec, params = params_from_hf_model(_tiny_mixtral())
    batches = [rng.integers(0, 128, size=(2, 32)).astype(np.int32) for _ in range(2)]
    calib = calibrate(spec, params, batches, [0, 1])
    config = CompressionConfig(compression_ratio=0.3, sparsity_smoothing=0.2)
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, smoothing=0.2, max_sparsity=0.8)

    ref = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp")["mlp"]
    monkeypatch.setattr(batched_mod, "_mlp_layers_per_program", lambda *a, **k: units)
    got = solve_chunk_batched(
        spec, params, [0, 1], keep, calib, config, "mlp", fetch="device"
    )["mlp"]
    for l in (0, 1):
        for k in ("up", "gate", "down"):
            np.testing.assert_allclose(
                np.asarray(got[l][k]), ref[l][k], rtol=1e-6, atol=1e-8
            )
        np.testing.assert_array_equal(np.asarray(got[l]["idx"]), ref[l]["idx"])


@pytest.mark.parametrize("lowmem", [False, True])
def test_moe_host_sliced_factors_match(monkeypatch, rng, lowmem):
    """host_params through the MoE solve (both the batched and the
    sequenced low-memory paths): expert up/gate factors are gathered
    from the HOST expert kernels instead of crossing the HBM->host link,
    bit-identical to the device gathers (this is the moe8 beyond-HBM
    capture path — r03 fetched 15.1 GB, mostly these slices)."""
    import jax

    import modegpt_tpu.compress.batched as B
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    spec, params = params_from_hf_model(_tiny_mixtral())
    batches = [rng.integers(0, 128, size=(2, 32)).astype(np.int32) for _ in range(2)]
    calib = calibrate(spec, params, batches, [0, 1], accumulate="device")
    config = CompressionConfig(
        compression_ratio=0.3, sparsity_smoothing=0.2, solver_precision="f32_device"
    )
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, smoothing=0.2, max_sparsity=0.8)

    ref = solve_chunk_batched(spec, params, [0, 1], keep, calib, config, "mlp")["mlp"]
    if lowmem:
        monkeypatch.setattr(B, "_LOWMEM_COV_BYTES", 0)
    host_view = {
        l: jax.tree_util.tree_map(lambda a: np.asarray(a), params["layers"][l])
        for l in (0, 1)
    }
    b0 = B.FETCHED_BYTES.total
    got = solve_chunk_batched(
        spec, params, [0, 1], keep, calib, config, "mlp", host_params=host_view
    )["mlp"]
    fetched = B.FETCHED_BYTES.total - b0
    for l in (0, 1):
        for k, v in ref[l].items():
            if "idx" in k:
                np.testing.assert_array_equal(got[l][k], v, err_msg=f"{l}/{k}")
            elif "down" in k and lowmem:
                # per-expert vs vmapped Cholesky tiling drift (same
                # envelope as test_lowmem_moe_solve_matches_batched)
                np.testing.assert_allclose(
                    np.asarray(got[l][k]), np.asarray(v), rtol=2e-3, atol=1e-5,
                    err_msg=f"{l}/{k}",
                )
            else:
                np.testing.assert_allclose(
                    np.asarray(got[l][k]), np.asarray(v), rtol=1e-6, atol=1e-7,
                    err_msg=f"{l}/{k}",
                )
    # the up/gate expert slices stayed off the link: only down (+shared)
    # was fetched
    up_gate_bytes = sum(
        np.asarray(ref[l][k]).nbytes for l in (0, 1) for k in ("up", "gate")
    )
    all_bytes = sum(
        np.asarray(v).nbytes for l in (0, 1) for v in ref[l].values()
    )
    assert fetched <= all_bytes - up_gate_bytes + 1024, (fetched, all_bytes)
