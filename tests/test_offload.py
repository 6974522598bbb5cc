"""Layer-streamed (host-offload) calibration + solve: equality with the
resident paths, staged-vs-resident bit-exactness, resume, and pipeline
integration (compress/offload.py — the TPU answer to the reference's
device_map="auto" beyond-HBM spill, src/model_utils.py:70)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from modegpt_tpu.calib.data import load_calibration_batches
from modegpt_tpu.calib.engine import calibrate
from modegpt_tpu.compress.batched import solve_chunk_batched
from modegpt_tpu.compress.offload import stream_bi_sweep, stream_calibrate_solve
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models.init import init_params
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.allocation import allocate_keep_ratios


def _llama_spec(n_layers=3, d_model=64, d_int=144):
    return ModelSpec(
        arch="llama", vocab_size=128, d_model=d_model, n_layers=n_layers,
        n_heads=4, n_kv_heads=2, head_dim=d_model // 4,
        d_int=d_int, max_position_embeddings=128, act="silu", norm="rmsnorm",
        norm_eps=1e-6, rope_theta=10000.0, attention_bias=False, mlp_bias=False,
        tie_word_embeddings=False,
        q_ranks=(d_model,) * n_layers, k_ranks=(d_model // 2,) * n_layers,
        v_ranks=(d_model // 2,) * n_layers, o_ranks=(d_model,) * n_layers,
        gate_ranks=(d_int,) * n_layers,
    )


def _config(**kw):
    kw.setdefault("solver_precision", "f32_device")
    return CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
        seq_len=32, compression_ratio=0.3, sparsity_smoothing=0.5, **kw
    )


def _host_params(params):
    """Device pytree -> host numpy pytree (the beyond-HBM residency)."""
    return jax.tree_util.tree_map(lambda a: np.asarray(a), params)


def test_stream_matches_chunked_factors():
    """Streamed sweep factors == calibrate+solve_chunk_batched factors
    (same solvers, same covariance math, different execution schedule)."""
    spec = _llama_spec()
    params = init_params(spec, jax.random.key(0))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    config = _config(layers_per_step=2)

    calib = calibrate(spec, params, batches, list(range(3)), accumulate="device")
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, 0.5, 0.8)
    ref = solve_chunk_batched(
        spec, params, list(range(3)), np.asarray(keep), calib, config, "mlp,qk,vo"
    )

    factors, bi, keep_s = stream_calibrate_solve(spec, params, batches, config)
    np.testing.assert_allclose(bi, calib.bi_scores, rtol=2e-5)
    np.testing.assert_allclose(np.asarray(keep_s), np.asarray(keep), rtol=2e-5)
    for s in ("mlp", "qk", "vo"):
        assert sorted(factors[s]) == [0, 1, 2]
        for l in range(3):
            for k, v in ref[s][l].items():
                np.testing.assert_allclose(
                    np.asarray(factors[s][l][k]), np.asarray(v),
                    rtol=5e-4, atol=5e-5, err_msg=f"{s}[{l}][{k}]",
                )


def test_staged_equals_resident_bitwise():
    """Host-numpy (staged) weights and device-resident weights through
    the SAME streamed path must produce bit-identical factors — staging
    is a transport, not a numeric path."""
    spec = _llama_spec()
    params = init_params(spec, jax.random.key(1))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    config = _config(layers_per_step=1)

    f_dev, bi_dev, keep_dev = stream_calibrate_solve(spec, params, batches, config)
    f_host, bi_host, keep_host = stream_calibrate_solve(
        spec, _host_params(params), batches, config
    )
    np.testing.assert_array_equal(np.asarray(keep_dev), np.asarray(keep_host))
    assert bi_dev == bi_host
    for s in f_dev:
        for l in f_dev[s]:
            for k in f_dev[s][l]:
                np.testing.assert_array_equal(
                    np.asarray(f_dev[s][l][k]), np.asarray(f_host[s][l][k]),
                    err_msg=f"{s}[{l}][{k}]",
                )


def test_stream_fixed_keep_and_target_layers():
    """keep_ratios supplied -> no BI prepass (single sweep); target_layers
    restricts solving (the resume path) without touching the forward."""
    spec = _llama_spec()
    params = init_params(spec, jax.random.key(2))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    config = _config(layers_per_step=2)

    keep = np.asarray([0.7, 0.8, 0.9])
    factors, bi, keep_out = stream_calibrate_solve(
        spec, params, batches, config, keep_ratios=keep, target_layers=[1, 2]
    )
    np.testing.assert_array_equal(keep_out, keep)
    for s in ("mlp", "qk", "vo"):
        assert sorted(factors[s]) == [1, 2]
    assert len(bi) == 3 and all(np.isfinite(bi))


def test_stream_bi_matches_calibrate():
    spec = _llama_spec()
    params = init_params(spec, jax.random.key(3))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, [0], accumulate="host")
    bi = stream_bi_sweep(spec, params, batches)
    np.testing.assert_allclose(bi, ref.bi_scores, rtol=2e-5)


def test_stream_moe_mixed_stack():
    """Mixed dense/MoE stack through the streamed sweep: per-kind solve
    groups, per-expert factor shapes."""
    spec = ModelSpec(
        arch="mixtral", vocab_size=128, d_model=64, n_layers=3, n_heads=4,
        n_kv_heads=2, head_dim=16, d_int=48, max_position_embeddings=128,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(64,) * 3, k_ranks=(32,) * 3, v_ranks=(32,) * 3,
        o_ranks=(64,) * 3, gate_ranks=(96, 48, 96),
        n_experts=4, experts_per_tok=2, moe_layers=(1,),
    )
    params = init_params(spec, jax.random.key(4))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    config = _config(layers_per_step=3)

    factors, bi, keep = stream_calibrate_solve(spec, params, batches, config)
    assert sorted(factors["mlp"]) == [0, 1, 2]
    assert factors["mlp"][0]["up"].ndim == 2  # dense
    assert factors["mlp"][1]["up"].ndim == 3  # per-expert stack
    assert factors["mlp"][1]["up"].shape[0] == 4

    # equality vs the chunked reference on the dense + MoE layers
    calib = calibrate(spec, params, batches, [0, 2], accumulate="device")
    calib1 = calibrate(spec, params, batches, [1], accumulate="device")
    keep_arr = np.asarray(keep)
    ref_d = solve_chunk_batched(spec, params, [0, 2], keep_arr, calib, config, "mlp")
    ref_m = solve_chunk_batched(spec, params, [1], keep_arr, calib1, config, "mlp")
    for l, ref in ((0, ref_d), (2, ref_d), (1, ref_m)):
        for k, v in ref["mlp"][l].items():
            np.testing.assert_allclose(
                np.asarray(factors["mlp"][l][k]), np.asarray(v),
                rtol=5e-4, atol=5e-5, err_msg=f"mlp[{l}][{k}]",
            )


def test_stream_async_flush_equals_sync():
    """stream_async_flush on == off, bit for bit, on a mixed dense/MoE
    stack at width 1 (dense windows flush in the background worker; the
    MoE window falls back to the synchronous path inside async mode).
    on_window sees every window in layer order either way."""
    spec = ModelSpec(
        arch="mixtral", vocab_size=128, d_model=64, n_layers=3, n_heads=4,
        n_kv_heads=2, head_dim=16, d_int=48, max_position_embeddings=128,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(64,) * 3, k_ranks=(32,) * 3, v_ranks=(32,) * 3,
        o_ranks=(64,) * 3, gate_ranks=(96, 48, 96),
        n_experts=4, experts_per_tok=2, moe_layers=(1,),
    )
    params = init_params(spec, jax.random.key(4))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    runs = {}
    for mode in ("on", "off"):
        windows = []
        config = _config(layers_per_step=1, stream_async_flush=mode)
        factors, bi, keep = stream_calibrate_solve(
            spec, params, batches, config,
            on_window=lambda layers, chunk: windows.append(list(layers)),
        )
        runs[mode] = (factors, bi, keep)
        assert windows == [[0], [1], [2]]

    f_on, bi_on, keep_on = runs["on"]
    f_off, bi_off, keep_off = runs["off"]
    assert bi_on == bi_off
    np.testing.assert_array_equal(np.asarray(keep_on), np.asarray(keep_off))
    assert sorted(f_on) == sorted(f_off)
    for s in f_off:
        assert sorted(f_on[s]) == sorted(f_off[s])
        for l in f_off[s]:
            for k, v in f_off[s][l].items():
                np.testing.assert_array_equal(
                    np.asarray(f_on[s][l][k]), np.asarray(v),
                    err_msg=f"{s}[{l}][{k}]",
                )


def test_stream_release_params_equals_keep():
    """release_params=True yields identical factors, pops exactly the
    solver-replaced dense leaves, and surgery on the released tree
    builds the same compressed model as on an untouched tree."""
    from modegpt_tpu.compress.surgery import apply_factors

    spec = _llama_spec()
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    config = _config(layers_per_step=1)

    params_keep = init_params(spec, jax.random.key(0))
    params_rel = init_params(spec, jax.random.key(0))
    f_keep, _, keep = stream_calibrate_solve(spec, params_keep, batches, config)
    f_rel, _, keep_r = stream_calibrate_solve(
        spec, params_rel, batches, config, release_params=True
    )
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep_r))
    for s in f_keep:
        for l in f_keep[s]:
            for k, v in f_keep[s][l].items():
                np.testing.assert_array_equal(
                    np.asarray(f_rel[s][l][k]), np.asarray(v),
                    err_msg=f"{s}[{l}][{k}]",
                )
    for l in range(spec.n_layers):
        lp = params_rel["layers"][l]
        for key in ("q", "k", "v", "o", "up", "gate", "down"):
            assert key not in lp, f"layer {l} still holds dense {key}"
        assert "input_ln" in lp or "ln1" in lp or len(lp) > 0  # norms survive

    cs_keep, cp_keep = apply_factors(
        spec, params_keep, f_keep["mlp"], f_keep["qk"], f_keep["vo"]
    )
    cs_rel, cp_rel = apply_factors(
        spec, params_rel, f_rel["mlp"], f_rel["qk"], f_rel["vo"],
        release_dense=True,  # pops already-released leaves: must no-op
    )
    assert cs_keep == cs_rel
    k_leaves = jax.tree_util.tree_leaves_with_path(cp_keep)
    r_leaves = jax.tree_util.tree_leaves_with_path(cp_rel)
    assert len(k_leaves) == len(r_leaves)
    for (pk, vk), (pr, vr) in zip(k_leaves, r_leaves):
        assert pk == pr
        np.testing.assert_array_equal(np.asarray(vk), np.asarray(vr))


def test_stream_fetch_device_equals_host():
    """stream_fetch='device' keeps factors as device slices and yields
    bit-identical values to the host fetch (fetch is a transport, not a
    numeric path); with release_params the dense leaves pop the same way
    and surgery builds the same compressed model from the in-HBM slices.
    This is the zero-factor-D2H compress-then-serve path for resident
    weights (the host fetch crosses a ~30 MB/s link on tunneled hosts)."""
    from modegpt_tpu.compress.surgery import apply_factors

    spec = _llama_spec()
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    params_h = init_params(spec, jax.random.key(0))
    f_host, _, keep_h = stream_calibrate_solve(
        spec, params_h, batches, _config(layers_per_step=1)
    )
    params_d = init_params(spec, jax.random.key(0))
    f_dev, _, keep_d = stream_calibrate_solve(
        spec, params_d, batches,
        _config(layers_per_step=1, stream_fetch="device"),
        release_params=True,
    )
    np.testing.assert_array_equal(np.asarray(keep_h), np.asarray(keep_d))
    for s in f_host:
        assert sorted(f_dev[s]) == sorted(f_host[s])
        for l in f_host[s]:
            for k, v in f_host[s][l].items():
                dv = f_dev[s][l][k]
                # kernel factors stay on device; idx/rotary_mask/bias are
                # host-side selection metadata on both paths
                if k in ("q", "k", "v", "o", "up", "gate", "down"):
                    assert isinstance(dv, jax.Array), f"{s}[{l}][{k}] left the device"
                np.testing.assert_array_equal(
                    np.asarray(dv), np.asarray(v), err_msg=f"{s}[{l}][{k}]"
                )
    for l in range(spec.n_layers):
        for key in ("q", "k", "v", "o", "up", "gate", "down"):
            assert key not in params_d["layers"][l], f"layer {l} dense {key} survived"

    cs_h, cp_h = apply_factors(
        spec, params_h, f_host["mlp"], f_host["qk"], f_host["vo"]
    )
    cs_d, cp_d = apply_factors(
        spec, params_d, f_dev["mlp"], f_dev["qk"], f_dev["vo"], release_dense=True
    )
    assert cs_h == cs_d
    h_leaves = jax.tree_util.tree_leaves_with_path(cp_h)
    d_leaves = jax.tree_util.tree_leaves_with_path(cp_d)
    assert len(h_leaves) == len(d_leaves)
    for (ph, vh), (pd, vd) in zip(h_leaves, d_leaves):
        assert ph == pd
        np.testing.assert_array_equal(np.asarray(vh), np.asarray(vd))


def test_stream_fetch_device_rejects_host_staged():
    """Beyond-HBM (host-staged) sweeps must refuse device factor fetch:
    accumulating ~keep_ratio x model bytes of factors on device would
    re-fill the HBM the staging exists to avoid."""
    spec = _llama_spec()
    params = _host_params(init_params(spec, jax.random.key(0)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    with pytest.raises(ValueError, match="device-resident"):
        stream_calibrate_solve(
            spec, params, batches, _config(stream_fetch="device"),
            keep_ratios=np.full(spec.n_layers, 0.7),
        )


def test_stream_fetch_device_moe_mixed():
    """Device fetch through the MoE/mixed-stack flush (per-expert phased
    solves) matches the host fetch value-for-value."""
    spec = ModelSpec(
        arch="mixtral", vocab_size=128, d_model=64, n_layers=3, n_heads=4,
        n_kv_heads=2, head_dim=16, d_int=48, max_position_embeddings=128,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(64,) * 3, k_ranks=(32,) * 3, v_ranks=(32,) * 3,
        o_ranks=(64,) * 3, gate_ranks=(96, 48, 96),
        n_experts=4, experts_per_tok=2, moe_layers=(1,),
    )
    params = init_params(spec, jax.random.key(3))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    f_host, _, _ = stream_calibrate_solve(
        spec, params, batches, _config(layers_per_step=1),
        keep_ratios=np.full(spec.n_layers, 0.7),
    )
    f_dev, _, _ = stream_calibrate_solve(
        spec, params, batches, _config(layers_per_step=1, stream_fetch="device"),
        keep_ratios=np.full(spec.n_layers, 0.7),
    )
    for s in f_host:
        for l in f_host[s]:
            for k, v in f_host[s][l].items():
                if f_dev[s][l][k] is None:
                    assert v is None, f"{s}[{l}][{k}]"
                    continue
                np.testing.assert_array_equal(
                    np.asarray(f_dev[s][l][k]), np.asarray(v),
                    err_msg=f"{s}[{l}][{k}]",
                )


def test_compress_in_memory_equals_streamed_surgery():
    """compress_in_memory (the compress-then-serve handoff, zero disk
    and zero factor D2H) builds the same compressed model as the
    explicit streamed sweep + apply_factors flow, and the result runs a
    forward pass."""
    from modegpt_tpu.compress.pipeline import compress_in_memory
    from modegpt_tpu.compress.surgery import apply_factors
    from modegpt_tpu.models.forward import forward

    spec = _llama_spec()
    config = _config(layers_per_step=1)

    params_ref = init_params(spec, jax.random.key(0))
    batches = load_calibration_batches(
        None, "synthetic", config.calib_size, config.calibs_batch_size,
        min(config.seq_len, spec.max_position_embeddings),
        vocab_size=spec.vocab_size,
    )
    f_ref, _, _ = stream_calibrate_solve(spec, params_ref, batches, config)
    cs_ref, cp_ref = apply_factors(
        spec, params_ref, f_ref["mlp"], f_ref["qk"], f_ref["vo"]
    )

    # host-numpy leaves: compress_in_memory must place them itself
    params_mem = _host_params(init_params(spec, jax.random.key(0)))
    cs_mem, cp_mem = compress_in_memory(spec, params_mem, config)
    assert cs_mem == cs_ref
    r_leaves = jax.tree_util.tree_leaves_with_path(cp_ref)
    m_leaves = jax.tree_util.tree_leaves_with_path(cp_mem)
    assert len(r_leaves) == len(m_leaves)
    for (pr, vr), (pm, vm) in zip(r_leaves, m_leaves):
        assert pr == pm
        np.testing.assert_array_equal(np.asarray(vm), np.asarray(vr))

    tokens = np.asarray(batches[0][:1, :16], dtype=np.int32)
    logits, _ = forward(cs_mem, cp_mem, tokens)
    assert logits.shape == (1, 16, spec.vocab_size)
    assert bool(np.isfinite(np.asarray(logits)).all())


def test_stream_pipeline_end_to_end(tmp_path):
    """--calib_exec stream through run_compression: same compressed
    kernels as the default chunked pipeline, factor store populated
    (resume-compatible)."""
    import os

    import transformers
    import torch

    from modegpt_tpu.compress.pipeline import run_compression
    from modegpt_tpu.models import params_from_hf_model

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144, num_hidden_layers=3,
        num_attention_heads=4, num_key_value_heads=2, max_position_embeddings=128,
        tie_word_embeddings=False,
    )
    torch.manual_seed(7)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())

    def mk(sub, **kw):
        return CompressionConfig(
            model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
            seq_len=32, compression_ratio=0.3, sparsity_smoothing=0.5,
            layers_per_step=2, solver_precision="f32_device",
            output_dir=str(tmp_path / sub / "o"),
            temp_storage_dir=str(tmp_path / sub / "l"),
            metrics_dir=str(tmp_path / sub / "m"),
            skip_baseline_eval=True, skip_final_eval=True, **kw,
        )

    ref = run_compression(mk("ref"), spec=spec, params=params, tokenizer=None)
    got = run_compression(
        mk("stream", calib_exec="stream"), spec=spec, params=params, tokenizer=None
    )
    assert got["compressed_spec"].gate_ranks == ref["compressed_spec"].gate_ranks
    assert got["compressed_spec"].q_ranks == ref["compressed_spec"].q_ranks
    for l in range(spec.n_layers):
        for name in ("up", "down", "q", "v"):
            np.testing.assert_allclose(
                np.asarray(got["compressed_params"]["layers"][l][name]["kernel"]),
                np.asarray(ref["compressed_params"]["layers"][l][name]["kernel"]),
                rtol=2e-3, atol=2e-4, err_msg=f"layer {l} {name}",
            )
    store = str(tmp_path / "stream" / "l")
    files = [f for f in os.listdir(store) if f.startswith("layer_")]
    assert len(files) >= 9  # 3 layers x 3 suffixes persisted for resume


def test_stream_pipeline_host_resident(tmp_path):
    """Host-numpy params through the streamed pipeline: surgery runs on
    the CPU backend and the artifact round-trips."""
    from modegpt_tpu.compress.artifact import load_compressed_model
    from modegpt_tpu.compress.pipeline import run_compression

    spec = _llama_spec()
    params = _host_params(init_params(spec, jax.random.key(5)))
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
        seq_len=32, compression_ratio=0.3, sparsity_smoothing=0.5,
        layers_per_step=1, solver_precision="f32_device", calib_exec="stream",
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
        skip_baseline_eval=True, skip_final_eval=True,
    )
    results = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams, _ = load_compressed_model(results["artifact_dir"])
    assert max(cspec.gate_ranks) < spec.d_int
    assert results["params_after"] < results["params_before"]


def test_stream_program_count_is_layer_invariant():
    """Compiled-program count must not scale with layer count: every
    per-window slice/gather/solve is padded onto coarse grids so remote
    backends (one AOT round trip PER signature) compile a bounded set.
    Regression for the signature collapse — before it, the streamed
    pipeline compiled one tiny program per distinct layer rank
    (~O(layers) extra compiles; ~1000 signatures at 7B depth)."""
    from jax._src import monitoring

    def count_compiles(n_layers):
        spec = _llama_spec(n_layers=n_layers)
        params = init_params(spec, jax.random.key(0))
        batches = load_calibration_batches(
            None, "synthetic", 4, 2, 32, vocab_size=128
        )
        config = _config()
        jax.clear_caches()
        n = [0]

        def obs(e, d, **kw):
            if e == "/jax/core/compile/backend_compile_duration":
                n[0] += 1

        monitoring.register_event_duration_secs_listener(obs)
        try:
            stream_calibrate_solve(spec, params, batches, config)
        finally:
            monitoring.unregister_event_duration_listener(obs)
        return n[0]

    base = count_compiles(2)
    deep = count_compiles(5)
    # Guard against vacuous passes: if the (private) jax monitoring
    # event this hooks ever stops firing, fail loudly instead of
    # counting 0 - 0 <= 6.
    assert base > 0, "compile-count event never fired — jax event renamed?"
    # Window flushes at different ranks must reuse programs: allow a few
    # extra signatures (grid boundaries), not one-per-layer growth.
    assert deep - base <= 6, (base, deep)


def test_stream_flush_depth_equals_depth1():
    """stream_flush_depth > 1 (sweep runs ahead of the drain) produces
    bit-identical factors/BI/keep to the default depth-1 double-buffer,
    and the phase-split stats stay coherent (flush_run_s counts every
    window's worker time regardless of depth)."""
    spec = _llama_spec(n_layers=5)
    params = _host_params(init_params(spec, jax.random.key(7)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    runs = {}
    for depth in (1, 3):
        stats = {}
        config = _config(
            layers_per_step=1, stream_async_flush="on", stream_flush_depth=depth
        )
        runs[depth] = stream_calibrate_solve(
            spec, params, batches, config, stats_out=stats
        )
        assert stats["async_flush"] is True
        assert stats["flush_depth"] == depth
        for k in ("stage_s", "sweep_s", "flush_run_s", "flush_wait_s"):
            assert stats[k] >= 0.0, (k, stats[k])
        assert stats["flush_run_s"] > 0.0  # 5 windows actually solved
        # link accounting: host params -> staged bytes cover the BI
        # prepass pass AND the sweep pass (~2x the layer weights)
        assert stats["prepass_s"] > 0.0
        layer_bytes = sum(
            leaf.nbytes
            for lp in params["layers"]
            for leaf in jax.tree_util.tree_leaves(lp)
        )
        assert stats["staged_bytes"] >= 2 * layer_bytes, (
            stats["staged_bytes"], layer_bytes,
        )

    f1, bi1, keep1 = runs[1]
    f3, bi3, keep3 = runs[3]
    assert bi1 == bi3
    np.testing.assert_array_equal(np.asarray(keep1), np.asarray(keep3))
    assert sorted(f1) == sorted(f3)
    for s in f1:
        assert sorted(f1[s]) == sorted(f3[s])
        for l in f1[s]:
            for k, v in f1[s][l].items():
                np.testing.assert_array_equal(
                    np.asarray(f3[s][l][k]), np.asarray(v),
                    err_msg=f"{s}[{l}][{k}]",
                )


def test_async_flush_hbm_gate():
    """'auto' async flush is gated on the coarse HBM estimate: a tight
    budget forces sync (the 32B-geometry OOM), a roomy one overlaps, an
    unknown budget (CPU) never gates, and 'on' bypasses the gate."""
    from modegpt_tpu.compress import offload

    spec = _llama_spec(n_layers=4)
    params = _host_params(init_params(spec, jax.random.key(3)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    est_sync = offload._flush_hbm_estimate(spec, 10_000, 1_000, 1, overlap=False)
    est_async = offload._flush_hbm_estimate(spec, 10_000, 1_000, 1, overlap=True)
    assert est_async > est_sync > 0
    assert offload._async_flush_fits(spec, 10_000, 1_000, 1, None)  # unknown budget
    assert offload._async_flush_fits(spec, 10_000, 1_000, 1, 100 * est_async)
    assert not offload._async_flush_fits(spec, 10_000, 1_000, 1, est_async)  # > 0.75x

    ref = stream_calibrate_solve(spec, params, batches, _config(layers_per_step=1))

    orig = offload._device_hbm_bytes
    offload._device_hbm_bytes = lambda: 1  # everything is too big
    try:
        stats = {}
        gated = stream_calibrate_solve(
            spec, params, batches,
            _config(layers_per_step=1, stream_async_flush="auto"),
            stats_out=stats,
        )
        assert stats["async_flush"] is False  # gate forced sync
        stats_on = {}
        forced = stream_calibrate_solve(
            spec, params, batches,
            _config(layers_per_step=1, stream_async_flush="on"),
            stats_out=stats_on,
        )
        assert stats_on["async_flush"] is True  # 'on' bypasses the gate
    finally:
        offload._device_hbm_bytes = orig

    for run in (gated, forced):
        f_ref, bi_ref, keep_ref = ref
        f, bi, keep = run
        assert bi == bi_ref
        np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep_ref))
        for s in f_ref:
            for l in f_ref[s]:
                for k, v in f_ref[s][l].items():
                    np.testing.assert_array_equal(np.asarray(f[s][l][k]), np.asarray(v))


def test_async_flush_oom_falls_back_to_sync():
    """A worker-side RESOURCE_EXHAUSTED during an async window flush is
    retried synchronously and disables async for the rest of the sweep —
    the job completes with factors identical to a clean run."""
    from modegpt_tpu.compress import batched as batched_mod

    spec = _llama_spec(n_layers=4)
    params = _host_params(init_params(spec, jax.random.key(5)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    ref = stream_calibrate_solve(
        spec, params, batches, _config(layers_per_step=1, stream_async_flush="on")
    )

    orig = batched_mod.solve_chunk_batched
    state = {"calls": 0}

    def flaky(*args, **kwargs):
        state["calls"] += 1
        if state["calls"] == 1:
            raise RuntimeError("RESOURCE_EXHAUSTED: TPU backend error (injected)")
        return orig(*args, **kwargs)

    batched_mod.solve_chunk_batched = flaky
    try:
        stats = {}
        f, bi, keep = stream_calibrate_solve(
            spec, params, batches,
            _config(layers_per_step=1, stream_async_flush="on"),
            stats_out=stats,
        )
    finally:
        batched_mod.solve_chunk_batched = orig

    assert state["calls"] >= 5  # 4 windows + the injected failure
    assert stats["async_flush"] is False  # flipped off by the fallback
    f_ref, bi_ref, keep_ref = ref
    assert bi == bi_ref
    np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep_ref))
    for s in f_ref:
        assert sorted(f[s]) == sorted(f_ref[s])
        for l in f_ref[s]:
            for k, v in f_ref[s][l].items():
                np.testing.assert_array_equal(
                    np.asarray(f[s][l][k]), np.asarray(v), err_msg=f"{s}[{l}][{k}]"
                )


def test_bi_stage_dtype_allocation_deviation():
    """Quantized BI-prepass staging (int8/int4) must reproduce the exact
    prepass's allocation to within a few rank units: BI feeds only the
    smoothed-softmax layer allocator (reference: compression_utils.py:
    102-104), so sub-percent forward error from per-row weight
    quantization must not move keep ratios materially. Also checks the
    staged-byte accounting reflects the 2x/4x link cut."""
    from modegpt_tpu.compress.surgery import compress_ranks_for_layer

    spec = _llama_spec(n_layers=4)
    params = _host_params(init_params(spec, jax.random.key(11)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    runs = {}
    for dtype in ("bf16", "int8", "int4"):
        stats = {}
        bi = stream_bi_sweep(
            spec, params, batches, stats_out=stats, stage_dtype=dtype
        )
        runs[dtype] = (np.asarray(bi), stats["staged_bytes"])

    bi_ref, bytes_ref = runs["bf16"]
    for dtype, max_rel in (("int8", 0.05), ("int4", 0.25)):
        bi_q, bytes_q = runs[dtype]
        assert np.all(np.isfinite(bi_q))
        # BI itself moves by at most a few percent of its magnitude
        np.testing.assert_allclose(
            bi_q, bi_ref, rtol=max_rel, atol=max_rel * float(np.abs(bi_ref).mean()),
            err_msg=dtype,
        )
        # ...and the allocation built from it moves by at most a couple
        # of rank units per layer
        keep_ref, _ = allocate_keep_ratios(bi_ref.tolist(), 0.3, 0.5, 0.8)
        keep_q, _ = allocate_keep_ratios(bi_q.tolist(), 0.3, 0.5, 0.8)
        for l in range(spec.n_layers):
            r_ref = compress_ranks_for_layer(spec, float(keep_ref[l]), "mlp")
            r_q = compress_ranks_for_layer(spec, float(keep_q[l]), "mlp")
            assert abs(r_ref - r_q) <= max(4, int(0.02 * spec.d_int)), (
                dtype, l, r_ref, r_q,
            )
        # link accounting: the weight payload shrinks ~2x (int8) / ~4x
        # (int4); small leaves (norms, scales) keep it from being exact
        shrink = bytes_ref / bytes_q
        assert shrink > (1.6 if dtype == "int8" else 2.6), (dtype, shrink)


def test_bi_stage_dtype_auto_resolution():
    """'auto' stays exact (bf16) on CPU even for host-staged weights —
    quantized prepass staging exists for link-bound accelerator
    backends; the stats record what ran."""
    spec = _llama_spec()
    params = _host_params(init_params(spec, jax.random.key(12)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    stats = {}
    stream_calibrate_solve(
        spec, params, batches, _config(layers_per_step=1), stats_out=stats
    )
    assert stats["bi_stage_dtype"] == "bf16"

    # forced int8 is honoured and still produces a complete solve
    stats8 = {}
    f, bi, keep = stream_calibrate_solve(
        spec, params, batches, _config(layers_per_step=1, bi_stage_dtype="int8"),
        stats_out=stats8,
    )
    assert stats8["bi_stage_dtype"] == "int8"
    assert sorted(f["mlp"]) == [0, 1, 2]
    assert all(np.isfinite(bi))


def test_host_sliced_factors_bit_equal_and_skip_link():
    """solve_chunk_batched with host_params gathers up/gate/q/k from the
    host tree: factors must be bit-identical to the device-fetch path,
    and the _fetch byte counter must show the up/gate/q/k transfers
    gone (only down + vo kernels cross)."""
    from modegpt_tpu.compress import batched as batched_mod

    spec = _llama_spec()
    params = init_params(spec, jax.random.key(13))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    config = _config(layers_per_step=3)
    calib = calibrate(spec, params, batches, list(range(3)), accumulate="device")
    keep, _ = allocate_keep_ratios(calib.bi_scores, 0.3, 0.5, 0.8)
    keep = np.asarray(keep)

    host_view = {l: _host_params(params["layers"][l]) for l in range(3)}

    b0 = batched_mod.FETCHED_BYTES.total
    ref = solve_chunk_batched(
        spec, params, list(range(3)), keep, calib, config, "mlp,qk,vo"
    )
    fetched_ref = batched_mod.FETCHED_BYTES.total - b0

    b1 = batched_mod.FETCHED_BYTES.total
    got = solve_chunk_batched(
        spec, params, list(range(3)), keep, calib, config, "mlp,qk,vo",
        host_params=host_view,
    )
    fetched_host = batched_mod.FETCHED_BYTES.total - b1

    for s in ("mlp", "qk", "vo"):
        for l in range(3):
            for k, v in ref[s][l].items():
                np.testing.assert_array_equal(
                    np.asarray(got[s][l][k]), np.asarray(v),
                    err_msg=f"{s}[{l}][{k}]",
                )
    # up+gate+q+k dominate the factor bytes at 0.3 ratio; host slicing
    # must delete them from the link (vo v/o + mlp down remain)
    assert fetched_host < 0.6 * fetched_ref, (fetched_host, fetched_ref)


def test_chunked_host_resident_autodetects_host_slices():
    """Host-numpy params through solve_chunk_batched (no explicit
    host_params) auto-detect and reconstruct — factors equal the device
    path's."""
    spec = _llama_spec()
    params = init_params(spec, jax.random.key(14))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
    config = _config(layers_per_step=3)
    calib = calibrate(spec, params, batches, list(range(3)), accumulate="device")
    keep = np.asarray(allocate_keep_ratios(calib.bi_scores, 0.3, 0.5, 0.8)[0])

    ref = solve_chunk_batched(
        spec, params, list(range(3)), keep, calib, config, "mlp,qk,vo"
    )
    got = solve_chunk_batched(
        spec, _host_params(params), list(range(3)), keep, calib, config, "mlp,qk,vo"
    )
    for s in ("mlp", "qk", "vo"):
        for l in range(3):
            for k, v in ref[s][l].items():
                np.testing.assert_array_equal(
                    np.asarray(got[s][l][k]), np.asarray(v),
                    err_msg=f"{s}[{l}][{k}]",
                )


def test_hbm_from_device_kind_table():
    """Backends with no memory_stats but a recognisable device_kind get
    an HBM budget from the capacity table (VERDICT r4 weak-3: the
    tunneled v5e reports 'TPU v5 lite' and no bytes_limit, so the auto
    flush-depth gate never engaged where it was built to)."""
    from unittest import mock

    from modegpt_tpu.compress import offload

    cases = {
        "TPU v5 lite": 16 << 30,
        "TPU v5e": 16 << 30,
        "TPU v5p": 95 << 30,
        "TPU v4": 32 << 30,
        "TPU v6 lite": 32 << 30,
        "cpu": None,  # virtual-device tests must stay ungated
    }
    for kind, want in cases.items():
        dev = mock.Mock()
        dev.device_kind = kind
        with mock.patch.object(offload.jax, "devices", return_value=[dev]):
            assert offload._hbm_from_device_kind() == want, kind


def test_async_flush_fit_fractions():
    """Depth-1 async uses the capture-calibrated 0.85 margin (r03 32B ran
    async at 0.78x HBM successfully); depth-2 keeps the conservative 0.75
    (its mis-estimate really did OOM a 32B flush)."""
    from modegpt_tpu.compress import offload

    spec = _llama_spec()
    est1 = offload._flush_hbm_estimate(spec, 10_000, 1_000, 1, overlap=True, depth=1)
    est2 = offload._flush_hbm_estimate(spec, 10_000, 1_000, 1, overlap=True, depth=2)
    assert est2 > est1
    # budget where est1 is exactly 0.80x: depth-1 passes, a same-estimate
    # depth-2 budget at 0.80x would fail its 0.75 line
    budget = int(est1 / 0.80)
    assert offload._async_flush_fits(spec, 10_000, 1_000, 1, budget, depth=1)
    assert not offload._async_flush_fits(
        spec, 10_000, 1_000, 1, int(est2 / 0.80), depth=2
    )
    # sanity: generous budgets pass both, tight budgets fail both
    assert offload._async_flush_fits(spec, 10_000, 1_000, 1, 100 * est2, depth=2)
    assert not offload._async_flush_fits(spec, 10_000, 1_000, 1, est1 // 2, depth=1)


def test_slim_window_keeps_qk_for_svd_non_rope():
    """A host-staged streamed window at lowmem scale drops the q/k staged
    leaves ONLY when the QK solver reconstructs from host rows — the
    whitened-SVD solver (qk_method='svd', non-RoPE archs) reads the
    staged kernels directly and must keep them (ADVICE r4 medium-2)."""
    import dataclasses

    from modegpt_tpu.compress import offload

    big = 20_000  # gate_ranks^2 * 4 > _LOWMEM_COV_BYTES (4e8)
    rope_spec = dataclasses.replace(_llama_spec(), gate_ranks=(big,) * 3)
    opt_spec = dataclasses.replace(
        _llama_spec(), arch="opt", gate_ranks=(big,) * 3
    )
    lp = {k: object() for k in ("q", "k", "v", "o", "up", "gate", "down")}

    # RoPE arch (host-reconstructed q/k rows): q/k dropped
    slim = offload._slim_window_lp(rope_spec, 0, lp, True, _config())
    assert set(slim) == {"down", "v", "o"}
    # non-RoPE + qk_method='svd': q/k survive the slim
    slim_svd = offload._slim_window_lp(
        opt_spec, 0, lp, True, _config(qk_method="svd")
    )
    assert set(slim_svd) == {"down", "v", "o", "q", "k"}
    # non-RoPE with the default CR method still reconstructs host-side
    slim_cr = offload._slim_window_lp(opt_spec, 0, lp, True, _config())
    assert set(slim_cr) == {"down", "v", "o"}
    # not host-staged / small d_int: untouched
    assert offload._slim_window_lp(rope_spec, 0, lp, False, _config()) is lp
    assert offload._slim_window_lp(_llama_spec(), 0, lp, True, _config()) is lp


class TestDropRecovery:
    """In-process tunnel-drop recovery (offload._reset_backend /
    stream_checkpoint_every): the sweeps snapshot stacks to host, catch
    UNAVAILABLE backend errors, reconnect, resume from the snapshot, and
    produce results identical to an undisturbed run. (Two flagship
    captures died to real drops; with journal compaction there is no
    transport replay, so recovery must live in the sweep.)"""

    def _inject_drop(self, monkeypatch, at_call, n_drops=1):
        """Make _stream_layer_step raise an UNAVAILABLE error starting
        at its ``at_call``-th invocation, ``n_drops`` times (counted
        by invocation because uniform stacks share one rep index)."""
        from modegpt_tpu.compress import offload

        orig = offload._stream_layer_step
        state = {"left": n_drops, "calls": 0}

        def flaky(spec, lp, stack, rep, collect, attn, gram):
            state["calls"] += 1
            if state["calls"] >= at_call and state["left"] > 0:
                state["left"] -= 1
                raise RuntimeError(
                    "UNAVAILABLE: TPU backend connection dropped; cannot replay"
                )
            return orig(spec, lp, stack, rep, collect, attn, gram)

        monkeypatch.setattr(offload, "_stream_layer_step", flaky)
        monkeypatch.setattr(offload, "_reset_backend", lambda: None)
        return state

    def test_sweep_resumes_identically(self, monkeypatch):
        spec = _llama_spec(n_layers=5)
        params = init_params(spec, jax.random.key(7))
        batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)
        config = _config(layers_per_step=1, stream_checkpoint_every=2)

        ref = stream_calibrate_solve(
            spec, _host_params(params), batches, _config(layers_per_step=1)
        )

        state = self._inject_drop(monkeypatch, at_call=7)
        stats = {}
        got = stream_calibrate_solve(
            spec, _host_params(params), batches, config, stats_out=stats
        )
        assert state["left"] == 0  # the drop really fired
        assert stats.get("drop_recoveries") == 1
        f_ref, bi_ref, keep_ref = ref
        f, bi, keep = got
        assert bi == bi_ref
        np.testing.assert_array_equal(np.asarray(keep), np.asarray(keep_ref))
        for s in f_ref:
            for l in f_ref[s]:
                for k, v in f_ref[s][l].items():
                    np.testing.assert_array_equal(
                        np.asarray(f[s][l][k]), np.asarray(v),
                        err_msg=f"{s}[{l}][{k}]",
                    )

    def test_sweep_release_backlog_still_releases(self, monkeypatch):
        """With release_params=True the deferral must not leak: after the
        run, solved projections are popped exactly as without recovery."""
        spec = _llama_spec(n_layers=4)
        params = init_params(spec, jax.random.key(8))
        batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

        hp_ref = _host_params(params)
        stream_calibrate_solve(
            spec, hp_ref, batches, _config(layers_per_step=1),
            release_params=True,
        )
        self._inject_drop(monkeypatch, at_call=5)
        hp = _host_params(params)
        stream_calibrate_solve(
            spec, hp, batches,
            _config(layers_per_step=1, stream_checkpoint_every=2),
            release_params=True,
        )
        for l in range(4):
            assert set(hp["layers"][l]) == set(hp_ref["layers"][l]), l

    def test_prepass_resumes_identically(self, monkeypatch):
        from modegpt_tpu.compress import offload

        spec = _llama_spec(n_layers=5)
        params = _host_params(init_params(spec, jax.random.key(9)))
        batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

        ref = offload.stream_bi_sweep(spec, params, batches, "xla")
        # one stack group x 5 layers = 5 calls; fire at layer 3 (past
        # the layer-2 checkpoint)
        state = self._inject_drop(monkeypatch, at_call=4)
        stats = {}
        got = offload.stream_bi_sweep(
            spec, params, batches, "xla", stats_out=stats,
            config=_config(stream_checkpoint_every=2),
        )
        assert state["left"] == 0
        assert stats.get("prepass_drop_recoveries") == 1
        assert got == ref

    def test_non_drop_errors_still_raise(self, monkeypatch):
        from modegpt_tpu.compress import offload

        spec = _llama_spec(n_layers=3)
        params = _host_params(init_params(spec, jax.random.key(10)))
        batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

        orig = offload._stream_layer_step
        calls = {"n": 0}

        def broken(spec_, lp, stack, rep, collect, attn, gram):
            calls["n"] += 1
            if calls["n"] == 2:
                raise ValueError("a real bug, not a drop")
            return orig(spec_, lp, stack, rep, collect, attn, gram)

        monkeypatch.setattr(offload, "_stream_layer_step", broken)
        monkeypatch.setattr(offload, "_reset_backend", lambda: None)
        with pytest.raises(ValueError, match="real bug"):
            stream_calibrate_solve(
                spec, params, batches,
                _config(layers_per_step=1, stream_checkpoint_every=2),
            )

    def test_retries_exhausted_raises(self, monkeypatch):
        spec = _llama_spec(n_layers=3)
        params = _host_params(init_params(spec, jax.random.key(11)))
        batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

        self._inject_drop(monkeypatch, at_call=3, n_drops=99)
        with pytest.raises(RuntimeError, match="UNAVAILABLE"):
            stream_calibrate_solve(
                spec, params, batches,
                _config(layers_per_step=1, stream_checkpoint_every=1),
            )


def test_adaptive_probe_int4_arm(monkeypatch):
    """When int8 staging beats raw (link-bound session), the adaptive
    prepass probe also measures int4 and commits to the cheapest; BI
    scores stay within the quantized-staging tolerance."""
    import time as _t

    from modegpt_tpu.compress import offload

    spec = _llama_spec(n_layers=4)
    params = _host_params(init_params(spec, jax.random.key(12)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    ref = offload.stream_bi_sweep(spec, params, batches, "xla")

    orig_stage, orig_q = offload._stage, offload._stage_quantized

    def slow_stage(lp, stats=None):
        _t.sleep(2.0)
        return orig_stage(lp, stats)

    def q_stage(lp, dtype, stats=None):
        # sleeps dominate the tiny-tensor quantize/compile costs so the
        # probe decision is deterministic: raw 2.0 > int8 0.8 > int4 0.2
        _t.sleep(0.8 if dtype == "int8" else 0.2)
        return orig_q(lp, dtype, stats)

    monkeypatch.setattr(offload, "_stage", slow_stage)
    monkeypatch.setattr(offload, "_stage_quantized", q_stage)
    stats = {}
    bi = offload.stream_bi_sweep(
        spec, params, batches, "xla", stats_out=stats,
        stage_dtype="int8", adaptive=True,
    )
    assert stats["bi_stage_dtype"] == "int4"
    assert set(stats["bi_stage_probe_s"]) == {"bf16", "quantized", "quantized_int4"}
    # int4-staged BI must still produce a usable ranking (bounded dev)
    r, g = np.asarray(ref), np.asarray(bi)
    assert np.all(np.abs(g - r) / (np.abs(r) + 1e-9) < 0.2)


def test_adaptive_probe_raw_wins(monkeypatch):
    """Raw staging cheaper -> bf16 chosen, no int4 arm probed."""
    import time as _t

    from modegpt_tpu.compress import offload

    spec = _llama_spec(n_layers=4)
    params = _host_params(init_params(spec, jax.random.key(13)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    orig_q = offload._stage_quantized

    def q_slow(lp, dtype, stats=None):
        _t.sleep(2.0)
        return orig_q(lp, dtype, stats)

    monkeypatch.setattr(offload, "_stage_quantized", q_slow)
    stats = {}
    offload.stream_bi_sweep(
        spec, params, batches, "xla", stats_out=stats,
        stage_dtype="int8", adaptive=True,
    )
    assert stats["bi_stage_dtype"] == "bf16"
    assert "quantized_int4" not in stats["bi_stage_probe_s"]


def test_sync_flush_oom_retries_with_native_cholesky(monkeypatch):
    """A RESOURCE_EXHAUSTED on a SYNC window flush (the MoE memory-tight
    case) retries once with caches cleared and the recursive Cholesky
    disabled, instead of killing the hour-scale job."""
    from modegpt_tpu.compress import batched as batched_mod
    from modegpt_tpu.compress import offload

    spec = _llama_spec(n_layers=3)
    params = _host_params(init_params(spec, jax.random.key(15)))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 32, vocab_size=128)

    ref = stream_calibrate_solve(
        spec, params, batches, _config(layers_per_step=1, stream_async_flush="off")
    )

    orig = batched_mod.solve_chunk_batched
    state = {"calls": 0}

    def flaky(*args, **kwargs):
        state["calls"] += 1
        if state["calls"] == 2:
            raise RuntimeError("RESOURCE_EXHAUSTED: out of memory (injected)")
        return orig(*args, **kwargs)

    monkeypatch.setattr(batched_mod, "solve_chunk_batched", flaky)
    monkeypatch.delenv("MODEGPT_CHOL_RECURSIVE", raising=False)
    got = stream_calibrate_solve(
        spec, params, batches, _config(layers_per_step=1, stream_async_flush="off")
    )
    assert state["calls"] >= 4  # retry really happened
    import os

    assert os.environ.get("MODEGPT_CHOL_RECURSIVE") == "0"
    monkeypatch.setenv("MODEGPT_CHOL_RECURSIVE", "1")  # restore for later tests
    f_ref, bi_ref, keep_ref = ref
    f, bi, keep = got
    assert bi == bi_ref
    for s in f_ref:
        for l in f_ref[s]:
            for k, v in f_ref[s][l].items():
                np.testing.assert_array_equal(
                    np.asarray(f[s][l][k]), np.asarray(v), err_msg=f"{s}[{l}][{k}]"
                )
