"""Mesh-parallel execution tests on 8 virtual CPU devices."""

import jax
import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from modegpt_tpu.calib.data import load_calibration_batches
from modegpt_tpu.calib.engine import calibrate
from modegpt_tpu.compress.pipeline import run_compression
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models import forward, params_from_hf_model
from modegpt_tpu.parallel.mesh import make_mesh, param_shardings, parse_mesh_shape


def _tiny_llama(seed=0):
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
    )
    torch.manual_seed(seed)
    return transformers.LlamaForCausalLM(cfg).eval()


def test_parse_and_make_mesh():
    assert parse_mesh_shape("data:4,model:2") == {"data": 4, "model": 2}
    mesh = make_mesh("data:4,model:2")
    assert mesh.shape == {"data": 4, "model": 2}
    assert make_mesh("", devices=jax.devices()[:1]) is None
    assert make_mesh("") is None  # explicit opt-in only
    with pytest.raises(ValueError):
        make_mesh("data:64")


def test_tp_forward_matches_single_device(rng):
    """Megatron-sharded forward must equal the unsharded one."""
    spec, params = params_from_hf_model(_tiny_llama())
    ids = rng.integers(0, 128, size=(4, 16)).astype(np.int32)
    ref, _ = forward(spec, params, jnp.asarray(ids))

    mesh = make_mesh("data:2,model:4")
    sharded = jax.device_put(params, param_shardings(mesh, spec, params))
    got, _ = forward(spec, sharded, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-4, atol=2e-4)


def test_mesh_calibration_matches_single_device():
    spec, params = params_from_hf_model(_tiny_llama(seed=1))
    batches = load_calibration_batches(None, "synthetic", 8, 4, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, [0, 1], accumulate="host")

    mesh = make_mesh("data:4")
    sharded = jax.device_put(params, param_shardings(mesh, spec, params))
    got = calibrate(spec, sharded, batches, [0, 1], mesh=mesh, accumulate="host")
    for l in (0, 1):
        np.testing.assert_allclose(got.cov_mlp[l], ref.cov_mlp[l], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_x[l], ref.cov_x[l], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=1e-5)


def test_pipeline_on_mesh_matches_single_device(tmp_path):
    """Full pipeline on a dp x tp mesh == single-device pipeline."""
    model = _tiny_llama(seed=2)
    spec, params = params_from_hf_model(model)

    def cfg(sub):
        return CompressionConfig(
            model="mem", dataset="synthetic", calib_size=8, calibs_batch_size=4,
            seq_len=32, eval_batch_size=4, eval_max_samples=8,
            compression_ratio=0.3, sparsity_smoothing=0.5,
            output_dir=str(tmp_path / sub / "o"), temp_storage_dir=str(tmp_path / sub / "l"),
            metrics_dir=str(tmp_path / sub / "m"), solver_precision="f32_device",
        )

    r_single = run_compression(cfg("single"), spec=spec, params=params, tokenizer=None)
    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    r_mesh = run_compression(cfg("mesh"), spec=spec, params=params, tokenizer=None, mesh=mesh)

    assert abs(r_mesh["compressed_ppl"] - r_single["compressed_ppl"]) < 2e-3 * r_single["compressed_ppl"]
    assert r_mesh["compressed_spec"].gate_ranks == r_single["compressed_spec"].gate_ranks


def test_sequence_parallel_calibration_matches():
    """Sequence-sharded calibration (dp x sp mesh) == single-device."""
    spec, params = params_from_hf_model(_tiny_llama(seed=3))
    batches = load_calibration_batches(None, "synthetic", 4, 2, 64, vocab_size=128)
    ref = calibrate(spec, params, batches, [0], accumulate="host")

    mesh = make_mesh("data:2,model:4")
    sharded = jax.device_put(params, param_shardings(mesh, spec, params))
    got = calibrate(spec, sharded, batches, [0], mesh=mesh, accumulate="host",
                    shard_sequence=True)
    np.testing.assert_allclose(got.cov_mlp[0], ref.cov_mlp[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.cov_q[0], ref.cov_q[0], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=1e-5)


def test_pipeline_parallel_calibration_matches():
    """GPipe-staged calibration (stage mesh, ppermute boundary flow) must
    reproduce the single-device statistics for every layer."""
    from modegpt_tpu.parallel.pp import calibrate_pp, supports_pp

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
    )
    torch.manual_seed(7)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    batches = load_calibration_batches(None, "synthetic", 12, 2, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, list(range(4)), accumulate="host")

    mesh = make_mesh("stage:4")
    assert supports_pp(spec, mesh)
    got = calibrate_pp(spec, params, batches, mesh)
    for l in range(4):
        for name in ("cov_mlp", "cov_q", "cov_k", "cov_x"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)[l]), np.asarray(getattr(ref, name)[l]),
                rtol=1e-5, atol=1e-6,
            )
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=1e-5)


def test_pipeline_parallel_end_to_end_matches(tmp_path):
    """Full compression with PP calibration == single-device compression."""
    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
    )
    torch.manual_seed(8)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())

    def cfg_for(sub):
        return CompressionConfig(
            model="mem", dataset="synthetic", calib_size=8, calibs_batch_size=2,
            seq_len=32, eval_batch_size=4, eval_max_samples=8,
            compression_ratio=0.3, sparsity_smoothing=0.3,
            output_dir=str(tmp_path / sub / "o"), temp_storage_dir=str(tmp_path / sub / "l"),
            metrics_dir=str(tmp_path / sub / "m"), solver_precision="f32_device",
        )

    r_single = run_compression(cfg_for("single"), spec=spec, params=params, tokenizer=None)
    mesh = make_mesh("stage:4")
    r_pp = run_compression(cfg_for("pp"), spec=spec, params=params, tokenizer=None, mesh=mesh)
    assert (
        abs(r_pp["compressed_ppl"] - r_single["compressed_ppl"])
        < 2e-3 * r_single["compressed_ppl"]
    )
    assert r_pp["compressed_spec"].gate_ranks == r_single["compressed_spec"].gate_ranks


def test_tp_generation_matches_single_device(rng):
    """KV-cache generation with Megatron-sharded params + head-sharded
    caches == unsharded generation (GSPMD propagates through the decode)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from modegpt_tpu.models.generate import generate

    spec, params = params_from_hf_model(_tiny_llama(seed=4))
    ids = rng.integers(0, 128, size=(2, 5)).astype(np.int32)
    ref = np.asarray(generate(spec, params, ids, max_new_tokens=6, temperature=0.0))

    mesh = make_mesh("data:2,model:4")
    sharded = jax.device_put(params, param_shardings(mesh, spec, params))
    got = np.asarray(generate(spec, sharded, ids, max_new_tokens=6, temperature=0.0))
    np.testing.assert_array_equal(got, ref)


def test_layer_sharded_stats_accumulators():
    """shard_stats=True (reduce-scatter over the layer-stack axis) must
    produce the same statistics as replicated accumulation."""
    spec, params = params_from_hf_model(_tiny_llama(seed=5))
    batches = load_calibration_batches(None, "synthetic", 8, 4, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, [0, 1], accumulate="host")

    mesh = make_mesh("data:2,model:2", devices=jax.devices()[:4])
    sharded = jax.device_put(params, param_shardings(mesh, spec, params))
    got = calibrate(
        spec, sharded, batches, [0, 1], mesh=mesh, accumulate="host", shard_stats=True
    )
    for l in (0, 1):
        np.testing.assert_allclose(got.cov_mlp[l], ref.cov_mlp[l], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_x[l], ref.cov_x[l], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_q[l], ref.cov_q[l], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=1e-5)

    # device-accumulate mode keeps the shards resident; results identical too
    got_dev = calibrate(
        spec, sharded, batches, [0, 1], mesh=mesh, accumulate="device", shard_stats=True
    )
    for l in (0, 1):
        np.testing.assert_allclose(
            np.asarray(got_dev.cov_mlp[l]), ref.cov_mlp[l], rtol=2e-4, atol=2e-4
        )


def test_pipeline_parallel_with_data_axis():
    """stage x data 2D mesh: each data shard pipelines its slice of every
    microbatch; Grams psum over data — identical statistics."""
    from modegpt_tpu.parallel.pp import calibrate_pp, supports_pp

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
    )
    torch.manual_seed(9)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    batches = load_calibration_batches(None, "synthetic", 12, 4, 32, vocab_size=128)
    ref = calibrate(spec, params, batches, list(range(4)), accumulate="host")

    mesh = make_mesh("stage:4,data:2")
    assert supports_pp(spec, mesh)
    got = calibrate_pp(spec, params, batches, mesh)
    for l in range(4):
        for name in ("cov_mlp", "cov_q", "cov_k", "cov_x"):
            np.testing.assert_allclose(
                np.asarray(getattr(got, name)[l]), np.asarray(getattr(ref, name)[l]),
                rtol=1e-5, atol=1e-6,
            )
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=1e-5)


def test_pipeline_parallel_perplexity_matches():
    """Stage-sharded eval: PP perplexity == single-device perplexity."""
    from modegpt_tpu.evals.perplexity import compute_perplexity
    from modegpt_tpu.parallel.pp import perplexity_pp

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
    )
    torch.manual_seed(10)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    tokens = np.random.default_rng(3).integers(0, 128, size=(8, 32)).astype(np.int32)

    ref = compute_perplexity(spec, params, tokens, 4, progress=False)
    for shape in ("stage:4", "stage:4,data:2"):
        got = perplexity_pp(spec, params, tokens, make_mesh(shape), batch_size=4)
        np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_pipeline_parallel_perplexity_padded_compressed(tmp_path):
    """PP eval of a heterogeneous COMPRESSED model via its padded stack."""
    from modegpt_tpu.evals.perplexity import compute_perplexity
    from modegpt_tpu.models.padded import pad_to_uniform
    from modegpt_tpu.parallel.pp import perplexity_pp

    cfg = transformers.LlamaConfig(
        vocab_size=128, hidden_size=64, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=8, num_key_value_heads=4, max_position_embeddings=128,
    )
    torch.manual_seed(11)
    spec, params = params_from_hf_model(transformers.LlamaForCausalLM(cfg).eval())
    config = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2, seq_len=32,
        compression_ratio=0.3, sparsity_smoothing=0.1,
        output_dir=str(tmp_path / "o"), temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"), skip_baseline_eval=True, skip_final_eval=True,
    )
    res = run_compression(config, spec=spec, params=params, tokenizer=None)
    cspec, cparams = res["compressed_spec"], res["compressed_params"]
    assert not cspec.is_uniform  # genuinely heterogeneous

    tokens = np.random.default_rng(4).integers(0, 128, size=(8, 32)).astype(np.int32)
    ref = compute_perplexity(cspec, cparams, tokens, 4, progress=False, exec_mode="unrolled")
    got = perplexity_pp(
        cspec, cparams, tokens, make_mesh("stage:4"), batch_size=4,
        padded=pad_to_uniform(cspec, cparams),
    )
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_pipeline_parallel_eval_gemma_scaled_embeddings(rng):
    """perplexity_pp must apply gemma's sqrt(d_model) embedding scaling
    (regression: the staged eval's embed_fn once skipped it)."""
    import jax
    import numpy as np
    import pytest

    transformers = pytest.importorskip("transformers")
    torch = pytest.importorskip("torch")

    from modegpt_tpu.evals.perplexity import compute_perplexity
    from modegpt_tpu.models import params_from_hf_model
    from modegpt_tpu.parallel.mesh import make_mesh
    from modegpt_tpu.parallel.pp import perplexity_pp, supports_pp

    cfg = transformers.GemmaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128, num_hidden_layers=2,
        num_attention_heads=4, num_key_value_heads=2, head_dim=32,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    m = transformers.GemmaForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    mesh = make_mesh("stage:2")
    assert supports_pp(spec, mesh)

    tokens = rng.integers(0, spec.vocab_size, size=(4, 32)).astype(np.int32)
    ref = compute_perplexity(spec, params, tokens, batch_size=2)
    got = perplexity_pp(spec, params, tokens, mesh, batch_size=2)
    np.testing.assert_allclose(got, ref, rtol=1e-4)


# ---- context-parallel ring-attention calibration (parallel/ring.py) ----


def test_ring_attention_matches_xla():
    """Ring attention inside shard_map over a context axis must equal
    full causal attention (GQA grouping, global-position masking)."""
    from jax.sharding import Mesh, PartitionSpec as P

    from modegpt_tpu.models.forward import _attention
    from modegpt_tpu.parallel.ring import CTX_AXIS, ring_attention

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(0)
    B, H, Hk, T, hd = 2, 4, 2, 64, 16
    q = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, Hk, T, hd)).astype(np.float32)
    v = rng.standard_normal((B, Hk, T, hd)).astype(np.float32)
    scale = hd**-0.5
    ref = _attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, None, "xla")

    mesh = Mesh(np.asarray(jax.devices()[:8]), (CTX_AXIS,))
    f = jax.jit(
        shard_map(
            lambda q, k, v: ring_attention(q, k, v, scale),
            mesh=mesh,
            in_specs=(P(None, None, CTX_AXIS), P(None, None, CTX_AXIS),
                      P(None, None, CTX_AXIS)),
            out_specs=P(None, None, CTX_AXIS),
        )
    )
    got = f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_ring_attention_sliding_window():
    from jax.sharding import Mesh, PartitionSpec as P

    from modegpt_tpu.models.forward import _attention
    from modegpt_tpu.parallel.ring import CTX_AXIS, ring_attention

    try:
        from jax import shard_map
    except ImportError:
        from jax.experimental.shard_map import shard_map

    rng = np.random.default_rng(1)
    B, H, T, hd, W = 1, 2, 64, 8, 10
    q = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    k = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    v = rng.standard_normal((B, H, T, hd)).astype(np.float32)
    scale = hd**-0.5
    ref = _attention(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), scale, W, "xla")
    mesh = Mesh(np.asarray(jax.devices()[:8]), (CTX_AXIS,))
    f = jax.jit(
        shard_map(
            lambda q, k, v: ring_attention(q, k, v, scale, window=W),
            mesh=mesh,
            in_specs=(P(None, None, CTX_AXIS),) * 3,
            out_specs=P(None, None, CTX_AXIS),
        )
    )
    got = f(jnp.asarray(q), jnp.asarray(k), jnp.asarray(v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("mk", ["llama", "qwen3"])
def test_ring_calibration_matches_single_device(mk):
    """Context-parallel ring calibration == plain calibrate: identical
    Grams (psum'd chunk sums) and BI scores; RoPE phases at global
    positions; qwen3 exercises per-head q/k norms through the ring."""
    import transformers

    from jax.sharding import Mesh

    from modegpt_tpu.parallel.ring import CTX_AXIS, calibrate_ring, supports_ring

    if mk == "llama":
        m = _tiny_llama(seed=4)
    else:
        cfg = transformers.Qwen3Config(
            vocab_size=128, hidden_size=64, intermediate_size=144,
            num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
            head_dim=16, max_position_embeddings=256, tie_word_embeddings=False,
        )
        import torch

        torch.manual_seed(4)
        m = transformers.Qwen3ForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    batches = load_calibration_batches(None, "synthetic", 4, 2, 64, vocab_size=128)
    ref = calibrate(spec, params, batches, [0, 1], accumulate="host")

    mesh = Mesh(np.asarray(jax.devices()[:8]), (CTX_AXIS,))
    assert supports_ring(spec, mesh)
    got = calibrate_ring(spec, params, batches, [0, 1], mesh)
    for l in (0, 1):
        np.testing.assert_allclose(got.cov_mlp[l], ref.cov_mlp[l], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_q[l], ref.cov_q[l], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_k[l], ref.cov_k[l], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_x[l], ref.cov_x[l], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=1e-5)
    assert got.total_tokens == ref.total_tokens


def test_pipeline_ring_calibration_end_to_end(tmp_path):
    """run_compression on a context-only mesh routes calibration through
    the ring path and produces the same compressed model as single-device
    (identical rank lists, matching compressed weights)."""
    spec, params = params_from_hf_model(_tiny_llama(seed=6))

    def cfg(sub):
        return CompressionConfig(
            model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
            seq_len=64, compression_ratio=0.3, sparsity_smoothing=0.5,
            output_dir=str(tmp_path / sub / "o"),
            temp_storage_dir=str(tmp_path / sub / "l"),
            metrics_dir=str(tmp_path / sub / "m"),
            skip_baseline_eval=True, skip_final_eval=True,
        )

    ref = run_compression(cfg("ref"), spec=spec, params=params, tokenizer=None)
    mesh = make_mesh("context:8")
    got = run_compression(cfg("ring"), spec=spec, params=params, tokenizer=None,
                          mesh=mesh)
    rs, gs = ref["compressed_spec"], got["compressed_spec"]
    assert rs.gate_ranks == gs.gate_ranks and rs.q_ranks == gs.q_ranks
    for l in range(spec.n_layers):
        for key in ("up", "down", "q", "k", "v", "o"):
            np.testing.assert_allclose(
                np.asarray(got["compressed_params"]["layers"][l][key]["kernel"]),
                np.asarray(ref["compressed_params"]["layers"][l][key]["kernel"]),
                rtol=2e-4, atol=2e-4,
            )


def test_explicit_window_wins_over_ring(tmp_path):
    """--calib_exec window on a mesh that happens to carry a context
    axis must take the windowed path, not ring (regression: ring used
    to silently override the explicit knob). seq_len=60 is NOT
    divisible by the 8-way context axis, so the ring path would raise —
    completing proves the windowed path ran."""
    spec, params = params_from_hf_model(_tiny_llama(seed=6))

    cfg = CompressionConfig(
        model="mem", dataset="synthetic", calib_size=4, calibs_batch_size=2,
        seq_len=60, compression_ratio=0.3, sparsity_smoothing=0.5,
        calib_exec="window",
        output_dir=str(tmp_path / "o"),
        temp_storage_dir=str(tmp_path / "l"),
        metrics_dir=str(tmp_path / "m"),
        skip_baseline_eval=True, skip_final_eval=True,
    )
    got = run_compression(cfg, spec=spec, params=params, tokenizer=None,
                          mesh=make_mesh("context:8"))
    assert got["params_after"] < got["params_before"]


def test_ring_calibration_moe_matches():
    """MoE ring calibration: dense-all-experts execution is token-local,
    so per-expert routed Grams and shared-expert Grams psum exactly."""
    import torch
    import transformers

    from jax.sharding import Mesh

    from modegpt_tpu.parallel.ring import CTX_AXIS, calibrate_ring, supports_ring

    cfg = transformers.Qwen2MoeConfig(
        vocab_size=128, hidden_size=64, intermediate_size=144,
        moe_intermediate_size=48, shared_expert_intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        num_experts=4, num_experts_per_tok=2, max_position_embeddings=256,
        decoder_sparse_step=1, mlp_only_layers=[], norm_topk_prob=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(5)
    m = transformers.Qwen2MoeForCausalLM(cfg).eval()
    spec, params = params_from_hf_model(m)
    batches = load_calibration_batches(None, "synthetic", 4, 2, 64, vocab_size=128)
    ref = calibrate(spec, params, batches, [0, 1], accumulate="host")

    mesh = Mesh(np.asarray(jax.devices()[:8]), (CTX_AXIS,))
    assert supports_ring(spec, mesh)
    got = calibrate_ring(spec, params, batches, [0, 1], mesh)
    for l in (0, 1):
        np.testing.assert_allclose(got.cov_mlp[l], ref.cov_mlp[l], rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_shared[l], ref.cov_shared[l],
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(got.cov_x[l], ref.cov_x[l], rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(got.bi_scores, ref.bi_scores, rtol=1e-5)
