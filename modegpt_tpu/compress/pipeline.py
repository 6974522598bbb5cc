"""End-to-end compression pipeline orchestration.

TPU-native equivalent of the reference driver (reference:
src/run_modegpt.py:72-196): load -> baseline PPL -> per-layer-chunk
(calibrate -> allocate sparsity -> Type-I/II/III solvers) -> surgery ->
save -> reload -> compressed PPL -> metrics.

Differences by design:
* solvers consume host-f64 covariances and run either on the CPU backend
  in float64 (reference parity) or on the accelerator in float32
  (speed) — config.solver_precision;
* surgery is pure-functional (modegpt_tpu/compress/surgery.py), no
  in-place module swapping;
* the per-layer factor store doubles as a resume checkpoint: layers
  with existing factor files are skipped on re-run.
"""

from __future__ import annotations

import gc
import logging
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.calib.data import load_calibration_batches, load_eval_tokens
from modegpt_tpu.calib.engine import CalibrationResult, calibrate
from modegpt_tpu.compress.artifact import (
    load_compressed_model,
    load_layer_factors,
    save_compressed_model,
    save_layer_factors,
)
from modegpt_tpu.compress.surgery import apply_factors, compress_ranks_for_layer
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.evals.perplexity import compute_perplexity
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.allocation import allocate_keep_ratios
from modegpt_tpu.ops.mlp import nystrom_mlp
from modegpt_tpu.ops.qk import compress_qk_layer_opt, compress_qk_layer_rope
from modegpt_tpu.ops.vo import compress_vo_layer
from modegpt_tpu.utils.metrics import MetricsRegistry
from modegpt_tpu.utils.precision import solver_dtype, solver_placement

logger = logging.getLogger("modegpt_tpu")

__all__ = ["run_compression", "solve_layer", "compress_in_memory"]


def compress_in_memory(
    spec: ModelSpec,
    params: Dict,
    config: CompressionConfig,
    tokenizer=None,
    mesh=None,
):
    """Dense in-memory model -> compressed in-memory model, zero disk.

    The compress-then-serve handoff: no artifact, no factor store, and —
    on the default path — no HBM->host factor transfer either. The
    reference has no equivalent flow; it must round-trip compress ->
    save_pretrained -> reload through its Rebuild classes
    (reference: run_modegpt.py:158-183).

    Path selection:
    * ``config.fused`` — the 3-dispatch fused program (compress/fused.py;
      dense uniform RoPE stacks only, whole-model taps resident: the
      latency winner when weights + taps fit HBM comfortably).
    * otherwise — the layer-streamed sweep with DEVICE-fetched factors
      (``stream_fetch='device'``): O(1)-in-depth tap memory, each dense
      projection released as its factors land, surgery consumes the
      factor slices in place. Works at any resident-model scale.

    Returns (compressed_spec, compressed_params); ``params`` is consumed
    (host leaves are device_put once, dense projections are released).
    """
    from dataclasses import replace as _replace

    batches = load_calibration_batches(
        tokenizer, config.dataset, config.calib_size, config.calibs_batch_size,
        min(config.seq_len, spec.max_position_embeddings),
        vocab_size=spec.vocab_size,
    )
    if config.fused:
        from modegpt_tpu.compress.fused import fused_compress

        return fused_compress(spec, params, batches, config, mesh=mesh)

    from modegpt_tpu.compress.offload import stream_calibrate_solve

    # Device-resident weights are the prerequisite for device factor
    # fetch; fresh checkpoint loads arrive as host numpy — place once.
    params = jax.tree_util.tree_map(jnp.asarray, params)
    model_dtype = (
        "bfloat16" if params["embed_tokens"].dtype == jnp.bfloat16 else "float32"
    )
    cfg = _replace(config, stream_fetch="device", model_dtype=model_dtype)
    order = config.order or "mlp,qk,vo"
    factors, _, _ = stream_calibrate_solve(
        spec, params, batches, cfg, order=order, release_params=True
    )
    return apply_factors(
        spec, params,
        factors.get("mlp", {}), factors.get("qk", {}), factors.get("vo", {}),
        release_dense=True,
    )


def _hf_weight(layer_params: Dict, name: str) -> np.ndarray:
    """Forward kernel [in, out] -> HF [out, in] layout for the solvers."""
    return np.asarray(layer_params[name]["kernel"]).T


def solve_layer(
    spec: ModelSpec,
    layer_params: Dict,
    layer_idx: int,
    keep_ratio: float,
    calib: CalibrationResult,
    config: CompressionConfig,
    order: str,
) -> Dict[str, Dict]:
    """Run the requested solvers for one layer; returns factor dicts
    keyed by suffix (mlp/qk/vo), all arrays as host numpy in HF layout."""
    out: Dict[str, Dict] = {}
    dt = solver_dtype(config.solver_precision)

    with solver_placement(config.solver_precision):
        if "mlp" in order and spec.is_moe_layer(layer_idx):
            # MoE: per-expert Type-I solves against each expert's own
            # routed-token Gram; one shared rank per layer keeps the
            # expert stack uniform (models/spec.py n_experts note).
            rank = compress_ranks_for_layer(spec, keep_ratio, "mlp")
            ek = layer_params["experts"]
            ups, gates, downs, idxs = [], [], [], []
            for e in range(spec.n_experts):
                C = jnp.asarray(np.asarray(calib.cov_mlp[layer_idx])[e], dtype=dt)
                W_u = jnp.asarray(np.asarray(ek["up"]["kernel"][e]).T, dtype=dt)
                W_g = jnp.asarray(np.asarray(ek["gate"]["kernel"][e]).T, dtype=dt)
                W_d = jnp.asarray(np.asarray(ek["down"]["kernel"][e]).T, dtype=dt)
                f = nystrom_mlp(C, W_u, W_g, W_d, keep_ratio, config.nystrom_ridge, rank=rank)
                ups.append(np.asarray(f.up))
                gates.append(np.asarray(f.gate))
                downs.append(np.asarray(f.down))
                idxs.append(np.asarray(f.idx))
            out["mlp"] = {
                "up": np.stack(ups),
                "gate": np.stack(gates),
                "down": np.stack(downs),
                "idx": np.stack(idxs),
            }
            if spec.has_shared_expert(layer_idx):
                # Shared expert: a dense gated MLP over all tokens — its
                # own Type-I solve at the shared intermediate's rank.
                s_rank = compress_ranks_for_layer(spec, keep_ratio, "shared")
                sp_ = layer_params["shared"]
                C = jnp.asarray(np.asarray(calib.cov_shared[layer_idx]), dtype=dt)
                f = nystrom_mlp(
                    C,
                    jnp.asarray(np.asarray(sp_["up"]["kernel"]).T, dtype=dt),
                    jnp.asarray(np.asarray(sp_["gate"]["kernel"]).T, dtype=dt),
                    jnp.asarray(np.asarray(sp_["down"]["kernel"]).T, dtype=dt),
                    keep_ratio,
                    config.nystrom_ridge,
                    rank=s_rank,
                )
                out["mlp"]["shared_up"] = np.asarray(f.up)
                out["mlp"]["shared_gate"] = np.asarray(f.gate)
                out["mlp"]["shared_down"] = np.asarray(f.down)
                out["mlp"]["shared_idx"] = np.asarray(f.idx)
                logger.info(
                    "[MLP-shared] layer %d: shared expert compressed to rank %d",
                    layer_idx, s_rank,
                )
            logger.info(
                "[MLP-MoE] layer %d: %d experts compressed to rank %d",
                layer_idx, spec.n_experts, rank,
            )
        elif "mlp" in order:
            rank = compress_ranks_for_layer(spec, keep_ratio, "mlp")
            C = jnp.asarray(calib.cov_mlp[layer_idx], dtype=dt)
            W_u = jnp.asarray(_hf_weight(layer_params, "up"), dtype=dt)
            W_g = (
                jnp.asarray(_hf_weight(layer_params, "gate"), dtype=dt)
                if spec.gated_mlp
                else None
            )
            W_d = jnp.asarray(_hf_weight(layer_params, "down"), dtype=dt)
            f = nystrom_mlp(C, W_u, W_g, W_d, keep_ratio, config.nystrom_ridge, rank=rank)
            out["mlp"] = {
                "up": np.asarray(f.up),
                "down": np.asarray(f.down),
                "idx": np.asarray(f.idx),
            }
            if spec.gated_mlp:
                out["mlp"]["gate"] = np.asarray(f.gate)
            elif "bias" in layer_params["up"]:
                # OPT fc1/fc2 biases: the reference's surgery drops all MLP
                # biases (model_adapter.py:199-207); we keep the kept-row
                # fc1 bias and the fc2 bias (the intended semantics for
                # column selection — fc2's bias is rank-independent).
                out["mlp"]["up_bias"] = np.asarray(layer_params["up"]["bias"])[np.asarray(f.idx)]
                out["mlp"]["down_bias"] = np.asarray(layer_params["down"]["bias"])
            logger.info("[MLP] layer %d compressed to rank %d", layer_idx, rank)

        if "qk" in order:
            rank = compress_ranks_for_layer(spec, keep_ratio, "qk")
            cov_q = jnp.asarray(calib.cov_q[layer_idx], dtype=dt)
            cov_k = jnp.asarray(calib.cov_k[layer_idx], dtype=dt)
            W_q = jnp.asarray(_hf_weight(layer_params, "q"), dtype=dt)
            W_k = jnp.asarray(_hf_weight(layer_params, "k"), dtype=dt)
            if spec.uses_rope:
                f = compress_qk_layer_rope(cov_q, cov_k, W_q, W_k, rank, config.ridge_qk)
                out["qk"] = {
                    "q": np.asarray(f.q),
                    "k": np.asarray(f.k),
                    "rotary_mask": np.asarray(f.rotary_mask),
                }
                if "bias" in layer_params["q"]:
                    # qwen2_moe: RoPE arch with qkv biases — slice the bias
                    # entries through the same per-head frequency mask.
                    H, Hk, hd = spec.n_heads, spec.n_kv_heads, spec.head_dim
                    masks = np.asarray(f.rotary_mask)
                    bq = np.asarray(layer_params["q"]["bias"]).reshape(H, hd)
                    bk = np.asarray(layer_params["k"]["bias"]).reshape(Hk, hd)
                    mq = np.repeat(masks, spec.group_size, axis=0)
                    out["qk"]["q_bias"] = np.concatenate([bq[h][mq[h]] for h in range(H)])
                    out["qk"]["k_bias"] = np.concatenate([bk[h][masks[h]] for h in range(Hk)])
            else:
                bq = jnp.asarray(np.asarray(layer_params["q"]["bias"]), dtype=dt)
                bk = jnp.asarray(np.asarray(layer_params["k"]["bias"]), dtype=dt)
                f = compress_qk_layer_opt(cov_q, cov_k, W_q, W_k, bq, bk, rank, config.ridge_qk)
                out["qk"] = {
                    "q": np.asarray(f.q),
                    "k": np.asarray(f.k),
                    "q_bias": np.asarray(f.q_bias),
                    "k_bias": np.asarray(f.k_bias),
                }
            logger.info("[QK] layer %d compressed to rank %d per head", layer_idx, rank)

        if "vo" in order:
            rank = compress_ranks_for_layer(spec, keep_ratio, "vo")
            C = jnp.asarray(calib.cov_x[layer_idx], dtype=dt)
            W_v = jnp.asarray(_hf_weight(layer_params, "v"), dtype=dt)
            W_o = jnp.asarray(_hf_weight(layer_params, "o"), dtype=dt)
            f = compress_vo_layer(C, W_v, W_o, rank, spec.n_heads, spec.n_kv_heads, config.ridge_vo)
            out["vo"] = {"v": np.asarray(f.v), "o": np.asarray(f.o)}
            if "bias" in layer_params.get("v", {}):
                # OPT/qwen2_moe v biases: attention weights sum to 1, so a
                # constant value bias contributes exactly W_o @ b_v to every
                # output token — fold it into the o bias (exact; the
                # reference instead drops both biases in its surgery,
                # model_adapter.py:199-207). GQA repeats each kv head's
                # bias across its query group first.
                b_v = np.asarray(layer_params["v"]["bias"], dtype=np.float64)
                if spec.n_kv_heads != spec.n_heads:
                    hd_v = b_v.shape[0] // spec.n_kv_heads
                    b_v = np.repeat(
                        b_v.reshape(spec.n_kv_heads, hd_v), spec.group_size, axis=0
                    ).reshape(-1)
                W_o_np = np.asarray(_hf_weight(layer_params, "o"), dtype=np.float64)
                b_o = np.asarray(
                    layer_params["o"].get("bias", np.zeros(spec.d_model)), dtype=np.float64
                )
                out["vo"]["o_bias"] = b_o + W_o_np @ b_v
            logger.info("[VO] layer %d compressed to rank %d per head", layer_idx, rank)

    return out


def _suffixes(order: str):
    return [s for s in ("mlp", "qk", "vo") if s in order]


def _check_factor_store(config: CompressionConfig, spec: ModelSpec, order: str) -> None:
    """Guard the resume store against stale factors from a different run.

    The per-layer factor files double as a resume checkpoint (reference:
    temp_storage_dir, model_adapter.py:184-191) — but resuming with
    factors solved for a DIFFERENT model/ratio/order would silently graft
    wrong weights. A fingerprint sidecar makes the mismatch loud.
    """
    import json

    fingerprint = {
        "model": config.model,
        "spec": spec.to_dict(),
        "order": order,
        "compression_ratio": config.compression_ratio,
        "sparsity_smoothing": config.sparsity_smoothing,
        "max_sparsity": config.max_sparsity,
        "calib": [config.dataset, config.calib_size, config.seed],
        "ridges": [config.nystrom_ridge, config.ridge_qk, config.ridge_vo],
        "qk_method": config.qk_method,
    }
    # normalise through JSON so tuples compare equal to the reloaded lists
    fingerprint = json.loads(json.dumps(fingerprint))
    store = os.path.expandvars(config.temp_storage_dir)
    meta_path = os.path.join(store, "store_meta.json")
    os.makedirs(store, exist_ok=True)
    has_factors = any(f.startswith("layer_") for f in os.listdir(store))
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            existing = json.load(f)
        if existing != fingerprint:
            raise ValueError(
                f"temp_storage_dir {store!r} holds factors from a different "
                "run (model/ratio/order/ridges differ). Point "
                "--temp_storage_dir at a fresh directory or delete the old "
                "factors to re-solve."
            )
    elif has_factors:
        raise ValueError(
            f"temp_storage_dir {store!r} holds factor files with no "
            "fingerprint (pre-existing or foreign). Use a fresh directory."
        )
    with open(meta_path, "w") as f:
        json.dump(fingerprint, f, indent=2)


def count_params(params: Dict) -> int:
    import numpy as _np

    return int(
        sum(_np.prod(a.shape) for a in jax.tree_util.tree_leaves(params) if hasattr(a, "shape"))
    )


def run_compression(
    config: CompressionConfig,
    spec: Optional[ModelSpec] = None,
    params: Optional[Dict] = None,
    tokenizer=None,
    mesh: Optional[jax.sharding.Mesh] = None,
    calib_batches=None,
    eval_tokens=None,
) -> Dict:
    """Run the full pipeline. Either pass (spec, params[, tokenizer]) or
    let it load config.model from disk. Returns a results dict including
    baseline/compressed PPL and the artifact path."""
    from modegpt_tpu.utils.logging import setup_logging

    from modegpt_tpu.utils.profiling import trace

    setup_logging()
    metrics = MetricsRegistry(config.metrics_dir)
    metrics["args"] = config.to_dict()
    metrics["note"] = config.note
    results: Dict = {}

    t0 = time.perf_counter()

    if spec is None or params is None:
        from modegpt_tpu.models.hf import load_hf_model

        spec, params, tokenizer = load_hf_model(config.model)
    order = config.order or "mlp,qk,vo"
    # Cap sequence length by the model's positional capacity
    # (reference: eval.py:127 min(2048, max_position_embeddings)).
    seq_len = min(config.seq_len, spec.max_position_embeddings)
    if seq_len != config.seq_len:
        logger.info("seq_len capped to max_position_embeddings: %d", seq_len)

    if config.model_dtype == "bfloat16":
        params = jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16) if jnp.issubdtype(a.dtype, jnp.floating) else a,
            params,
        )

    pp_mode = False
    if mesh is not None:
        from modegpt_tpu.parallel.pp import supports_pp

        pp_mode = supports_pp(spec, mesh)
    if mesh is not None and not pp_mode:
        # Tensor/data-parallel placement: Megatron-style TP shardings when
        # the mesh has a "model" axis, replicated otherwise (new capability
        # vs the reference's single-process design, SURVEY.md §2).
        from modegpt_tpu.parallel.mesh import param_shardings

        params = jax.device_put(params, param_shardings(mesh, spec, params))
    elif pp_mode:
        # Pipeline staging: calibrate_pp places each stage's layer block on
        # its own device — do NOT replicate the model across the mesh here.
        logger.info(
            "pipeline-parallel calibration over %d stages", mesh.shape["stage"]
        )

    # ---- baseline PPL (reference: run_modegpt.py:91-99) ----
    if eval_tokens is None and not (config.skip_baseline_eval and config.skip_final_eval):
        eval_tokens = load_eval_tokens(
            tokenizer,
            config.dataset,
            seq_len,
            config.eval_max_samples,
            vocab_size=spec.vocab_size,
        )
    attn_impl = "auto" if config.use_flash_attention else "xla"
    if not config.skip_baseline_eval:
        if pp_mode:
            # Stage-sharded eval: the dense model never needs to fit one
            # chip (the same memory plan as the PP calibration).
            from modegpt_tpu.parallel.pp import perplexity_pp

            baseline_ppl = perplexity_pp(
                spec, params, eval_tokens, mesh, batch_size=config.eval_batch_size
            )
        else:
            baseline_ppl = compute_perplexity(
                spec, params, eval_tokens, config.eval_batch_size, mesh=mesh,
                metrics=metrics.run, attn_impl=attn_impl,
            )
        logger.info("Baseline ppl: %s", baseline_ppl)
        metrics["baseline-ppl"] = baseline_ppl
        results["baseline_ppl"] = baseline_ppl

    # ---- calibration batches ----
    if calib_batches is None:
        calib_batches = load_calibration_batches(
            tokenizer,
            config.dataset,
            config.calib_size,
            config.calibs_batch_size,
            seq_len,
            vocab_size=spec.vocab_size,
        )

    # ---- layer-chunked calibrate + solve (reference: run_modegpt.py:107-156) ----
    t_compress = time.perf_counter()
    _check_factor_store(config, spec, order)
    suffixes = _suffixes(order)
    factors: Dict[str, Dict[int, Dict]] = {s: {} for s in suffixes}
    n_layers = spec.n_layers
    # PP shards the accumulators across stages — that IS the memory plan,
    # so the whole stack calibrates in one pass (no layer chunking).
    layers_per_step = n_layers if pp_mode else config.layers_per_step
    # Fused path: the whole calibrate -> allocate -> solve -> surgery job
    # as 3 dispatches + 1 tiny fetch (compress/fused.py) — for
    # latency-bound scales; bypasses the factor store/resume.
    fused_result = None
    if config.fused:
        from modegpt_tpu.compress.fused import fused_compress

        with trace(config.profile_dir or None):
            fused_result = fused_compress(spec, params, calib_batches, config, mesh=mesh)
        logger.info("fused compression: 3 dispatches + 1 host fetch")
    elif config.calib_exec == "stream" and not pp_mode and mesh is None:
        # Layer-streamed sweep (compress/offload.py): ONE forward pass for
        # the whole job, weights staged per layer — the beyond-HBM path
        # (host-resident params) and the fastest resident big-model path
        # (no per-chunk forward repeats). Factors persist per window so
        # the sweep composes with resume like the chunked loop.
        from modegpt_tpu.compress.offload import stream_calibrate_solve

        pending_all = [
            l
            for l in range(n_layers)
            if not all(
                load_layer_factors(config.temp_storage_dir, l, s) is not None
                for s in suffixes
            )
        ]
        if pending_all:

            def _persist(layers_done, chunk):
                for s, by_layer in chunk.items():
                    for l, f in by_layer.items():
                        save_layer_factors(config.temp_storage_dir, l, s, f)

            stream_stats = {}
            with trace(config.profile_dir or None):
                _, bi_scores, _keep = stream_calibrate_solve(
                    spec, params, calib_batches, config, order,
                    on_window=_persist, target_layers=pending_all,
                    stats_out=stream_stats,
                )
            metrics["stream_async_flush"] = bool(stream_stats["async_flush"])
            metrics["stream_flush_wait_s"] = round(stream_stats["flush_wait_s"], 3)
            _, max_sp = allocate_keep_ratios(
                bi_scores, config.compression_ratio,
                smoothing=config.sparsity_smoothing,
                max_sparsity=config.max_sparsity,
            )
            metrics["max_layer_sparsity"] = max_sp
            metrics["smoothing"] = config.sparsity_smoothing
            gc.collect()
    # fused already captured its trace above — don't open a second,
    # empty session around the skipped layer loop (it would shadow the
    # real capture as the directory's latest run).
    with trace(None if fused_result else (config.profile_dir or None)):
        for start in range(0, 0 if fused_result else n_layers, layers_per_step):
            target_layers = list(range(start, min(n_layers, start + layers_per_step)))

            # Resume: skip layers whose factors are all on disk already.
            pending = [
                l
                for l in target_layers
                if not all(
                    load_layer_factors(config.temp_storage_dir, l, s) is not None
                    for s in suffixes
                )
            ]
            if pending:
                from modegpt_tpu.parallel.ring import supports_ring

                if pp_mode:
                    from modegpt_tpu.parallel.pp import calibrate_pp

                    calib = calibrate_pp(spec, params, calib_batches, mesh)
                elif (
                    config.calib_exec != "window"
                    and mesh is not None
                    and supports_ring(spec, mesh)
                ):
                    # context-parallel ring calibration: beyond-32k
                    # sequences with O(T/N) per-device K/V (parallel/ring.py).
                    # An EXPLICIT --calib_exec window wins over the mesh's
                    # context axis — the user asked for the windowed
                    # memory plan, not ring semantics.
                    from modegpt_tpu.parallel.ring import calibrate_ring

                    calib = calibrate_ring(spec, params, calib_batches, pending, mesh)
                elif config.calib_exec == "window":
                    # windowed single-program calibration: weights consumed
                    # in place, one compile for every layers_per_step chunk
                    # — the big-model-on-one-chip path (the scanned stats
                    # path stacks a second full weight copy; see
                    # calib/engine.calibrate_window)
                    from modegpt_tpu.calib.engine import calibrate_window

                    calib = calibrate_window(
                        spec, params, calib_batches, start, layers_per_step,
                        gram_precision=config.gram_precision,
                    )
                else:
                    accumulate = (
                        "device" if config.solver_precision == "f32_device" else "host"
                    )
                    # Mixed dense/MoE stacks: the per-layer cov_mlp shapes
                    # differ by kind ([E,D,D] vs [D',D']), so calibrate
                    # each kind's layers as its own group.
                    if spec.n_experts and spec.moe_layers:
                        groups = [
                            [l for l in pending if spec.is_moe_layer(l)],
                            [l for l in pending if not spec.is_moe_layer(l)],
                        ]
                        groups = [g for g in groups if g]
                    else:
                        groups = [pending]
                    calib = None
                    for g in groups:
                        part = calibrate(
                            spec,
                            params,
                            calib_batches,
                            g,
                            mesh=mesh,
                            accumulate=accumulate,
                            shard_sequence=config.shard_sequence,
                            shard_stats=config.shard_stats,
                            gram_precision=config.gram_precision,
                        )
                        if calib is None:
                            calib = part
                        else:
                            calib.cov_mlp.update(part.cov_mlp)
                            calib.cov_q.update(part.cov_q)
                            calib.cov_k.update(part.cov_k)
                            calib.cov_x.update(part.cov_x)
                            if part.cov_shared:
                                if calib.cov_shared:
                                    calib.cov_shared.update(part.cov_shared)
                                else:
                                    calib.cov_shared = part.cov_shared
                keep_ratios, max_sp = allocate_keep_ratios(
                    calib.bi_scores,
                    config.compression_ratio,
                    smoothing=config.sparsity_smoothing,
                    max_sparsity=config.max_sparsity,
                )
                metrics["max_layer_sparsity"] = max_sp
                metrics["smoothing"] = config.sparsity_smoothing
                from modegpt_tpu.compress.batched import solve_chunk_batched

                solver_mesh = mesh if config.solver_precision == "f32_device" else None
                chunk_factors = solve_chunk_batched(
                    spec, params, pending, keep_ratios, calib, config, order, mesh=solver_mesh
                )
                for s, by_layer in chunk_factors.items():
                    for l, f in by_layer.items():
                        save_layer_factors(config.temp_storage_dir, l, s, f)
                del calib
                gc.collect()

            for l in target_layers:
                for s in suffixes:
                    factors[s][l] = load_layer_factors(config.temp_storage_dir, l, s)

    compress_seconds = time.perf_counter() - t_compress
    metrics["compress_seconds"] = compress_seconds
    results["compress_seconds"] = compress_seconds

    # ---- surgery + artifact (reference: run_modegpt.py:158-166) ----
    # Count the dense model BEFORE surgery: apply_factors(release_dense=
    # True) pops the replaced projections out of `params` in place, so a
    # post-surgery count would see a gutted model and report a negative
    # "reduction".
    n_before = count_params(params)
    if fused_result is not None:
        comp_spec, comp_params = fused_result
    else:
        # Host-resident params (the beyond-HBM streamed flow): assemble
        # the compressed model on the CPU backend — at 13B+ geometry even
        # the compressed weights can exceed one chip's HBM, and the
        # artifact write consumes host arrays anyway.
        import contextlib

        leaves = jax.tree_util.tree_leaves(params["layers"][0])
        host_resident = leaves and all(
            not isinstance(a, jax.Array) for a in leaves if hasattr(a, "shape")
        )
        ctx = (
            jax.default_device(jax.local_devices(backend="cpu")[0])
            if host_resident
            else contextlib.nullcontext()
        )
        with ctx:
            comp_spec, comp_params = apply_factors(
                spec,
                params,
                release_dense=config.release_dense,
                mlp_factors=factors.get("mlp"),
                qk_factors=factors.get("qk"),
                vo_factors=factors.get("vo"),
            )
    n_after = count_params(comp_params)
    metrics["params_before"] = n_before
    metrics["params_after"] = n_after
    metrics["achieved_compression"] = 1.0 - n_after / max(n_before, 1)
    # Per-layer rank dump (SURVEY.md §5: "add per-layer rank/score dumps").
    metrics["rank_lists"] = {
        "q_ranks": list(comp_spec.q_ranks),
        "k_ranks": list(comp_spec.k_ranks),
        "v_ranks": list(comp_spec.v_ranks),
        "o_ranks": list(comp_spec.o_ranks),
        "gate_ranks": list(comp_spec.gate_ranks),
        **(
            {"shared_gate_ranks": list(comp_spec.shared_gate_ranks)}
            if comp_spec.shared_gate_ranks
            else {}
        ),
    }
    results["params_before"] = n_before
    results["params_after"] = n_after
    logger.info(
        "params: %.1fM -> %.1fM (%.1f%% reduction)",
        n_before / 1e6,
        n_after / 1e6,
        100 * (1 - n_after / max(n_before, 1)),
    )
    save_dir = os.path.join(config.output_dir, "model")
    save_compressed_model(
        save_dir,
        comp_spec,
        comp_params,
        tokenizer_source=config.model,
        metadata={"order": order, "compression_ratio": config.compression_ratio},
        dtype=config.artifact_dtype
        or ("bfloat16" if config.model_dtype == "bfloat16" else "float32"),
        backend=config.artifact_backend,
    )
    results["artifact_dir"] = save_dir

    # ---- reload + compressed PPL (reference: run_modegpt.py:179-194) ----
    del comp_params
    gc.collect()
    comp_spec, comp_params, _ = load_compressed_model(save_dir)
    results["compressed_spec"] = comp_spec
    results["compressed_params"] = comp_params
    if not config.skip_final_eval:
        if pp_mode:
            from modegpt_tpu.models.padded import pad_to_uniform
            from modegpt_tpu.parallel.pp import perplexity_pp

            compressed_ppl = perplexity_pp(
                comp_spec, comp_params, eval_tokens, mesh,
                batch_size=config.eval_batch_size,
                padded=pad_to_uniform(comp_spec, comp_params),
            )
        else:
            compressed_ppl = compute_perplexity(
                comp_spec,
                comp_params,
                eval_tokens,
                config.eval_batch_size,
                mesh=mesh,
                metrics=metrics.run,
                attn_impl=attn_impl,
                exec_mode=config.compressed_exec,
            )
        logger.info("Compressed ppl: %s", compressed_ppl)
        metrics[f"ppl-{config.dataset}"] = compressed_ppl
        results["compressed_ppl"] = compressed_ppl

    results["total_seconds"] = time.perf_counter() - t0
    metrics["total_seconds"] = results["total_seconds"]
    metrics.save()
    return results
