"""Pipeline-parallel calibration: the layer stack staged over the mesh.

For models whose parameters exceed one chip's HBM, tensor parallelism
(parallel/mesh.py) shards every matmul; this module adds the orthogonal
option: a GPipe-style pipeline over a ``stage`` mesh axis. Each stage
holds L/S whole layers, calibration batches flow stage-to-stage over ICI
(`lax.ppermute`), and each stage accumulates the Gram statistics for ITS
OWN layers locally — the accumulator memory (the real pressure point,
SURVEY.md §7 hard part 6: [D_int, D_int] per layer) is sharded across
stages by construction, and no statistic ever moves between devices.

Calibration is uniquely pipeline-friendly: it needs NO logits and NO
backward pass (the reference's hooks fire during plain forwards,
src/calibration.py:114-127), so the classic GPipe bubble is the only
overhead: (S-1)/(N+S-1) idle fraction for N microbatches — each entry of
the calibration batch list is one microbatch, so N = calib_size /
calibs_batch_size and the bubble is small for real calibration sizes
(e.g. 128/8 = 16 microbatches on 4 stages -> 16% bubble).

The whole pipeline — N+S-1 steps, each a `lax.scan` over the stage's
layers with Gram taps — is ONE jitted program driven by `lax.fori_loop`;
per-step state is just the [B, T, d] boundary activation and the
stage-local accumulators.

New capability relative to the reference (single-process, SURVEY.md §2).
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

from modegpt_tpu.models.forward import _bi_piece, _gram, _head_gram, _linear
from modegpt_tpu.models.scan_forward import _one_layer, stack_layer_params
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.rope import rope_cos_sin

try:  # jax >= 0.4.35 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

logger = logging.getLogger("modegpt_tpu")

__all__ = ["calibrate_pp", "perplexity_pp", "supports_pp"]

STAGE_AXIS = "stage"


def supports_pp(spec: ModelSpec, mesh: Optional[jax.sharding.Mesh]) -> bool:
    """PP calibration needs a 'stage' mesh axis, a uniform dense layer
    stack (calibration always runs on the dense model), and a layer count
    divisible by the stage count."""
    if mesh is None or STAGE_AXIS not in mesh.axis_names:
        return False
    extra = [a for a in mesh.axis_names if a not in (STAGE_AXIS, "data")]
    if extra:
        return False  # only stage (+ optional data) axes are understood
    if spec.n_experts or not spec.is_uniform:
        return False
    if spec.layer_types and len(set(spec.layer_types)) > 1:
        return False
    return spec.n_layers % mesh.shape[STAGE_AXIS] == 0


def calibrate_pp(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    mesh: jax.sharding.Mesh,
    attn_impl: str = "xla",
):
    """Run pipeline-parallel calibration over ALL layers in one pass.

    Returns a CalibrationResult (f32 device accumulation, fetched once at
    the end — same semantics as `calibrate(..., accumulate="device")`).
    Unlike the chunked engine there is no layers_per_step: sharding the
    accumulators across stages IS the memory plan.
    """
    from modegpt_tpu.calib.engine import CalibrationResult

    assert supports_pp(spec, mesh), "spec/mesh not pipeline-compatible"
    S = mesh.shape[STAGE_AXIS]
    L = spec.n_layers
    per_stage = L // S
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[0] // H
    d_int = spec.gate_ranks[0]

    shapes = {b.shape for b in batches}
    if len(shapes) != 1:
        raise ValueError(
            f"pipeline calibration needs uniform microbatches, got shapes {shapes} "
            "(make calib_size a multiple of calibs_batch_size)"
        )
    stacked_batches = jnp.asarray(np.stack([np.asarray(b) for b in batches]))  # [N, B, T]
    N, B, T = stacked_batches.shape
    n_data = mesh.shape.get("data", 1)
    if B % n_data != 0:
        raise ValueError(f"batch size {B} must divide the data axis ({n_data})")

    # Stage-stacked layer parameters: [L, ...] -> [S, per_stage, ...],
    # placed sharded on the stage axis (each device holds only its block).
    layer_stack = stack_layer_params(params)
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((S, per_stage) + a.shape[1:]), layer_stack
    )
    stage_sharding = jax.tree_util.tree_map(
        lambda a: NamedSharding(mesh, P(STAGE_AXIS, *([None] * (a.ndim - 1)))), staged
    )
    staged = jax.device_put(staged, stage_sharding)
    embed = {
        k: v
        for k, v in params.items()
        if k in ("embed_tokens", "embed_positions", "project_in")
    }

    def layer_specs(tree):
        return jax.tree_util.tree_map(
            lambda a: P(STAGE_AXIS, *([None] * (a.ndim - 1))), tree
        )

    out_spec_stats = (
        P(STAGE_AXIS, None, None),  # cov_mlp [L, D, D]
        P(STAGE_AXIS, None, None, None),  # cov_q [L, H, hd, hd]
        P(STAGE_AXIS, None, None, None),  # cov_k
        P(STAGE_AXIS, None, None),  # cov_x
        P(STAGE_AXIS),  # bi [L]
    )

    def run(stage_layers, embed_params, all_batches):
        # inside shard_map: stage_layers leaves are [1, per_stage, ...];
        # all_batches is this data shard's slice [N, B/n_data, T]
        stage_layers = jax.tree_util.tree_map(lambda a: a[0], stage_layers)
        B_local = all_batches.shape[1]
        s = lax.axis_index(STAGE_AXIS)
        cos = sin = None
        if spec.uses_rope:
            cos, sin = rope_cos_sin(
                jnp.arange(T, dtype=jnp.int32),
                spec.head_dim,
                spec.rope_theta,
                dtype=params["embed_tokens"].dtype,
                scaling=spec.rope_scaling,
            )

        def embed_fn(tokens):
            from modegpt_tpu.models.forward import _scale_embed

            x = _scale_embed(spec, embed_params["embed_tokens"][tokens])
            if spec.arch in ("opt", "gpt2"):
                if "project_in" in embed_params:
                    x = _linear(x, embed_params["project_in"])
                pos = jnp.arange(T, dtype=jnp.int32) + spec.position_offset
                x = x + embed_params["embed_positions"][pos][None, :, :]
            return x

        def stage_body(x):
            """Scan this stage's layers; ys are the per-layer tap pieces."""

            def body(x, p):
                h_in = x
                x_out, taps_src, (h_mlp, _) = _one_layer(spec, p, x, cos, sin, attn_impl)
                x_ln, q, k = taps_src
                piece = (
                    _gram(h_mlp.reshape(-1, d_int)),
                    _head_gram(q.reshape(B_local, T, H, q_hd)),
                    _head_gram(k.reshape(B_local, T, Hk, q_hd)),
                    _gram(x_ln.reshape(-1, spec.d_model)),
                    _bi_piece(h_in, x_out),
                )
                return x_out, piece

            return lax.scan(body, x, stage_layers)

        acc0 = (
            jnp.zeros((per_stage, d_int, d_int), jnp.float32),
            jnp.zeros((per_stage, H, q_hd, q_hd), jnp.float32),
            jnp.zeros((per_stage, Hk, q_hd, q_hd), jnp.float32),
            jnp.zeros((per_stage, spec.d_model, spec.d_model), jnp.float32),
            jnp.zeros((per_stage,), jnp.float32),
        )
        x0 = jnp.zeros((B_local, T, spec.d_model), params["embed_tokens"].dtype)

        def step(t, carry):
            x_recv, acc = carry
            # stage 0 ingests microbatch t; others consume what stage s-1
            # sent at the end of step t-1 (= microbatch t - s).
            fresh = embed_fn(all_batches[jnp.clip(t, 0, N - 1)])
            x_in = jnp.where(s == 0, fresh, x_recv)
            x_out, pieces = stage_body(x_in)
            active = ((t - s) >= 0) & ((t - s) < N)
            scale = active.astype(jnp.float32)
            acc = jax.tree_util.tree_map(lambda a, p: a + scale * p, acc, pieces)
            x_next = lax.ppermute(
                x_out, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)]
            )
            return (x_next, acc)

        _, acc = lax.fori_loop(0, N + S - 1, step, (x0, acc0))
        if "data" in mesh.axis_names:
            acc = jax.tree_util.tree_map(lambda a: lax.psum(a, "data"), acc)
        return acc

    run_sharded = jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(
                layer_specs(staged),
                P(),
                P(None, "data" if "data" in mesh.axis_names else None, None),
            ),
            out_specs=out_spec_stats,
            check_vma=False,
        )
    )
    cov_mlp, cov_q, cov_k, cov_x, bi = run_sharded(staged, embed, stacked_batches)

    n_sequences = N * B
    total_tokens = n_sequences * T
    inv = 1.0 / total_tokens
    cov_mlp = np.asarray(cov_mlp, dtype=np.float64) * inv
    cov_q = np.asarray(cov_q, dtype=np.float64) * inv
    cov_k = np.asarray(cov_k, dtype=np.float64) * inv
    cov_x = np.asarray(cov_x, dtype=np.float64) * inv
    bi = np.asarray(bi, dtype=np.float64) / n_sequences

    logger.info(
        "pp calibration: %d microbatches x [%d, %d] over %d stages "
        "(bubble %.0f%%), all %d layers in one pass",
        N, B, T, S, 100 * (S - 1) / (N + S - 1), L,
    )
    return CalibrationResult(
        cov_mlp={l: cov_mlp[l] for l in range(L)},
        cov_q={l: cov_q[l] for l in range(L)},
        cov_k={l: cov_k[l] for l in range(L)},
        cov_x={l: cov_x[l] for l in range(L)},
        bi_scores=bi.tolist(),
        n_sequences=n_sequences,
        total_tokens=total_tokens,
    )


def perplexity_pp(
    spec: ModelSpec,
    params: Dict,
    eval_tokens: np.ndarray,
    mesh: jax.sharding.Mesh,
    batch_size: int = 8,
    attn_impl: str = "xla",
    padded: "Optional[object]" = None,
) -> float:
    """Pipeline-parallel perplexity: the layer stack staged over the
    `stage` mesh (same GPipe schedule as `calibrate_pp`), with the LAST
    stage computing the shifted cross-entropy of each microbatch as it
    drains. This evaluates models whose parameters exceed one chip's HBM
    without any resharding — the memory plan the final-stage unembed
    rides along with (embeddings are replicated; only the last stage
    touches them).

    Heterogeneous compressed models evaluate by passing their
    PaddedModel (models/padded.pad_to_uniform) via `padded`: the stage
    body then scans the exact padded layer (true-rank scaling, rotary
    masks, masked norms), so the compressed PPL of an arbitrarily deep
    model is also stage-sharded.

    Returns exp(sum_nll / (n * (seq_len - 1))) (reference: eval.py:220).
    """
    if padded is not None:
        spec, params = padded.spec, {"layers": None, **padded.other}
    assert (
        padded is not None or supports_pp(spec, mesh)
    ), "spec/mesh not pipeline-compatible"
    assert spec.n_layers % mesh.shape[STAGE_AXIS] == 0, "layers must divide stages"
    S = mesh.shape[STAGE_AXIS]
    per_stage = spec.n_layers // S
    n_data = mesh.shape.get("data", 1)

    n_samples, T = eval_tokens.shape
    n_keep = (n_samples // batch_size) * batch_size
    if n_keep != n_samples:
        logger.info("pp eval: dropping %d samples to fill batches", n_samples - n_keep)
    batches = np.asarray(eval_tokens[:n_keep]).reshape(-1, batch_size, T)
    N, B = batches.shape[0], batch_size
    if B % n_data != 0:
        raise ValueError(f"batch size {B} must divide the data axis ({n_data})")

    if padded is not None:
        layer_stack = dict(padded.layers)
        layer_stack["__q_hd_true__"] = padded.q_hd_true
    else:
        layer_stack = stack_layer_params(params)
    staged = jax.tree_util.tree_map(
        lambda a: a.reshape((S, per_stage) + a.shape[1:]), layer_stack
    )
    staged = jax.device_put(
        staged,
        jax.tree_util.tree_map(
            lambda a: NamedSharding(mesh, P(STAGE_AXIS, *([None] * (a.ndim - 1)))), staged
        ),
    )
    head = {
        k: v
        for k, v in params.items()
        if k in ("embed_tokens", "embed_positions", "project_in", "project_out",
                 "final_norm", "lm_head")
        and v is not None
    }

    def layer_specs(tree):
        return jax.tree_util.tree_map(
            lambda a: P(STAGE_AXIS, *([None] * (a.ndim - 1))), tree
        )

    def run(stage_layers, head_params, all_batches):
        from modegpt_tpu.models.forward import _norm as _fnorm

        stage_layers = jax.tree_util.tree_map(lambda a: a[0], stage_layers)
        B_local = all_batches.shape[1]
        s = lax.axis_index(STAGE_AXIS)
        cos = sin = None
        if spec.uses_rope:
            cos, sin = rope_cos_sin(
                jnp.arange(T, dtype=jnp.int32), spec.head_dim, spec.rope_theta,
                dtype=params["embed_tokens"].dtype, scaling=spec.rope_scaling,
            )

        def embed_fn(tokens):
            from modegpt_tpu.models.forward import _scale_embed

            x = _scale_embed(spec, head_params["embed_tokens"][tokens])
            if spec.arch in ("opt", "gpt2"):
                if "project_in" in head_params:
                    x = _linear(x, head_params["project_in"])
                pos = jnp.arange(T, dtype=jnp.int32) + spec.position_offset
                x = x + head_params["embed_positions"][pos][None, :, :]
            return x

        def nll_fn(x, tokens):
            from modegpt_tpu.models.forward import _softcap

            if "final_norm" in head_params:
                x = _fnorm(x, head_params["final_norm"], spec.norm, spec.norm_eps)
            if "project_out" in head_params:
                x = _linear(x, head_params["project_out"])
            if "lm_head" in head_params:
                logits = _linear(x, head_params["lm_head"])
            else:
                logits = x @ head_params["embed_tokens"].T
            logits = _softcap(logits, spec.final_logit_softcap)
            logp = jax.nn.log_softmax(logits[:, :-1].astype(jnp.float32), axis=-1)
            nll = -jnp.take_along_axis(logp, tokens[:, 1:, None], axis=-1)
            return jnp.sum(nll)

        def stage_body(x):
            if padded is not None:
                from modegpt_tpu.models.padded import _layer_padded

                q_hd_true = stage_layers.pop("__q_hd_true__") if isinstance(
                    stage_layers, dict
                ) and "__q_hd_true__" in stage_layers else None

                def body(x, inputs):
                    p, r_true = inputs
                    x, _ = _layer_padded(spec, p, r_true, x, cos, sin, attn_impl)
                    return x, None

                x, _ = lax.scan(body, x, (stage_layers, q_hd_true))
                return x

            def body(x, p):
                x, _, _ = _one_layer(spec, p, x, cos, sin, attn_impl)
                return x, None

            x, _ = lax.scan(body, x, stage_layers)
            return x

        x0 = jnp.zeros((B_local, T, spec.d_model), params["embed_tokens"].dtype)

        def step(t, carry):
            x_recv, nll_acc = carry
            fresh = embed_fn(all_batches[jnp.clip(t, 0, N - 1)])
            x_in = jnp.where(s == 0, fresh, x_recv)
            x_out = stage_body(x_in)
            # the LAST stage finishes microbatch t - (S-1) at step t
            mb = jnp.clip(t - (S - 1), 0, N - 1)
            active = ((t - (S - 1)) >= 0) & ((t - (S - 1)) < N) & (s == S - 1)
            piece = nll_fn(x_out, all_batches[mb])
            nll_acc = nll_acc + jnp.where(active, piece, 0.0)
            x_next = lax.ppermute(x_out, STAGE_AXIS, [(i, (i + 1) % S) for i in range(S)])
            return (x_next, nll_acc)

        _, nll = lax.fori_loop(0, N + S - 1, step, (x0, jnp.asarray(0.0, jnp.float32)))
        # only the last stage's accumulator is real; share it with everyone
        nll = lax.psum(jnp.where(s == S - 1, nll, 0.0), STAGE_AXIS)
        if "data" in mesh.axis_names:
            nll = lax.psum(nll, "data")
        return nll

    run_sharded = jax.jit(
        shard_map(
            run,
            mesh=mesh,
            in_specs=(
                layer_specs(staged),
                P(),
                P(None, "data" if "data" in mesh.axis_names else None, None),
            ),
            out_specs=P(),
            check_vma=False,
        )
    )
    total_nll = float(run_sharded(staged, head, jnp.asarray(batches)))
    logger.info("pp eval: %d samples x %d tokens over %d stages", n_keep, T, S)
    import math

    return math.exp(total_nll / (n_keep * (T - 1)))
