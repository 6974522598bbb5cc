"""Calibration engine: streamed Gram statistics + Block-Influence scores.

TPU-native equivalent of the reference's hooked calibration loop
(reference: src/calibration.py:39-150). Instead of registering PyTorch
forward hooks, the jitted functional forward returns the per-layer Gram
taps directly (see modegpt_tpu/models/forward.py). Per-batch statistics
are computed on-device in float32 at HIGHEST MXU precision and
accumulated across batches in float64 on the host — the same
"f32 matmul, f64 accumulate" tradeoff the reference notes at
LlamaAdapter.py:110-113, but with the f64 accumulation exact because it
happens outside the device loop.

Mesh execution (new capability — the reference is single-process): pass
a `jax.sharding.Mesh` with a ``data`` axis and the batch is sharded
across it; GSPMD inserts the psum that reduces each Gram over the data
shards. Layer chunking bounds accumulator memory exactly like the
reference's ``layers_per_step`` (run_modegpt.py:107).
"""

from __future__ import annotations

import functools
import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
import numpy as np

from modegpt_tpu.models.forward import forward
from modegpt_tpu.models.scan_forward import forward_scan, supports_scan
from modegpt_tpu.models.spec import ModelSpec

logger = logging.getLogger("modegpt_tpu")

__all__ = ["CalibrationResult", "calibrate", "calibrate_window"]


@dataclass
class CalibrationResult:
    """Normalised second-moment statistics, keyed by ABSOLUTE layer index
    (only the target layers of this chunk are present); bi_scores covers
    every layer (reference computes BI for all layers each chunk,
    calibration.py:118-124). Normalisation matches the reference
    (calibration.py:141-146).

    Accumulation mode decides residency:
      * host (parity): float64 numpy, accumulated exactly per batch on
        the host — matches the reference's f64 accumulators;
      * device (speed): float32 jax arrays accumulated on-device, fetched
        lazily — avoids per-batch HBM->host transfers of the
        [D_int, D_int] Grams, which dominate wall time on tunneled or
        DCN-attached hosts, and lets the solvers consume the stats
        without a host round-trip.
    """

    cov_mlp: Dict[int, "np.ndarray | jax.Array"]
    cov_q: Dict[int, "np.ndarray | jax.Array"]
    cov_k: Dict[int, "np.ndarray | jax.Array"]
    cov_x: Dict[int, "np.ndarray | jax.Array"]
    bi_scores: List[float]
    n_sequences: int
    total_tokens: int
    # Shared-expert Grams (DeepSeek/qwen2_moe shared experts); empty for
    # models without them.
    cov_shared: Optional[Dict[int, "np.ndarray | jax.Array"]] = None


def _stats_fn(
    spec: ModelSpec,
    stats_layers: Tuple[int, ...],
    mesh: Optional[jax.sharding.Mesh],
    shard_sequence: bool = False,
    shard_stats: bool = False,
    gram_precision: str = "highest",
):
    """Build the jitted per-batch stats function (logits are discarded —
    XLA dead-code-eliminates the LM head for calibration batches).

    With a mesh: the batch is data-sharded; params keep whatever sharding
    the caller placed them with (e.g. Megatron TP via
    `modegpt_tpu.parallel.mesh.param_shardings`); the Gram outputs are
    replicated — GSPMD inserts the psum over data shards.

    shard_sequence=True additionally shards the sequence axis over the
    "model" axis (sequence parallelism): the Gram statistics are plain
    sums over tokens, so sequence sharding is exact — GSPMD inserts the
    gathers the attention needs and the psum that reduces the Grams
    (long-context extension the reference lacks, SURVEY.md §5).

    shard_stats=True shards the Gram accumulators over the data axis on
    their LAYER-stack dim: the all-reduce becomes a reduce-scatter (half
    the collective traffic) and each device holds 1/n of the
    [n_t, D_int, D_int] accumulators — the mesh answer to SURVEY.md §7
    hard part 6 (streaming Gram memory). Requires n_t % data == 0.
    """

    fwd = forward_scan if supports_scan(spec, stats_layers) else forward

    def fn(params, batch):
        _, stats = fwd(
            spec, params, batch, stats_layers=stats_layers,
            gram_precision=gram_precision,
        )
        return stats

    if mesh is None:
        return jax.jit(fn)

    from jax.sharding import NamedSharding, PartitionSpec as P

    from modegpt_tpu.models.forward import CalibStats

    seq_axis = "model" if (shard_sequence and "model" in mesh.axis_names) else None
    batch_sharding = NamedSharding(mesh, P("data", seq_axis))
    replicated = NamedSharding(mesh, P())

    out_shardings = replicated
    if shard_stats and len(stats_layers) % mesh.shape["data"] == 0:
        layer_sharded3 = NamedSharding(mesh, P("data", None, None))
        layer_sharded4 = NamedSharding(mesh, P("data", None, None, None))
        has_shared = spec.shared_d_int > 0 and all(
            spec.is_moe_layer(l) for l in stats_layers
        )
        out_shardings = CalibStats(
            cov_mlp=layer_sharded3,
            cov_q=layer_sharded4,
            cov_k=layer_sharded4,
            cov_x=layer_sharded3,
            bi_acc=replicated,
            cov_shared=layer_sharded3 if has_shared else None,
        )

    return jax.jit(fn, in_shardings=(None, batch_sharding), out_shardings=out_shardings)


@jax.jit
def _acc_add(acc, stats):
    return jax.tree_util.tree_map(jnp.add, acc, stats)


@functools.lru_cache(maxsize=32)
def _scan_stats_fn(
    spec: ModelSpec, stats_layers: Tuple[int, ...], gram_precision: str = "highest"
):
    """One device program that scans over stacked batches [N, B, T],
    accumulating all statistics on-device — a single dispatch for the
    whole calibration pass (dispatch/RPC latency dominates on tunneled
    or DCN-attached hosts)."""

    fwd = forward_scan if supports_scan(spec, stats_layers) else forward

    def one(params, batch):
        _, stats = fwd(
            spec, params, batch, stats_layers=stats_layers,
            gram_precision=gram_precision,
        )
        return stats

    @jax.jit
    def run(params, batches):
        def body(carry, batch):
            stats = one(params, batch)
            if carry is None:
                return stats, None
            return jax.tree_util.tree_map(jnp.add, carry, stats), None

        init = one(params, batches[0])
        if batches.shape[0] == 1:
            return init
        acc, _ = jax.lax.scan(lambda c, b: body(c, b), init, batches[1:])
        return acc

    return run


def calibrate(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    target_layers: Sequence[int],
    mesh: Optional[jax.sharding.Mesh] = None,
    accumulate: str = "host",
    shard_sequence: bool = False,
    shard_stats: bool = False,
    gram_precision: str = "highest",
) -> CalibrationResult:
    """Run calibration forwards and accumulate statistics.

    Args:
      batches: list of [B, T] int token arrays (uniform T; B may vary on
        the last batch).
      target_layers: layers whose Grams are collected this chunk.
      accumulate: "host" (per-batch f64 on the host, reference parity) or
        "device" (on-device f32 running sums, one fetch per chunk).
      shard_sequence: also shard the sequence axis over the mesh's
        "model" axis (exact for Gram sums).
      shard_stats: shard Gram accumulators over the data axis on the
        layer-stack dim (reduce-scatter instead of all-reduce; per-device
        accumulator memory divided by the data-axis size).
    """
    stats_layers = tuple(int(l) for l in target_layers)
    fn = _stats_fn(spec, stats_layers, mesh, shard_sequence, shard_stats, gram_precision)

    n_sequences = 0
    seq_len = int(batches[0].shape[1])

    if accumulate == "device":
        uniform = len({b.shape for b in batches}) == 1
        if uniform and mesh is None and len(batches) > 1:
            # Single-dispatch scan over the stacked batches.
            n_sequences = sum(int(b.shape[0]) for b in batches)
            stacked = jnp.asarray(np.stack([np.asarray(b) for b in batches]))
            acc = _scan_stats_fn(spec, stats_layers, gram_precision)(params, stacked)
        else:
            acc = None
            for batch in batches:
                n_sequences += int(batch.shape[0])
                stats = fn(params, jnp.asarray(batch))
                acc = stats if acc is None else _acc_add(acc, stats)
        total_tokens = n_sequences * seq_len
        inv = jnp.asarray(1.0 / total_tokens, acc.cov_mlp.dtype)
        acc_mlp = acc.cov_mlp * inv
        acc_q = acc.cov_q * inv
        acc_k = acc.cov_k * inv
        acc_x = acc.cov_x * inv
        acc_shared = acc.cov_shared * inv if acc.cov_shared is not None else None
        bi = np.asarray(acc.bi_acc, dtype=np.float64) / n_sequences
    else:
        acc_mlp = acc_q = acc_k = acc_x = acc_shared = None
        bi = np.zeros(spec.n_layers, dtype=np.float64)
        for batch in batches:
            n_sequences += int(batch.shape[0])
            stats = fn(params, jnp.asarray(batch))
            # Host f64 accumulation (exact summation across batches).
            s_mlp = np.asarray(stats.cov_mlp, dtype=np.float64)
            s_q = np.asarray(stats.cov_q, dtype=np.float64)
            s_k = np.asarray(stats.cov_k, dtype=np.float64)
            s_x = np.asarray(stats.cov_x, dtype=np.float64)
            s_shared = (
                np.asarray(stats.cov_shared, dtype=np.float64)
                if stats.cov_shared is not None
                else None
            )
            bi += np.asarray(stats.bi_acc, dtype=np.float64)
            if acc_mlp is None:
                acc_mlp, acc_q, acc_k, acc_x = s_mlp, s_q, s_k, s_x
                acc_shared = s_shared
            else:
                acc_mlp += s_mlp
                acc_q += s_q
                acc_k += s_k
                acc_x += s_x
                if s_shared is not None:
                    acc_shared += s_shared

        total_tokens = n_sequences * seq_len
        # Normalisation (reference: calibration.py:135-146 — BI by sequence
        # count, covariances by token count; the reference hardcodes 2048 as
        # the token count per sequence, we use the actual seq_len, identical
        # for the reference's configs).
        bi /= n_sequences
        acc_mlp /= total_tokens
        acc_q /= total_tokens
        acc_k /= total_tokens
        acc_x /= total_tokens
        if acc_shared is not None:
            acc_shared /= total_tokens

    logger.info(
        "calibration: %d sequences x %d tokens, %d target layers (%s accumulation)",
        n_sequences,
        seq_len,
        len(stats_layers),
        accumulate,
    )
    return CalibrationResult(
        cov_mlp={l: acc_mlp[i] for i, l in enumerate(stats_layers)},
        cov_q={l: acc_q[i] for i, l in enumerate(stats_layers)},
        cov_k={l: acc_k[i] for i, l in enumerate(stats_layers)},
        cov_x={l: acc_x[i] for i, l in enumerate(stats_layers)},
        bi_scores=bi.tolist(),
        n_sequences=n_sequences,
        total_tokens=total_tokens,
        cov_shared=(
            {l: acc_shared[i] for i, l in enumerate(stats_layers)}
            if acc_shared is not None
            else {}
        ),
    )


# ---------------------------------------------------------------------------
# Windowed calibration: one compiled program for EVERY layer chunk
# ---------------------------------------------------------------------------


def _window_acc_shapes(spec: ModelSpec, width: int):
    """Accumulator zeros for one window: dense slots always; MoE slots
    (per-expert [E, D, D] + optional shared [Ds, Ds]) when the stack has
    MoE layers. Mixed dense/MoE stacks carry BOTH kinds — each layer's
    cond branch touches only its own kind, and the unused kind's slots
    stay zero for that layer index."""
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[0] // H
    acc = {
        "cov_q": jnp.zeros((width, H, q_hd, q_hd), jnp.float32),
        "cov_k": jnp.zeros((width, Hk, q_hd, q_hd), jnp.float32),
        "cov_x": jnp.zeros((width, spec.d_model, spec.d_model), jnp.float32),
        "bi": jnp.zeros((spec.n_layers,), jnp.float32),
    }
    dense_layers = [l for l in range(spec.n_layers) if not spec.is_moe_layer(l)]
    if dense_layers:
        dense_d = spec.gate_ranks[dense_layers[0]]
        acc["cov_mlp"] = jnp.zeros((width, dense_d, dense_d), jnp.float32)
    if spec.n_experts:
        acc["cov_moe"] = jnp.zeros(
            (width, spec.n_experts, spec.d_int, spec.d_int), jnp.float32
        )
        if spec.shared_d_int:
            acc["cov_shared"] = jnp.zeros(
                (width, spec.shared_d_int, spec.shared_d_int), jnp.float32
            )
    return acc


@functools.partial(
    jax.jit,
    static_argnames=("spec", "width", "attn_impl", "gram_precision"),
    donate_argnames=("acc",),
)
def _window_stats_step(spec: ModelSpec, params, batch, start, acc, width: int,
                       attn_impl: str = "xla", gram_precision: str = "highest"):
    """One batch through the UNROLLED forward, accumulating Gram taps for
    the traced layer window [start, start+width) into fixed [width, ...]
    slots (plus BI for every layer).

    Why this exists: the scanned stats path stacks the layer weights
    into [L, ...] arrays — a full second copy of the model. At 7B on a
    16 GB chip that copy does not fit next to the original (measured:
    22.6 GB requested). Here the weights are consumed in place and,
    because `start` is traced, ONE compiled program serves every chunk
    of a layers_per_step sweep.

    The forward runs every layer, but the Gram matmuls are wrapped in a
    `lax.cond` on window membership: layers OUTSIDE the live window pay
    zero tap FLOPs (the tapped tensors x_ln/q/k/h are byproducts of the
    forward; only their [D, D] Grams are conditional). Round 2 executed
    every layer's taps and masked them off — at layers_per_step=1 over
    32 layers that wasted ~32x the minimal tap FLOPs.
    """
    from modegpt_tpu.models.forward import (
        _bi_piece, _gram, _head_gram, _layer, _linear, _moe_gram, _scale_embed,
    )
    from modegpt_tpu.ops.rope import rope_cos_sin

    B, T = batch.shape
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[0] // H
    x = _scale_embed(spec, params["embed_tokens"][batch])
    if spec.arch in ("opt", "gpt2"):
        if "project_in" in params:
            x = _linear(x, params["project_in"])
        pos = jnp.arange(T, dtype=jnp.int32) + spec.position_offset
        x = x + params["embed_positions"][pos][None]
    cos = sin = None
    if spec.uses_rope:
        cos, sin = rope_cos_sin(
            jnp.arange(T, dtype=jnp.int32), spec.head_dim, spec.rope_theta,
            dtype=x.dtype, scaling=spec.rope_scaling,
        )

    acc_keys = tuple(k for k in acc if k != "bi")
    bi = []
    for l in range(spec.n_layers):
        x_new, raw = _layer(
            spec, l, params["layers"][l], x, cos, sin, "raw", attn_impl
        )
        slot = jnp.clip(l - start, 0, width - 1)
        inside = ((l - start >= 0) & (l - start < width))
        moe = spec.is_moe_layer(l)

        def add_taps(a, raw=raw, slot=slot, moe=moe):
            gp = gram_precision
            t = {
                "cov_q": _head_gram(raw["q"], gp),
                "cov_k": _head_gram(raw["k"], gp),
                "cov_x": _gram(raw["x_ln"].reshape(-1, spec.d_model), gp),
            }
            if moe:
                t["cov_moe"] = _moe_gram(raw["h_moe"], gp)
                if "h_shared" in raw:
                    t["cov_shared"] = _gram(
                        raw["h_shared"].reshape(-1, spec.shared_d_int), gp
                    )
            else:
                t["cov_mlp"] = _gram(raw["h"].reshape(-1, raw["h"].shape[-1]), gp)
            return {
                k: (a[k].at[slot].add(t[k]) if k in t else a[k]) for k in a
            }

        sub = {k: acc[k] for k in acc_keys}
        sub = lax.cond(inside, add_taps, lambda a: a, sub)
        bi.append(_bi_piece(x, x_new))
        # Scheduling barrier: without it XLA hoists every layer's
        # [d_int, d_int] gram temp alive at once (measured 21.8 GB for
        # 32 layers); tying the residual stream to the accumulators
        # forces layer l's taps to retire before layer l+1 computes.
        x, *accs = lax.optimization_barrier((x_new, *[sub[k] for k in acc_keys]))
        for key, a in zip(acc_keys, accs):
            acc[key] = a
    acc["bi"] = acc["bi"] + jnp.stack(bi)
    return acc


def calibrate_window(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    start: int,
    width: int,
    attn_impl: str = "auto",
    gram_precision: str = "highest",
) -> CalibrationResult:
    """calibrate() for layers [start, start+width) via the windowed
    single-program path (see _window_stats_step). Device-resident f32
    accumulation; intended for layers_per_step sweeps over models whose
    weights fill most of HBM (the 7B-on-one-v5e shape). Covers dense,
    MoE, and mixed dense/MoE stacks (per-expert and shared-expert tap
    slots ride the same window)."""
    if len(set(spec.q_ranks)) != 1:
        raise ValueError("calibrate_window needs uniform attention ranks")
    dense_gates = {
        spec.gate_ranks[l]
        for l in range(spec.n_layers)
        if not spec.is_moe_layer(l)
    }
    if len(dense_gates) > 1:
        raise ValueError("calibrate_window needs uniform dense MLP widths")
    if attn_impl == "auto":
        use_flash = jax.default_backend() == "tpu" and not jax.config.jax_enable_x64
        attn_impl = "flash" if use_flash else "xla"

    acc = _window_acc_shapes(spec, width)
    n_sequences = 0
    seq_len = int(batches[0].shape[1])
    start_arr = jnp.asarray(start, jnp.int32)
    for b in batches:
        n_sequences += int(b.shape[0])
        acc = _window_stats_step(
            spec, params, jnp.asarray(np.asarray(b, dtype=np.int32)), start_arr, acc,
            width, attn_impl, gram_precision,
        )
    total_tokens = n_sequences * seq_len
    inv = jnp.float32(1.0 / total_tokens)
    layers = [start + i for i in range(width) if start + i < spec.n_layers]
    logger.info(
        "calibration (windowed): %d sequences x %d tokens, layers %s",
        n_sequences, seq_len, layers,
    )
    # Drain the queue before building result slices: the tiny BI fetch
    # completes only after the last stats program retires, so its temp
    # arena is free before we allocate [d,d] result buffers next to the
    # full model weights (enqueue-time allocation otherwise overlaps
    # them — observed OOM at 7B scale).
    bi = np.asarray(acc["bi"], dtype=np.float64) / n_sequences
    out: Dict[str, Dict[int, jax.Array]] = {"cov_mlp": {}, "cov_shared": {}}
    for key in ("cov_q", "cov_k", "cov_x"):
        out[key] = {l: acc[key][i] * inv for i, l in enumerate(layers)}
        # free each [width, ...] accumulator before slicing the next
        acc.pop(key)
    for i, l in enumerate(layers):
        mlp_key = "cov_moe" if spec.is_moe_layer(l) else "cov_mlp"
        out["cov_mlp"][l] = acc[mlp_key][i] * inv
        if spec.has_shared_expert(l):
            out["cov_shared"][l] = acc["cov_shared"][i] * inv
    return CalibrationResult(
        cov_mlp=out["cov_mlp"],
        cov_q=out["cov_q"],
        cov_k=out["cov_k"],
        cov_x=out["cov_x"],
        bi_scores=bi.tolist(),
        n_sequences=n_sequences,
        total_tokens=total_tokens,
        cov_shared=out["cov_shared"] or None,
    )
