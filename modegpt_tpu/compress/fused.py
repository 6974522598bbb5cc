"""Fused compression: the whole pipeline in (almost) one dispatch.

On tunneled / DCN-attached hosts, per-dispatch round-trip latency —
measured ~25 ms on this environment's v5e tunnel — dominates small-model
compression: the standard pipeline's ~20 host-synced steps cost more
than its math. This module restructures the whole job into THREE
compiled programs and ONE tiny host fetch:

1. ``_calibrate_allocate``: scan the calibration batches through the
   stats forward, normalise the Grams, run the BI softmax allocator
   (`ops/allocation`) — all on device. Output: covariance stacks
   (stay on device) + the keep-ratio vector (fetched: L floats).
2. host: derive per-layer ranks from the fetched keep ratios with
   EXACTLY the pipeline's rules (`compress_ranks_for_layer`) — ranks
   are shapes, so this is the one unavoidable host decision point.
3. ``_solve_padded``: every solver in rank-INDEPENDENT or padded form —
   Type-I via `nystrom_mlp_padded` at pad d_int with the TRACED rank
   vector (compiles once, any ranks), Type-II as pair scores + a full
   descending top-k (the exact mask for any even rank r is the first
   r/2 entries), Type-III via `vo_full_factors` (truncation = slicing).
4. ``_finalize``: slice the padded factors at the (now static) ranks
   and emit the compressed kernels directly — surgery included, so no
   eager per-leaf transposes.

Scope: dense RoPE-family stacks (llama/mistral/qwen-shaped: gated MLP,
pre-norm, bias-free attention) — the flagship shape. The padded MLP
factors are full-size ([L, d_int, d_model] f32), so this path targets
the latency-bound regime (≲1B); at 7B+ the memory-bound chunked
pipeline (`--calib_exec window`) is the right tool.

Factor-level equality with the standard pipeline is tested
(tests/test_fused.py).
"""

from __future__ import annotations

import logging
from functools import partial
from typing import Dict, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.calib.engine import CalibrationResult
from modegpt_tpu.compress.surgery import compress_ranks_for_layer
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models.forward import forward
from modegpt_tpu.models.scan_forward import forward_scan, supports_scan
from modegpt_tpu.models.spec import ModelSpec
from modegpt_tpu.ops.allocation import _allocate
from modegpt_tpu.ops.mlp import nystrom_mlp_padded
from modegpt_tpu.ops.qk import qk_rope_pair_scores
from modegpt_tpu.ops.vo import vo_full_factors

logger = logging.getLogger("modegpt_tpu")

__all__ = ["fused_compress", "supports_fused"]


def supports_fused(spec: ModelSpec) -> bool:
    return (
        spec.uses_rope
        and spec.gated_mlp
        and spec.pre_norms
        and not spec.post_norms
        and not spec.n_experts
        and not spec.attention_bias
        and spec.is_uniform
    )


@partial(
    jax.jit,
    static_argnames=("spec", "ratio", "smoothing", "max_sparsity", "gram_precision"),
)
def _calibrate_allocate(spec: ModelSpec, params, stacked, ratio, smoothing,
                        max_sparsity, gram_precision: str = "highest"):
    """[N, B, T] batches -> (normalised CalibStats stacks, keep [L])."""
    stats_layers = tuple(range(spec.n_layers))
    fwd = forward_scan if supports_scan(spec, stats_layers) else forward

    def one(batch):
        _, stats = fwd(
            spec, params, batch, stats_layers=stats_layers,
            gram_precision=gram_precision,
        )
        return stats

    init = one(stacked[0])
    if stacked.shape[0] > 1:
        acc, _ = jax.lax.scan(
            lambda c, b: (jax.tree_util.tree_map(jnp.add, c, one(b)), None),
            init, stacked[1:],
        )
    else:
        acc = init
    n_seq = stacked.shape[0] * stacked.shape[1]
    inv = jnp.asarray(1.0 / (n_seq * stacked.shape[2]), acc.cov_mlp.dtype)
    bi = acc.bi_acc.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    keep, _ = _allocate(bi / n_seq, ratio, smoothing, max_sparsity, False)
    return (
        acc.cov_mlp * inv, acc.cov_q * inv, acc.cov_k * inv, acc.cov_x * inv,
        keep,
    )


@partial(jax.jit, static_argnames=("spec", "nystrom_ridge", "ridge_qk", "ridge_vo"))
def _solve_padded(spec: ModelSpec, params, cov_mlp, cov_q, cov_k, cov_x, r_mlp,
                  nystrom_ridge, ridge_qk, ridge_vo):
    """All three solvers over the layer stack in padded / rank-free form.

    r_mlp [L] is TRACED — one compile serves any allocation outcome.
    """
    H, Hk, hd = spec.n_heads, spec.n_kv_heads, spec.head_dim
    d = spec.d_model

    def hfw(name):
        # [L, out, in] HF stacks from the per-layer kernels
        return jnp.stack(
            [params["layers"][l][name]["kernel"].T.astype(jnp.float32)
             for l in range(spec.n_layers)]
        )

    W_u, W_g, W_d = hfw("up"), hfw("gate"), hfw("down")

    def mlp_one(C, wu, wg, wd, r):
        up, gate, down, idx, valid = nystrom_mlp_padded(
            C, wu, wg, wd, r, spec.d_int, jnp.asarray(nystrom_ridge, C.dtype)
        )
        return up, gate, down

    up_p, gate_p, down_p = jax.vmap(mlp_one)(
        cov_mlp.astype(jnp.float32), W_u, W_g, W_d, r_mlp
    )

    # QK: full descending pair order per kv head; the exact mask for any
    # even rank r is concat(order[:, :r/2], order[:, :r/2] + hd/2)
    def qk_one(cq, ck):
        scores = qk_rope_pair_scores(
            cq.astype(jnp.float32), ck.astype(jnp.float32), ridge_qk, Hk
        )
        _, order = jax.lax.top_k(scores, hd // 2)
        return order.astype(jnp.int32)

    pair_order = jax.vmap(qk_one)(cov_q, cov_k)  # [L, Hk, hd/2]

    W_v, W_o = hfw("v"), hfw("o")

    def vo_one(Cx, wv, wo):
        return vo_full_factors(
            Cx.astype(jnp.float32), wv, wo, H, Hk, ridge_vo, whiten="cholesky"
        )

    v_full, o_full = jax.vmap(vo_one)(cov_x, W_v, W_o)  # [L,Hk,d,hd], [L,H,hd,d]
    return up_p, gate_p, down_p, pair_order, v_full, o_full


@partial(jax.jit, static_argnames=("spec", "ranks_mlp", "ranks_hd"))
def _finalize(spec: ModelSpec, params, up_p, gate_p, down_p, pair_order, v_full,
              o_full, ranks_mlp: Tuple[int, ...], ranks_hd: Tuple[int, ...]):
    """Static-rank slicing + surgery: emit the compressed kernels (and
    per-layer rotary masks) in the forward's [in, out] layout."""
    H, Hk, hd = spec.n_heads, spec.n_kv_heads, spec.head_dim
    d = spec.d_model
    group = spec.group_size
    half = hd // 2
    dtype = params["embed_tokens"].dtype

    new_layers = []
    for l in range(spec.n_layers):
        rm, rh = ranks_mlp[l], ranks_hd[l]
        mask = jnp.concatenate(
            [pair_order[l, :, : rh // 2], pair_order[l, :, : rh // 2] + half], axis=-1
        )  # [Hk, rh]
        Wq = params["layers"][l]["q"]["kernel"].T.reshape(H, hd, d)
        Wk = params["layers"][l]["k"]["kernel"].T.reshape(Hk, hd, d)
        q_rows = jnp.take_along_axis(
            Wq, jnp.repeat(mask, group, axis=0)[:, :, None], axis=1
        ).reshape(H * rh, d)
        k_rows = jnp.take_along_axis(Wk, mask[:, :, None], axis=1).reshape(Hk * rh, d)

        v_w = v_full[l][:, :, :rh].transpose(0, 2, 1).reshape(Hk * rh, d)
        o_w = o_full[l][:, :rh, :].transpose(2, 0, 1).reshape(d, H * rh)

        new_layers.append({
            "up": {"kernel": up_p[l, :rm, :].T.astype(dtype)},
            "gate": {"kernel": gate_p[l, :rm, :].T.astype(dtype)},
            "down": {"kernel": down_p[l][:, :rm].T.astype(dtype)},
            "q": {"kernel": q_rows.T.astype(dtype)},
            "k": {"kernel": k_rows.T.astype(dtype)},
            "v": {"kernel": v_w.T.astype(dtype)},
            "o": {"kernel": o_w.T.astype(dtype)},
            "rotary_mask": mask.astype(jnp.int32),
        })
    return new_layers


def fused_compress(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    config: CompressionConfig,
    mesh=None,
):
    """Compress with 3 dispatches + 1 tiny fetch (see module docstring).

    Returns (compressed_spec, compressed_params) — identical factors to
    the standard pipeline at solver_precision="f32_device".

    mesh: optional data-parallel mesh — the stacked calibration batches
    are committed sharded over the "data" axis (params replicated), so
    GSPMD partitions the calibration forwards and psums the Gram stacks;
    the solver/finalize stages run replicated.
    """
    if not supports_fused(spec):
        raise ValueError(
            "fused_compress covers uniform dense RoPE-family stacks "
            "(gated MLP, pre-norm, bias-free attention)"
        )
    stacked = jnp.asarray(np.stack([np.asarray(b, dtype=np.int32) for b in batches]))
    if mesh is not None and "data" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        stacked = jax.device_put(stacked, NamedSharding(mesh, P(None, "data", None)))
        params = jax.device_put(params, NamedSharding(mesh, P()))
    cov_mlp, cov_q, cov_k, cov_x, keep = _calibrate_allocate(
        spec, params, stacked, float(config.compression_ratio),
        float(config.sparsity_smoothing), float(config.max_sparsity),
        config.gram_precision,
    )
    keep_h = np.asarray(keep)  # the one host fetch: L floats
    ranks_mlp = tuple(
        compress_ranks_for_layer(spec, float(keep_h[l]), "mlp")
        for l in range(spec.n_layers)
    )
    ranks_hd = tuple(
        compress_ranks_for_layer(spec, float(keep_h[l]), "qk")
        for l in range(spec.n_layers)
    )
    up_p, gate_p, down_p, pair_order, v_full, o_full = _solve_padded(
        spec, params, cov_mlp, cov_q, cov_k, cov_x,
        jnp.asarray(np.asarray(ranks_mlp, np.int32)),
        float(config.nystrom_ridge), float(config.ridge_qk), float(config.ridge_vo),
    )
    new_layers = _finalize(
        spec, params, up_p, gate_p, down_p, pair_order, v_full, o_full,
        ranks_mlp, ranks_hd,
    )
    # merge: compressed projections from the program, everything else
    # (norms, embeds, lm_head) passed through by reference
    merged = []
    for l in range(spec.n_layers):
        lp = dict(params["layers"][l])
        lp.update(new_layers[l])
        merged.append(lp)
    cparams = dict(params)
    cparams["layers"] = merged
    cspec = spec.with_ranks(
        q_ranks=[spec.n_heads * r for r in ranks_hd],
        k_ranks=[spec.n_kv_heads * r for r in ranks_hd],
        v_ranks=[spec.n_kv_heads * r for r in ranks_hd],
        o_ranks=[spec.n_heads * r for r in ranks_hd],
        gate_ranks=list(ranks_mlp),
        has_rotary_masks=True,
    )
    return cspec, cparams
