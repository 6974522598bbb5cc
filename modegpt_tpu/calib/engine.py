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

import logging
from dataclasses import dataclass
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.models.forward import forward
from modegpt_tpu.models.spec import ModelSpec

logger = logging.getLogger("modegpt_tpu")

__all__ = ["CalibrationResult", "calibrate"]


@dataclass
class CalibrationResult:
    """Host-side float64 statistics, normalised by total token count
    (reference: calibration.py:141-146).

    Covariances are dicts keyed by ABSOLUTE layer index (only the target
    layers of this chunk are present); bi_scores covers every layer
    (reference computes BI for all layers each chunk, calibration.py:118-124).
    """

    cov_mlp: Dict[int, np.ndarray]
    cov_q: Dict[int, np.ndarray]
    cov_k: Dict[int, np.ndarray]
    cov_x: Dict[int, np.ndarray]
    bi_scores: List[float]
    n_sequences: int
    total_tokens: int


def _stats_fn(spec: ModelSpec, stats_layers: Tuple[int, ...], mesh: Optional[jax.sharding.Mesh]):
    """Build the jitted per-batch stats function (logits are discarded —
    XLA dead-code-eliminates the LM head for calibration batches)."""

    def fn(params, batch):
        _, stats = forward(spec, params, batch, stats_layers=stats_layers)
        return stats

    if mesh is None:
        return jax.jit(fn)

    from jax.sharding import NamedSharding, PartitionSpec as P

    batch_sharding = NamedSharding(mesh, P("data", None))
    replicated = NamedSharding(mesh, P())

    return jax.jit(
        fn,
        in_shardings=(replicated, batch_sharding),
        out_shardings=replicated,
    )


def calibrate(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    target_layers: Sequence[int],
    mesh: Optional[jax.sharding.Mesh] = None,
) -> CalibrationResult:
    """Run calibration forwards and accumulate statistics.

    Args:
      batches: list of [B, T] int token arrays (uniform T; B may vary on
        the last batch).
      target_layers: layers whose Grams are collected this chunk.
    """
    stats_layers = tuple(int(l) for l in target_layers)
    fn = _stats_fn(spec, stats_layers, mesh)

    acc_mlp = acc_q = acc_k = acc_x = None
    bi = np.zeros(spec.n_layers, dtype=np.float64)
    n_sequences = 0
    seq_len = int(batches[0].shape[1])

    for batch in batches:
        n_sequences += int(batch.shape[0])
        stats = fn(params, jnp.asarray(batch))
        # Host f64 accumulation (exact summation across batches).
        s_mlp = np.asarray(stats.cov_mlp, dtype=np.float64)
        s_q = np.asarray(stats.cov_q, dtype=np.float64)
        s_k = np.asarray(stats.cov_k, dtype=np.float64)
        s_x = np.asarray(stats.cov_x, dtype=np.float64)
        bi += np.asarray(stats.bi_acc, dtype=np.float64)
        if acc_mlp is None:
            acc_mlp, acc_q, acc_k, acc_x = s_mlp, s_q, s_k, s_x
        else:
            acc_mlp += s_mlp
            acc_q += s_q
            acc_k += s_k
            acc_x += s_x

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

    logger.info(
        "calibration: %d sequences x %d tokens, %d target layers",
        n_sequences,
        seq_len,
        len(stats_layers),
    )
    return CalibrationResult(
        cov_mlp={l: acc_mlp[i] for i, l in enumerate(stats_layers)},
        cov_q={l: acc_q[i] for i, l in enumerate(stats_layers)},
        cov_k={l: acc_k[i] for i, l in enumerate(stats_layers)},
        cov_x={l: acc_x[i] for i, l in enumerate(stats_layers)},
        bi_scores=bi.tolist(),
        n_sequences=n_sequences,
        total_tokens=total_tokens,
    )
