"""On-device perplexity harness.

Reproduces the reference's PPL computation exactly (reference:
src/eval.py:134-225): sequential ``seq_len`` windows, shifted
cross-entropy averaged per batch, and the final
``ppl = exp(sum_nll / (n_samples * (seq_len - 1)))`` formula
(eval.py:220). The per-batch loss is jitted; throughput is reported with
`block_until_ready` bracketing (the reference brackets with
torch.cuda.synchronize, eval.py:169-204).
"""

from __future__ import annotations

import logging
import math
import time
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from modegpt_tpu.models.forward import forward
from modegpt_tpu.models.scan_forward import forward_scan, supports_scan
from modegpt_tpu.models.spec import ModelSpec

logger = logging.getLogger("modegpt_tpu")

__all__ = ["compute_perplexity", "compute_perplexity_alpaca"]


@partial(jax.jit, static_argnames=("spec", "attn_impl"))
def _batch_nll(spec: ModelSpec, params, batch, attn_impl: str = "auto"):
    """Mean shifted cross-entropy over the batch, scaled back to a sum.

    Matches the reference: CE is averaged over all (B*(T-1)) positions
    then multiplied by (T-1)*B (eval.py:192-198), i.e. the plain sum of
    per-position NLL. Loss in float32.
    """
    fwd = forward_scan if supports_scan(spec, ()) else forward
    logits, _ = fwd(spec, params, batch, attn_impl=attn_impl)
    return _nll_from_logits(logits, batch)


def _nll_from_logits(logits, batch):
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = batch[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    return jnp.sum(nll)


@partial(jax.jit, static_argnames=("spec", "attn_impl"))
def _batch_nll_padded(spec: ModelSpec, layers, other, q_hd_true, batch, attn_impl="auto"):
    from modegpt_tpu.models.padded import forward_padded

    logits = forward_padded.__wrapped__(spec, layers, other, q_hd_true, batch, attn_impl)
    return _nll_from_logits(logits, batch)


def compute_perplexity(
    spec: ModelSpec,
    params: Dict,
    eval_tokens: np.ndarray,
    batch_size: int = 16,
    mesh: Optional[jax.sharding.Mesh] = None,
    metrics: Optional[Dict] = None,
    progress: bool = True,
    attn_impl: str = "auto",
    exec_mode: str = "auto",
) -> float:
    """Perplexity over pre-chunked eval windows [n, seq_len].

    exec_mode selects the heterogeneous-rank execution path: 'unrolled'
    (exact shapes, one compiled body per layer), 'padded' (zero-padded
    uniform scan, models/padded.py), or 'auto' (padded when the spec is
    non-uniform and the padding FLOP overhead is < 1.5x).
    """
    n_samples, seq_len = eval_tokens.shape

    if mesh is not None and "data" not in mesh.axis_names:
        # stage-only (pipeline) meshes have no data axis to shard eval over
        mesh = None

    # mixed sliding/full stacks pad fine now (per-layer window is a
    # scanned leaf, models/padded.py); only mixed dense/MoE stays unrolled
    mixed_moe = bool(spec.n_experts and spec.moe_layers)
    if exec_mode == "auto":
        from modegpt_tpu.models.padded import padding_overhead

        use_padded = (
            not spec.is_uniform
            and not mixed_moe
            and padding_overhead(spec) < 1.5
        )
    else:
        use_padded = exec_mode == "padded"
    if use_padded and mesh is not None:
        logger.warning(
            "exec_mode=padded is single-device; falling back to the unrolled "
            "path because a mesh was passed"
        )
    if use_padded and mesh is None:
        from modegpt_tpu.models.padded import pad_to_uniform, padding_overhead

        pm = pad_to_uniform(spec, params)
        logger.info(
            "eval: padded-uniform execution (%.1f%% FLOP overhead, compile O(1) in depth)",
            (padding_overhead(spec) - 1) * 100,
        )
        nll_fn = lambda _spec, _params, batch, impl: _batch_nll_padded(
            pm.spec, pm.layers, pm.other, pm.q_hd_true, batch, impl
        )
    else:
        nll_fn = _batch_nll
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        # pjit with explicit in_shardings rejects kwargs; bind attn_impl
        # positionally via a wrapper.
        impl = attn_impl

        def _nll_pos(spec, params, batch):
            return _batch_nll.__wrapped__(spec, params, batch, impl)

        nll_fn_mesh = jax.jit(
            _nll_pos,
            static_argnames=("spec",),
            in_shardings=(None, NamedSharding(mesh, P("data", None))),
            out_shardings=NamedSharding(mesh, P()),
        )
        nll_fn = lambda spec, params, batch, attn_impl: nll_fn_mesh(spec, params, batch)

    total_nll = 0.0
    total_tokens = 0
    t_start = time.perf_counter()
    for i in range(0, n_samples, batch_size):
        j = min(i + batch_size, n_samples)
        batch = jnp.asarray(eval_tokens[i:j])
        nll = nll_fn(spec, params, batch, attn_impl)
        total_nll += float(nll)
        total_tokens += (j - i) * seq_len
        if progress and i > 0:
            elapsed = time.perf_counter() - t_start
            running = math.exp(total_nll / ((j) * (seq_len - 1)))
            tps = total_tokens / max(elapsed, 1e-9)
            print(
                f"\rsample {j}/{n_samples} | ppl: {running:.2f} | {tps:,.0f} tok/s | {elapsed:.1f}s   ",
                end="",
                flush=True,
            )
    jax.block_until_ready(nll)
    elapsed = time.perf_counter() - t_start
    tps = total_tokens / max(elapsed, 1e-9)
    if progress:
        print()
    logger.info(
        "eval: %d tokens in %.2fs -> %.0f tok/s (%.1f ktok/s)",
        total_tokens,
        elapsed,
        tps,
        tps / 1000,
    )
    if metrics is not None:
        # Same metric keys as the reference (eval.py:213-215).
        metrics["throughput_tok/s"] = tps
        metrics["throughput_ktok/s"] = tps / 1000

    # exp(sum_nll / (n * (seq_len - 1)))  (reference: eval.py:220)
    return math.exp(total_nll / (n_samples * (seq_len - 1)))


@partial(jax.jit, static_argnames=("spec", "attn_impl"))
def _per_sample_nll(spec: ModelSpec, params, batch, lens, attn_impl: str = "auto"):
    """Per-row (sum shifted NLL, valid position count) with tail masking.

    Rows are right-padded; causal attention means pad tokens cannot leak
    into valid positions, so only the loss is masked.
    """
    fwd = forward_scan if supports_scan(spec, ()) else forward
    logits, _ = fwd(spec, params, batch, attn_impl=attn_impl)
    logits = logits[:, :-1, :].astype(jnp.float32)
    labels = batch[:, 1:]
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]  # [B, T-1]
    counts = jnp.maximum(lens - 1, 0)
    mask = jnp.arange(nll.shape[1])[None, :] < counts[:, None]
    return jnp.sum(nll * mask, axis=1), counts


def compute_perplexity_alpaca(
    spec: ModelSpec,
    params: Dict,
    tokenizer,
    texts=None,
    max_length: int = 2048,
    batch_size: int = 8,
    progress: bool = True,
) -> float:
    """Per-sample truncated-window alpaca perplexity.

    Reproduces the reference's ``evaluate_perplexity_alpaca``
    (eval.py:257-295) exactly: each held-out alpaca text is tokenized
    independently WITH special tokens and truncated to ``max_length``;
    per text, the loss is the MEAN shifted cross-entropy over its own
    window; texts are combined token-weighted by their FULL length
    (``total += loss_i * L_i; ppl = exp(total / sum L_i)`` — the
    reference weights by L, not L-1), and non-finite per-text losses are
    skipped. This differs from ``compute_perplexity``'s joined-window
    harness, which concatenates the corpus before chunking.

    TPU mapping: texts are sorted by length and right-padded to
    power-of-two buckets so one jitted program per bucket computes
    masked per-row NLLs for a whole batch.
    """
    if texts is None:
        from modegpt_tpu.calib.data import _alpaca_texts

        texts = _alpaca_texts(tokenizer, calib=False)

    seqs = []
    for t in texts:
        ids = tokenizer(t, truncation=True, max_length=max_length)["input_ids"]
        seqs.append(np.asarray(ids, dtype=np.int32))

    # Sort by length (stable): per-text losses are independent, so order
    # doesn't change the result, but bucketed batches pad far less.
    order = sorted(range(len(seqs)), key=lambda i: len(seqs[i]))
    total_loss = 0.0
    total_tokens = 0
    done = 0
    for start in range(0, len(order), batch_size):
        chunk = [seqs[i] for i in order[start : start + batch_size]]
        lens = np.asarray([len(s) for s in chunk], dtype=np.int32)
        width = 1 << max(int(np.ceil(np.log2(max(int(lens.max()), 2)))), 1)
        width = min(width, max_length)
        batch = np.zeros((len(chunk), width), dtype=np.int32)
        for r, s in enumerate(chunk):
            batch[r, : len(s)] = s
        sums, counts = _per_sample_nll(spec, params, jnp.asarray(batch), jnp.asarray(lens))
        sums, counts = np.asarray(sums), np.asarray(counts)
        for r in range(len(chunk)):
            if counts[r] == 0:
                continue  # single-token text: loss undefined (ref: isfinite skip)
            loss = sums[r] / counts[r]
            if not np.isfinite(loss):
                logger.warning("non-finite loss on a sample; skipping (ref: eval.py:279)")
                continue
            total_loss += float(loss) * int(lens[r])
            total_tokens += int(lens[r])
        done += len(chunk)
        if progress:
            print(f"\ralpaca sample {done}/{len(order)}   ", end="", flush=True)
    if progress:
        print()
    if total_tokens == 0:
        return float("inf")
    return math.exp(total_loss / total_tokens)
