"""Ragged GQA decode attention: HBM traffic scales with slot lengths.

The serving decode step attends each slot's single new query over its
own cache prefix [0, count_s). The XLA path contracts over the full
[slots, Hk, max_len, R] pool and masks — every decode step reads the
WHOLE cache pool from HBM no matter how full each slot actually is.
This kernel tiles the length axis and CLAMPS the K/V block index map to
each slot's live block range: Pallas skips the HBM->VMEM copy whenever
consecutive grid steps map to the same block, so per-slot traffic is
ceil(live_len_s / block_t) tiles instead of max_len / block_t — the
slot-table analogue of flash-decoding over a paged cache. At 25 %
average occupancy that is ~4x less cache-read bandwidth, which is where
the decode step's HBM time goes once weights are amortised over slots.

Grid (B, n_blocks) with `pos` and the `window` scalar-prefetched so
the index maps can clamp; online-softmax state (m, l, acc) persists in
VMEM scratch across the innermost (length) grid axis — init at j == 0,
accumulate under ``pl.when(first <= j <= last)``, finalize into the
output on the last grid step. Each program carries ALL Hk kv heads'
tiles ([Hk, block_t, R] blocks, a static in-kernel head loop): the
per-step DMA is Hk-fold bigger and the grid Hk-fold shorter than a
(B, Hk, n_blocks) layout, which matters because the kernel is
DMA-issue-bound, not FLOP-bound (measured on v5e: 64 KB blocks over a
4096-step grid ran 2.2x slower than XLA's full-pool contraction;
bench_results/r03/serving_ab). GQA is native: each kv head attends its
whole q-head group [G, Rq] against one [block_t, Rq] tile, so K/V are
read once per kv head (never repeated to H).

Covered beyond the plain case (each lifts an XLA-fallback from the
serving fast path):

* **int8 KV** (``k_scale``/``v_scale`` given): K/V are int8 codes with
  per-(slot, head, position) symmetric scales. The codes hit the MXU
  directly (cast in VMEM — ints <= 127 are exact in bf16) and the
  position-wise scales fold into the score columns / probability rows,
  so the kernel reads HALF the bytes of the bf16 pool and never
  materialises a dequantised cache — the XLA path's dequant temp is
  exactly what made int8 KV capacity-only on v5e
  (bench_results/r02).
* **sliding window** (``window`` > 0, static or traced): attends
  t in [max(0, count-window), count). The block range clamps at BOTH
  ends, so an 8k-context 512-window layer reads 512 positions' worth
  of tiles, not 8k.
* **logit softcap** (static float): s -> cap * tanh(s / cap) before
  masking, matching forward._softcap (gemma2).

Multi-position queries (``ragged_gqa_attend``) cover the OTHER ragged
serving dispatches — chunked/batched prefill and the speculative
(k+1)-position verify step: each slot's S queries sit at absolute
positions pos[b]..pos[b]+S-1 and query s attends t <= pos[b]+s
(causal over the new positions, full prefix before them), so one
kernel serves decode (S=1), draft, verify and prefill chunks. The
q-head group and the S positions share the MXU tile ([G*S, Rq] rows),
and the live block range is the UNION of the rows' windows.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

__all__ = ["ragged_gqa_decode", "ragged_gqa_attend"]


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _live_range(pos0, s_len: int, win, block_t: int):
    """Union block range [first, last] of the S queries' live keys:
    query s attends t in [lo(s), pos0 + s] with
    lo(s) = max(0, pos0 + s + 1 - win) (0 when win <= 0), so the union
    is [lo(0), pos0 + S - 1]. Returns (lo(0), first_blk, last_blk)."""
    start_pos = jnp.where(win > 0, jnp.maximum(pos0 + 1 - win, 0), 0)
    return start_pos, start_pos // block_t, (pos0 + s_len - 1) // block_t


def _kernel(pos_ref, win_ref, q_ref, k_ref, v_ref, *rest,
            block_t: int, s_len: int, n_hk: int, quantized: bool,
            softcap: Optional[float], out_dtype):
    if quantized:
        ks_ref, vs_ref, o_ref, acc_ref, m_ref, l_ref = rest
    else:
        o_ref, acc_ref, m_ref, l_ref = rest
        ks_ref = vs_ref = None
    b = pl.program_id(0)
    j = pl.program_id(1)
    n_j = pl.num_programs(1)
    p0 = pos_ref[b]
    win = win_ref[0]
    _, first, last = _live_range(p0, s_len, win, block_t)

    in_dtype = q_ref.dtype
    mxu_precision = (
        lax.Precision.HIGHEST if in_dtype == jnp.float32 else lax.Precision.DEFAULT
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when((j >= first) & (j <= last))
    def _step():
        # the causal/window mask is head-independent: build it once for
        # the whole static head loop below
        rows_shape = (q_ref.shape[2], block_t)  # [G*S, block_t]
        k_ids = j * block_t + lax.broadcasted_iota(jnp.int32, rows_shape, 1)
        if s_len == 1:
            limit = p0  # scalar broadcasts — skip the row-index modulo
        else:
            rows = lax.broadcasted_iota(jnp.int32, rows_shape, 0)
            limit = p0 + rows % s_len  # query s at position pos0 + s
        lo = jnp.where(win > 0, jnp.maximum(limit + 1 - win, 0), 0)
        live = (k_ids <= limit) & (k_ids >= lo)

        for h in range(n_hk):
            q = q_ref[0, h]   # [G*S, Rq] (pre-scaled; row = g*S + s)
            kb = k_ref[0, h]  # [block_t, Rq] (int8 codes when quantized)
            vb = v_ref[0, h]  # [block_t, Rv]
            if quantized:
                # codes are integers <= 127: exact in bf16, so the cast
                # in VMEM is lossless and the MXU sees the same operands
                # the dequantised-bf16 matmul would — minus half the HBM
                # reads
                kb = kb.astype(in_dtype)
                vb = vb.astype(in_dtype)
            s = lax.dot_general(
                q, kb, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_precision,
            )  # [G*S, block_t] f32
            if quantized:
                # per-position K scale factors out of the Rq contraction
                s = s * ks_ref[0, h].astype(jnp.float32)  # [1, block_t]
            if softcap is not None:
                s = jnp.tanh(s / softcap) * softcap
            s = jnp.where(live, s, NEG_INF)

            m_prev = m_ref[h, :, 0]  # [G*S]
            m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
            alpha = jnp.exp(m_prev - m_cur)
            p = jnp.exp(s - m_cur[:, None])  # [G*S, block_t] f32
            l_new = l_ref[h, :, 0] * alpha + jnp.sum(p, axis=1)
            if quantized:
                # per-position V scale folds into the probability rows
                p = p * vs_ref[0, h].astype(jnp.float32)  # [1, block_t]
            acc_ref[h] = acc_ref[h] * alpha[:, None] + lax.dot_general(
                p.astype(in_dtype) if in_dtype != jnp.float32 else p, vb,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=mxu_precision,
            )
            m_ref[h] = jnp.broadcast_to(m_cur[:, None], m_ref.shape[1:])
            l_ref[h] = jnp.broadcast_to(l_new[:, None], l_ref.shape[1:])

    @pl.when(j == n_j - 1)
    def _finish():
        for h in range(n_hk):
            o_ref[0, h] = (
                acc_ref[h] / jnp.maximum(l_ref[h, :, :1], 1e-30)
            ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("block_t", "interpret", "softcap")
)
def ragged_gqa_attend(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pos: jax.Array,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    window=None,
    softcap: Optional[float] = None,
    block_t: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """S-position ragged GQA attention over a slot-table cache.

    Slot b's query s sits at absolute position ``pos[b] + s`` and
    attends ``t in [max(0, pos[b]+s+1-window), pos[b]+s]`` — causal
    over the new positions, full (or windowed) prefix before them. The
    new positions' own K/V must already be scattered into the pools
    (the padded decode/prefill step writes before it reads).

    Args:
      q: [B, H, S, Rq] — each slot's S queries, ALREADY scaled.
      k: [B, Hk, T, Rq] cache pool (Hk divides H); int8 codes when
        `k_scale` is given.
      v: [B, Hk, T, Rv] cache pool; int8 codes when `v_scale` is given.
      pos: [B] int32 — each slot's first query position (its current
        length before the S new tokens).
      k_scale, v_scale: [B, Hk, T] per-position dequant scales (int8 KV),
        or None for a full-precision cache. Give both or neither.
      window: sliding window size (int or traced scalar; None/0 = full
        attention).
      softcap: static logit softcap (gemma2) or None.
    Returns [B, H, S, Rv] in q's dtype.
    """
    if (k_scale is None) != (v_scale is None):
        raise ValueError("give both k_scale and v_scale, or neither")
    quantized = k_scale is not None
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, S, Rq = q.shape
    _, Hk, T, _ = k.shape
    Rv = v.shape[-1]
    G = H // Hk

    # Each program holds all Hk heads' K/V tiles (double-buffered by the
    # Pallas pipeline): shrink block_t so the in-flight working set
    # stays well under VMEM even for MHA-wide Hk or fat head dims.
    bytes_per_t = Hk * (Rq + Rv) * (1 if quantized else k.dtype.itemsize)
    while block_t > 128 and 2 * block_t * bytes_per_t > 6 * 1024 * 1024:
        block_t //= 2
    block_t = min(block_t, _ceil_to(T, 128))
    t_pad = _ceil_to(T, block_t)
    if t_pad != T:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
        if quantized:
            k_scale = jnp.pad(k_scale, ((0, 0), (0, 0), (0, t_pad - T)))
            v_scale = jnp.pad(v_scale, ((0, 0), (0, 0), (0, t_pad - T)))
    n_blk = t_pad // block_t
    # row = g*S + s: the q-head group and the chunk positions share the
    # MXU tile, so K/V are still read once per kv head per block
    q4 = q.reshape(B, Hk, G * S, Rq)
    pos = pos.astype(jnp.int32)
    win = jnp.asarray(0 if window is None else window, jnp.int32).reshape(1)
    if quantized:
        # [B, Hk, 1, T]: the length axis lands on lanes, so the scale
        # block (1, Hk, 1, block_t) satisfies Mosaic's last-two-dims
        # tiling rule (1 == the array's own third dim; block_t % 128)
        k_scale = k_scale[:, :, None, :]
        v_scale = v_scale[:, :, None, :]

    def q_map(b, j, p, w):
        return (b, 0, 0, 0)

    def _blk(b, j, p, w):
        # clamp to the slot's live block range: grid steps outside it
        # revisit an edge tile, and Pallas skips the copy for a
        # repeated block — reads scale with live length, not max_len.
        # The outer clip keeps masked serving rows (whose pos may sit
        # at/past the pool edge, e.g. non-prefilling slots in a batched
        # prefill) inside the array; their output is discarded.
        _, first, last = _live_range(p[b], S, w[0], block_t)
        return jnp.clip(jnp.clip(j, first, last), 0, n_blk - 1)

    def kv_map(b, j, p, w):
        return (b, 0, _blk(b, j, p, w), 0)

    def sc_map(b, j, p, w):
        return (b, 0, 0, _blk(b, j, p, w))

    in_specs = [
        pl.BlockSpec((1, Hk, G * S, Rq), q_map),
        pl.BlockSpec((1, Hk, block_t, Rq), kv_map),
        pl.BlockSpec((1, Hk, block_t, Rv), kv_map),
    ]
    operands = [q4, k, v]
    if quantized:
        in_specs += [
            pl.BlockSpec((1, Hk, 1, block_t), sc_map),
            pl.BlockSpec((1, Hk, 1, block_t), sc_map),
        ]
        operands += [k_scale, v_scale]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(B, n_blk),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, Hk, G * S, Rv), q_map),
        scratch_shapes=[
            pltpu.VMEM((Hk, G * S, Rv), jnp.float32),
            pltpu.VMEM((Hk, G * S, 128), jnp.float32),
            pltpu.VMEM((Hk, G * S, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(
            _kernel, block_t=block_t, s_len=S, n_hk=Hk, quantized=quantized,
            softcap=softcap, out_dtype=q.dtype,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G * S, Rv), q.dtype),
        interpret=interpret,
    )(pos, win, *operands)
    return out.reshape(B, H, S, Rv)


@functools.partial(
    jax.jit, static_argnames=("block_t", "interpret", "softcap")
)
def ragged_gqa_decode(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    counts: jax.Array,
    k_scale: Optional[jax.Array] = None,
    v_scale: Optional[jax.Array] = None,
    window=None,
    softcap: Optional[float] = None,
    block_t: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One-position ragged GQA attention (the decode/draft step).

    ``counts`` [B] is the number of positions attended per slot (>= 1;
    the decode step attends t < counts[b], i.e. counts = length + 1
    after the new token's K/V is written). Equivalent to
    ``ragged_gqa_attend`` with S = 1 and pos = counts - 1; see it for
    the other arguments. Returns [B, H, Rv]."""
    out = ragged_gqa_attend(
        q[:, :, None, :], k, v, counts.astype(jnp.int32) - 1,
        k_scale=k_scale, v_scale=v_scale, window=window, softcap=softcap,
        block_t=block_t, interpret=interpret,
    )
    return out[:, :, 0, :]
