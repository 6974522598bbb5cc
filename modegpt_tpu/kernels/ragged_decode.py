"""Ragged GQA decode attention: HBM traffic scales with slot lengths.

The serving decode step attends each slot's single new query over its
own cache prefix [0, count_s). The XLA path contracts over the full
[slots, Hk, max_len, R] pool and masks — every decode step reads the
WHOLE cache pool from HBM no matter how full each slot actually is.
This kernel tiles the length axis and CLAMPS the K/V block index map at
each slot's last live block: Pallas skips the HBM->VMEM copy whenever
consecutive grid steps map to the same block, so per-slot traffic is
ceil(count_s / block_t) tiles instead of max_len / block_t — the
slot-table analogue of flash-decoding over a paged cache. At 25 %
average occupancy that is ~4x less cache-read bandwidth, which is where
the decode step's HBM time goes once weights are amortised over slots.

Grid (B, Hk, n_blocks) with `counts` scalar-prefetched so the index
maps can clamp; online-softmax state (m, l, acc) persists in VMEM
scratch across the innermost (length) grid axis — init at j == 0,
accumulate under ``pl.when(j <= last_block)``, finalize into the output
on the last grid step. GQA is native: each (b, kv-head) program attends
its whole q-head group [G, Rq] against one [block_t, Rq] tile, so K/V
are read once per kv head (never repeated to H).

Scope (serving fast path): single-position queries, full-precision
cache, no logit softcap, no sliding window — the caller falls back to
the XLA contraction otherwise.
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

__all__ = ["ragged_gqa_decode"]


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(counts_ref, q_ref, k_ref, v_ref, o_ref, acc_ref, m_ref, l_ref,
            *, block_t: int):
    b = pl.program_id(0)
    j = pl.program_id(2)
    n_j = pl.num_programs(2)
    cnt = counts_ref[b]
    last = (cnt - 1) // block_t

    in_dtype = q_ref.dtype
    mxu_precision = (
        lax.Precision.HIGHEST if in_dtype == jnp.float32 else lax.Precision.DEFAULT
    )

    @pl.when(j == 0)
    def _init():
        acc_ref[:] = jnp.zeros_like(acc_ref)
        m_ref[:] = jnp.full_like(m_ref, NEG_INF)
        l_ref[:] = jnp.zeros_like(l_ref)

    @pl.when(j <= last)
    def _step():
        q = q_ref[0, 0]   # [G, Rq] (pre-scaled by caller)
        kb = k_ref[0, 0]  # [block_t, Rq]
        vb = v_ref[0, 0]  # [block_t, Rv]
        s = lax.dot_general(
            q, kb, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_precision,
        )  # [G, block_t] f32
        k_ids = j * block_t + lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(k_ids < cnt, s, NEG_INF)

        m_prev = m_ref[:, 0]  # [G]
        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])  # [G, block_t] f32
        l_new = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
        acc_ref[:] = acc_ref[:] * alpha[:, None] + lax.dot_general(
            p.astype(in_dtype) if in_dtype != jnp.float32 else p, vb,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=mxu_precision,
        )
        m_ref[:] = jnp.broadcast_to(m_cur[:, None], m_ref.shape)
        l_ref[:] = jnp.broadcast_to(l_new[:, None], l_ref.shape)

    @pl.when(j == n_j - 1)
    def _finish():
        o_ref[0, 0] = (
            acc_ref[:] / jnp.maximum(l_ref[:, :1], 1e-30)
        ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def ragged_gqa_decode(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    counts: jax.Array,
    block_t: int = 256,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """One-position ragged GQA attention over a slot-table cache.

    Args:
      q: [B, H, Rq] — each slot's single query, ALREADY scaled.
      k: [B, Hk, T, Rq] cache pool (Hk divides H).
      v: [B, Hk, T, Rv] cache pool.
      counts: [B] int32 — positions attended per slot (>= 1; the decode
        step attends t < counts[b], i.e. counts = length + 1 after the
        new token's K/V is written).
    Returns [B, H, Rv] in q's dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, Rq = q.shape
    _, Hk, T, _ = k.shape
    Rv = v.shape[-1]
    G = H // Hk

    block_t = min(block_t, _ceil_to(T, 128))
    t_pad = _ceil_to(T, block_t)
    if t_pad != T:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, t_pad - T), (0, 0)))
    n_blk = t_pad // block_t
    q4 = q.reshape(B, Hk, G, Rq)
    counts = counts.astype(jnp.int32)

    def q_map(b, h, j, cnt):
        return (b, h, 0, 0)

    def kv_map(b, h, j, cnt):
        # clamp at the slot's last live block: grid steps past it revisit
        # the same tile, and Pallas skips the copy for a repeated block
        return (b, h, jnp.minimum(j, (cnt[b] - 1) // block_t), 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B, Hk, n_blk),
        in_specs=[
            pl.BlockSpec((1, 1, G, Rq), q_map),
            pl.BlockSpec((1, 1, block_t, Rq), kv_map),
            pl.BlockSpec((1, 1, block_t, Rv), kv_map),
        ],
        out_specs=pl.BlockSpec((1, 1, G, Rv), q_map),
        scratch_shapes=[
            pltpu.VMEM((G, Rv), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
            pltpu.VMEM((G, 128), jnp.float32),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_kernel, block_t=block_t),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B, Hk, G, Rv), q.dtype),
        interpret=interpret,
    )(counts, q4, k, v)
    return out.reshape(B, H, Rv)
