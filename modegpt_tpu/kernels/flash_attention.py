"""Pallas TPU flash attention for compressed (non-128-aligned) head dims.

The compressed models this framework produces have per-layer head dims
like 40, 44, 88 (head_dim * keep_ratio, evenized) — XLA's stock attention
handles them, but materialises the [T, T] score matrix in HBM at eval
batch sizes. This kernel computes causal attention with the standard
online-softmax (flash) recurrence, tiled over the query and key sequence
axes so scores live only in VMEM, with the non-aligned head dim padded
to the lane width inside VMEM only.

Grid: (batch*heads, q_tiles); the k loop is a `fori_loop` inside the
kernel over k tiles up to the causal frontier. GQA is handled by the
index map (kv head = q head // group).

Inference/eval only (no VJP — the compression pipeline is training-free;
reference has no backward passes either).
"""

from __future__ import annotations

import functools
import math
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _attn_kernel(q_ref, k_ref, v_ref, o_ref, *, block_q, block_k, seq_len, window):
    qi = pl.program_id(1)
    # dtype policy: f32 inputs run at HIGHEST precision (the MXU's default
    # f32 decomposition costs ~8e-3 relative error); bf16 inputs stay bf16
    # on the MXU with f32 accumulators (single pass, exact for bf16 data —
    # upcasting them to f32 + HIGHEST would force the slow multi-pass path).
    in_dtype = q_ref.dtype
    mxu_precision = (
        jax.lax.Precision.HIGHEST if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    q = q_ref[0]  # [block_q, hd] (pre-scaled by caller)

    q_start = qi * block_q
    # causal frontier: last k tile index that intersects this q tile
    num_k = (q_start + block_q + block_k - 1) // block_k
    # sliding window: first k tile that can still be inside the window
    # (key is visible iff q - window < k <= q)
    if window is None:
        k_lo = 0
    else:
        # q_start is traced (program_id); keep the bound computation traced.
        k_lo = jnp.maximum(0, (q_start - window + 1) // block_k)

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        k = k_ref[0, pl.ds(ki * block_k, block_k), :]
        v = v_ref[0, pl.ds(ki * block_k, block_k), :]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )  # [block_q, block_k] f32
        q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_ids <= q_ids) & (k_ids < seq_len)
        if window is not None:
            mask = mask & (k_ids > q_ids - window)
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])  # f32
        l_cur = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(in_dtype) if in_dtype != jnp.float32 else p,
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )
        return acc, m_cur, l_cur

    hd_v = v_ref.shape[-1]
    acc0 = jnp.zeros((block_q, hd_v), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(k_lo, num_k, body, (acc0, m0, l0))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret", "window"))
def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = 256,
    block_k: int = 512,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """Causal (optionally sliding-window) flash attention.

    Default blocks (256, 512) measured best on TPU v5e across
    B4/H16/T2048/hd44, B2/H32/T4096/hd96 and B8/H16/T1024/hd64
    (23-26% over 256x256; wider k-tiles amortise the q-tile's VMEM
    residency across more MXU work).

    Args:
      q: [B, H, T, hd]
      k: [B, Hk, T, hd]   (Hk divides H; GQA repeat handled by index map)
      v: [B, Hk, T, hd_v]
      interpret: force Pallas interpreter mode (auto: on for CPU backend,
        where Mosaic TPU kernels can't compile).
      window: sliding-window size (key visible iff q-window < k <= q;
        Qwen3 semantics, reference: DenseQwenRebuild.py:341).
    Returns [B, H, T, hd_v] in q's dtype.
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, hd = q.shape
    Hk = k.shape[1]
    hd_v = v.shape[-1]
    group = H // Hk
    if scale is None:
        scale = 1.0 / math.sqrt(hd)

    block_q = min(block_q, _ceil_to(T, 128))
    block_k = min(block_k, _ceil_to(T, 128))
    if block_k % block_q != 0 and block_q % block_k != 0:
        # clamping can leave the q/k tiles without a common multiple
        # (e.g. T=300: block_q 256, block_k 384) and then one pad length
        # cannot tile both — the q grid under-covered and real rows past
        # the last full q-tile were returned as uninitialized memory
        block_k = _ceil_to(block_k, block_q)
    t_pad = _ceil_to(T, max(block_q, block_k))

    # Pre-scale q outside the kernel (a traced scalar can't be closed over).
    qf = (q * jnp.asarray(scale, q.dtype)).reshape(B * H, T, hd)
    kf = k.reshape(B * Hk, T, hd)
    vf = v.reshape(B * Hk, T, hd_v)
    if t_pad != T:
        qf = jnp.pad(qf, ((0, 0), (0, t_pad - T), (0, 0)))
        kf = jnp.pad(kf, ((0, 0), (0, t_pad - T), (0, 0)))
        vf = jnp.pad(vf, ((0, 0), (0, t_pad - T), (0, 0)))

    grid = (B * H, t_pad // block_q)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel, block_q=block_q, block_k=block_k, seq_len=T, window=window
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec((1, t_pad, hd), lambda bh, qi, group=group: (bh // group, 0, 0)),
            pl.BlockSpec((1, t_pad, hd_v), lambda bh, qi, group=group: (bh // group, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, hd_v), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, hd_v), q.dtype),
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :T, :].reshape(B, H, T, hd_v)


def _attn_kernel_hbm(
    q_ref, k_hbm, v_hbm, o_ref, k_buf, v_buf, sem_k, sem_v,
    *, block_q, block_k, seq_len, window, group,
):
    """Flash body with K/V streamed from HBM via double-buffered DMA.

    K/V never fully enter VMEM — each [block_k, hd] tile is copied into a
    two-slot scratch while the previous tile computes (pallas guide's
    double-buffering pattern), so sequence length is bounded by HBM, not
    the ~16 MB VMEM.
    """
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    kv_idx = bh // group

    in_dtype = q_ref.dtype
    mxu_precision = (
        jax.lax.Precision.HIGHEST if in_dtype == jnp.float32 else jax.lax.Precision.DEFAULT
    )
    q = q_ref[0]
    q_start = qi * block_q
    num_k = (q_start + block_q + block_k - 1) // block_k
    if window is None:
        k_lo = 0
    else:
        k_lo = jnp.maximum(0, (q_start - window + 1) // block_k)

    def dma(ki, slot):
        return (
            pltpu.make_async_copy(
                k_hbm.at[kv_idx, pl.ds(ki * block_k, block_k), :],
                k_buf.at[slot],
                sem_k.at[slot],
            ),
            pltpu.make_async_copy(
                v_hbm.at[kv_idx, pl.ds(ki * block_k, block_k), :],
                v_buf.at[slot],
                sem_v.at[slot],
            ),
        )

    # Warm up the pipeline with the first tile.
    dk0, dv0 = dma(k_lo, k_lo % 2)
    dk0.start()
    dv0.start()

    def body(ki, carry):
        acc, m_prev, l_prev = carry
        slot = ki % 2

        @pl.when(ki + 1 < num_k)
        def _():
            dk, dv = dma(ki + 1, (ki + 1) % 2)
            dk.start()
            dv.start()

        dk_cur, dv_cur = dma(ki, slot)
        dk_cur.wait()
        dv_cur.wait()

        k = k_buf[slot]
        v = v_buf[slot]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )
        q_ids = q_start + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 0)
        k_ids = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (block_q, block_k), 1)
        mask = (k_ids <= q_ids) & (k_ids < seq_len)
        if window is not None:
            mask = mask & (k_ids > q_ids - window)
        s = jnp.where(mask, s, NEG_INF)

        m_cur = jnp.maximum(m_prev, jnp.max(s, axis=1))
        alpha = jnp.exp(m_prev - m_cur)
        p = jnp.exp(s - m_cur[:, None])
        l_cur = l_prev * alpha + jnp.sum(p, axis=1)
        acc = acc * alpha[:, None] + jax.lax.dot_general(
            p.astype(in_dtype) if in_dtype != jnp.float32 else p,
            v,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=mxu_precision,
        )
        return acc, m_cur, l_cur

    hd_v = v_buf.shape[-1]
    acc0 = jnp.zeros((block_q, hd_v), jnp.float32)
    m0 = jnp.full((block_q,), NEG_INF, jnp.float32)
    l0 = jnp.zeros((block_q,), jnp.float32)
    acc, m, l = jax.lax.fori_loop(k_lo, num_k, body, (acc0, m0, l0))

    o_ref[0] = (acc / jnp.maximum(l, 1e-30)[:, None]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "block_k", "interpret", "window"))
def flash_attention_hbm(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    scale: Optional[float] = None,
    block_q: int = 512,
    block_k: int = 1024,
    interpret: Optional[bool] = None,
    window: Optional[int] = None,
) -> jax.Array:
    """Long-context flash attention: K/V stay in HBM, tiles are streamed
    into VMEM with double-buffered DMA. Same semantics as
    `flash_attention`; use when T is too long for whole-K/V-in-VMEM
    (~30k+ tokens at hd 128 f32).

    Default blocks (512, 1024) measured best on TPU v5e at
    B1/H16/T16384/hd96 (16.9ms vs 27.7ms at 256x256): bigger k-tiles
    keep the double-buffered DMA pipeline ahead of the MXU."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    B, H, T, hd = q.shape
    Hk = k.shape[1]
    hd_v = v.shape[-1]
    group = H // Hk
    if scale is None:
        scale = 1.0 / math.sqrt(hd)

    block_q = min(block_q, _ceil_to(T, 128))
    block_k = min(block_k, _ceil_to(T, 128))
    if block_k % block_q != 0 and block_q % block_k != 0:
        # same under-coverage hazard as `flash_attention` (see there)
        block_k = _ceil_to(block_k, block_q)
    t_pad = _ceil_to(T, max(block_q, block_k))
    # Manual HBM DMA slices must be 128-lane aligned (Mosaic tiling);
    # zero-padded head columns contribute nothing to q.k or the output.
    hd_p = _ceil_to(hd, 128)
    hd_v_p = _ceil_to(hd_v, 128)

    qf = (q * jnp.asarray(scale, q.dtype)).reshape(B * H, T, hd)
    kf = k.reshape(B * Hk, T, hd)
    vf = v.reshape(B * Hk, T, hd_v)
    qf = jnp.pad(qf, ((0, 0), (0, t_pad - T), (0, hd_p - hd)))
    kf = jnp.pad(kf, ((0, 0), (0, t_pad - T), (0, hd_p - hd)))
    vf = jnp.pad(vf, ((0, 0), (0, t_pad - T), (0, hd_v_p - hd_v)))

    grid = (B * H, t_pad // block_q)

    out = pl.pallas_call(
        functools.partial(
            _attn_kernel_hbm,
            block_q=block_q, block_k=block_k, seq_len=T, window=window, group=group,
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, hd_p), lambda bh, qi: (bh, qi, 0)),
            pl.BlockSpec(memory_space=pl.ANY),  # K stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # V stays in HBM
        ],
        out_specs=pl.BlockSpec((1, block_q, hd_v_p), lambda bh, qi: (bh, qi, 0)),
        out_shape=jax.ShapeDtypeStruct((B * H, t_pad, hd_v_p), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, block_k, hd_p), q.dtype),
            pltpu.VMEM((2, block_k, hd_v_p), q.dtype),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(qf, kf, vf)

    return out[:, :T, :hd_v].reshape(B, H, T, hd_v)
