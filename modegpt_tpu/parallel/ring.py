"""Context-parallel ring-attention calibration: sequence sharded, K/V rotating.

The existing sequence-parallel mode (``calibrate(..., shard_sequence=True)``)
lets GSPMD insert all-gathers for attention, so every device still
materialises the FULL [T, ...] K/V — fine to ~32k, not beyond. This
module is the beyond-32k path (SURVEY.md §5 long-context row; ROADMAP
"long-context calibration"): the whole calibration forward runs inside a
``shard_map`` over a ``context`` mesh axis with each device holding only
its T/N-token chunk, and attention is computed as a RING (blockwise
online softmax, K/V chunks rotating one neighbour per step via
``lax.ppermute`` — Liu et al. 2023, the scaling-book context-parallel
recipe). Peak per-device attention memory is O(T/N * chunk) instead of
O(T), and the K/V exchange rides ICI neighbour links.

Everything else in the forward is token-local (norms, projections,
gated MLP, Gram taps, BI cosines), so the statistics are EXACT:

* Gram accumulators are plain sums over tokens -> ``psum`` over chunks;
* BI is a mean over tokens -> mean of per-chunk means (equal chunks);
* RoPE phases use each chunk's GLOBAL positions (axis_index offset).

Reuses the single-source layer body (models/forward._layer) with
``attn_impl="ring"`` — the one cross-token op dispatches to
`ring_attention` below, everything else is untouched code.

Causality makes half the ring steps fully-masked for the average chunk;
they are still computed (a static N-step loop keeps the program simple
and the cost is 2x the minimal causal schedule, amortised against the
memory win this mode exists for). Striped/zig-zag chunk placement is the
known load-balancing refinement if the 2x ever matters.
"""

from __future__ import annotations

import logging
from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P

try:  # jax >= 0.4.35 exports shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from modegpt_tpu.calib.engine import CalibrationResult
from modegpt_tpu.models.spec import ModelSpec

logger = logging.getLogger("modegpt_tpu")

__all__ = ["ring_attention", "calibrate_ring", "supports_ring", "CTX_AXIS"]

CTX_AXIS = "context"
_HI = lax.Precision.HIGHEST
_NEG = -1e30  # finite -inf stand-in: exp(_NEG - m) == 0 in f32, no inf-inf NaN


def ring_attention(q, k, v, scaling: float, softcap: Optional[float] = None,
                   window: Optional[int] = None, axis: str = CTX_AXIS):
    """Blockwise causal attention over a ring of sequence chunks.

    Must run inside shard_map over `axis`. q [B, H, C, hd] and
    k/v [B, Hk, C, hd_v] are this device's chunk (global positions
    axis_index*C ..); GQA is grouped, never materialised to H heads.
    Flash-style online softmax across ring steps; the causal (and
    optional sliding-window) mask is built from GLOBAL positions, which
    uniformly covers the fully-visible / diagonal / fully-masked cases.
    """
    B, H, C, hd = q.shape
    Hk, hd_v = k.shape[1], v.shape[3]
    G = H // Hk
    N = lax.psum(1, axis)
    idx = lax.axis_index(axis)

    qg = q.reshape(B, Hk, G, C, hd)
    q_pos = idx * C + jnp.arange(C, dtype=jnp.int32)

    # pvary: the initial accumulators are constants, but the loop outputs
    # vary over the context axis — align the carry types up front.
    o = lax.pvary(jnp.zeros((B, Hk, G, C, hd_v), jnp.float32), (axis,))
    m = lax.pvary(jnp.full((B, Hk, G, C), _NEG, jnp.float32), (axis,))
    l = lax.pvary(jnp.zeros((B, Hk, G, C), jnp.float32), (axis,))

    def step(r, carry):
        k_r, v_r, o, m, l = carry
        src = (idx - r) % N  # which global chunk this step's K/V came from
        k_pos = src * C + jnp.arange(C, dtype=jnp.int32)
        scores = jnp.einsum("bkgqd,bkcd->bkgqc", qg, k_r, precision=_HI) * scaling
        scores = scores.astype(jnp.float32)
        if softcap is not None:
            scores = jnp.tanh(scores / softcap) * softcap
        mask = k_pos[None, :] <= q_pos[:, None]
        if window is not None:
            mask = mask & (k_pos[None, :] > q_pos[:, None] - window)
        scores = jnp.where(mask[None, None, None], scores, _NEG)

        m_new = jnp.maximum(m, jnp.max(scores, axis=-1))
        alpha = jnp.exp(m - m_new)
        p = jnp.exp(scores - m_new[..., None])
        l = l * alpha + jnp.sum(p, axis=-1)
        o = o * alpha[..., None] + jnp.einsum(
            "bkgqc,bkcd->bkgqd", p, v_r.astype(jnp.float32), precision=_HI
        )
        perm = [(d, (d + 1) % N) for d in range(N)]
        k_r = lax.ppermute(k_r, axis, perm)
        v_r = lax.ppermute(v_r, axis, perm)
        return k_r, v_r, o, m_new, l

    _, _, o, m, l = lax.fori_loop(0, N, step, (k, v, o, m, l))
    out = o / jnp.maximum(l, 1e-30)[..., None]
    return out.reshape(B, H, C, hd_v).astype(q.dtype)


def supports_ring(spec: ModelSpec, mesh: Optional[jax.sharding.Mesh]) -> bool:
    """Ring calibration needs a 'context' mesh axis. MoE stacks are fine:
    calibration runs the dense-all-experts execution
    (forward._moe_mlp), whose routing softmax/top-k and expert einsums
    are token-local, so chunk statistics psum exactly."""
    return (
        mesh is not None
        and CTX_AXIS in mesh.axis_names
        and mesh.shape[CTX_AXIS] > 1
    )


def calibrate_ring(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    target_layers: Sequence[int],
    mesh: jax.sharding.Mesh,
) -> CalibrationResult:
    """Drop-in calibrate() over a context-parallel mesh: tokens sharded
    [B, T/N] per device, ring attention, psum'd exact statistics.
    Host-f64 accumulation across batches (parity mode semantics)."""
    from modegpt_tpu.models.forward import _bi_piece, _layer, _linear, _scale_embed
    from modegpt_tpu.ops.rope import rope_cos_sin

    if not supports_ring(spec, mesh):
        raise ValueError("calibrate_ring needs a 'context' mesh axis and a dense stack")
    N = mesh.shape[CTX_AXIS]
    stats_layers = tuple(int(x) for x in target_layers)

    def run(params, tokens):  # tokens: local [B, C]
        B, C = tokens.shape
        idx = lax.axis_index(CTX_AXIS)
        pos = idx * C + jnp.arange(C, dtype=jnp.int32)

        x = _scale_embed(spec, params["embed_tokens"][tokens])
        if spec.arch in ("opt", "gpt2"):
            if "project_in" in params:
                x = _linear(x, params["project_in"])
            x = x + params["embed_positions"][pos + spec.position_offset][None]
        cos = sin = None
        if spec.uses_rope:
            cos, sin = rope_cos_sin(
                pos, spec.head_dim, spec.rope_theta, dtype=x.dtype,
                scaling=spec.rope_scaling,
            )

        taps_out = {}
        bi = []
        for li in range(spec.n_layers):
            collect = li in stats_layers
            x_new, taps = _layer(spec, li, params["layers"][li], x, cos, sin,
                                 collect, attn_impl="ring")
            # mean over global T == mean of equal-chunk local means / N
            bi.append(lax.psum(_bi_piece(x, x_new), CTX_AXIS) / N)
            if collect:
                taps_out[li] = {
                    key: lax.psum(val, CTX_AXIS) for key, val in taps.items()
                }
            x = x_new
        return taps_out, jnp.stack(bi)

    run_sharded = jax.jit(
        shard_map(
            run, mesh=mesh,
            in_specs=(P(), P(None, CTX_AXIS)),
            out_specs=(P(), P()),
        )
    )

    acc = {li: None for li in stats_layers}
    bi_acc = np.zeros(spec.n_layers, dtype=np.float64)
    n_sequences = 0
    seq_len = int(batches[0].shape[1])
    for b in batches:
        b = np.asarray(b, dtype=np.int32)
        if b.shape[1] % N:
            raise ValueError(f"seq_len {b.shape[1]} not divisible by context size {N}")
        taps, bi = run_sharded(params, jnp.asarray(b))
        n_sequences += b.shape[0]
        bi_acc += np.asarray(bi, dtype=np.float64)
        for li, t in taps.items():
            t64 = {key: np.asarray(val, dtype=np.float64) for key, val in t.items()}
            if acc[li] is None:
                acc[li] = t64
            else:
                for key, val in t64.items():
                    acc[li][key] += val

    total_tokens = n_sequences * seq_len
    norm = float(total_tokens)
    shared = {
        li: a["cov_shared"] / norm for li, a in acc.items() if "cov_shared" in a
    }
    return CalibrationResult(
        cov_mlp={li: a["cov_mlp"] / norm for li, a in acc.items()},
        cov_q={li: a["cov_q"] / norm for li, a in acc.items()},
        cov_k={li: a["cov_k"] / norm for li, a in acc.items()},
        cov_x={li: a["cov_x"] / norm for li, a in acc.items()},
        bi_scores=list(bi_acc / max(n_sequences, 1)),
        n_sequences=n_sequences,
        total_tokens=total_tokens,
        cov_shared=shared or None,
    )
