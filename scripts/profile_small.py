"""Per-dispatch profile of the SMALL (0.1B) preset's fused pipeline.

VERDICT r4 weak-7: the small capture reports 87 ms on-chip for a
~959 GFLOP job (≈5 ms at the v5e's bf16 peak) and nothing accounted for
the other ~82 ms. This script runs the same fused path the bench runs
(compress/fused.py: calibrate+allocate -> solve -> finalize) with a sync
after every dispatch, plus isolated timings of the numeric primitives
the solve dispatch is built from (eigh / Cholesky at preset dims), so
the gap decomposes into named phases against the MXU ceiling.

Prints ONE JSON document. CPU smoke: MODEGPT_PROFILE_SMOKE=1.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from modegpt_tpu.utils.backend import ensure_available_backend

ensure_available_backend()

import jax
import jax.numpy as jnp
import numpy as np

# small-preset dims (bench.py)
D, H, HK, HD = 1024, 16, 8, 64
DI, L, V = 2816, 4, 8192
SEQ, N_SEQ, BATCH = 512, 8, 4
if os.environ.get("MODEGPT_PROFILE_SMOKE") == "1":
    D, H, HK, HD = 128, 4, 2, 32
    DI, L, V = 256, 3, 512
    SEQ, N_SEQ, BATCH = 64, 4, 2
RATIO = 0.3
PEAK_FLOPS = 197e12

rows = []


def sync(x):
    arr = next(a for a in jax.tree_util.tree_leaves(x) if hasattr(a, "reshape"))
    np.asarray(arr.reshape(-1)[:1])


def phase(name, fn, flops=0.0, note="", reps=3):
    """Median of ``reps`` synced runs (programs already warm)."""
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn()
        sync(out)
        times.append(time.perf_counter() - t0)
    dt = sorted(times)[len(times) // 2]
    row = {"phase": name, "wall_ms": round(dt * 1e3, 2)}
    if flops:
        row["pct_mxu"] = round(100 * flops / dt / PEAK_FLOPS, 2)
    if note:
        row["note"] = note
    rows.append(row)
    print(f"  {name}: {dt * 1e3:.1f} ms {note}", file=sys.stderr, flush=True)
    return out


def main():
    from modegpt_tpu.calib.data import load_calibration_batches
    from modegpt_tpu.compress.fused import (
        _calibrate_allocate, _finalize, _solve_padded, fused_compress,
    )
    from modegpt_tpu.compress.surgery import compress_ranks_for_layer
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models.init import init_params
    from modegpt_tpu.models.spec import ModelSpec

    dev_kind = str(jax.devices()[0].device_kind)
    spec = ModelSpec(
        arch="llama", vocab_size=V, d_model=D, n_layers=L, n_heads=H,
        n_kv_heads=HK, head_dim=HD, d_int=DI, max_position_embeddings=SEQ * 2,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        q_ranks=(H * HD,) * L, k_ranks=(HK * HD,) * L, v_ranks=(HK * HD,) * L,
        o_ranks=(H * HD,) * L, gate_ranks=(DI,) * L,
    )
    params = jax.jit(
        lambda: init_params(spec, jax.random.key(0), dtype=jnp.bfloat16)
    )()
    sync(params)
    batches = load_calibration_batches(None, "synthetic", N_SEQ, BATCH, SEQ,
                                       vocab_size=V)
    config = CompressionConfig(
        compression_ratio=RATIO, solver_precision="f32_device",
        sparsity_smoothing=0.5, calib_size=N_SEQ, calibs_batch_size=BATCH,
        seq_len=SEQ, model_dtype="bfloat16", fused=True,
    )

    # warm every program through the public entry (same code path as the
    # bench), then phase the dispatches individually
    fused_compress(spec, params, batches, config)

    stacked = jnp.stack([jnp.asarray(b) for b in batches])
    T = N_SEQ * SEQ
    n_params = sum(
        a.size for a in jax.tree_util.tree_leaves(params["layers"])
    )
    fwd_flops = 2 * n_params * T + 2 * T * D * V
    gram_flops = 2 * T * (DI * DI + D * D + H * HD * HD + HK * HD * HD)

    ca = phase(
        "calibrate_allocate", lambda: _calibrate_allocate(
            spec, params, stacked, RATIO, 0.5, float(config.max_sparsity),
            "highest",
        ),
        flops=fwd_flops + gram_flops,
        note=f"{T} tokens scan forward + grams + BI allocator",
    )
    cov_mlp, cov_q, cov_k, cov_x, keep = ca
    keep_h = np.asarray(keep)
    r_mlp = jnp.asarray(
        [compress_ranks_for_layer(spec, float(k), "mlp") for k in keep_h],
        jnp.int32,
    )

    solve = phase(
        "solve_padded", lambda: _solve_padded(
            spec, params, cov_mlp, cov_q, cov_k, cov_x, r_mlp,
            float(config.nystrom_ridge), float(config.ridge_qk),
            float(config.ridge_vo),
        ),
        flops=L * (DI ** 3 + D ** 3 / 3 + HK * 2 * D * HD * HD),
        note="all three solvers, padded/rank-independent forms",
    )

    ranks_mlp = tuple(int(r) for r in np.asarray(r_mlp))
    ranks_hd = tuple(
        compress_ranks_for_layer(spec, float(k), "qk") for k in keep_h
    )
    phase(
        "finalize", lambda: _finalize(
            spec, params, *solve, ranks_mlp=ranks_mlp, ranks_hd=ranks_hd,
        ),
        note="padded factor slicing + surgery kernels",
    )

    # --- isolated primitives at preset dims: where does solve time go?
    C = (cov_mlp[0] + jnp.eye(DI) * 1e-2).astype(jnp.float32)
    Cx = (cov_x[0] + jnp.eye(D) * 1e-2).astype(jnp.float32)
    chol = jax.jit(jnp.linalg.cholesky)
    eigh = jax.jit(lambda a: jnp.linalg.eigh(a)[1])
    sync(chol(C)); sync(eigh(Cx))
    phase("cholesky_DI", lambda: chol(C), flops=DI ** 3 / 3,
          note=f"[{DI}]^2 f32 native Cholesky")
    phase("eigh_D", lambda: eigh(Cx), flops=9 * D ** 3,
          note=f"[{D}]^2 f32 eigh (VO whitening, Jacobi on TPU)")
    phase(
        "eigh_D_batched", lambda: jax.vmap(jnp.linalg.eigh)(
            jnp.stack([Cx] * L))[1],
        flops=L * 9 * D ** 3, note=f"{L} stacked eigh (the eigh-whiten form)",
    )
    # the VO path's actual decomposition: batched thin SVD of the
    # whitened per-kv-head [D, HD] blocks
    W = jnp.asarray(
        np.random.default_rng(0).standard_normal((L * HK, D, HD)),
        jnp.float32,
    )
    svd = jax.jit(lambda a: jax.vmap(
        lambda m: jnp.linalg.svd(m, full_matrices=False)[0])(a))
    sync(svd(W))
    phase("svd_heads_batched", lambda: svd(W),
          flops=L * HK * 4 * D * HD * HD,
          note=f"{L * HK} batched [{D}, {HD}] thin SVDs (VO truncation)")

    # dispatch floor for context
    tiny = jax.jit(lambda x: x + 1)
    sync(tiny(jnp.zeros((8,), jnp.float32)))
    phase("dispatch_floor", lambda: tiny(jnp.zeros((8,), jnp.float32)),
          note="empty dispatch round trip", reps=5)

    out = {
        "device_kind": dev_kind,
        "geometry": {"d_model": D, "d_int": DI, "layers": L, "tokens": T},
        "phases": rows,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
