"""Per-phase device-time + roofline profile of ONE streamed-sweep window
at 7B (large32) layer geometry (VERDICT r3 next-5: "profile the sweep on
TPU and make the utilization claim honest").

Runs the real streamed-path building blocks — quantized/raw H2D layer
staging, the fused forward+taps dispatch, the Type-I selection and down
re-solve, QK/VO solves, and the factor fetch — each bracketed by a
tiny-fetch sync, and reports for every phase:

  wall_s          synced wall time (includes the ~25 ms tunnel dispatch
                  floor, negligible at these phase sizes)
  gflops/gbs      analytic work over wall
  pct_mxu         vs the chip's dense-bf16 peak (f32 phases marked)
  pct_hbm         vs the chip's HBM bandwidth

The point: the SOLVE phases are Cholesky/triangular-solve-bound and the
TAPS phase is a Gram contraction — per phase, the honest ceiling is
named (MXU for grams/matmuls, HBM for gathers/fetch, the serialized
~90/33 MB/s tunnel for stage/fetch on this host), instead of quoting one
whole-job MFU against a workload that is mostly link time on tunneled
hosts.

Optionally wraps the window in a jax.profiler trace:
  MODEGPT_PROFILE_DIR=/tmp/trace python scripts/profile_window.py

Prints ONE JSON document to stdout.
"""

from __future__ import annotations

import contextlib
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

# 7B (large32) layer geometry — bench.py's preset dims.
D, H, HK, HD, DI = 4096, 32, 8, 128, 11008
SEQ, N_SEQ, BATCH = 2048, 8, 2
if os.environ.get("MODEGPT_PROFILE_SMOKE") == "1":
    # structural CPU smoke: same code paths at toy dims
    D, H, HK, HD, DI = 128, 4, 2, 32, 288
    SEQ, N_SEQ, BATCH = 64, 4, 2
RATIO = 0.3

# v5e nominal peaks (jax.devices()[0].device_kind == "TPU v5 lite"):
# 197 TFLOP/s dense bf16 MXU, ~819 GB/s HBM.
PEAK_FLOPS = 197e12
PEAK_HBM = 819e9


def sync(x):
    arr = jax.tree_util.tree_leaves(x)[0]
    np.asarray(arr.reshape(-1)[:1])


def phase(name, fn, flops=0.0, bytes_moved=0.0, note=""):
    t0 = time.perf_counter()
    out = fn()
    sync(out)
    dt = time.perf_counter() - t0
    row = {"phase": name, "wall_s": round(dt, 3)}
    if flops:
        row["gflops"] = round(flops / dt / 1e9, 1)
        row["pct_mxu"] = round(100 * flops / dt / PEAK_FLOPS, 2)
    if bytes_moved:
        row["gbs"] = round(bytes_moved / dt / 1e9, 2)
        row["pct_hbm"] = round(100 * bytes_moved / dt / PEAK_HBM, 2)
    if note:
        row["note"] = note
    rows.append(row)
    print(f"  {name}: {dt:.2f}s {note}", file=sys.stderr, flush=True)
    return out


rows = []


def main():
    from modegpt_tpu.calib.data import load_calibration_batches
    from modegpt_tpu.compress.batched import FETCHED_BYTES, solve_chunk_batched
    from modegpt_tpu.compress.offload import (
        _embed_batches, _embed_leaves, _group_batches, _stage,
        _stage_quantized, _stream_layer_step,
    )
    from modegpt_tpu.calib.engine import CalibrationResult
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models.init import init_params
    from modegpt_tpu.models.spec import ModelSpec

    dev_kind = str(jax.devices()[0].device_kind)
    spec = ModelSpec(
        arch="llama", vocab_size=32000, d_model=D, n_layers=2, n_heads=H,
        n_kv_heads=HK, head_dim=HD, d_int=DI, max_position_embeddings=SEQ * 2,
        act="silu", norm="rmsnorm", norm_eps=1e-6, rope_theta=10000.0,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=True,
        q_ranks=(H * HD,) * 2, k_ranks=(HK * HD,) * 2, v_ranks=(HK * HD,) * 2,
        o_ranks=(H * HD,) * 2, gate_ranks=(DI,) * 2,
    )
    print("building host params...", file=sys.stderr, flush=True)
    params = jax.tree_util.tree_map(
        np.asarray,
        jax.jit(lambda: init_params(spec, jax.random.key(0), dtype=jnp.bfloat16),
                backend="cpu")(),
    )
    batches = load_calibration_batches(None, "synthetic", N_SEQ, BATCH, SEQ,
                                       vocab_size=spec.vocab_size)
    config = CompressionConfig(
        compression_ratio=RATIO, solver_precision="f32_device",
        sparsity_smoothing=0.5, calib_size=N_SEQ, calibs_batch_size=BATCH,
        seq_len=SEQ, model_dtype="bfloat16", layers_per_step=1,
    )

    lp_host = params["layers"][0]
    layer_bytes = sum(a.nbytes for a in jax.tree_util.tree_leaves(lp_host))
    T = N_SEQ * SEQ
    layer_params_count = layer_bytes / 2  # bf16

    trace_dir = os.environ.get("MODEGPT_PROFILE_DIR")
    ctx = jax.profiler.trace(trace_dir) if trace_dir else contextlib.nullcontext()

    with ctx:
        other_dev = _stage(_embed_leaves(spec, {k: v for k, v in params.items()
                                                if k != "layers"}))
        stacks = [_embed_batches(spec, other_dev, jnp.asarray(g))
                  for g in _group_batches(batches)]
        sync(stacks)

        # --- H2D staging: raw bf16 vs int8-quantized (the BI-prepass path)
        staged = phase(
            "stage_bf16_h2d", lambda: _stage(lp_host),
            bytes_moved=layer_bytes,
            note=f"{layer_bytes / 2**20:.0f} MB over the tunnel",
        )
        phase(
            "stage_int8_h2d", lambda: _stage_quantized(lp_host, "int8"),
            bytes_moved=layer_bytes / 2,
            note="quantized prepass staging (half the link bytes + dequant)",
        )

        # --- warm the forward program on layer 0, then time it
        def fwd(collect):
            outs = []
            for i in range(len(stacks)):
                x, taps, bi = _stream_layer_step(
                    spec, staged, stacks[i], 0, collect, "flash", "highest")
                stacks[i] = x
                outs.append((taps, bi))
            return outs

        fwd_flops = 2 * layer_params_count * T
        # Gram taps: cov_mlp (T x DI^2) + cov_x (T x D^2) + per-head q/k;
        # gram_precision=highest executes 6 MXU passes per gram.
        gram_flops = 2 * T * (DI * DI + D * D + H * HD * HD + HK * HD * HD)
        warm = fwd(True)
        sync(warm[0][0])
        taps_acc = None
        def collect_taps():
            nonlocal taps_acc
            outs = fwd(True)
            taps_acc = outs[0][0]
            for t, _ in outs[1:]:
                taps_acc = {k: taps_acc[k] + t[k] for k in taps_acc}
            return taps_acc
        phase(
            "forward_plus_taps", collect_taps,
            flops=fwd_flops + gram_flops,
            note=f"{T} tokens; useful FLOPs (highest-precision grams run 6 passes)",
        )

        # --- window solve, one suffix at a time
        inv = jnp.float32(1.0 / T)
        calib = CalibrationResult(
            cov_mlp={0: taps_acc["cov_mlp"] * inv},
            cov_q={0: taps_acc["cov_q"] * inv},
            cov_k={0: taps_acc["cov_k"] * inv},
            cov_x={0: taps_acc["cov_x"] * inv},
            bi_scores=[0.0, 0.0], n_sequences=N_SEQ, total_tokens=T,
        )
        keep = np.full(2, 1.0 - RATIO)
        rank = int(DI * (1.0 - RATIO))
        wparams = {"layers": {0: staged}}
        host_view = {0: lp_host}

        f0 = FETCHED_BYTES.total
        t_fetchable = {}

        def solve(order):
            return solve_chunk_batched(
                spec, wparams, [0], keep, calib, config, order,
                host_params=host_view,
            )

        # Warm every solve program first (remote AOT compiles cost tens
        # of seconds through the tunnel and must not pollute the phase
        # timings; dense solves don't consume their inputs, so a second
        # run sees identical state), then time the steady-state run.
        for order in ("mlp", "qk", "vo"):
            solve(order)
        f0 = FETCHED_BYTES.total  # count only the timed runs below

        # --- solve sub-phases (VERDICT r4 weak-4: name where the solve
        # seconds go, against BOTH ceilings). The Type-I selection is a
        # Cholesky + inverse-diagonal on [DI, DI]; time each alone so the
        # solve_mlp row decomposes.
        from modegpt_tpu.ops.psd import _cholesky_escalated, ridge_inverse_diag

        C_dev = calib.cov_mlp[0]
        chol_j = jax.jit(lambda C: _cholesky_escalated(C, 1e-2))
        sync(chol_j(C_dev))  # warm
        # traffic: read C + write L (+ panel re-reads, ignored — lower bound)
        chol_bytes = 2 * 4 * DI * DI
        phase(
            "cholesky_only", lambda: chol_j(C_dev),
            flops=DI ** 3 / 3, bytes_moved=chol_bytes,
            note=f"[{DI}]^2 f32 escalated Cholesky alone (warm)",
        )
        sync(ridge_inverse_diag(C_dev))  # warm
        # traffic: each of the ceil(DI/1024) column-block solves re-reads L
        invdiag_bytes = (4 * DI * DI) * (-(-DI // 1024))
        phase(
            "invdiag_only", lambda: ridge_inverse_diag(C_dev),
            flops=DI ** 3 / 3 + DI ** 3 / 2, bytes_moved=invdiag_bytes,
            note="Cholesky + blocked identity solves (the full Type-I score)",
        )

        # MLP: selection (Cholesky + cholesky-inverse on [DI, DI]) and the
        # down re-solve (blocked triangular solves at rank), fused in one
        # call — the dominant solve phase.
        mlp_flops = (DI ** 3 / 3 + 2 * DI ** 3 / 3) + (
            rank ** 3 / 3 + 2 * rank * rank * D
        )
        # HBM floor: selection traffic (invdiag) + down re-solve reads
        mlp_bytes = invdiag_bytes + chol_bytes + 3 * 4 * rank * rank + 2 * 2 * rank * D
        f_mlp = phase(
            "solve_mlp", lambda: solve("mlp"), flops=mlp_flops,
            bytes_moved=mlp_bytes,
            note=f"f32 Cholesky {DI}^3/3 + inv + rank-{rank} down re-solve (warm)",
        )
        f_qk = phase(
            "solve_qk", lambda: solve("qk"),
            note="diagonal scores + host row gathers (no device FLOPs)",
        )
        vo_flops = D ** 3 / 3 + HK * (2 * D * HD * HD)
        vo_bytes = 3 * 4 * D * D + 2 * 2 * D * D
        f_vo = phase(
            "solve_vo", lambda: solve("vo"), flops=vo_flops,
            bytes_moved=vo_bytes,
            note="Cholesky whiten + per-head SVDs (warm)",
        )
        fetched = FETCHED_BYTES.total - f0
        factor_bytes = sum(
            a.nbytes
            for fs in (f_mlp, f_qk, f_vo)
            for by_layer in fs.values()
            for fd in by_layer.values()
            for a in fd.values()
            if hasattr(a, "nbytes")
        )

    out = {
        "device_kind": dev_kind,
        "geometry": {"d_model": D, "d_int": DI, "heads": f"{H}/{HK}",
                     "tokens": T, "layers_profiled": 1, "keep": 1 - RATIO},
        "peaks_assumed": {"mxu_bf16_tflops": PEAK_FLOPS / 1e12,
                          "hbm_gbs": PEAK_HBM / 1e9},
        "phases": rows,
        "factor_bytes": factor_bytes,
        "fetched_bytes": fetched,
        "host_sliced_pct": round(100 * (1 - fetched / max(factor_bytes, 1)), 1),
        "profile_dir": trace_dir or None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
