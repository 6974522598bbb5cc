"""Benchmark: end-to-end compression time, TPU-native vs reference-equivalent torch.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "s", "vs_baseline": N}

The workload is the framework's headline job (BASELINE.json metric:
"end-to-end compress time"): calibrate (forward passes + Gram/BI
statistics) and solve all three decompositions for every layer of a
synthetic Llama-style model at 30% compression, then apply surgery.
The reference publishes no numbers (BASELINE.md), so the baseline here
is a faithful torch implementation of the reference's computation
(hooked HF forward, float64 per-layer solvers with the same closed
forms) on this host's CPU — the only backend the reference can use in
this environment. `vs_baseline` is the speedup (baseline_s / ours_s).

Both paths are warmed up (one calibration batch) so the metric is
steady-state compute, which is what dominates at real model scale; JIT
compile time is excluded symmetrically.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

# ---- workload size (fits comfortably in one v5e chip and in host RAM) ----
# MODEGPT_BENCH_PRESET: small (default, ~0.1B), medium (~0.5B),
# large (7B-proxy layer geometry, 4 layers).
import os as _os

# Honour an explicit JAX_PLATFORMS=cpu even on hosts whose sitecustomize
# force-registers a remote TPU platform; otherwise probe the tunneled
# backend in a bounded subprocess and fall back to CPU if it is down, so
# the bench always emits its JSON line (device_kind records which
# backend actually ran) instead of hanging in backend init.
from modegpt_tpu.utils.backend import ensure_available_backend

ensure_available_backend()

_PRESET = _os.environ.get("MODEGPT_BENCH_PRESET", "small")
if _PRESET == "large13B":
    # Llama-2-13B geometry at FULL depth: ~25 GB bf16 weights — strictly
    # BIGGER than the 15.75 GiB of v5e HBM. Weights live in host RAM;
    # the layer-streamed sweep (compress/offload.py) stages one layer at
    # a time into HBM (double-buffered H2D), mirroring the scale the
    # reference only reaches by spilling across devices via
    # device_map="auto" (reference: src/model_utils.py:70, tests.sh:150).
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 5120, 40, 40, 128
    D_INT, N_LAYERS, VOCAB = 13824, 40, 32000
    SEQ, CALIB_SEQS, BATCH = 2048, 8, 2
    _LABEL = "13B-40L"
elif _PRESET == "large32B":
    # Qwen3-32B geometry at FULL depth: ~64 GB bf16 weights — 4x one
    # chip's HBM. This is the reference's flagship scale (32B configs at
    # tests.sh:150-175; the optuna study targets 32B@0.5,
    # analysis/optuna.py:16-35), reached there only by spilling layers
    # across 2 GPUs + host via device_map="auto". Here the weights are
    # host RAM numpy and the layer-streamed sweep stages one layer at a
    # time through HBM (double-buffered H2D); the d_int=25600 Type-I
    # solve runs the blocked low-memory path.
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 5120, 64, 8, 128
    D_INT, N_LAYERS, VOCAB = 25600, 64, 151936
    SEQ, CALIB_SEQS, BATCH = 2048, 8, 2
    _LABEL = "32B-64L"
elif _PRESET == "moe8":
    # Mixtral-8x7B layer geometry (8 experts, d_int 14336, top-2) at 8
    # layers: ~24 GB bf16 — beyond one chip's HBM, host-resident weights
    # streamed per layer. Calibration executes dense-all-experts (Grams
    # cover each expert's routed tokens, reference hook semantics);
    # expert solves are memory-chunked (compress/batched._solve_mlp_moe).
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 4096, 32, 8, 128
    D_INT, N_LAYERS, VOCAB = 14336, 8, 32000
    SEQ, CALIB_SEQS, BATCH = 2048, 8, 2
    N_EXPERTS, TOP_K = 8, 2
    _LABEL = "mixtral8x-8L"
elif _PRESET == "large32":
    # Llama-2-7B geometry at FULL depth on one chip: 13.5 GB bf16 weights
    # + per-window Gram stats inside 16 GB HBM. Default execution is the
    # layer-streamed sweep (compress/offload.py): TWO forward passes for
    # the whole job (BI prepass + tap sweep) instead of one forward per
    # layer chunk. MODEGPT_BENCH_STREAM=0 falls back to the windowed
    # chunked loop (the reference's memory strategy, run_modegpt.py:107).
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 4096, 32, 8, 128
    D_INT, N_LAYERS, VOCAB = 11008, 32, 32000
    SEQ, CALIB_SEQS, BATCH = 2048, 8, 4
    _LABEL = "7B-32L"
elif _PRESET == "large":
    # Llama-2-7B layer geometry (d_model 4096, d_int 11008, GQA 32/8),
    # truncated to 4 layers so the dense model + Gram stats fit one chip.
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 4096, 32, 8, 128
    D_INT, N_LAYERS, VOCAB = 11008, 4, 32000
    SEQ, CALIB_SEQS, BATCH = 2048, 8, 4
    _LABEL = "7Bproxy"
elif _PRESET == "medium":
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 2048, 16, 8, 128
    D_INT, N_LAYERS, VOCAB = 5504, 8, 16384
    SEQ, CALIB_SEQS, BATCH = 1024, 8, 4
    _LABEL = "0.5B"
else:
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 1024, 16, 8, 64
    D_INT, N_LAYERS, VOCAB = 2816, 4, 8192
    SEQ, CALIB_SEQS, BATCH = 512, 8, 4
    _LABEL = "0.1B"
if _PRESET != "moe8":
    N_EXPERTS, TOP_K = 0, 2
if _os.environ.get("MODEGPT_BENCH_SMOKE") == "1":
    # Structural smoke: the SAME code paths (streamed/host-resident/MoE
    # branches included) at toy dims, so every preset is CPU-testable.
    D_MODEL, N_HEADS, N_KV, HEAD_DIM = 128, 4, 2, 32
    D_INT, VOCAB = 256, 512
    N_LAYERS = min(N_LAYERS, 3)
    SEQ, CALIB_SEQS, BATCH = 64, 4, 2
RATIO = 0.3
# Streamed presets solve in 1-layer windows: one layer's taps
# (d_int^2 f32 ~ 0.5-0.8 GB at 7B/13B scale) + <=2 staged layers +
# activations is the whole HBM footprint beside any resident weights.
# MODEGPT_BENCH_STREAM=1 forces the streamed path on any preset (=0
# restores the windowed chunked loop on large32); large13B is always
# streamed — nothing else can run beyond-HBM weights.
# Host-resident presets: the dense model exceeds one chip's HBM.
_HOST_RESIDENT = _PRESET in ("large13B", "large32B", "moe8")
_STREAMED = _HOST_RESIDENT or (
    _os.environ.get("MODEGPT_BENCH_STREAM", "1" if _PRESET == "large32" else "0")
    == "1"
)
if _PRESET == "large32" and not _STREAMED:
    # chunked calibration bounds per-chunk Gram memory; ONE layer per
    # chunk leaves ~3.3 GB beside the 11.8 GB resident weights for the
    # d_int=11008 Cholesky working set; batch 2 halves the activation
    # transients at seq 2048.
    BATCH = 2
    LAYERS_PER_STEP = 1
elif _STREAMED:
    LAYERS_PER_STEP = 1
else:
    LAYERS_PER_STEP = N_LAYERS


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def rss_gib() -> float:
    """Current host RSS (GiB) — post-mortem telemetry for the
    host-resident presets (the 13B run was host-OOM-killed at 130 GB on
    a 125 GB host; the milestone trail localises where that grows)."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * 4096 / 2**30
    except (OSError, ValueError, IndexError):
        return 0.0


def rss_peak_gib() -> float:
    import resource

    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024 / 2**30


if _HOST_RESIDENT:
    # The streamed sweep logs per-layer/per-window progress (with RSS) at
    # INFO — on the hour-scale host-resident presets that trail is the
    # only post-mortem evidence when the OS OOM-kills the process.
    import logging as _logging

    _logging.basicConfig(
        level=_logging.INFO,
        stream=sys.stderr,
        format="%(asctime)s %(levelname).1s %(message)s",
    )


# ---- analytic workload FLOPs (MFU numerator) ----

def workload_flops() -> float:
    """Analytic FLOPs of one timed pass (calibration forward + Gram taps
    + BI + the three solvers), counting matmuls as 2mnk and decomposition
    kernels at their standard constants. Causal attention is counted at
    the average attended length (T+1)/2. A lower bound: padding, masking
    and elementwise work are excluded, so MFU is conservative."""
    d, H, Hk, hd, di, L, V = D_MODEL, N_HEADS, N_KV, HEAD_DIM, D_INT, N_LAYERS, VOCAB
    T = SEQ
    toks = CALIB_SEQS * SEQ
    # forward: projections + gated MLP per token-layer, attention at the
    # causal average length. The unembed is NOT counted: no calibration
    # path ever executes it (the stats programs never form logits and
    # XLA DCEs the lm_head), so charging 2*d*V per token would inflate
    # MFU with phantom FLOPs.
    proj = 2 * d * H * hd + 2 * 2 * d * Hk * hd + 2 * H * hd * d
    # MoE calibration executes dense-all-experts (forward.py:_moe_mlp) so
    # every expert's Gram covers its routed tokens exactly — charge E x.
    E = max(N_EXPERTS, 1)
    mlp = E * 3 * 2 * d * di
    attn = 2 * 2 * H * hd * (T + 1) / 2
    fwd = toks * L * (proj + mlp + attn)
    if _STREAMED:
        # layer-streamed execution (compress/offload.py): the BI prepass
        # and the tap sweep are each ONE full forward — executed ==
        # useful FLOPs, no per-chunk forward repeats.
        fwd *= 2
    else:
        # chunked calibration runs the FULL forward once per layer chunk
        n_chunks = -(-L // LAYERS_PER_STEP)
        fwd *= n_chunks
    # Gram taps per token-layer: cov_mlp [di,di] (x E for MoE — the
    # masked [B,T,E,di] intermediates hit the MXU at full token count),
    # cov_x [d,d], per-head q/k
    gram = toks * L * (E * 2 * di * di + 2 * d * d + 2 * H * hd * hd + 2 * Hk * hd * hd)
    # solvers per layer (f32 device): MLP cholesky+inverse+solve, QK
    # ridged-diagonal scoring (no eigh on the hot path), VO eigh + SVDs
    r_mlp = int(di * (1 - RATIO))
    r_hd = int(hd * (1 - RATIO)) // 2 * 2
    mlp_s = E * (di**3 / 3 + di**3 + 2 * r_mlp * di * d + r_mlp**3 / 3 + 2 * r_mlp**2 * d)
    vo_s = 10 * d**3 + Hk * (2 * d * d * hd + 6 * d * hd**2 + 2 * d * d * r_hd) \
        + H * (2 * r_hd * hd * d)
    qk_s = H * hd * hd + Hk * hd * hd  # diagonal scoring only
    solv = L * (mlp_s + vo_s + qk_s)
    return float(fwd + gram + solv)


def device_peak_flops():
    """(peak_flops_bf16, device_kind): nominal dense bf16 peak for the
    attached accelerator; None on CPU (MFU is only meaningful on TPU)."""
    import jax

    dev = jax.devices()[0]
    kind = getattr(dev, "device_kind", dev.platform)
    if dev.platform not in ("tpu", "axon"):
        return None, kind
    peaks = {  # dense bf16 peak per chip
        "v4": 275e12,
        "v5lite": 197e12, "v5e": 197e12,
        "v5p": 459e12, "v5": 459e12,
        "v6e": 918e12, "trillium": 918e12,
    }
    k = str(kind).lower().replace(" ", "")
    for name, peak in peaks.items():
        if name in k:
            return peak, kind
    return 197e12, kind  # conservative default (v5e)


def dispatch_floor(n: int = 30) -> float:
    """Round-trip floor of one dispatch + 1-element fetch on this
    backend (the tunnel latency component of every host-synced step)."""
    import jax
    import jax.numpy as jnp

    f = jax.jit(lambda x: x + 1)
    x = jnp.zeros((8,), jnp.float32)
    x = f(x)
    np.asarray(x[:1])
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        x = f(x)
        np.asarray(x[:1])
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _host_init_params(spec):
    """Host bf16 init for the beyond-HBM presets: same pytree structure
    as init_params (via eval_shape), leaves filled host-side so the
    25-66 GB model never touches the device — the streamed sweep stages
    layers one at a time. Norm scales are ones (a random scale would
    collapse activations over 40 layers and degenerate the statistics).

    Weight leaves land in anon RSS by default; MODEGPT_BENCH_MMAP=1 (or
    auto, when the model is > ~30% of host RAM — large32B's 64 GB on a
    125 GB host) writes them to disk-backed .npy memmaps instead, so
    residency is reclaimable page cache and never OOM-killable, and a
    re-init after release_params just reopens the files. This mirrors
    how real checkpoints stream (safetensors are mmapped), not a bench
    shortcut."""
    import jax
    import jax.numpy as jnp
    import ml_dtypes

    from modegpt_tpu.models.init import init_params

    shapes = jax.eval_shape(
        lambda: init_params(spec, jax.random.key(0), dtype=jnp.bfloat16)
    )
    leaves, treedef = jax.tree_util.tree_flatten_with_path(shapes)
    total_bytes = sum(
        int(np.prod(sd.shape)) * 2 for _, sd in leaves
    )
    mmap_env = _os.environ.get("MODEGPT_BENCH_MMAP", "auto")
    host_bytes = _os.sysconf("SC_PAGE_SIZE") * _os.sysconf("SC_PHYS_PAGES")
    use_mmap = mmap_env == "1" or (
        mmap_env == "auto" and total_bytes > 0.3 * host_bytes
    )
    mdir = None
    if use_mmap:
        mdir = _os.environ.get(
            "MODEGPT_BENCH_MMAP_DIR", f"/tmp/modegpt_bench_mmap/{_PRESET}"
        )
        _os.makedirs(mdir, exist_ok=True)
        log(f"mmap weight fabrication -> {mdir} ({total_bytes / 2**30:.1f} GiB)")

    # SFC64 uniform + truncating bf16 cast: ~4x faster than
    # PCG64 standard_normal + round-to-nearest astype on this host's ONE
    # core (25 GB of weights would otherwise take ~40 min to fabricate).
    # Solver/Gram workload cost is value-independent; uniform at the same
    # std (half-width 0.02*sqrt(3)) keeps activation scales equivalent.
    rng = np.random.Generator(np.random.SFC64(0))

    def fabricate(sd):
        a = rng.random(sd.shape, dtype=np.float32)
        a -= 0.5
        a *= 2.0 * 0.02 * np.sqrt(3.0)
        return (a.view(np.uint32) >> 16).astype(np.uint16)

    def leaf_file(i, sd):
        return _os.path.join(mdir, f"leaf_{i:04d}_{'x'.join(map(str, sd.shape))}.npy")

    out = []
    for i, (path, sd) in enumerate(leaves):
        name = path[-1].key if hasattr(path[-1], "key") else str(path[-1])
        if name == "scale":
            out.append(np.ones(sd.shape, dtype=ml_dtypes.bfloat16))
            continue
        if name == "bias":
            out.append(np.zeros(sd.shape, dtype=ml_dtypes.bfloat16))
            continue
        if not use_mmap:
            out.append(fabricate(sd).view(ml_dtypes.bfloat16))
            continue
        f = leaf_file(i, sd)
        if not _os.path.exists(f):
            # Existence gates the RNG too: a restarted run reopens the
            # ~1 GB/layer files instead of re-paying the single-core
            # fabrication (~30 min at 64 GB). Write-then-reopen
            # read-only: flushed pages are clean page cache, evictable
            # under memory pressure (anon RSS is not). The leaf RNG
            # stream doesn't depend on which leaves already exist —
            # fabricate() draws per-leaf from the shared generator, so
            # values differ across restarts, but the workload cost is
            # value-independent (uniform same-std weights either way).
            codes = fabricate(sd)
            m = np.lib.format.open_memmap(f, mode="w+", dtype=np.uint16, shape=sd.shape)
            m[...] = codes
            m.flush()
            del m, codes
        out.append(np.load(f, mmap_mode="r").view(ml_dtypes.bfloat16))
    return jax.tree_util.tree_unflatten(treedef, out)


STREAM_STATS = {}  # streamed-sweep telemetry of the last pass (bench_jax)


def bench_jax() -> float:
    import jax

    from modegpt_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from modegpt_tpu.calib.data import load_calibration_batches
    from modegpt_tpu.calib.engine import calibrate
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.compress.surgery import apply_factors
    from modegpt_tpu.config import CompressionConfig
    from modegpt_tpu.models.init import init_params
    from modegpt_tpu.models.spec import ModelSpec
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    spec = ModelSpec(
        arch="mixtral" if N_EXPERTS else "llama",
        n_experts=N_EXPERTS, experts_per_tok=TOP_K,
        vocab_size=VOCAB, d_model=D_MODEL, n_layers=N_LAYERS,
        n_heads=N_HEADS, n_kv_heads=N_KV, head_dim=HEAD_DIM, d_int=D_INT,
        max_position_embeddings=SEQ * 2, act="silu", norm="rmsnorm", norm_eps=1e-6,
        rope_theta=10000.0, attention_bias=False, mlp_bias=False,
        # large presets: tie embeddings so no lm_head is resident — the
        # compress job never consumes it (calibration DCEs the unembed)
        # and 262 MB matters beside an 11.8 GB model on a 16 GB chip.
        tie_word_embeddings=(_HOST_RESIDENT or _PRESET == "large32"),
        q_ranks=(N_HEADS * HEAD_DIM,) * N_LAYERS, k_ranks=(N_KV * HEAD_DIM,) * N_LAYERS,
        v_ranks=(N_KV * HEAD_DIM,) * N_LAYERS, o_ranks=(N_HEADS * HEAD_DIM,) * N_LAYERS,
        gate_ranks=(D_INT,) * N_LAYERS,
    )
    import jax.numpy as jnp

    # bf16 weights: the production configuration (the reference's saved
    # artifacts are always bf16, model_utils.py:111-118). Calibration
    # statistics still accumulate in f32 at HIGHEST MXU precision.
    # large13B: the model does NOT fit in HBM — weights are host numpy
    # and the streamed sweep stages them per layer (compress/offload.py).
    # one jitted program instead of ~20 eager op-by-op compiles — each
    # eager op pays the tunnel's per-program AOT round trip. The key is
    # created inside the program too (jax.random.key / threefry_seed are
    # otherwise two more eager programs). Hoisted so repeat calls (the
    # release presets re-init before the timed pass) hit jit's cache
    # instead of constructing a fresh PjitFunction each time.
    _jit_init = jax.jit(lambda: init_params(spec, jax.random.key(0), dtype=jnp.bfloat16))

    def fresh_params():
        if _HOST_RESIDENT:
            return _host_init_params(spec)
        return _jit_init()

    params = fresh_params()
    if _HOST_RESIDENT:
        log(f"host params built [rss {rss_gib():.1f} GiB]")
    config = CompressionConfig(
        compression_ratio=RATIO, solver_precision="f32_device",
        sparsity_smoothing=0.5, calib_size=CALIB_SEQS, calibs_batch_size=BATCH,
        seq_len=SEQ, model_dtype="bfloat16", layers_per_step=LAYERS_PER_STEP,
        # auto = background window flush when host-resident (overlaps the
        # HBM->host factor fetch with compute); MODEGPT_STREAM_ASYNC=on
        # forces it for resident-weight presets (large32) to measure the
        # overlap against the tighter HBM headroom.
        stream_async_flush=_os.environ.get("MODEGPT_STREAM_ASYNC", "auto"),
        # async flushes allowed in flight; >1 lets the sweep run ahead of
        # a drain-bound flush worker (tunnel D2H) at the cost of pinning
        # that many windows' solve working sets in HBM
        stream_flush_depth=int(_os.environ.get("MODEGPT_STREAM_FLUSH_DEPTH", "0")),
        # BI-prepass staging precision (compress/offload.py): auto = int8
        # for host-staged weights on TPU (the prepass is link-bound — one
        # full-model H2D whose only product is the layer ranking); int4
        # quarters the prepass bytes. Allocation deviation is bounded in
        # tests/test_offload.py::test_bi_stage_dtype_allocation_deviation.
        bi_stage_dtype=_os.environ.get("MODEGPT_BENCH_BI_DTYPE", "auto"),
        # Factor destination for the streamed sweep: 'host' (default —
        # persistence semantics, factors cross the ~30 MB/s tunnel D2H
        # link) or 'device' (resident-weight presets only: factors stay
        # in HBM as bf16 slices, release_params frees each dense layer
        # as its factors land, surgery consumes them in place — the
        # compress-then-serve job with zero factor D2H).
        stream_fetch=_os.environ.get("MODEGPT_STREAM_FETCH", "host"),
        # Gram speed/precision A/B knob: highest (parity oracle, 6-pass
        # MXU) | high (3-pass) | bf16 (1-pass, f32 accumulate). Factor
        # deviation vs the oracle is bounded in
        # tests/test_calibration.py::test_gram_precision.
        gram_precision=_os.environ.get("MODEGPT_BENCH_GRAM", "highest"),
    )
    batches = load_calibration_batches(None, "synthetic", CALIB_SEQS, BATCH, SEQ,
                                       vocab_size=VOCAB)
    target_layers = list(range(N_LAYERS))

    # On tunneled backends block_until_ready can return before the queue
    # drains; a tiny fetch of the first and last leaves is a reliable
    # barrier (the arrays themselves stay on device). One jitted probe
    # program per tree signature — eager ravel[:1] per leaf costs FOUR
    # programs (ravel + slice, twice), each a tunnel AOT round trip.
    @jax.jit
    def _probe(a, b):
        return jnp.concatenate([a.reshape(-1)[:1].astype(jnp.float32),
                                b.reshape(-1)[:1].astype(jnp.float32)])

    def sync(tree):
        leaves = [a for a in jax.tree_util.tree_leaves(tree) if hasattr(a, "shape")]
        if not isinstance(leaves[0], jax.Array):
            return  # host-numpy tree (host-resident presets): no queue to drain
        np.asarray(_probe(leaves[0], leaves[-1]))

    # Fused path (3 dispatches + 1 tiny fetch, compress/fused.py): the
    # framework's fast path for latency-bound scales — default for
    # small/medium; the memory-bound large presets use the layer-streamed
    # sweep. MODEGPT_BENCH_FUSED=0 forces the chunked path.
    use_fused = (
        not _STREAMED
        and not _HOST_RESIDENT
        and _PRESET != "large32"
        and _os.environ.get("MODEGPT_BENCH_FUSED", "1") == "1"
    )
    if use_fused:
        from modegpt_tpu.compress.fused import fused_compress

    def one_pass(keep_fixed=None):
        """One e2e compress pass. layers_per_step chunking (the
        reference's memory strategy, run_modegpt.py:107) bounds Gram
        memory: the large32 preset runs 7B geometry at full depth on one
        chip with 2-layer chunks. keep_fixed (host array) skips the
        per-pass allocation fetch — used by the async on-chip probe."""
        if use_fused:
            cspec, cparams = fused_compress(spec, params, batches, config)
            return cspec, cparams, np.zeros(N_LAYERS)  # keep unused on this path
        if _STREAMED:
            # Layer-streamed sweep (compress/offload.py): BI prepass +
            # ONE tap/solve forward, weights staged per layer — runs the
            # 7B resident and the 25 GB beyond-HBM geometry alike. The
            # pass includes factor persistence semantics (factors land on
            # host) and dense-release surgery, like the chunked large32
            # flow. 13B surgery assembles on host: even the compressed
            # model can exceed one chip's HBM.
            import contextlib

            from modegpt_tpu.compress.offload import stream_calibrate_solve

            STREAM_STATS.clear()
            factors, _bi, keep = stream_calibrate_solve(
                spec, params, batches, config, keep_ratios=keep_fixed,
                stats_out=STREAM_STATS,
                # free each layer's dense projections as its factors land
                # (device HBM for resident weights, host RAM for staged):
                # headroom GROWS over the sweep instead of waiting for
                # surgery's release_dense
                release_params=True,
            )
            ctx = (
                jax.default_device(jax.local_devices(backend="cpu")[0])
                if _HOST_RESIDENT
                else contextlib.nullcontext()
            )
            with ctx:
                cspec, cparams = apply_factors(
                    spec, params, factors["mlp"], factors["qk"], factors["vo"],
                    release_dense=True,
                )
            return cspec, cparams, keep
        factors = {"mlp": {}, "qk": {}, "vo": {}}
        keep = keep_fixed
        for start in range(0, N_LAYERS, LAYERS_PER_STEP):
            chunk = list(range(start, min(start + LAYERS_PER_STEP, N_LAYERS)))
            if _PRESET == "large32":
                # windowed single-program calibration: the scanned stats
                # path would stack a second full copy of the 11.8 GB
                # weights (measured 22.6 GB > 15.75 GB HBM); the windowed
                # path consumes weights in place and compiles ONCE for
                # all 16 chunks (calib/engine.calibrate_window).
                from modegpt_tpu.calib.engine import calibrate_window

                calib = calibrate_window(spec, params, batches, start, LAYERS_PER_STEP)
            else:
                calib = calibrate(spec, params, batches, chunk, accumulate="device")
            if keep is None:
                keep, _ = allocate_keep_ratios(calib.bi_scores, RATIO, 0.5, 0.8)
            # fetch="device": factors stay in HBM and the surgery consumes
            # them there — the in-memory compress-then-serve job never
            # pays the HBM->host link (persistence is separate). large32:
            # factors must leave the device (dense weights + accumulated
            # factors together exceed HBM), so the pass INCLUDES factor
            # persistence; surgery then releases each dense projection as
            # its compressed kernel lands (dense+compressed > HBM too).
            fetch = "host" if _PRESET == "large32" else "device"
            f = solve_chunk_batched(
                spec, params, chunk, keep, calib, config, "mlp,qk,vo", fetch=fetch
            )
            for s in factors:
                factors[s].update(f[s])
            del calib
        cspec, cparams = apply_factors(
            spec, params, factors["mlp"], factors["qk"], factors["vo"],
            release_dense=(_PRESET == "large32"),
        )
        return cspec, cparams, keep

    # Warmup: one full pass (calibrate + solve + surgery) compiles every
    # program with the exact shapes/ranks of the timed pass; the sync
    # keeps warmup work from spilling into the timed region.
    # MODEGPT_BENCH_SKIP_WARMUP=1 folds compiles into the single timed
    # pass instead — for the hour-scale host-resident presets, where a
    # second full pass (2x the H2D sweep + factor fetch) costs more than
    # it isolates; n_compiles/compile_s in the JSON keep it honest.
    release = _STREAMED or _PRESET == "large32"
    skip_warmup = release and _os.environ.get("MODEGPT_BENCH_SKIP_WARMUP") == "1"
    if skip_warmup:
        warmup_s = 0.0
        wparams = None
        keep_host = None  # release presets never use the on-chip probe
    else:
        t = time.perf_counter()
        cspec, wparams, keep_w = one_pass()
        sync(wparams["layers"])
        warmup_s = time.perf_counter() - t
        log(f"jax warmup (compile): {warmup_s:.2f}s "
            f"[rss {rss_gib():.1f} GiB, peak {rss_peak_gib():.1f}]")
        keep_host = np.asarray(keep_w)

    # min of N timed passes: the tunneled backend adds multi-hundred-ms
    # dispatch jitter per pass; min is the steady-state compute.
    n_runs = 1 if release else 3
    times = []
    for _ in range(n_runs):
        if release and wparams is not None:
            # release_dense consumed the projections; restore a fresh
            # dense model OUTSIDE the timed region
            del wparams
            params = fresh_params()
            sync(params["layers"])
        t0 = time.perf_counter()
        cspec, cparams, _ = one_pass()
        sync(cparams["layers"])
        times.append(time.perf_counter() - t0)
        log(f"timed pass done [rss {rss_gib():.1f} GiB, peak {rss_peak_gib():.1f}]")
        wparams = cparams
    elapsed = min(times)
    log(
        f"jax e2e compress: {elapsed:.2f}s (runs: {[round(t, 2) for t in times]}); "
        f"gate_ranks={cspec.gate_ranks}"
    )

    if release:
        # host-fetched factors make every pass host-synced; the queue
        # trick does not apply — report the wall number for both.
        on_chip = elapsed
    else:
        # On-chip estimate: run passes back-to-back with NO intermediate
        # host syncs (ranks pinned from warmup so nothing forces a
        # fetch), then one sync — the host enqueues ahead of the device,
        # so per-dispatch tunnel latency amortizes out and (total / n)
        # approaches pure device time.
        n_async = 3
        t0 = time.perf_counter()
        for _ in range(n_async):
            cspec, cparams, _ = one_pass(keep_fixed=keep_host)
        sync(cparams["layers"])
        on_chip = (time.perf_counter() - t0) / n_async
        log(f"jax on-chip estimate (queue-amortised): {on_chip:.2f}s")

    hbm_peak = None
    try:
        from modegpt_tpu.utils.memory import device_memory_stats

        stats = device_memory_stats()
        peaks = [s.get("peak_bytes_in_use", 0) for s in stats.values()]
        if peaks and max(peaks):
            hbm_peak = max(peaks) / 2**30
            log(f"peak HBM: {hbm_peak:.2f} GiB")
    except Exception:
        pass
    return elapsed, min(on_chip, elapsed), hbm_peak, warmup_s


def bench_torch_reference(n_layers: int = N_LAYERS) -> float:
    """Reference-equivalent computation in torch on CPU: hooked forward
    calibration (f64 Gram accumulation) + f64 closed-form solvers.

    `n_layers` sizes the measured model — main() uses two-point (1- and
    2-layer) extrapolation for the medium/large presets so the CPU
    baseline cannot blow the bench's time budget (the workload is
    per-layer uniform: fixed = embed/lm_head cost, slope = one layer's
    forward + solver cost)."""
    import torch
    import transformers

    # Pinned methodology (VERDICT r3 weak-5): the same preset's baseline
    # read 17.7 s in one session and ~40 s in another because nothing
    # controlled threads or run count. Thread count is now explicit (this
    # host exposes one core; the env knob documents rather than tunes)
    # and main() takes the MEDIAN of N runs, recording every sample.
    torch.set_num_threads(int(_os.environ.get("MODEGPT_BASELINE_THREADS", "1")))
    torch.manual_seed(0)
    if N_EXPERTS:
        cfg = transformers.MixtralConfig(
            vocab_size=VOCAB, hidden_size=D_MODEL, intermediate_size=D_INT,
            num_hidden_layers=n_layers, num_attention_heads=N_HEADS,
            num_key_value_heads=N_KV, max_position_embeddings=SEQ * 2,
            num_local_experts=N_EXPERTS, num_experts_per_tok=TOP_K,
            tie_word_embeddings=False,
        )
        model = transformers.MixtralForCausalLM(cfg).eval()
    else:
        cfg = transformers.LlamaConfig(
            vocab_size=VOCAB, hidden_size=D_MODEL, intermediate_size=D_INT,
            num_hidden_layers=n_layers, num_attention_heads=N_HEADS,
            num_key_value_heads=N_KV, max_position_embeddings=SEQ * 2,
            tie_word_embeddings=False,
            # Explicit: the large32B preset (Qwen-32B geometry) has
            # n_heads * head_dim != d_model (64*128 vs 5120); the HF
            # default hidden_size // num_attention_heads would build
            # 80-dim heads and the hooked solver's 128-dim row slices
            # would run off the K projection (IndexError at kv>=5).
            head_dim=HEAD_DIM,
        )
        model = transformers.LlamaForCausalLM(cfg).eval()

    rng = np.random.default_rng(1234)
    tokens = torch.tensor(
        rng.integers(0, VOCAB, size=(CALIB_SEQS, SEQ)), dtype=torch.long
    )

    _E = max(N_EXPERTS, 1)
    cov_mlp = [
        torch.zeros(D_INT, D_INT, dtype=torch.float64)
        if not N_EXPERTS
        else torch.zeros(_E, D_INT, D_INT, dtype=torch.float64)
        for _ in range(n_layers)
    ]
    cov_q = [torch.zeros(N_HEADS, HEAD_DIM, HEAD_DIM, dtype=torch.float64) for _ in range(n_layers)]
    cov_k = [torch.zeros(N_KV, HEAD_DIM, HEAD_DIM, dtype=torch.float64) for _ in range(n_layers)]
    cov_x = [torch.zeros(D_MODEL, D_MODEL, dtype=torch.float64) for _ in range(n_layers)]

    def mlp_hook(l):
        def hook(mod, inp):
            h = inp[0].detach().to(torch.float64).reshape(-1, D_INT)
            cov_mlp[l] += h.T @ h
        return hook

    def proj_hook(l, cov, n_h):
        def hook(mod, inp, out):
            p = out.detach().to(torch.float64).reshape(-1, n_h, HEAD_DIM).permute(1, 0, 2)
            cov[l] += torch.bmm(p.transpose(1, 2), p)
        return hook

    def ln_hook(l):
        def hook(mod, inp, out):
            x = out.detach().to(torch.float64)
            cov_x[l] += torch.einsum("btd,bte->de", x, x)
        return hook

    def moe_hook(l, e):
        # HF Mixtral runs each expert on its routed tokens only; the
        # pre-w2 input IS the routed intermediate (same Gram semantics
        # as our masked dense-all-experts tap, forward.py:_moe_gram).
        def hook(mod, inp):
            h = inp[0].detach().to(torch.float64).reshape(-1, D_INT)
            cov_mlp[l][e] += h.T @ h
        return hook

    handles = []
    for l, blk in enumerate(model.model.layers):
        if N_EXPERTS:
            for e, ex in enumerate(blk.block_sparse_moe.experts):
                handles.append(ex.w2.register_forward_pre_hook(moe_hook(l, e)))
        else:
            handles.append(blk.mlp.down_proj.register_forward_pre_hook(mlp_hook(l)))
        handles.append(blk.self_attn.q_proj.register_forward_hook(proj_hook(l, cov_q, N_HEADS)))
        handles.append(blk.self_attn.k_proj.register_forward_hook(proj_hook(l, cov_k, N_KV)))
        handles.append(blk.input_layernorm.register_forward_hook(ln_hook(l)))

    def sqrt_m(M, ridge=1e-4):
        w, V = torch.linalg.eigh(M)
        w = (w + ridge).clamp(min=0).sqrt()
        return (V * w) @ V.T

    bi = torch.zeros(n_layers, dtype=torch.float64)

    def run_calibration():
        with torch.no_grad():
            for i in range(0, CALIB_SEQS, BATCH):
                out = model(tokens[i : i + BATCH], output_hidden_states=True)
                hs = out.hidden_states
                for l in range(n_layers):
                    cs = torch.cosine_similarity(hs[l].double(), hs[l + 1].double(), dim=2)
                    bi[l] += (1 - cs).sum(0).mean()

    # Warmup one batch (symmetric with the JAX warmup).
    with torch.no_grad():
        model(tokens[:BATCH], output_hidden_states=True)
    log("torch warmup done")

    t0 = time.perf_counter()
    run_calibration()
    total_tokens = CALIB_SEQS * SEQ
    rank_mlp = int(D_INT * (1 - RATIO))
    rank_hd = int(HEAD_DIM * (1 - RATIO)) // 2 * 2
    group = N_HEADS // N_KV
    with torch.no_grad():
        def solve_type1(C, W_d, W_u, W_g):
            L = torch.linalg.cholesky(C + 1e-2 * torch.eye(D_INT, dtype=torch.float64))
            inv_diag = torch.diag(torch.cholesky_inverse(L))
            topk, _ = torch.sort(torch.topk(inv_diag, rank_mlp, largest=False).indices)
            C_SS = C[topk][:, topk]
            cross = C[topk, :] @ W_d.T
            Lr = torch.linalg.cholesky(C_SS + 1e-6 * torch.eye(rank_mlp, dtype=torch.float64))
            # materialise the factors the reference persists, at its bf16
            # save dtype (compress_mlp.py:59-63)
            return (
                torch.cholesky_solve(cross, Lr).to(torch.bfloat16),
                W_u[topk, :].contiguous().to(torch.bfloat16),
                W_g[topk, :].contiguous().to(torch.bfloat16),
            )

        for l, blk in enumerate(model.model.layers):
            if N_EXPERTS:
                for e, ex in enumerate(blk.block_sparse_moe.experts):
                    _f = solve_type1(
                        cov_mlp[l][e] / total_tokens, ex.w2.weight.double(),
                        ex.w3.weight.double(), ex.w1.weight.double(),
                    )
            else:
                _f = solve_type1(
                    cov_mlp[l] / total_tokens, blk.mlp.down_proj.weight.double(),
                    blk.mlp.up_proj.weight.double(), blk.mlp.gate_proj.weight.double(),
                )

            # QK: per-head sqrt + pair scores + row slicing (the reference
            # slices Q rows for every head in the group plus the K rows
            # and saves bf16, compress_qk.py:369-380,298-301)
            W_q_all = blk.self_attn.q_proj.weight.double()
            W_k_all = blk.self_attn.k_proj.weight.double()
            for kv in range(N_KV):
                sk = sqrt_m(cov_k[l][kv] / total_tokens, 1e-6)
                score = torch.zeros(HEAD_DIM // 2, dtype=torch.float64)
                for g in range(group):
                    sq = sqrt_m(cov_q[l][kv * group + g] / total_tokens)
                    e_q = (sq * sq).sum(0)
                    e_k = (sk * sk).sum(0)
                    score += e_q[: HEAD_DIM // 2] * e_k[: HEAD_DIM // 2] + e_q[HEAD_DIM // 2 :] * e_k[HEAD_DIM // 2 :]
                pairs = torch.topk(score.sqrt(), rank_hd // 2).indices
                mask = torch.cat([pairs, pairs + HEAD_DIM // 2])
                _k_rows = W_k_all[kv * HEAD_DIM : (kv + 1) * HEAD_DIM][mask].contiguous().to(torch.bfloat16)
                for g in range(group):
                    h = kv * group + g
                    _q_rows = W_q_all[h * HEAD_DIM : (h + 1) * HEAD_DIM][mask].contiguous().to(torch.bfloat16)

            # VO: whitening + per-head SVDs, factors materialised bf16
            # (compress_vo.py:89-92)
            Cx = cov_x[l] / total_tokens
            w, V = torch.linalg.eigh(Cx)
            sw = (w + 1e-4).clamp(min=0).sqrt()
            sqrt_C = (V * sw) @ V.T
            inv_sqrt_C = (V * (1.0 / sw.clamp(min=1e-12))) @ V.T
            W_v = blk.self_attn.v_proj.weight.double()
            W_o = blk.self_attn.o_proj.weight.double()
            for kv in range(N_KV):
                Vh_w = W_v[kv * HEAD_DIM : (kv + 1) * HEAD_DIM, :]
                U, S, Vh = torch.linalg.svd(sqrt_C @ Vh_w.T, full_matrices=False)
                _v_new = (inv_sqrt_C @ U[:, :rank_hd]).T.contiguous().to(torch.bfloat16)
                for g in range(group):
                    h = kv * group + g
                    O_h = W_o[:, h * HEAD_DIM : (h + 1) * HEAD_DIM]
                    _o_new = (torch.diag(S[:rank_hd]) @ Vh[:rank_hd, :] @ O_h.T).to(torch.bfloat16)
    elapsed = time.perf_counter() - t0
    for h in handles:
        h.remove()
    log(f"torch reference-equivalent compress: {elapsed:.2f}s")
    return elapsed


LINK_RATES = {}  # session link-rate probe (host-resident presets)


def probe_link_rates(mb: int = 64) -> None:
    """In-process duplex link probe: one H2D and one D2H of ``mb`` MB,
    recorded beside the capture so the wall model evaluates at THIS
    session's rates (the tunnel swings >8x within a day). The D2H leg
    fetches a freshly device-COMPUTED array — device_put'd arrays keep a
    host-side value cache that 'fetches' at RAM speed."""
    import jax
    import jax.numpy as jnp

    host = np.ones(mb * 2**20 // 2, dtype=np.int16)
    np.asarray(jax.device_put(host[:1024])[:1])  # session setup, not link
    t0 = time.perf_counter()
    d = jax.device_put(host)
    np.asarray(d.reshape(-1)[:1])
    h2d = mb / (time.perf_counter() - t0)
    d2 = jax.block_until_ready(d + jnp.int16(1))
    t0 = time.perf_counter()
    np.asarray(d2)
    d2h = mb / (time.perf_counter() - t0)
    LINK_RATES.update(
        {"h2d_mb_s": round(h2d, 1), "d2h_mb_s": round(d2h, 1), "probe_mb": mb}
    )
    log(f"link probe: H2D {h2d:.1f} MB/s, D2H {d2h:.1f} MB/s")


def main():
    # XLA compile accounting (VERDICT r2 §weak-5): count actual backend
    # compiles and the time they took, so cold-vs-warm cache progress is
    # driver-visible. Cache HITS don't fire backend_compile events, so
    # n_compiles on a warm disk cache ~ 0 and warmup_s is mostly load.
    # compile_s VARIANCE across captures of the same preset is the
    # persistent disk cache hitting or missing: the cache key is the
    # traced program's fingerprint, so ANY code change to a traced
    # function since the last warm run recompiles through the remote
    # tunnel (~15 s/program there — the 5.9 s-vs-137 s swing between
    # identical r03/r04 small captures). compile_cache.new_entries
    # makes the hit/miss state explicit in every capture.
    compile_events = []
    try:
        from jax._src import monitoring

        monitoring.register_event_duration_secs_listener(
            lambda e, d, **kw: compile_events.append(d)
            if e == "/jax/core/compile/backend_compile_duration"
            else None
        )
    except Exception:
        pass
    from modegpt_tpu.utils.cache import _DEFAULT as _CACHE_DIR

    cache_dir = _os.path.expanduser(_CACHE_DIR)
    cache_entries_before = (
        len(_os.listdir(cache_dir)) if _os.path.isdir(cache_dir) else 0
    )
    if _HOST_RESIDENT:
        try:
            probe_link_rates()
        except Exception as e:  # probe failure must never kill a capture
            log(f"link probe failed: {e}")
    ours, on_chip, hbm_peak, warmup_s = bench_jax()
    floor = dispatch_floor()
    flops = workload_flops()
    peak, device_kind = device_peak_flops()
    full_baseline = (
        _PRESET == "small" or _os.environ.get("MODEGPT_BENCH_FULL_BASELINE") == "1"
    )
    injected_baseline = _os.environ.get("MODEGPT_BENCH_BASELINE_S", "")
    if injected_baseline == "none":
        # No torch baseline at all: the 13B/32B-geometry t(1)/t(2)
        # measurement takes ~50 min on this host's ONE core, and a
        # runner timeout there would destroy the whole capture. The JSON
        # records vs_baseline null + baseline_source "unmeasured".
        baseline = None
        log("torch baseline: skipped (unmeasured)")
    elif injected_baseline:
        # Re-captures on the SAME preset reuse the audited torch number
        # instead of burning ~25 min re-measuring an unchanged CPU
        # baseline (t(1)/t(2) extrapolation, below). The JSON labels it.
        baseline = float(injected_baseline)
        log(f"torch baseline injected: {baseline:.2f}s")
    elif full_baseline:
        # Median of N (default 3) with every sample recorded: the single-
        # run baseline swung ~2x across sessions (170x vs 380x for the
        # same capture) purely on host weather.
        n_base = int(_os.environ.get("MODEGPT_BASELINE_RUNS", "3"))
        base_runs = sorted(bench_torch_reference() for _ in range(n_base))
        baseline = base_runs[len(base_runs) // 2]
        baseline_samples = [round(b, 2) for b in base_runs]
        log(f"torch baseline median of {n_base}: {baseline:.2f}s {baseline_samples}")
    else:
        # Two-point extrapolation keeps the CPU baseline inside the time
        # budget at medium/large scale: t(L) = fixed + L * per_layer is
        # exact for this per-layer-uniform workload, so measure L=1, 2
        # and evaluate at N_LAYERS.
        t1 = bench_torch_reference(1)
        t2 = bench_torch_reference(2)
        per_layer = max(t2 - t1, 0.0)
        baseline = t1 + per_layer * (N_LAYERS - 1)
        baseline_samples = {"t1_s": round(t1, 2), "t2_s": round(t2, 2)}
        log(
            f"torch baseline extrapolated: t(1)={t1:.2f}s t(2)={t2:.2f}s "
            f"-> t({N_LAYERS})={baseline:.2f}s"
        )
    out = {
        "metric": f"e2e_compress_seconds_synthetic_llama_{_LABEL}@30%",
        "value": round(ours, 3),
        "unit": "s",
        "vs_baseline": round(baseline / ours, 3) if baseline is not None else None,
        # analytic workload FLOPs / queue-amortised on-chip time / nominal
        # dense-bf16 chip peak. Conservative: the numerator excludes
        # padding and elementwise work.
        "flops": flops,
        "on_chip_s": round(on_chip, 3),
        "mfu": round(flops / on_chip / peak, 4) if peak else None,
        "mfu_wall": round(flops / ours / peak, 4) if peak else None,
        "device_kind": str(device_kind),
        "dispatch_floor_s": round(floor, 4),
        # warmup = first full pass incl. tracing + compiles + cache loads;
        # n_compiles/compile_s are the XLA backend compiles actually run
        # (disk-cache hits fire no event — warm restarts show ~0 here).
        "warmup_s": round(warmup_s, 2),
        "n_compiles": len(compile_events),
        "compile_s": round(sum(compile_events), 2),
    }
    cache_entries_after = (
        len(_os.listdir(cache_dir)) if _os.path.isdir(cache_dir) else 0
    )
    out["compile_cache"] = {
        # warm run: new_entries == 0 and n_compiles == 0 — compile_s
        # then reflects nothing but this session's code drift
        "enabled": _os.environ.get("MODEGPT_NO_COMPILE_CACHE") != "1",
        "new_entries": cache_entries_after - cache_entries_before,
    }
    if injected_baseline:
        out["baseline_source"] = "unmeasured" if injected_baseline == "none" else "injected"
    elif full_baseline:
        out["baseline_method"] = {
            "threads": int(_os.environ.get("MODEGPT_BASELINE_THREADS", "1")),
            "runs": baseline_samples,
            "stat": "median",
            "cpu_count": _os.cpu_count(),
            "loadavg_1m": round(_os.getloadavg()[0], 2),
        }
    else:
        out["baseline_method"] = {
            "threads": int(_os.environ.get("MODEGPT_BASELINE_THREADS", "1")),
            "stat": "two-point extrapolation",
            **baseline_samples,
            "cpu_count": _os.cpu_count(),
            "loadavg_1m": round(_os.getloadavg()[0], 2),
        }
    if hbm_peak is not None:
        out["hbm_peak_gib"] = round(hbm_peak, 2)
    if _HOST_RESIDENT:
        out["host_rss_peak_gib"] = round(rss_peak_gib(), 2)
    if STREAM_STATS:
        # streamed-sweep telemetry: whether the window flush ran in the
        # background, how long the main thread still blocked on it, and
        # the factor bytes that crossed the HBM->host link (the tunnel's
        # ~30 MB/s D2H makes this the streamed large-preset bottleneck).
        out["async_flush"] = bool(STREAM_STATS["async_flush"])
        out["flush_wait_s"] = round(STREAM_STATS["flush_wait_s"], 2)
        out["fetched_gb"] = round(STREAM_STATS["fetched_bytes"] / 2**30, 3)
        if "fetch" in STREAM_STATS:
            out["stream_fetch"] = STREAM_STATS["fetch"]
        # phase split (see stream_calibrate_solve stats_out): main-thread
        # H2D enqueue block / forward+BI-sync time / worker solve+fetch
        # total (overlaps sweep when async) / allowed flushes in flight.
        for k in ("stage_s", "sweep_s", "flush_run_s", "prepass_s",
                  "prepass_quant_s"):
            if k in STREAM_STATS:
                out[k] = round(STREAM_STATS[k], 2)
        if "bi_stage_dtype" in STREAM_STATS:
            out["bi_stage_dtype"] = STREAM_STATS["bi_stage_dtype"]
        if "factor_bytes" in STREAM_STATS:
            # total factor bytes vs fetched_gb: the gap is what host-side
            # factor reconstruction kept OFF the link (up/gate/q/k row
            # slices gathered from host RAM, compress/batched.py)
            out["factor_gb"] = round(STREAM_STATS["factor_bytes"] / 2**30, 3)
        if "staged_bytes" in STREAM_STATS:
            # total host->HBM weight traffic (2x the model for beyond-HBM
            # presets: BI prepass + tap sweep each stage every layer);
            # with fetched_gb and the probe_duplex.py link rates this IS
            # the wall-clock floor on tunneled hosts.
            out["staged_gb"] = round(STREAM_STATS["staged_bytes"] / 2**30, 3)
        if "flush_depth" in STREAM_STATS:
            out["flush_depth"] = STREAM_STATS["flush_depth"]
        # mfu over the sweep alone (e2e minus the main-thread flush
        # block): the compute-efficiency number comparable across hosts —
        # on non-tunneled hardware the D2H drain term vanishes and
        # mfu_wall converges to this.
        sweep_s = ours - STREAM_STATS["flush_wait_s"]
        if peak and sweep_s > 0:
            out["mfu_sweep"] = round(flops / sweep_s / peak, 4)
        # Checked wall model (VERDICT r4 weak-2): bytes x this session's
        # probed link rates + solve + compile vs the actual wall. A
        # residual_frac near 0 proves "bytes are the design, seconds are
        # weather"; a big one means the link moved mid-run (compare
        # implied_link_mb_s against the probe).
        if LINK_RATES:
            out["link_probe"] = dict(LINK_RATES)
            from modegpt_tpu.utils.wallmodel import wall_model

            wm = wall_model(
                out, LINK_RATES.get("h2d_mb_s"), LINK_RATES.get("d2h_mb_s")
            )
            if wm:
                out["wall_model"] = wm
    print(json.dumps(out))


if __name__ == "__main__":
    main()
