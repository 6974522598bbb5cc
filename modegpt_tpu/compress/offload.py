"""Layer-streamed calibration + solve: beyond-HBM models on one chip.

The reference compresses models bigger than one GPU by spilling layers
across devices/host via HF accelerate's ``device_map="auto"``
(reference: src/model_utils.py:70,152 — naive layer placement; the 32B
configs at tests.sh:150-175 depend on it). This module is the TPU-native
answer, designed around the sequential structure of the job rather than
around module placement:

The compression statistics are per-layer token sums, so the whole
calibration is ONE forward pass if layers are processed sequentially
with the activations held on device:

  1. Embed every calibration sequence once: ``X [N, B, T, D]`` stays in
     HBM (S.T.D activations — 168 MB for 8x2048 sequences at 13B scale).
  2. For each layer l: stage its weights into HBM (an async H2D copy,
     double-buffered so layer l+1 transfers while layer l computes),
     run ALL batches through the layer in one dispatch (a lax.scan over
     the batch stack), collecting the layer's Gram taps and BI piece,
     and write the updated activations back over X (donated).
  3. Every ``width`` layers, solve the window's factors from the
     on-device covariances (compress/batched.py, fetch="host") and drop
     the window's taps + staged weights.

Versus the resident windowed path (calib/engine.calibrate_window) this
runs the forward ONCE instead of once per layer chunk — at 7B with
1-layer chunks that deletes 31/32 of the forward FLOPs — and because
weights are staged per layer, the model never needs to fit in HBM at
all: peak residency is two staged layers + activations + one window of
covariances. A 13B-geometry stack (~24 GB bf16 > 16 GB HBM) compresses
on one v5e this way.

Allocation semantics: keep ratios come from Block-Influence scores over
every layer (reference: run_modegpt.py:126-133). BI needs a full sweep
before the first solve, so when ``keep_ratios`` is not supplied a
BI-only prepass runs first (taps skipped — pure forward). Callers that
already know the allocation (resume, fixed sweeps, the bench's timed
passes) pass ``keep_ratios`` and pay a single sweep.

Factor equality with the resident paths is tested at tight tolerance
(tests/test_offload.py); weights may be host numpy (beyond-HBM) or
device arrays (resident — staging is then a no-op).
"""

from __future__ import annotations

import logging
import time as _time
from functools import partial
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from modegpt_tpu.calib.engine import CalibrationResult
from modegpt_tpu.config import CompressionConfig
from modegpt_tpu.models.spec import ModelSpec

logger = logging.getLogger("modegpt_tpu")

__all__ = ["stream_calibrate_solve", "stream_bi_sweep"]


@partial(jax.jit, donate_argnums=0)
def _scale_tap_donated(tap: jax.Array, inv: jax.Array) -> jax.Array:
    return tap * inv


def _scale_tap(tap, inv):
    """Normalize a Gram accumulator by 1/total_tokens, reusing its buffer.

    Donation matters only where HBM is the constraint; CPU does not
    support donation (it would just log a warning per call)."""
    if isinstance(tap, jax.Array) and jax.default_backend() != "cpu":
        return _scale_tap_donated(tap, inv)
    return tap * inv


def _trim_host() -> None:
    """Return freed H2D-staging memory to the OS after each streamed
    layer. The tunneled backend's client allocates a host buffer per
    transfer (measured: RSS grows by ~one staged layer per layer swept,
    moe8 BI prepass 35.9->44.0 GiB over 8 layers), and glibc keeps the
    freed chunks in-arena — over 40 staged layers that reads as a leak
    and OOM-killed the 13B host-resident run. gc first (drop any python
    refs), then malloc_trim (no-op where unsupported)."""
    import gc

    gc.collect()
    try:
        import ctypes

        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def _host_rss_gib() -> float:
    """Current host RSS (GiB) — the sweep logs it per layer/window so an
    OS OOM kill (the 13B host-resident run died at 130 GB anon RSS)
    leaves a trail localising WHERE host memory grew."""
    try:
        with open("/proc/self/statm") as f:
            return int(f.read().split()[1]) * 4096 / 2**30
    except (OSError, ValueError, IndexError):
        return 0.0


def _layer_signature(spec: ModelSpec, l: int):
    """Layers with equal signatures share one compiled step program."""
    return (
        spec.q_ranks[l], spec.k_ranks[l], spec.v_ranks[l], spec.o_ranks[l],
        spec.gate_ranks[l], spec.is_moe_layer(l), spec.has_shared_expert(l),
        spec.layer_types[l] if spec.layer_types else None,
    )


def _rep_index(spec: ModelSpec, l: int) -> int:
    """Canonical representative layer index for l's signature (jit key)."""
    sig = _layer_signature(spec, l)
    for r in range(l + 1):
        if _layer_signature(spec, r) == sig:
            return r
    return l


@partial(jax.jit, static_argnames=("spec",))
def _embed_batches(spec: ModelSpec, other: Dict, tokens: jax.Array) -> jax.Array:
    """[N, B, T] tokens -> [N, B, T, D] embedded activations."""
    from modegpt_tpu.models.forward import _linear, _scale_embed

    N, B, T = tokens.shape

    def one(tok):
        x = _scale_embed(spec, other["embed_tokens"][tok])
        if spec.arch in ("opt", "gpt2"):
            if "project_in" in other:
                x = _linear(x, other["project_in"])
            pos = jnp.arange(T, dtype=jnp.int32) + spec.position_offset
            x = x + other["embed_positions"][pos][None]
        return x

    return jax.vmap(one)(tokens)


@partial(
    jax.jit,
    static_argnames=("spec", "rep_idx", "collect", "attn_impl", "gram_precision"),
    donate_argnums=(2,),
)
def _stream_layer_step(
    spec: ModelSpec,
    lp: Dict,
    x: jax.Array,
    rep_idx: int,
    collect: bool,
    attn_impl: str,
    gram_precision: str,
):
    """One layer over the whole batch stack: x [N, B, T, D] -> x' (donated),
    plus the layer's Gram taps (token sums over all N*B*T tokens) and its
    BI piece. One dispatch; the per-batch lax.scan bounds the transient
    working set (MLP intermediates, attention) to one batch."""
    from modegpt_tpu.models.forward import (
        _bi_piece, _gram, _head_gram, _layer, _moe_gram,
    )
    from modegpt_tpu.ops.rope import rope_cos_sin

    N, B, T, D = x.shape
    cos = sin = None
    if spec.uses_rope:
        cos, sin = rope_cos_sin(
            jnp.arange(T, dtype=jnp.int32), spec.head_dim, spec.rope_theta,
            dtype=x.dtype, scaling=spec.rope_scaling,
        )

    moe = spec.is_moe_layer(rep_idx)
    H, Hk = spec.n_heads, spec.n_kv_heads
    q_hd = spec.q_ranks[rep_idx] // H

    def taps_zero():
        t = {
            "cov_q": jnp.zeros((H, q_hd, q_hd), jnp.float32),
            "cov_k": jnp.zeros((Hk, q_hd, q_hd), jnp.float32),
            "cov_x": jnp.zeros((spec.d_model, spec.d_model), jnp.float32),
        }
        if moe:
            t["cov_mlp"] = jnp.zeros(
                (spec.n_experts, spec.d_int, spec.d_int), jnp.float32
            )
            if spec.has_shared_expert(rep_idx):
                t["cov_shared"] = jnp.zeros(
                    (spec.shared_d_int, spec.shared_d_int), jnp.float32
                )
        else:
            d_int = spec.gate_ranks[rep_idx]
            t["cov_mlp"] = jnp.zeros((d_int, d_int), jnp.float32)
        return t

    def body(carry, xb):
        taps_acc, bi_acc = carry
        x_new, raw = _layer(
            spec, rep_idx, lp, xb, cos, sin, "raw" if collect else False, attn_impl
        )
        bi_acc = bi_acc + _bi_piece(xb, x_new)
        if collect:
            gp = gram_precision
            t = {
                "cov_q": _head_gram(raw["q"], gp),
                "cov_k": _head_gram(raw["k"], gp),
                "cov_x": _gram(raw["x_ln"].reshape(-1, spec.d_model), gp),
            }
            if moe:
                t["cov_mlp"] = _moe_gram(raw["h_moe"], gp)
                if "h_shared" in raw:
                    t["cov_shared"] = _gram(
                        raw["h_shared"].reshape(-1, spec.shared_d_int), gp
                    )
            else:
                t["cov_mlp"] = _gram(raw["h"].reshape(-1, raw["h"].shape[-1]), gp)
            taps_acc = {k: taps_acc[k] + t[k] for k in taps_acc}
        return (taps_acc, bi_acc), x_new

    init = (taps_zero() if collect else {}, jnp.zeros((), jnp.float32))
    (taps, bi), x_out = lax.scan(body, init, x)
    return x_out, taps, bi


_Q_MIN_SIZE = 1 << 12  # leaves below this stage raw (tiny 2D leaves; 1D
# norms/biases are already excluded by ndim)


def _quantize_host_tree(lp, dtype: str):
    """Host pytree -> (treedef, kinds, payload) at prepass staging precision.

    Symmetric per-row (last-axis) quantization of every large floating
    leaf; small leaves (norms, biases) and device-resident leaves pass
    through raw. int8 = one signed byte per value; int4 = two codes per
    byte (offset-8 nibbles), last axis padded to even and trimmed on
    dequant. ``kinds`` is the static per-leaf recipe for the jitted
    device-side dequant (one compiled program per layer signature)."""
    leaves, treedef = jax.tree_util.tree_flatten(lp)
    kinds: List = []
    payload: List = []
    for a in leaves:
        if (
            isinstance(a, jax.Array)
            or a.ndim < 2
            or a.size < _Q_MIN_SIZE
            # jnp.issubdtype handles ml_dtypes (bf16 reports kind 'V' to
            # bare numpy)
            or not jnp.issubdtype(np.asarray(a).dtype, jnp.floating)
        ):
            kinds.append(("raw",))
            payload.append(a)
            continue
        f = np.asarray(a, dtype=np.float32)
        amax = np.abs(f).max(axis=-1, keepdims=True)
        if dtype == "int8":
            scale = np.where(amax > 0, amax / 127.0, 1.0).astype(np.float32)
            q = np.clip(np.rint(f / scale), -127, 127).astype(np.int8)
            kinds.append(("q8", str(np.asarray(a).dtype)))
            payload.extend((q, scale))
        else:  # int4
            scale = np.where(amax > 0, amax / 7.0, 1.0).astype(np.float32)
            q = np.clip(np.rint(f / scale), -7, 7).astype(np.int8) + 8
            n = q.shape[-1]
            if n % 2:
                q = np.concatenate(
                    [q, np.full(q.shape[:-1] + (1,), 8, np.int8)], axis=-1
                )
            packed = (q[..., 0::2] | (q[..., 1::2] << 4)).astype(np.uint8)
            kinds.append(("q4", str(np.asarray(a).dtype), n))
            payload.extend((packed, scale))
    return treedef, tuple(kinds), payload


@partial(jax.jit, static_argnames=("treedef", "kinds"))
def _dequant_staged(treedef, kinds, payload):
    """Rebuild the bf16/f32 layer tree from quantized staged leaves on
    device. Exactly inverts _quantize_host_tree; jit cache is keyed by
    (treedef, kinds, shapes) so signature-sharing layers share the
    program."""
    it = iter(payload)
    leaves = []
    for kind in kinds:
        if kind[0] == "raw":
            leaves.append(next(it))
        elif kind[0] == "q8":
            q, scale = next(it), next(it)
            leaves.append((q.astype(jnp.float32) * scale).astype(jnp.dtype(kind[1])))
        else:  # q4
            q, scale = next(it), next(it)
            lo = (q & jnp.uint8(0xF)).astype(jnp.int32) - 8
            hi = (q >> jnp.uint8(4)).astype(jnp.int32) - 8
            full = jnp.stack([lo, hi], axis=-1).reshape(*q.shape[:-1], -1)
            full = full[..., : kind[2]]
            leaves.append((full.astype(jnp.float32) * scale).astype(jnp.dtype(kind[1])))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def _stage_quantized(lp, dtype: str, stats: Optional[Dict] = None) -> Dict:
    """Host leaves -> device arrays through per-row quantized staging:
    the H2D link carries 1 (int8) or 0.5 (int4) bytes per weight instead
    of 2, and the layer is dequantized on device before the forward.
    Used ONLY by the BI-allocation prepass (stream_bi_sweep) — the layer
    ranking it produces is insensitive to sub-percent forward error,
    while the tap/solve sweep always stages exact weights."""
    t0 = _time.perf_counter()
    treedef, kinds, payload = _quantize_host_tree(lp, dtype)
    if stats is not None:
        stats["staged_bytes"] = stats.get("staged_bytes", 0) + sum(
            p.nbytes for p in payload if not isinstance(p, jax.Array)
        )
        stats["prepass_quant_s"] = (
            stats.get("prepass_quant_s", 0.0) + _time.perf_counter() - t0
        )
    dev = tuple(
        p if isinstance(p, jax.Array) else jax.device_put(p) for p in payload
    )
    return _dequant_staged(treedef, kinds, dev)


def _stage(lp, stats: Optional[Dict] = None) -> Dict:
    """Host leaves -> device arrays (async H2D); device leaves pass through.

    ``stats`` accumulates ``staged_bytes`` (host->HBM traffic) so bench
    JSONs can decompose beyond-HBM e2e into link terms: the tunneled
    host moves 2x the model H2D (BI prepass + tap sweep) plus the
    factors D2H, and those byte counts x the measured link rates ARE the
    wall-clock floor there (scripts/probe_duplex.py)."""
    if stats is not None:
        stats["staged_bytes"] = stats.get("staged_bytes", 0) + sum(
            leaf.nbytes
            for leaf in jax.tree_util.tree_leaves(lp)
            if not isinstance(leaf, jax.Array)
        )
    return jax.tree_util.tree_map(jax.device_put, lp)


def _slim_window_lp(spec: ModelSpec, l: int, lp: Dict, host_staged: bool) -> Dict:
    """The staged tree a flush window keeps for its solve.

    With host-side factor reconstruction active (host-staged weights),
    the lowmem-scale dense solve reads ONLY the down/v/o kernels from
    the staged tree — up/gate/q/k factors are gathered from host RAM and
    the forward is already done by flush time. Dropping the dead refs
    frees ~half the staged layer's HBM (524 MB per window at 32B
    geometry) before the solve workspace allocates beside it. MoE and
    big-path (small d_int) layers keep the full tree: their solvers
    still stack up/gate on device."""
    from modegpt_tpu.compress.batched import _LOWMEM_COV_BYTES

    if (
        not host_staged
        or spec.is_moe_layer(l)
        or spec.gate_ranks[l] ** 2 * 4 <= _LOWMEM_COV_BYTES
    ):
        return lp
    return {k: v for k, v in lp.items() if k in ("down", "v", "o", "shared")}


def _flush_hbm_estimate(
    spec: ModelSpec, layer_bytes: int, stack_bytes: int, width: int, overlap: bool,
    depth: int = 1,
) -> int:
    """Worst-case device bytes while ONE dense window flushes.

    Terms (f32 solves over bf16 weights):
      taps      per dense layer: cov_mlp [d_int, d_int] f32 + cov_x
                [d, d] f32 + per-head Q/K grams (bounded by 2*d^2)
      workspace Type-I selection holds ~2x [d_int, d_int] f32 BESIDE the
                cov it factors (escalated-Cholesky temp + L,
                ops/psd.py ridge_inverse_diag)
      staged    layer weights in flight (2 when the next layer's H2D
                prefetch overlaps, 1 when deferred past the flush)
      stacks    the activation stacks the sweep carries
      overlap   an async flush solves window W while the sweep
                accumulates window W+1's taps -> taps count twice

    Deliberately coarse (it ignores XLA transients and fragmentation) —
    callers compare against a conservative fraction of HBM."""
    d_int = max(
        (spec.gate_ranks[l] for l in range(spec.n_layers)), default=0
    ) or spec.d_int
    taps = 4 * (d_int * d_int + 3 * spec.d_model * spec.d_model) * width
    workspace = 2 * 4 * d_int * d_int
    staged = (2 if overlap else 1) * layer_bytes
    # depth > 1 lets the sweep accumulate that many extra windows' taps
    # while flushes drain — each pins one more window of taps.
    extra = (depth - 1) * taps if overlap else 0
    return stack_bytes + staged + (2 if overlap else 1) * taps + workspace + extra


def _async_flush_fits(
    spec: ModelSpec, layer_bytes: int, stack_bytes: int, width: int,
    hbm_bytes: Optional[int], depth: int = 1,
) -> bool:
    """Whether an async window flush (solve racing the sweep) fits in
    ``hbm_bytes``. Unknown budget (CPU, no memory_stats) -> True: the
    gate exists for real HBM, not virtual-device tests."""
    if not hbm_bytes:
        return True
    est = _flush_hbm_estimate(
        spec, layer_bytes, stack_bytes, width, overlap=True, depth=depth
    )
    return est <= 0.75 * hbm_bytes


def _device_hbm_bytes() -> Optional[int]:
    try:
        from modegpt_tpu.utils.memory import device_memory_stats

        stats = device_memory_stats()
        limits = [s.get("bytes_limit") for s in stats.values()]
        limits = [b for b in limits if b]
        return min(limits) if limits else None
    except Exception:
        return None


def _release_solved(spec: ModelSpec, params: Dict, chunk: Dict) -> None:
    """Pop the dense projection leaves that ``chunk``'s factors replace
    (mirrors apply_factors(release_dense=True), compress/surgery.py): a
    layer's dense q/k, v/o, up/gate/down (or experts/shared) are dead
    once its factors are solved — the sweep only moves forward and the
    later surgery consumes factors, not these leaves."""
    for l in chunk.get("qk", {}):
        params["layers"][l].pop("q", None)
        params["layers"][l].pop("k", None)
    for l in chunk.get("vo", {}):
        params["layers"][l].pop("v", None)
        params["layers"][l].pop("o", None)
    for l, f in chunk.get("mlp", {}).items():
        src = params["layers"][l]
        if spec.is_moe_layer(l):
            src.pop("experts", None)
            if f.get("shared_up") is not None:
                src.pop("shared", None)
        else:
            for key in ("up", "gate", "down"):
                src.pop(key, None)


def _group_batches(batches: Sequence[np.ndarray]) -> List[np.ndarray]:
    """Stack uniform-shaped batches into [N, B, T] groups (the ragged
    tail batch becomes its own group)."""
    groups: Dict[Tuple[int, int], List[np.ndarray]] = {}
    order: List[Tuple[int, int]] = []
    for b in batches:
        key = tuple(b.shape)
        if key not in groups:
            groups[key] = []
            order.append(key)
        groups[key].append(np.asarray(b, dtype=np.int32))
    return [np.stack(groups[k]) for k in order]


def stream_bi_sweep(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    attn_impl: str = "auto",
    stats_out: Optional[Dict] = None,
    stage_dtype: str = "bf16",
    adaptive: bool = False,
) -> List[float]:
    """BI-only streamed sweep (no taps): one forward's FLOPs, one full
    H2D weight sweep. Returns per-layer BI scores normalised by sequence
    count (reference: calibration.py:135-136).

    ``stage_dtype`` sets the precision the prepass stages weights at:
    'bf16' stages the exact model leaves; 'int8'/'int4' stage symmetric
    per-row quantized copies and dequantize on device, cutting the
    prepass link bytes 2x/4x. BI feeds only the smoothed-softmax layer
    allocation (reference: compression_utils.py:102-104), which is
    insensitive to the sub-percent forward error quantized staging adds
    — the measured keep-ratio deviation is bounded in
    tests/test_offload.py::test_bi_stage_dtype_allocation_deviation.

    ``adaptive`` (the 'auto' policy) measures instead of assuming:
    layer 0 stages raw and layer 1 stages quantized, each synced and
    timed, and the CHEAPER path stages the remaining layers. Whether
    quantization wins depends on the session: the host-side quantize
    costs CPU that the CPU-bound tunnel client also needs, so at fast
    link rates raw bf16 staging wins while at degraded rates (the
    tunnel swings >8x within a day — scripts/probe_link_rate.py) the
    2x byte cut dominates. Both timings land in ``stats_out``.

    ``stats_out`` gains ``prepass_s`` (wall) and accumulates
    ``staged_bytes`` — the prepass is one full-model H2D pass, usually
    link-bound on tunneled hosts (measured serialised at ~89 MB/s H2D,
    scripts/probe_duplex.py), which is exactly why quantized staging
    exists."""
    t_pre = _time.perf_counter()
    attn_impl = _resolve_attn(attn_impl)

    def stage_layer(lp):
        if stage_dtype in ("int8", "int4"):
            return _stage_quantized(lp, stage_dtype, stats_out)
        return _stage(lp, stats_out)

    def _sync_staged(tree):
        lead = next(
            a for a in jax.tree_util.tree_leaves(tree) if isinstance(a, jax.Array)
        )
        np.asarray(lead.reshape(-1)[:1])

    other = {k: v for k, v in params.items() if k != "layers"}
    other_dev = _stage(_embed_leaves(spec, other), stats_out)
    stacks = [
        _embed_batches(spec, other_dev, jnp.asarray(g)) for g in _group_batches(batches)
    ]
    del other_dev  # embeddings are dead once the stacks exist (see sweep)
    n_seq = sum(int(b.shape[0]) for b in batches)
    bi = np.zeros(spec.n_layers, dtype=np.float64)

    if adaptive and stage_dtype in ("int8", "int4") and spec.n_layers >= 3:
        # Measure both stagings on real layers this session, pick the
        # cheaper for the rest. Layers 0/1 stay exact-vs-quantized as
        # timed (BI tolerates either; deviation is bounded by test).
        t0 = _time.perf_counter()
        staged0 = _stage(params["layers"][0], stats_out)
        _sync_staged(staged0)
        t_raw = _time.perf_counter() - t0
        t0 = _time.perf_counter()
        staged1 = stage_layer(params["layers"][1])
        _sync_staged(staged1)
        t_q = _time.perf_counter() - t0
        if t_raw <= t_q:
            stage_dtype = "bf16"
        if stats_out is not None:
            stats_out["bi_stage_probe_s"] = {"bf16": round(t_raw, 2),
                                             "quantized": round(t_q, 2)}
            stats_out["bi_stage_dtype"] = stage_dtype
        logger.info(
            "BI prepass staging probe: bf16 %.1fs vs quantized %.1fs -> %s",
            t_raw, t_q, stage_dtype,
        )
        prestaged = {0: staged0, 1: staged1}
    else:
        prestaged = {0: stage_layer(params["layers"][0])}

    staged = prestaged.pop(0)
    for l in range(spec.n_layers):
        lp = staged
        if l + 1 < spec.n_layers:
            staged = prestaged.pop(l + 1, None)
            if staged is None:
                staged = stage_layer(params["layers"][l + 1])  # overlap H2D with compute
        rep = _rep_index(spec, l)
        for i in range(len(stacks)):
            stacks[i], _, bi_l = _stream_layer_step(
                spec, lp, stacks[i], rep, False, attn_impl, "highest"
            )
            bi[l] += float(bi_l)
        _trim_host()
        logger.info(
            "BI prepass: layer %d/%d done (rss %.1f GiB)",
            l + 1, spec.n_layers, _host_rss_gib(),
        )
    if stats_out is not None:
        stats_out["prepass_s"] = _time.perf_counter() - t_pre
    return (bi / n_seq).tolist()


def _embed_leaves(spec: ModelSpec, other: Dict) -> Dict:
    keep = {"embed_tokens"}
    if spec.arch in ("opt", "gpt2"):
        keep |= {"project_in", "embed_positions"}
    return {k: v for k, v in other.items() if k in keep}


def _resolve_attn(attn_impl: str) -> str:
    if attn_impl == "auto":
        use_flash = jax.default_backend() == "tpu" and not jax.config.jax_enable_x64
        return "flash" if use_flash else "xla"
    return attn_impl


def stream_calibrate_solve(
    spec: ModelSpec,
    params: Dict,
    batches: Sequence[np.ndarray],
    config: CompressionConfig,
    order: str = "mlp,qk,vo",
    keep_ratios: Optional[np.ndarray] = None,
    on_window=None,
    target_layers: Optional[Sequence[int]] = None,
    stats_out: Optional[Dict] = None,
    release_params: bool = False,
) -> Tuple[Dict[str, Dict[int, Dict]], List[float], np.ndarray]:
    """Calibrate + solve every layer in one streamed sweep.

    Args:
      params: model pytree; ``params["layers"][l]`` leaves may be host
        numpy (beyond-HBM staging) or device arrays (resident).
      keep_ratios: per-layer keep ratios; None runs a BI prepass and
        allocates (reference: compression_utils.py:79).
      on_window: optional callback ``(layers, factors_dict)`` invoked as
        each window's factors land (for incremental persistence).
      target_layers: layers to SOLVE (default all). Non-target layers
        still flow activations (the forward needs them) but pay no tap
        FLOPs — resume sweeps skip already-solved layers' Grams.
      release_params: MUTATES the caller's ``params`` — as each window's
        factors land, pop the dense projection leaves the solved factors
        replace (the same leaves apply_factors(release_dense=True) would
        pop). The sweep is strictly forward, so a solved layer's dense
        projections are dead for the rest of the run: releasing them as
        the sweep advances frees device HBM (resident weights) or host
        RAM (staged weights) monotonically instead of holding the whole
        dense model until surgery.

    Returns (factors, bi_scores, keep_ratios); factors keyed
    [suffix][layer] — host numpy under ``config.stream_fetch='host'``
    (default), model-dtype device slices under ``'device'`` (resident
    weights only: the compress-then-serve job skips the HBM->host factor
    transfer entirely and surgery consumes the slices in place).
    """
    from modegpt_tpu.compress.batched import solve_chunk_batched
    from modegpt_tpu.ops.allocation import allocate_keep_ratios

    attn_impl = _resolve_attn("auto" if config.use_flash_attention else "xla")
    width = max(1, min(config.layers_per_step, spec.n_layers))
    targets = (
        set(range(spec.n_layers)) if target_layers is None else set(target_layers)
    )

    host_staged = not isinstance(
        jax.tree_util.tree_leaves(params["layers"][0])[0], jax.Array
    )
    # Factor destination (config.stream_fetch): 'host' = numpy factors
    # (persistence; mandatory for beyond-HBM weights), 'device' = model-
    # dtype device slices for zero-copy surgery — the compress-then-serve
    # job then never pays the HBM->host factor link (~30 MB/s on tunneled
    # hosts, the streamed path's dominant term for resident models).
    fetch_mode = getattr(config, "stream_fetch", "host")
    if fetch_mode == "device" and host_staged:
        raise ValueError(
            "stream_fetch='device' requires device-resident weights: a "
            "host-staged (beyond-HBM) sweep exists precisely because the "
            "model does not fit in HBM, and accumulating device factors "
            "(~keep_ratio x model bytes) would re-fill it"
        )

    bi_scores: List[float]
    if keep_ratios is None:
        # Prepass staging precision: 'auto' considers int8 exactly when
        # the prepass is link-bound — host-staged weights on a real
        # accelerator (the beyond-HBM tunneled case) — and lets the
        # sweep MEASURE raw-vs-quantized staging on the first two layers
        # before committing (adaptive): the host-side quantize costs CPU
        # the tunnel client also needs, so which wins depends on the
        # session's link rate. Everywhere else auto stays exact.
        bi_dtype = getattr(config, "bi_stage_dtype", "auto")
        adaptive = False
        if bi_dtype == "auto":
            if host_staged and jax.default_backend() != "cpu":
                bi_dtype, adaptive = "int8", True
            else:
                bi_dtype = "bf16"
        if stats_out is not None:
            stats_out["bi_stage_dtype"] = bi_dtype
        bi_scores = stream_bi_sweep(
            spec, params, batches, attn_impl, stats_out, stage_dtype=bi_dtype,
            adaptive=adaptive,
        )
        keep_ratios, _ = allocate_keep_ratios(
            bi_scores, config.compression_ratio,
            smoothing=config.sparsity_smoothing, max_sparsity=config.max_sparsity,
        )
        keep_ratios = np.asarray(keep_ratios)
    else:
        bi_scores = []
        keep_ratios = np.asarray(keep_ratios)

    other = {k: v for k, v in params.items() if k != "layers"}
    other_dev = _stage(_embed_leaves(spec, other), stats_out)
    stacks = [
        _embed_batches(spec, other_dev, jnp.asarray(g)) for g in _group_batches(batches)
    ]
    # The embed table is dead once the stacks exist — drop our reference
    # so host-staged copies free their HBM (Qwen3 vocab at bf16 is
    # 1.45 GB, real headroom against the 32B-geometry solve workspace).
    # Resident callers keep theirs alive through ``params``.
    del other_dev
    n_seq = sum(int(b.shape[0]) for b in batches)
    seq_len = int(batches[0].shape[1])
    total_tokens = n_seq * seq_len

    # Async window flush: the HBM->host factor transfer is the streamed
    # sweep's idle time on tunneled hosts (the device drains while the
    # main thread blocks in np.asarray), so eligible windows solve+fetch
    # in ONE background worker while the main thread keeps the device
    # fed with the next layers' forwards. At most
    # ``config.stream_flush_depth`` windows in flight (the next flush
    # waits for the oldest first); the single worker serialises the
    # flushes themselves, so depth only controls how far the sweep may
    # run ahead of the drain. Each in-flight window pins its taps +
    # staged layer + solve working set in HBM, which is why the default
    # depth is 1, 'auto' only enables async when weights are host-staged
    # (beyond-HBM: HBM holds just 2 staged layers + activations), and
    # MoE windows never go async (their [E, d_int, d_int] taps are too
    # big to double-buffer; their flush also gates the next H2D
    # prefetch).
    layer_bytes = sum(
        leaf.nbytes for leaf in jax.tree_util.tree_leaves(params["layers"][0])
    )
    stack_bytes = sum(s.nbytes for s in stacks)
    # Device-fetched flushes are pure device dispatches (JAX async
    # dispatch already overlaps them with the sweep; there is no D2H
    # drain to hide), so the worker thread would add nothing but a
    # second copy of the flush working set.
    use_async = fetch_mode == "host" and config.stream_async_flush == "on" or (
        fetch_mode == "host"
        and config.stream_async_flush == "auto"
        and host_staged
        # HBM gate: at 32B geometry (d_int 25600) one window's Type-I
        # selection workspace is ~7.9 GB f32 — racing it against the
        # sweep's next-window taps RESOURCE_EXHAUSTED a 16 GB chip.
        # 'auto' only overlaps when the coarse estimate fits.
        and _async_flush_fits(
            spec, layer_bytes, stack_bytes, width, _device_hbm_bytes()
        )
    )
    flush_depth = int(getattr(config, "stream_flush_depth", 0) or 0)
    if flush_depth == 0:
        # auto: run one extra window ahead of the drain ONLY when a
        # KNOWN HBM budget says the extra in-flight window's taps fit
        # beside the solve workspace. An unknown budget (this tunneled
        # backend exposes no memory_stats) resolves to the proven
        # depth-1 double-buffer — treating unknown as "fits" put a
        # second 2.9 GB window of taps beside the 32B solve workspace
        # and RESOURCE_EXHAUSTED the first flush of a 50-min capture.
        hbm = _device_hbm_bytes()
        flush_depth = (
            2
            if use_async
            and hbm
            and _async_flush_fits(
                spec, layer_bytes, stack_bytes, width, hbm, depth=2
            )
            else 1
        )
    from modegpt_tpu.compress import batched as _batched_mod

    fetch_bytes_at_start = _batched_mod.FETCHED_BYTES.total
    executor = None
    pending: List = []
    flush_wait_s = 0.0
    flush_run_s = 0.0
    stage_s = 0.0
    sweep_s = 0.0
    if use_async:
        from concurrent.futures import ThreadPoolExecutor

        executor = ThreadPoolExecutor(max_workers=1)

    def _stage_timed(lp):
        nonlocal stage_s
        t0 = _time.perf_counter()
        out = _stage(lp, stats_out)
        stage_s += _time.perf_counter() - t0
        return out

    bi_pass = np.zeros(spec.n_layers, dtype=np.float64)
    factors: Dict[str, Dict[int, Dict]] = {}
    window_taps: Dict[int, Dict] = {}
    window_lp: Dict[int, Dict] = {}

    def _merge(chunks: Dict[str, Dict[int, Dict]]):
        for s, by_layer in chunks.items():
            factors.setdefault(s, {}).update(by_layer)

    def _is_oom(e: Exception) -> bool:
        return "RESOURCE_EXHAUSTED" in str(e)

    def _drain_pending(keep: int = 0):
        """Block until at most ``keep`` flushes remain in flight.

        A flush that RESOURCE_EXHAUSTED in the worker is retried
        synchronously: first every newer in-flight flush is collected
        (so nothing races the retry's solve workspace), async is
        disabled for the rest of the sweep (the HBM estimate was
        evidently optimistic), then the failed windows re-solve one at
        a time from their still-held taps. Only dense windows ever go
        async, and dense solves don't consume their inputs — the retry
        sees exactly the state the first attempt saw."""
        nonlocal flush_wait_s, use_async
        while len(pending) > keep:
            fut, run_fn = pending.pop(0)
            t0 = _time.perf_counter()
            failed = []
            try:
                _merge(fut.result())
            except Exception as e:  # noqa: BLE001 — re-raised unless OOM
                if not _is_oom(e):
                    raise
                failed.append(run_fn)
            if failed:
                use_async = False
                logger.warning(
                    "async window flush RESOURCE_EXHAUSTED; draining in-flight "
                    "flushes and retrying synchronously (async disabled for the "
                    "rest of this sweep)"
                )
                while pending:
                    fut2, run2 = pending.pop(0)
                    try:
                        _merge(fut2.result())
                    except Exception as e2:  # noqa: BLE001
                        if not _is_oom(e2):
                            raise
                        failed.append(run2)
                for rf in failed:
                    try:
                        _merge(rf())
                    except Exception as e3:  # noqa: BLE001
                        if not _is_oom(e3):
                            raise
                        # Last resort: drop every cached executable's
                        # retained buffers and retry once with the
                        # device otherwise quiet; propagate if even
                        # that doesn't fit.
                        logger.warning(
                            "sync window-flush retry RESOURCE_EXHAUSTED; "
                            "clearing caches and retrying once"
                        )
                        jax.clear_caches()
                        _merge(rf())
            flush_wait_s += _time.perf_counter() - t0

    def flush_window():
        nonlocal pending, flush_wait_s
        if not window_taps:
            return
        layers = sorted(window_taps)
        inv = jnp.float32(1.0 / total_tokens)
        moe_layers = [l for l in layers if spec.is_moe_layer(l)]

        def scaled(l, key):
            # Donate the accumulator buffer into the scale: the tap and
            # its scaled copy must never be alive together — at Mixtral
            # geometry cov_mlp is [E, d_int, d_int] f32 = 6.6 GB per
            # layer, and holding both was the moe8 RESOURCE_EXHAUSTED.
            return _scale_tap(window_taps[l].pop(key), inv)

        calib = CalibrationResult(
            cov_mlp={l: scaled(l, "cov_mlp") for l in layers},
            cov_q={l: scaled(l, "cov_q") for l in layers},
            cov_k={l: scaled(l, "cov_k") for l in layers},
            cov_x={l: scaled(l, "cov_x") for l in layers},
            bi_scores=list(bi_scores),
            n_sequences=n_seq,
            total_tokens=total_tokens,
            cov_shared={
                l: scaled(l, "cov_shared")
                for l in moe_layers
                if "cov_shared" in window_taps[l]
            }
            or None,
        )
        # Mixed dense/MoE windows: solve each kind as its own group (the
        # batched solvers need uniform cov shapes per call).
        groups = (
            [moe_layers, [l for l in layers if l not in moe_layers]]
            if moe_layers and len(moe_layers) != len(layers)
            else [layers]
        )
        wlp = dict(window_lp)
        # Host-side factor reconstruction (solve_chunk_batched
        # host_params): when the dense kernels live in host RAM anyway
        # (beyond-HBM staging), the selection-type factors (up/gate row
        # slices, q/k rows) are gathered there and never cross the
        # HBM->host link. Snapshot the host trees NOW — release_params
        # pops these leaves after the solve.
        host_view = (
            {l: params["layers"][l] for l in layers} if host_staged else None
        )

        def run() -> Dict[str, Dict[int, Dict]]:
            nonlocal flush_run_s
            t_run = _time.perf_counter()
            out: Dict[str, Dict[int, Dict]] = {}
            for g in groups:
                if not g:
                    continue
                chunk = solve_chunk_batched(
                    spec, {"layers": wlp}, g, keep_ratios, calib, config, order,
                    fetch=fetch_mode,
                    # the staged window tree is disposable: the solver may
                    # consume leaves its factors make dead (frees the
                    # up/gate expert stacks before the Cholesky arena)
                    scratch_params=True,
                    host_params=host_view,
                )
                for s, by_layer in chunk.items():
                    out.setdefault(s, {}).update(by_layer)
                if on_window is not None:
                    on_window(g, chunk)
            if release_params:
                _release_solved(spec, params, out)
            flush_run_s += _time.perf_counter() - t_run
            return out

        if use_async and not moe_layers:
            _drain_pending(flush_depth - 1)  # bound windows in flight
            if use_async:  # a drained flush may have OOMed and gone sync
                pending.append((executor.submit(run), run))
            else:
                t0 = _time.perf_counter()
                _merge(run())
                flush_wait_s += _time.perf_counter() - t0
        else:
            _drain_pending()  # sync flush: nothing may run beside it
            t0 = _time.perf_counter()
            _merge(run())
            flush_wait_s += _time.perf_counter() - t0
            logger.info(
                "window %s flushed in %.1fs (rss %.1f GiB)",
                layers, _time.perf_counter() - t0, _host_rss_gib(),
            )
        window_taps.clear()
        window_lp.clear()

    staged = _stage_timed(params["layers"][0])
    try:
        for l in range(spec.n_layers):
            lp = staged
            collect = l in targets
            # MoE flush windows hold [E, d_int, d_int] taps + the window's
            # expert stacks — at Mixtral geometry the solver needs every byte
            # beside them, so the next layer's H2D prefetch (enqueue-time
            # allocation!) is DEFERRED past the flush. The same applies to
            # any SYNC flush: sync mode is chosen exactly when the solve
            # working set is HBM-tight (the auto gate, or a prior OOM), and
            # with the sweep paused the prefetch buys no overlap anyway.
            # Async dense flushes keep the prefetch overlapping compute.
            # ONE predicate for both the deferral and the flush below: this
            # layer's taps (if collected) make the window full, or it's the
            # last layer. A drifted copy would silently re-introduce the
            # prefetch-over-flush enqueue allocation.
            will_flush = (
                len(window_taps) + (1 if collect else 0) >= width
                or l == spec.n_layers - 1
            )
            defer = will_flush and (spec.is_moe_layer(l) or not use_async)
            if l + 1 < spec.n_layers and not defer:
                staged = _stage_timed(params["layers"][l + 1])  # overlap H2D with compute
            rep = _rep_index(spec, l)
            taps_l = None
            t_sweep = _time.perf_counter()
            for i in range(len(stacks)):
                stacks[i], taps, bi_l = _stream_layer_step(
                    spec, lp, stacks[i], rep, collect, attn_impl, config.gram_precision
                )
                bi_pass[l] += float(bi_l)
                if collect:
                    taps_l = taps if taps_l is None else {
                        k: taps_l[k] + taps[k] for k in taps_l
                    }
            sweep_s += _time.perf_counter() - t_sweep
            if collect:
                window_taps[l] = taps_l
                window_lp[l] = _slim_window_lp(spec, l, lp, host_staged)
            _trim_host()
            logger.info(
                "streamed sweep: layer %d/%d done (rss %.1f GiB)",
                l + 1, spec.n_layers, _host_rss_gib(),
            )
            if will_flush and window_taps:
                flush_window()
            if l + 1 < spec.n_layers and defer:
                staged = _stage_timed(params["layers"][l + 1])
        _drain_pending()
    finally:
        if executor is not None:
            executor.shutdown(wait=True)

    if not bi_scores:
        bi_scores = (bi_pass / n_seq).tolist()
    if stats_out is not None:
        stats_out["async_flush"] = use_async
        stats_out["flush_wait_s"] = flush_wait_s
        # phase split for perf triage: stage_s = main-thread block in H2D
        # enqueues; sweep_s = forward dispatches + per-layer BI syncs;
        # flush_run_s = worker-side solve+fetch total (overlaps sweep_s
        # when async). e2e ≈ stage_s + sweep_s + flush_wait_s + python.
        stats_out["stage_s"] = stage_s
        stats_out["sweep_s"] = sweep_s
        stats_out["flush_run_s"] = flush_run_s
        stats_out["flush_depth"] = flush_depth if use_async else 0
        stats_out["fetch"] = fetch_mode
        # Bytes that actually crossed the HBM->host link (kernel-factor
        # transfers through batched._fetch): host-reconstructed slices
        # and device-fetched factors never did.
        stats_out["fetched_bytes"] = (
            _batched_mod.FETCHED_BYTES.total - fetch_bytes_at_start
        )
        stats_out["factor_bytes"] = sum(
            a.nbytes
            for by_layer in factors.values()
            for f in by_layer.values()
            for a in f.values()
            if hasattr(a, "nbytes") and not isinstance(a, jax.Array)
        )
    logger.info(
        "streamed calibrate+solve: %d layers, %d sequences x %d tokens, "
        "width %d, async_flush=%s (main-thread flush wait %.2fs)",
        spec.n_layers, n_seq, seq_len, width, use_async, flush_wait_s,
    )
    return factors, bi_scores, keep_ratios
