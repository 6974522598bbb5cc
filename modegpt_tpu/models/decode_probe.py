"""Measured resolution of ``decode_attn='auto'`` (startup A/B probe).

The r03/r04 rounds settled the ragged-vs-XLA pure-decode choice with
controlled sweeps (bench_results/r04/decode_sweep: XLA wins pure decode
at every pool size on the tunneled v5e), but that answer is a CONSTANT
baked under one environment's ~25 ms dispatch floor — on a different
host the crossover may move. This module replaces the constant with a
measurement the first time a (device, pool geometry) pair is seen:

* ``probe_decode_attn`` times the REAL fused decode program
  (`_decode_slots_multi_jit`, the same program the batcher dispatches)
  once per backend on a synthetic pool at serving occupancy, and
  returns the winner with both step times.
* The result persists in ``~/.cache/modegpt_tpu/decode_auto.json``
  keyed by device kind + pool rows + cache geometry, so every later
  serve start resolves in <1 ms. The probe itself costs two compiles
  (amortised by the persistent XLA compilation cache, utils/cache.py)
  plus ~6 fused dispatches — sub-second warm, a few seconds cold on
  tunneled backends.
* ``MODEGPT_DECODE_AUTO=policy`` restores the r04 constant policy
  (no probe, no record); ``=measured`` (the default) probes on record
  miss. Prefill/mixed dispatches stay on the ragged kernel either way —
  that choice was decisive in BOTH measured regimes (r03 serving_load +
  r04 sweep), and probing it too would double the startup cost for a
  question the data already answers.

Reference anchor: the reference has no serving stack; this tunes the
TPU-native continuous batcher (models/serving.py) only.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["probe_decode_attn", "resolve_decode_attn_measured"]

_RECORD = "~/.cache/modegpt_tpu/decode_auto.json"


def _record_path() -> str:
    return os.path.expanduser(os.environ.get("MODEGPT_DECODE_AUTO_RECORD", _RECORD))


def _probe_key(spec, slots: int, max_len: int, kv_dtype: str) -> str:
    """Record key: everything the decode step's attention cost depends
    on. Pool rows (slots*max_len) set the XLA contraction size; the
    cache geometry (L, Hk, per-head ranks) sets both backends' read
    volume; device kind pins the hardware."""
    try:
        kind = jax.devices()[0].device_kind
    except Exception:
        kind = "unknown"
    rq = spec.q_ranks[0] // spec.n_heads
    rv = spec.v_ranks[0] // spec.n_kv_heads
    return (
        f"{kind}|slots={slots}|max_len={max_len}|L={spec.n_layers}"
        f"|Hk={spec.n_kv_heads}|Rq={rq}|Rv={rv}|kv={kv_dtype}"
    )


def _load_record() -> Dict:
    try:
        with open(_record_path()) as f:
            return json.load(f)
    except Exception:
        return {}


def _save_record(rec: Dict) -> None:
    path = _record_path()
    try:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(rec, f, indent=1)
        os.replace(tmp, path)
    except Exception:
        pass  # an unpersistable record only costs a re-probe next start


def probe_decode_attn(
    pm,
    slots: int,
    max_len: int,
    kv_dtype: str = "model",
    steps: int = 64,
    reps: int = 3,
    occupancy: float = 0.25,
) -> Dict:
    """Time one fused pure-decode dispatch per backend and pick the
    winner. Uses the batcher's own program (`_decode_slots_multi_jit`)
    at ``occupancy`` pool fill — the regime the r04 sweep measured —
    with every slot active and no EOS, so both backends do identical
    non-attention work and the difference is the attention read path.

    ``steps`` fused steps per dispatch amortise the dispatch floor into
    the comparison (64 steps x ~0.5 ms step >> the ~25 ms tunneled
    floor); the median of ``reps`` timed dispatches rejects transient
    host jitter. Returns {"winner", "xla_ms", "ragged_ms"} where the
    *_ms are per-STEP times."""
    from modegpt_tpu.models.serving import _decode_slots_multi_jit, init_serve_state

    spec = pm.spec
    # keep the scan inside the pool: occupancy fill + every probed step
    total_steps = steps * (reps + 1)
    fill = max(1, min(int(occupancy * max_len), max_len - total_steps - 1))
    results = {}
    for backend in ("xla", "ragged"):
        state = init_serve_state(
            pm, slots, max_len, dtype=pm.other["embed_tokens"].dtype,
            kv_dtype=kv_dtype,
        )
        state = state._replace(
            lengths=jnp.full((slots,), fill, jnp.int32),
            last_token=jnp.zeros((slots,), jnp.int32),
        )
        active = jnp.ones((slots,), bool)
        budgets = jnp.full((slots,), total_steps + 1, jnp.int32)
        eos = jnp.asarray(-1, jnp.int32)
        key = jax.random.key(0)

        def dispatch(st):
            out = _decode_slots_multi_jit(
                spec, pm.layers, pm.other, pm.q_hd_true, st, active, budgets,
                eos, steps, 0.0, None, key, has_eos=False,
                decode_attn=backend,
            )
            return out[0], out[1]

        state, toks = dispatch(state)  # warmup: compile + first run
        np.asarray(toks[:1, :1])
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            state, toks = dispatch(state)
            np.asarray(toks[:1, :1])  # small-slice sync (tunnel-reliable)
            times.append(time.perf_counter() - t0)
        results[backend] = sorted(times)[len(times) // 2] / steps * 1e3
    winner = "ragged" if results["ragged"] < results["xla"] else "xla"
    return {
        "winner": winner,
        "xla_ms": round(results["xla"], 4),
        "ragged_ms": round(results["ragged"], 4),
        "steps": steps,
        "reps": reps,
        "occupancy": occupancy,
    }


def resolve_decode_attn_measured(
    pm, slots: int, max_len: int, kv_dtype: str = "model"
) -> Optional[str]:
    """Pure-decode backend from the per-environment record, probing on
    a miss. Returns None when measurement is disabled
    (``MODEGPT_DECODE_AUTO=policy``) or the probe fails — callers then
    fall back to the swept constant policy."""
    if os.environ.get("MODEGPT_DECODE_AUTO", "measured") == "policy":
        return None
    key = _probe_key(pm.spec, slots, max_len, kv_dtype)
    rec = _load_record()
    hit = rec.get(key)
    if hit:
        return hit["winner"]
    try:
        result = probe_decode_attn(pm, slots, max_len, kv_dtype)
    except Exception:
        return None
    result["ts"] = time.time()
    rec[key] = result
    _save_record(rec)
    return result["winner"]
