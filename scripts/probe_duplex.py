"""Characterise the host<->HBM link's CONCURRENCY on this backend.

The beyond-HBM captures show flush_wait_s ~= fetched_bytes / D2H-rate
(large13B: 651.9 s vs 16.5 GB at ~25 MB/s), i.e. the async flush worker
achieved ~zero overlap between the factor drain (D2H) and the sweep's
forward dispatches + H2D staging. Two hypotheses:

  H1  the tunnel client serialises ALL traffic (one socket / one lock):
      H2D, D2H and dispatch enqueues queue behind each other -> threads
      can't buy overlap, only byte cuts or link upgrades can.
  H2  the link is duplex but the worker's np.asarray sync point also
      drains the main thread's queued work -> smarter fetch scheduling
      (e.g. per-factor chunked fetches between dispatches) could help.

This probe answers it with four bounded measurements (~1-2 min total):

  h2d_alone     MB/s of device_put, synced via a 1-element fetch
                (block_until_ready does not block on the axon backend)
  d2h_alone     MB/s of np.asarray on device arrays freshly COMPUTED on
                device and never fetched before (a repeated fetch of one
                array times jax.Array's host-side value cache, not the
                link — see _fresh)
  duplex        two threads, one streaming H2D and one D2H: reports the
                combined achieved rate vs the serialised expectation
                (ratio ~1.0 -> H1 serialised; ~2.0 -> full duplex)
  d2h_vs_compute  D2H wall time while a long matmul chain is queued
                (ratio to d2h_alone ~1.0 -> transfers ride beside
                compute; >> 1.0 -> fetch waits for the queue to drain)

Writes one JSON line to stdout; capture with
  python scripts/probe_duplex.py | tee bench_results/r03/probe_duplex.json

NOTE: run only when the TPU is otherwise idle (one tunnel process at a
time) — this host has ONE core and the tunnel client is CPU-bound.
"""

from __future__ import annotations

import json
import os
import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

MB = 2**20
# Payload/reps are env-tunable: at the observed ~25-50 MB/s tunnel rates
# the 256 MB x 4 default runs ~7-10 min end to end (compile warmup
# included), which outlives impatient runners. 64 MB x 3 answers the
# same duplex question in ~2 min.
CHUNK = int(os.environ.get("PROBE_CHUNK_MB", "256")) * MB  # per-transfer payload
REPS = int(os.environ.get("PROBE_REPS", "4"))  # transfers per measurement


def _sync(x: jax.Array) -> None:
    """Round-trip sync: fetch one element (block_until_ready is a no-op
    on the tunneled backend)."""
    np.asarray(x[(0,) * x.ndim])


def _h2d(host: np.ndarray, reps: int) -> float:
    """Seconds to push ``reps`` copies of ``host`` to the device."""
    t0 = time.perf_counter()
    for _ in range(reps):
        d = jax.device_put(host)
        _sync(d)
        del d
    return time.perf_counter() - t0


def _fresh(base: jax.Array, n: int) -> list:
    """``n`` DISTINCT device arrays derived on-device from ``base``.

    jax.Array caches its fetched value on the object (``_value``), so
    timing repeated ``np.asarray`` on ONE array measures the cache, not
    the link (the first capture of this probe reported a 15.7 TB/s
    "D2H rate" exactly this way — and a device_put result may carry the
    host buffer from birth). Each measured fetch below therefore targets
    an array that was computed on device and never fetched."""
    outs = []
    add = jax.jit(lambda x, s: x + s)
    for i in range(n):
        o = add(base, np.int16(i + 1))
        outs.append(o)
    _sync(outs[-1])  # drain the queue; the adds are trivial
    return outs


def _d2h(devs: list) -> float:
    t0 = time.perf_counter()
    for d in devs:
        np.asarray(d)
    return time.perf_counter() - t0


def main() -> None:
    dev = jax.devices()[0]
    host = np.ones(CHUNK // 2, dtype=np.int16)  # CHUNK bytes, no bf16 cast cost
    resident = jax.device_put(host)
    _sync(resident)

    # --- solo rates (warm one transfer each first) ---
    _h2d(host, 1)
    h2d_s = _h2d(host, REPS)
    _d2h(_fresh(resident, 1))
    d2h_s = _d2h(_fresh(resident, REPS))
    h2d_rate = CHUNK * REPS / h2d_s / MB
    d2h_rate = CHUNK * REPS / d2h_s / MB

    # --- duplex: H2D and D2H streams from two threads ---
    down_targets = _fresh(resident, REPS)
    times = {}

    def up() -> None:
        times["up"] = _h2d(host, REPS)

    def down() -> None:
        times["down"] = _d2h(down_targets)

    t0 = time.perf_counter()
    th = [threading.Thread(target=up), threading.Thread(target=down)]
    for t in th:
        t.start()
    for t in th:
        t.join()
    duplex_wall = time.perf_counter() - t0
    serialised = h2d_s + d2h_s
    # ~1.0 -> fully serialised (H1); ~max(h2d_s, d2h_s)/serialised -> duplex
    duplex_ratio = serialised / duplex_wall if duplex_wall > 0 else 0.0

    # --- D2H while compute is queued ---
    a = jnp.ones((4096, 4096), jnp.bfloat16)

    @jax.jit
    def burn(x):
        def body(_, y):
            return y @ y * 0.5 + y

        return jax.lax.fori_loop(0, 64, body, x)

    b = burn(a)  # warm/compile
    _sync(b)
    busy_target = _fresh(resident, 1)
    queued = burn(a)  # enqueue a long chain, do NOT sync
    t0 = time.perf_counter()
    _d2h(busy_target)
    d2h_busy_s = time.perf_counter() - t0
    _sync(queued)
    d2h_idle_s = d2h_s / REPS

    print(
        json.dumps(
            {
                "device_kind": dev.device_kind,
                "chunk_mb": CHUNK // MB,
                "h2d_mb_s": round(h2d_rate, 1),
                "d2h_mb_s": round(d2h_rate, 1),
                "duplex_speedup_vs_serialised": round(duplex_ratio, 3),
                "duplex_verdict": "serialised"
                if duplex_ratio < 1.25
                else "partial"
                if duplex_ratio < 1.7
                else "duplex",
                "d2h_idle_s": round(d2h_idle_s, 3),
                "d2h_while_compute_queued_s": round(d2h_busy_s, 3),
                "d2h_compute_overlap": round(
                    d2h_idle_s / d2h_busy_s if d2h_busy_s > 0 else 0.0, 3
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
