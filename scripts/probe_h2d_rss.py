"""Probe: host-RSS lifetime of H2D staging buffers on the tunneled backend.

The streamed beyond-HBM sweep observes RSS growing by ~one staged layer
per layer (large13B BI prepass: +0.6 GiB/layer over 40 layers despite
gc+malloc_trim each layer — compress/offload.py:_trim_host). That reads
as the PJRT client pinning a host transfer buffer per device_put and
not returning it. At 32B geometry (64 x ~1 GiB layers x 2 passes) the
pinned set alone would OOM the 125 GB host, so large32B is blocked on
understanding WHAT releases these buffers.

MEASURED (v5e tunnel, 2026-08-19, n=6 x 1024 MB then n=4 x 512 MB):

  default env        EVERY variant (plain/sync/delete/consume/donate/
                     reuse_src) pins +1 buffer of host RSS per
                     device_put, permanently — the client journals each
                     op's payload to replay it if the connection drops,
                     and nothing the Python side does releases the
                     journal entries.
  AXON_JOURNAL_COMPACT=1
                     any variant that makes a D2H round trip after the
                     put (sync/delete/consume/donate/reuse_src) stays
                     FLAT at ~one buffer in flight: the round trip
                     pushes the journal and compaction filters the
                     destroyed puts out. `plain` (no round trip) still
                     accumulates until some later op syncs. Trade-off:
                     a dropped connection can no longer replay — the
                     session fails instead of recovering.

The streamed sweep (compress/offload.py) fetches a scalar BI term per
layer, which is exactly the per-step round trip compaction needs — so
host-resident presets run with AXON_JOURNAL_COMPACT=1 and bounded RSS
(scripts/run_r03_benches.sh run_one).

Each variant stages N buffers of SIZE_MB and logs RSS after every
stage; between variants everything is deleted + synced + trimmed.

  plain      device_put, drop the python ref
  sync       device_put, tiny D2H fetch (forces queue drain), drop
  delete     device_put, jax.Array.delete() (explicit buffer free)
  consume    device_put, run a jitted reduce on it, fetch, drop
  reuse_src  device_put the SAME numpy buffer every time (tests
             whether pinning is keyed by source address)

Run: python scripts/probe_h2d_rss.py [N] [SIZE_MB]
"""

import ctypes
import gc
import sys
import time

import numpy as np


def rss_gib() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 2**30


def trim() -> None:
    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    size_mb = int(sys.argv[2]) if len(sys.argv) > 2 else 512
    import os

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from modegpt_tpu.utils.backend import ensure_available_backend

    ensure_available_backend()
    import jax

    if os.environ.get("JAX_PLATFORMS"):
        # this host's sitecustomize forces the axon backend; honor an
        # explicit env request (e.g. CPU smoke while the TPU is busy)
        jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"backend={dev.platform} device={dev.device_kind} n={n} size={size_mb}MB")
    shape = (size_mb * 1024 * 1024 // 2,)  # bf16 elements

    reduce_fn = jax.jit(lambda x: jnp.sum(x.astype(jnp.float32)))
    donate_fn = jax.jit(lambda x: x[:8] * 1, donate_argnums=0)

    def variant(name, step):
        trim()
        base = rss_gib()
        print(f"--- {name} (rss base {base:.2f} GiB)")
        src = np.ones(shape, dtype=np.uint16).view(jnp.bfloat16.dtype)
        keep = None
        for i in range(n):
            buf = src if name == "reuse_src" else src.copy()
            keep = step(buf, keep)
            trim()
            print(f"  {name} {i + 1}/{n}: rss {rss_gib():.2f} GiB (+{rss_gib() - base:.2f})")
        del keep, src
        trim()
        time.sleep(0.5)
        print(f"  {name} end: rss {rss_gib():.2f} GiB (+{rss_gib() - base:.2f})")

    def plain(buf, _):
        d = jax.device_put(buf)
        del d
        return None

    def sync(buf, _):
        d = jax.device_put(buf)
        np.asarray(d[:1])
        del d
        return None

    def delete(buf, _):
        d = jax.device_put(buf)
        np.asarray(d[:1])
        d.delete()
        return None

    def consume(buf, _):
        d = jax.device_put(buf)
        s = reduce_fn(d)
        float(s)
        del d, s
        return None

    def donate(buf, _):
        d = jax.device_put(buf)
        s = donate_fn(d)
        np.asarray(s)
        del d, s
        return None

    for name, step in [
        ("plain", plain),
        ("sync", sync),
        ("delete", delete),
        ("consume", consume),
        ("donate", donate),
        ("reuse_src", sync),
    ]:
        variant(name, step)


if __name__ == "__main__":
    main()
