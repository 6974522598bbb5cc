"""Probe: does H2D staging leak HOST memory on the tunneled backend?

The large13B host-resident bench was OS-OOM-killed at 130 GB anon RSS on
a 125 GB host; the legitimate host working set is ~56 GB. The unaccounted
~75 GB matches the total bytes staged host->device across the run's three
layer sweeps (25 GB model x 3), suggesting the IFRT-proxy client retains
a host-side copy of every MakeArrayFromHostBuffer transfer.

This probe stages a 1 GiB numpy array to the default device N times,
dropping the device array each iteration, and prints RSS per iteration:

  * RSS flat            -> no client-side retention; the 13B OOM is ours.
  * RSS +1 GiB/iter     -> the client pins per-transfer host copies; test
                           the mitigations below.

Mitigation variants (one per phase, N iterations each):
  A  plain device_put, del ref
  B  device_put, block_until_ready, del ref, gc.collect()
  C  device_put onto device, CONSUME via donated jit (x+0), del both
  D  reuse ONE source buffer (np array) for every transfer

Run it only while no other process is using the tunnel (the tunnel
misbehaves with two TPU clients).
"""

from __future__ import annotations

import gc
import time

import numpy as np


def rss_gib() -> float:
    with open("/proc/self/statm") as f:
        return int(f.read().split()[1]) * 4096 / 2**30


def main(n: int = 6, gib: float = 1.0) -> None:
    from modegpt_tpu.utils.backend import ensure_available_backend

    ensure_available_backend()
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    print(f"device: {dev.device_kind if hasattr(dev, 'device_kind') else dev}")
    elems = int(gib * 2**30 // 4)

    @jax.jit
    def probe(x):
        return x.reshape(-1)[:1]

    def sync(a):
        np.asarray(probe(a))

    consume = jax.jit(lambda x: x + 0.0, donate_argnums=0)

    def phase(name, body):
        gc.collect()
        base = rss_gib()
        print(f"--- {name} (rss base {base:.2f} GiB)")
        for i in range(n):
            t0 = time.perf_counter()
            body()
            gc.collect()
            print(
                f"  iter {i}: rss {rss_gib():.2f} GiB "
                f"(+{rss_gib() - base:.2f}) {time.perf_counter() - t0:.1f}s",
                flush=True,
            )

    def body_a():
        src = np.ones((elems,), np.float32)
        a = jax.device_put(src)
        sync(a)
        del a, src

    phase("A plain device_put + del", body_a)

    def body_b():
        src = np.ones((elems,), np.float32)
        a = jax.device_put(src)
        jax.block_until_ready(a)
        del a, src

    phase("B block_until_ready + del + gc", body_b)

    def body_c():
        src = np.ones((elems,), np.float32)
        a = jax.device_put(src)
        b = consume(a)
        sync(b)
        del a, b, src

    phase("C consume via donated jit", body_c)

    src_d = np.ones((elems,), np.float32)

    def body_d():
        a = jax.device_put(src_d)
        sync(a)
        del a

    phase("D reuse one host source", body_d)

    # E: does jnp.asarray behave differently from device_put?
    def body_e():
        src = np.ones((elems,), np.float32)
        a = jnp.asarray(src)
        sync(a)
        del a, src

    phase("E jnp.asarray + del", body_e)


if __name__ == "__main__":
    main()
