"""5-second tunnel H2D rate probe: one 64 MB RAM-sourced device_put,
synced by a 1-element fetch. The link rate on this host swings more
than 8x within a session (measured 89 MB/s at 12:14, 10 MB/s at 14:00
the same day — bench_results/r04/probe_duplex.json vs capture logs), so
captures gate on this probe instead of burning an hour into a degraded
link. Prints one JSON line.
"""

import json
import time

import numpy as np


def main() -> None:
    import jax

    mb = 64
    host = np.ones(mb * 2**20 // 2, dtype=np.int16)
    # warm one tiny transfer (session setup cost is not link rate)
    np.asarray(jax.device_put(host[:1024])[:1])
    t0 = time.perf_counter()
    d = jax.device_put(host)
    np.asarray(d[:1])
    dt = time.perf_counter() - t0
    print(json.dumps({
        "h2d_mb_s": round(mb / dt, 1),
        "probe_mb": mb,
        "device_kind": str(jax.devices()[0].device_kind),
    }))


if __name__ == "__main__":
    main()
