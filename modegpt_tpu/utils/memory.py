"""Host + device memory watchdog.

Extends the reference's RSS monitor daemon (reference:
src/model_utils.py:34-60 — 1 Hz RSS dump to ``.mem-usage`` with a 64 GB
warning) with JAX device-memory stats, which matter far more on TPU
(HBM is the binding constraint for the Gram accumulators).
"""

from __future__ import annotations

import os
import threading
from typing import Optional

__all__ = ["start_memory_watchdog", "device_memory_stats"]


def device_memory_stats() -> dict:
    import jax

    out = {}
    for d in jax.local_devices():
        try:
            s = d.memory_stats()
        except Exception:
            s = None
        if s:
            out[str(d)] = {
                "bytes_in_use": s.get("bytes_in_use"),
                "bytes_limit": s.get("bytes_limit"),
            }
    return out


def start_memory_watchdog(
    path: str = "./.mem-usage",
    interval_s: float = 1.0,
    warn_gb: float = 60.0,
    stop_event: Optional[threading.Event] = None,
) -> threading.Thread:
    stop = stop_event or threading.Event()

    def loop():
        try:
            import psutil

            proc = psutil.Process(os.getpid())
        except ImportError:
            proc = None
        while not stop.is_set():
            lines = []
            if proc is not None:
                rss_gb = proc.memory_info().rss / 1024**3
                import psutil

                lines.append(f"[Monitor] Process RAM: {rss_gb:.2f} GB")
                lines.append(f"System RAM: {psutil.virtual_memory().percent}% used")
                if rss_gb > warn_gb:
                    lines.append("WARNING: process RSS near host memory limit")
            for dev, s in device_memory_stats().items():
                if s.get("bytes_in_use") is not None:
                    lines.append(
                        f"{dev}: {s['bytes_in_use'] / 1024**3:.2f} GB HBM in use"
                        + (
                            f" / {s['bytes_limit'] / 1024**3:.2f} GB"
                            if s.get("bytes_limit")
                            else ""
                        )
                    )
            try:
                with open(path, "w") as f:
                    f.write("\n".join(lines))
            except OSError:
                pass
            stop.wait(interval_s)

    t = threading.Thread(target=loop, daemon=True)
    t._stop_event = stop  # handle for tests
    t.start()
    return t
