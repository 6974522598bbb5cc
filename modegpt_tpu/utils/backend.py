"""Bounded accelerator-backend availability probe.

The tunneled TPU backend this environment reaches can go down for
HOURS, and jax backend init then hangs INDEFINITELY — hanging whatever
process touches devices first (bench, driver compile checks). Probing
in a bounded subprocess and falling back to CPU keeps those entry
points productive: they emit results labelled with the backend that
actually ran instead of hanging with no output.
"""

from __future__ import annotations

import os
import subprocess
import sys

__all__ = ["ensure_available_backend"]


def ensure_available_backend(timeout: int | None = None) -> bool:
    """Probe jax backend init in a subprocess; force CPU on failure.

    Returns True when the accelerator backend is usable, False when the
    process was switched to CPU. An explicit ``JAX_PLATFORMS=cpu`` is
    honoured without probing (probe cost through a live tunnel is one
    backend init, ~20-60 s; bounded by MODEGPT_BENCH_PROBE_TIMEOUT or
    `timeout`, default 300 s, when the tunnel is down).
    """
    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip().lower() == "cpu":
        jax.config.update("jax_platforms", "cpu")
        return False
    if timeout is None:
        timeout = int(os.environ.get("MODEGPT_BENCH_PROBE_TIMEOUT", "300"))
    try:
        rc = subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=timeout, stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        ).returncode
    except subprocess.TimeoutExpired:
        rc = -1
    if rc == 0:
        return True
    print(
        f"accelerator backend unavailable (probe rc={rc}) — CPU fallback",
        file=sys.stderr, flush=True,
    )
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    return False
