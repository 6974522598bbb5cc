"""Bounded accelerator-backend availability probe.

The tunneled TPU backend this environment reaches can go down for
HOURS, and jax backend init then hangs INDEFINITELY — hanging whatever
process touches devices first (bench, driver compile checks). Probing
in a bounded subprocess and falling back to CPU keeps those entry
points productive: they emit results labelled with the backend that
actually ran instead of hanging with no output. A successful probe is
followed by the parent's own backend init under a watchdog, so even a
tunnel drop in the probe->init race window aborts loudly within the
timeout rather than hanging forever.
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
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass
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
        # The probe only proves the tunnel was up a moment ago: the
        # PARENT's backend init (its first jax op) can still hang
        # indefinitely if the tunnel drops right now. Initialize here,
        # under a watchdog, so the residual race window is seconds wide
        # and a mid-init drop dies loudly (bounded, diagnosable) instead
        # of hanging the caller forever. Hangs in LATER ops (remote AOT
        # compiles after init) remain the caller's to bound — e.g. the
        # outer `timeout` in scripts/run_r03_benches.sh.
        import threading

        done = threading.Event()

        def _watchdog():
            if not done.wait(timeout):
                print(
                    f"backend init hung >{timeout}s after a successful "
                    "probe (tunnel dropped mid-init) — aborting",
                    file=sys.stderr, flush=True,
                )
                os._exit(3)

        threading.Thread(target=_watchdog, daemon=True).start()
        jax.devices()
        done.set()
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
