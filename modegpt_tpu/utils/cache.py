"""Persistent XLA compilation cache.

Compiles on this environment's tunneled TPU backend cost minutes of
round-trip latency (measured 2-7 min for the bench program); JAX's
on-disk executable cache eliminates repeat compiles across processes —
including on the remote-compile (axon) backend, verified. Enabled by
every CLI entry point and the bench; opt out with
``MODEGPT_NO_COMPILE_CACHE=1``.
"""

from __future__ import annotations

import os

__all__ = ["enable_compilation_cache"]

_DEFAULT = "~/.cache/modegpt_tpu/jax_cache"


def enable_compilation_cache(path: str = _DEFAULT) -> bool:
    """Point jax at an on-disk compilation cache. Safe to call multiple
    times; returns False when disabled by env or on a CPU-only run."""
    if os.environ.get("MODEGPT_NO_COMPILE_CACHE") == "1":
        return False
    import jax

    # CPU-only runs don't use the cache: CPU compiles cost seconds (the
    # cache exists to amortise the remote TPU backend's minutes-long AOT
    # round trips), and XLA:CPU AOT artifacts are machine-feature-pinned
    # — entries written under a different detected feature set reload
    # with cpu_aot_loader mismatch errors and a SIGILL risk (observed:
    # teardown aborts after such loads).
    platforms = os.environ.get("JAX_PLATFORMS", "")
    try:
        platforms = jax.config.jax_platforms or platforms
    except Exception:
        pass
    if str(platforms).strip().lower() == "cpu":
        return False
    if not str(platforms).strip():
        # nothing requested: resolve the actual backend (every caller
        # initializes it immediately after anyway), so a CPU-only host
        # with JAX_PLATFORMS unset doesn't write pinned AOT entries
        try:
            if jax.default_backend() == "cpu":
                return False
        except Exception:
            pass

    p = os.path.expanduser(path)
    os.makedirs(p, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", p)
    # only persist compiles that actually cost something
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
    return True
