"""Profiling / tracing utilities.

The reference's observability is wall-clock + tok/s prints
(reference: src/eval.py:169-216). TPU-native equivalent (SURVEY.md §5):
`jax.profiler` traces viewable in TensorBoard/Perfetto plus named
per-phase timers that land in the metrics registry.
"""

from __future__ import annotations

import contextlib
import logging
import time
from typing import Dict, Iterator, Optional

logger = logging.getLogger("modegpt_tpu")

__all__ = ["trace", "phase_timer"]


@contextlib.contextmanager
def trace(profile_dir: Optional[str]) -> Iterator[None]:
    """Capture a jax.profiler trace into `profile_dir` (no-op if None)."""
    if not profile_dir:
        yield
        return
    import jax

    with jax.profiler.trace(profile_dir):
        yield
    logger.info("profiler trace written to %s", profile_dir)


@contextlib.contextmanager
def phase_timer(name: str, metrics: Optional[Dict] = None) -> Iterator[None]:
    """Wall-clock a named phase; records `<name>_seconds` into metrics."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        logger.info("phase %s: %.2fs", name, dt)
        if metrics is not None:
            metrics[f"{name}_seconds"] = dt
