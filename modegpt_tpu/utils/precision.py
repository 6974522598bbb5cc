"""Precision policy for the compression solvers.

The reference does all decomposition linear algebra in float64 on GPU
(reference: src/model_utils.py:15 `dtype_p = torch.float64`). TPUs are
f32-native, so we support two solver placements:

* ``f64_cpu`` (default, parity mode): solver inputs are moved to the host
  CPU backend and the eigh/SVD/Cholesky run in float64 — bitwise-stable
  and matches the reference math to ~1e-10.
* ``f32_device`` (speed mode): solvers run on the accelerator in float32
  with HIGHEST matmul precision. Good enough for the PPL metric in most
  configs; much faster for large d_int.

`enable_x64()` must run before any JAX computation that needs f64.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp

SOLVER_MODES = ("f64_cpu", "f32_device")


def enable_x64() -> None:
    """Globally enable 64-bit dtypes in JAX (needed for parity mode)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def cpu_device() -> jax.Device:
    return jax.devices("cpu")[0]


def solver_dtype(mode: str) -> jnp.dtype:
    if mode == "f64_cpu":
        if not x64_enabled():
            enable_x64()
        return jnp.float64
    return jnp.float32


@contextlib.contextmanager
def solver_placement(mode: str) -> Iterator[None]:
    """Context manager placing solver computations per the precision mode."""
    if mode == "f64_cpu":
        with jax.default_device(cpu_device()):
            yield
    else:
        yield
