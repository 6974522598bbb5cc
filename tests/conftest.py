"""Test harness: 8 virtual CPU devices + x64 for solver parity.

Env vars must be set before the first jax import, hence at conftest
import time.
"""

import os

os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "true")

import jax  # noqa: E402

# The environment's sitecustomize registers an experimental TPU platform and
# overrides JAX_PLATFORMS; force the CPU backend explicitly for tests.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


def random_psd(rng, n, dtype=np.float64, scale=1.0):
    A = rng.standard_normal((n, max(n, 2 * n))).astype(dtype)
    return (A @ A.T) * (scale / n)


@pytest.fixture
def make_psd(rng):
    def _make(n, dtype=np.float64, scale=1.0):
        return random_psd(rng, n, dtype, scale)

    return _make
