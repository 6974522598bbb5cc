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


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Bound in-process XLA:CPU executable accumulation.

    On this host the full suite in one process segfaults ~90% through,
    inside LLVM codegen in ``backend_compile_and_load`` (the failing
    test moves with ordering; every subset passes in isolation; RSS is
    ~6 GB and mmap count is flat — it is accumulated live-executable
    state in XLA:CPU, not our code). Dropping compiled programs between
    test modules keeps the compiler healthy; cross-module cache reuse
    was minimal anyway (different model geometries per file)."""
    yield
    jax.clear_caches()


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
