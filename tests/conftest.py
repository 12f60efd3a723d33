"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding is exercised
without TPU hardware (set M4RI_TPU_TEST_PLATFORM=tpu to run on a real chip).
Must happen before jax is imported anywhere.
"""

import os

_platform = os.environ.get("M4RI_TPU_TEST_PLATFORM", "cpu")
if _platform == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The axon sitecustomize imports jax at interpreter start, so env vars
    # alone are too late — switch the already-imported config too.
    import jax
    jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


_MODULE_SEEN = set()


@pytest.fixture(autouse=True)
def _bound_jit_cache(request):
    """Drop compiled executables at every module boundary.

    The suite compiles thousands of unique-shape programs in one process;
    letting them all stay live has produced nondeterministic XLA-CPU
    compiler segfaults late in the run (LLVM JIT resource exhaustion —
    the crash moves with test-collection order and never reproduces in
    isolation).  Clearing per module caps the live-executable count at
    the cost of recompiling the handful of shapes shared across
    modules."""
    mod = request.module.__name__
    if mod not in _MODULE_SEEN:
        _MODULE_SEEN.add(mod)
        import jax
        jax.clear_caches()
    yield


@pytest.fixture
def rng():
    return np.random.default_rng(17)


def random_dense(rng, m, n, density=0.5):
    return (rng.random((m, n)) < density).astype(np.uint8)
