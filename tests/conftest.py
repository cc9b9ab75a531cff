"""Test configuration: run on a virtual 8-device CPU mesh.

Mirrors the SURVEY.md §4 strategy — oracle tests vs NumPy references, with
multi-device parity checked by running the same programs on a simulated
mesh (XLA_FLAGS=--xla_force_host_platform_device_count).
"""

import jax

# The axon TPU plugin ignores the JAX_PLATFORMS env var; the config flags
# are authoritative.  Tests run on an 8-device virtual CPU mesh so
# multi-device sharding is exercised without hardware.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(1234)


@pytest.fixture(autouse=True, scope="module")
def _bound_jax_memory_between_modules():
    """Free compiled executables between test modules: the full suite
    (~230 tests, 8 virtual devices) accumulates enough XLA-CPU state to
    segfault late in the run on this 1-core box (observed r4 at
    test_oracle after ~60% of the suite).  Per-module recompiles cost a
    couple of minutes total; a green single-process `pytest tests/` is
    worth it."""
    yield
    jax.clear_caches()
