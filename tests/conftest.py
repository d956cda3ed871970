"""Test harness: force CPU with 8 virtual devices (the multi-chip fake).

Mirrors the reference's strategy of deterministic, real-implementation tests
(SURVEY.md §4.5); sharding tests use the virtual device mesh the way the
reference CI uses QEMU as its fake backend.

Must run before any `import jax` anywhere in the test session.
"""

import os

# the session env pins JAX_PLATFORMS=axon (the real TPU tunnel) — tests must
# override it, not setdefault it, to run on the local-CPU fake
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_test_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "0.1")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")

import jax

# env alone is not enough under the axon sitecustomize: force via config
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng():
    """Fixed seed 42, like every reference test (SURVEY.md §4.5)."""
    return np.random.default_rng(42)


@pytest.fixture
def tmp_store_path(tmp_path):
    return str(tmp_path / "vdb")
