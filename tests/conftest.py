"""Test configuration: force an 8-device virtual CPU mesh.

Tests exercise the full multi-chip sharding path on CPU (the driver
validates it the same way); real-TPU benchmarks live in bench.py.
Must run before jax is imported anywhere.
"""

import os

# the driver environment presets JAX_PLATFORMS=axon (TPU tunnel) and a
# sitecustomize registers the axon PJRT plugin at interpreter start, so the
# env var alone is not enough — override via jax.config before any backend
# initialization
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")

# persistent compilation cache: the suite is compile-dominated (dozens of
# distinct tracer configurations), so re-runs skip straight to execution
_cache_dir = os.environ.get(
    "THEIA_TEST_CACHE", os.path.join(os.path.dirname(__file__), ".jax_cache")
)
jax.config.update("jax_compilation_cache_dir", _cache_dir)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

import numpy as np
import pytest


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0xC0FFEE)
