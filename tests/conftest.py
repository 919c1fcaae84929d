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

import numpy as np
import pytest


@pytest.fixture
def rng() -> np.random.Generator:
    return np.random.default_rng(0xC0FFEE)
