"""Test harness config: hermetic CPU backend with 8 virtual devices.

Multi-chip sharding tests run on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count); real-TPU behavior is exercised by
bench.py and the driver's compile checks.

NOTE: this environment boots a TPU plugin from sitecustomize.py that
programmatically sets jax_platforms, so the JAX_PLATFORMS env var alone is
not enough — we must override via jax.config before any backend is used.
"""

import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xF1A7)
