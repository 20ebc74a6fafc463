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
# quiet XLA:CPU AOT loader feature-string noise when loading cached
# executables (cosmetic: same machine, canonicalization-order mismatch);
# level 2 keeps ERROR-severity diagnostics visible
os.environ.setdefault("TF_CPP_MIN_LOG_LEVEL", "2")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent compile cache for the suite (committed in-repo): the tests are
# compile-dominated on the single-core CPU mesh (~10 min cold), and the
# suite must fit a single-shot 600 s runner. Only multi-second compiles are
# cached to keep the blob small; source changes miss cleanly (keyed on HLO)
# and fall back to compiling.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir,
                 ".test_compile_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0xF1A7)
