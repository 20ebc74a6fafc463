"""Persistent XLA compilation cache.

Construction/search specialize on a handful of power-of-two shape buckets;
on TPU each compile is expensive (remote compile in some deployments), so
benchmarks and tools persist compiled executables across processes.
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # CPU escape hatch: deployments whose sitecustomize boots a TPU
    # plugin set jax_platforms programmatically, which outranks the
    # JAX_PLATFORMS env var — so `JAX_PLATFORMS=cpu python tools/...`
    # would still try (and, on a dead tunnel, hang) to init the TPU.
    # Re-assert ONLY an explicit cpu request: the ambient env in such
    # deployments names the TPU platform, and blindly re-applying it
    # would clobber callers that force cpu via jax.config directly.
    if os.environ.get("JAX_PLATFORMS") == "cpu":
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized by the caller

    cache_dir = path or os.environ.get(
        "FLATNAV_TPU_CACHE", os.path.expanduser("~/.cache/flatnav_tpu_xla")
    )
    os.makedirs(cache_dir, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass  # older jax without the knob — caching is best-effort
