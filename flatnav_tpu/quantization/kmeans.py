"""On-device k-means (Lloyd's algorithm) for PQ codebook training.

Re-design of the reference's CentroidsGenerator
(/root/reference/developmental-features/quantization/CentroidsGenerator.h):
the OpenMP assignment/update loops (97-152) become one MXU distance block +
one one-hot matmul per iteration, jit-compiled with a `lax.fori_loop` over
the default 62 iterations (CentroidsGenerator.h:40-49).

Initializers mirror the reference: random sample (167-182), kmeans++
(199-252), hypercube (280-309). Initialization is host-side (offline, runs
once); iterations run on device.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flatnav_tpu.ops.distances import MetricType, pairwise_distances


def _init_random(data: np.ndarray, k: int, rng: np.random.Generator):
    idx = rng.choice(data.shape[0], size=k, replace=data.shape[0] < k)
    return data[idx].astype(np.float32)


def _init_kmeanspp(data: np.ndarray, k: int, rng: np.random.Generator):
    """kmeans++ seeding (CentroidsGenerator.h:199-252)."""
    n = data.shape[0]
    centroids = np.empty((k, data.shape[1]), np.float32)
    centroids[0] = data[rng.integers(n)]
    d2 = ((data - centroids[0]) ** 2).sum(1)
    for i in range(1, k):
        total = d2.sum()
        if total > 1e-12:
            centroids[i] = data[rng.choice(n, p=d2 / total)]
        else:
            # degenerate: every remaining point coincides with a chosen
            # centroid (fewer than k distinct rows) — fall back to uniform
            # sampling instead of crashing on an all-zero distribution
            centroids[i] = data[rng.integers(n)]
        d2 = np.minimum(d2, ((data - centroids[i]) ** 2).sum(1))
    return centroids


def _init_hypercube(data: np.ndarray, k: int, rng: np.random.Generator):
    """Hypercube init (CentroidsGenerator.h:280-309): mean +- spread on the
    first log2(k) axes."""
    d = data.shape[1]
    nbits = max(int(np.log2(k)), 1)
    mean = data.mean(0)
    spread = data.std(0).mean() / 2.0
    centroids = np.tile(mean, (k, 1)).astype(np.float32)
    for i in range(k):
        for b in range(min(nbits, d)):
            centroids[i, b] += spread if (i >> b) & 1 else -spread
    return centroids


_INITS = {
    "default": _init_random,
    "random": _init_random,
    "kmeans++": _init_kmeanspp,
    "hypercube": _init_hypercube,
}


@functools.partial(jax.jit, static_argnames=("n_iters",))
def _lloyd(data: jax.Array, centroids: jax.Array, n_iters: int):
    n = data.shape[0]

    def step(_, cents):
        d = pairwise_distances(data, cents, MetricType.L2)  # [n, k]
        assign = jnp.argmin(d, axis=1)
        one_hot = jax.nn.one_hot(assign, cents.shape[0], dtype=jnp.float32)
        sums = jnp.einsum(
            "nk,nd->kd", one_hot, data, preferred_element_type=jnp.float32
        )
        counts = one_hot.sum(0)
        new = sums / jnp.maximum(counts[:, None], 1.0)
        # empty clusters keep their previous centroid
        return jnp.where(counts[:, None] > 0, new, cents)

    cents = jax.lax.fori_loop(0, n_iters, step, centroids)
    d = pairwise_distances(data, cents, MetricType.L2)
    assign = jnp.argmin(d, axis=1)
    return cents, assign


def kmeans(
    data: np.ndarray,
    k: int,
    n_iters: int = 62,
    init: str = "default",
    seed: int = 0,
) -> Tuple[jax.Array, jax.Array]:
    """Train k centroids; returns (centroids [k, d] f32, assignment [n])."""
    if init not in _INITS:
        raise ValueError(f"unknown init {init!r}; options: {sorted(_INITS)}")
    rng = np.random.default_rng(seed)
    data = np.asarray(data, dtype=np.float32)
    cents0 = _INITS[init](data, k, rng)
    return _lloyd(jnp.asarray(data), jnp.asarray(cents0), n_iters)
