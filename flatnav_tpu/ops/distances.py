"""Batched distance kernels (L2, inner-product) and exact kNN ground truth.

This module replaces the reference's entire L0/L1 stack — the SIMD register
wrappers and hand-written AVX512/AVX/SSE kernels
(/root/reference/include/flatnav/util/SimdUtils.h,
SquaredL2SimdExtensions.h, InnerProductSimdExtensions.h) and the CRTP
distance dispatchers (/root/reference/include/flatnav/distances/
L2DistanceDispatcher.h:39-104, IPDistanceDispatcher.h:10-16) — with batched
XLA ops. On TPU there is no runtime ISA dispatch: XLA tiles these
contractions onto the MXU/VPU for every supported dtype, so one formula
serves float32/uint8/int8 (the dispatcher tree collapses away).

Metric conventions match the reference exactly:
  * L2 = squared euclidean, no sqrt (SquaredL2Distance.h, defaultSquaredL2
    at L2DistanceDispatcher.h:10-17).
  * IP distance = 1 - <x, y> (IPDistanceDispatcher.h:10-16); "angular" is IP
    over externally pre-normalized vectors.

All distances are computed and returned in float32. Integer inputs are
widened before multiply; for uint8/int8 at the reference's dimensions
(d <= 960, values <= 255) the products and partial sums stay well inside
float32's exact-integer range per tile, matching the reference's int32
accumulation (SquaredL2SimdExtensions.h:32-76) in observable results.
"""

from __future__ import annotations

import enum
import functools
from typing import Tuple

import jax
import jax.numpy as jnp


class MetricType(enum.Enum):
    """Mirrors flatnav::distances::MetricType (DistanceInterface.h:14)."""

    L2 = "l2"
    IP = "ip"


def _as_f32(x: jax.Array) -> jax.Array:
    return x.astype(jnp.float32)


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, float32. x: [..., d] -> [...]."""
    xf = _as_f32(x)
    return jnp.sum(xf * xf, axis=-1)


def pairwise_distances(
    x: jax.Array,
    y: jax.Array,
    metric: MetricType,
    x_sq: jax.Array | None = None,
    y_sq: jax.Array | None = None,
) -> jax.Array:
    """All-pairs distances between x [B, d] and y [C, d] -> [B, C] float32.

    Uses the matmul form (||x||^2 - 2 x.y + ||y||^2 for L2) so the inner
    contraction lands on the MXU — this is the TPU replacement for the
    reference's per-pair AVX loops, and also the building block for exact
    ground truth (cf. TPU-KNN, arXiv:2206.14286).
    """
    xf, yf = _as_f32(x), _as_f32(y)
    # HIGHEST keeps full fp32 accuracy on TPU (3-pass bf16 matmul); this
    # path feeds the exact-kNN oracle and pruning decisions, so accuracy
    # wins over raw MXU throughput here.
    dots = jax.lax.dot_general(
        xf,
        yf,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    if metric == MetricType.IP:
        return 1.0 - dots
    xs = squared_norms(x) if x_sq is None else x_sq
    ys = squared_norms(y) if y_sq is None else y_sq
    d2 = xs[:, None] - 2.0 * dots + ys[None, :]
    return jnp.maximum(d2, 0.0)


def query_block_distances(
    queries: jax.Array, blocks: jax.Array, metric: MetricType
) -> jax.Array:
    """Distances from each query to its own block of vectors.

    queries: [B, d]; blocks: [B, M, d] (per-query gathered neighbors)
    -> [B, M] float32.

    This is the hot per-hop computation of beam search (the batched analog
    of the reference's per-neighbor `_distance->distance(...)` loop in
    processCandidateNode, Index.h:667-705). The direct (q - v)^2 form is
    used for L2: per-hop work is HBM-gather-bound, and the direct form
    avoids the cancellation of the matmul form.
    """
    qf = _as_f32(queries)[:, None, :]
    bf = _as_f32(blocks)
    if metric == MetricType.IP:
        return 1.0 - jnp.sum(qf * bf, axis=-1)
    diff = qf - bf
    return jnp.sum(diff * diff, axis=-1)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile_size")
)
def brute_force_knn(
    dataset: jax.Array,
    queries: jax.Array,
    k: int,
    metric: MetricType = MetricType.L2,
    tile_size: int = 65536,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-nearest-neighbors by tiled scan over the dataset.

    Returns (dists [B, k] ascending, ids [B, k]). Serves as the on-device
    ground-truth oracle for recall tests (the reference computes ground
    truth on host or downloads it; see test_utils.py / data pipeline).

    The dataset is scanned in tiles of `tile_size` rows; each tile is one
    [B, d] x [d, T] MXU matmul, merged into a running top-k. Peak memory is
    O(B * (k + tile_size)) instead of O(B * N).
    """
    n, d = dataset.shape
    b = queries.shape[0]
    tile = max(min(tile_size, n), 128)
    n_tiles = -(-n // tile)
    n_pad = n_tiles * tile
    if n_pad != n:
        pad = jnp.zeros((n_pad - n, d), dataset.dtype)
        dataset = jnp.concatenate([dataset, pad], axis=0)
    q_sq = squared_norms(queries)

    def scan_tile(carry, tile_idx):
        best_d, best_i = carry
        start = tile_idx * tile
        rows = jax.lax.dynamic_slice_in_dim(dataset, start, tile, axis=0)
        dists = pairwise_distances(queries, rows, metric, x_sq=q_sq)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        valid = (ids < n)
        dists = jnp.where(valid, dists, jnp.inf)
        ids = jnp.broadcast_to(ids, (b, tile))
        all_d = jnp.concatenate([best_d, dists], axis=1)
        all_i = jnp.concatenate([best_i, ids], axis=1)
        # top-k smallest via negated lax.top_k (largest-k primitive).
        neg_top, pos = jax.lax.top_k(-all_d, k)
        new_i = jnp.take_along_axis(all_i, pos, axis=1)
        return (-neg_top, new_i), None

    init = (
        jnp.full((b, k), jnp.inf, jnp.float32),
        jnp.zeros((b, k), jnp.int32),
    )
    (best_d, best_i), _ = jax.lax.scan(
        scan_tile, init, jnp.arange(n_tiles, dtype=jnp.int32)
    )
    # lax.top_k returns descending by -d => ascending by d, but ties may be
    # unordered; do a final stable sort for determinism.
    order = jnp.argsort(best_d, axis=1, stable=True)
    return (
        jnp.take_along_axis(best_d, order, axis=1),
        jnp.take_along_axis(best_i, order, axis=1),
    )
