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

All distances are returned in float32. uint8/int8 inputs ACCUMULATE IN
INT32 (the MXU's native integer-matmul accumulator), matching the
reference's int32 accumulation (SquaredL2SimdExtensions.h:32-76) exactly:
worst-case uint8 L2 at d=960 sums to ~6.2e7 > 2^24, past float32's
exact-integer range, so float accumulation would be inexact there
(tested at the boundary in tests/test_distances.py).
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


def _is_int(x: jax.Array) -> bool:
    return jnp.issubdtype(x.dtype, jnp.integer)


def squared_norms(x: jax.Array) -> jax.Array:
    """Row-wise squared L2 norms, float32. x: [..., d] -> [...].

    Integer inputs accumulate in int32 (exact for uint8/int8 up to
    d = 2^31 / 255^2 ≈ 33k), then convert."""
    if _is_int(x):
        xi = x.astype(jnp.int32)
        return jnp.sum(xi * xi, axis=-1).astype(jnp.float32)
    xf = _as_f32(x)
    return jnp.sum(xf * xf, axis=-1)


def exact_int_dot(x: jax.Array, y: jax.Array) -> jax.Array:
    """Exact int32 dot products x [B, d] . y [C, d] -> [B, C].

    uint8/int8 inputs ride the native int8 MXU path (s8 x s8 -> s32, ~2x
    bf16 and ~4x f32 matmul throughput on v5e). uint8 values don't fit
    int8, so they are shifted by 128 and corrected exactly:

        x.y = (x-128).(y-128) + 128*sum(x-128) + 128*sum(y-128) + 128^2*d

    (the TPU-native analog of the reference's unpack-to-16-bit uint8
    kernel, SquaredL2SimdExtensions.h:32-76). All terms are int32-exact
    for d up to 2^31 / 128^2 = 131072. Wider int dtypes fall back to an
    int32 contraction.
    """
    d = x.shape[-1]
    nums = (((1,), (1,)), ((), ()))
    s8_able = lambda a: a.dtype in (jnp.dtype(jnp.uint8), jnp.dtype(jnp.int8))
    if s8_able(x) and s8_able(y) and d <= 131072:

        def to_s8(a):
            """-> (int8 values, int32 row sums of those values,
            1 if shifted by 128 else 0)."""
            if a.dtype == jnp.int8:
                return a, jnp.sum(a.astype(jnp.int32), axis=-1), 0
            s = (a.astype(jnp.int32) - 128).astype(jnp.int8)
            return s, jnp.sum(s.astype(jnp.int32), axis=-1), 1

        xs, sx, fx = to_s8(x)
        ys, sy, fy = to_s8(y)
        # x.y = x'.y' + 128*fx*sum(y') + 128*fy*sum(x') + 128^2*fx*fy*d
        dots = jax.lax.dot_general(
            xs, ys, dimension_numbers=nums,
            preferred_element_type=jnp.int32,
        )
        if fy:
            dots = dots + 128 * sx[:, None]
        if fx:
            dots = dots + 128 * sy[None, :]
        if fx and fy:
            dots = dots + (128 * 128) * d
        return dots
    return jax.lax.dot_general(
        x.astype(jnp.int32),
        y.astype(jnp.int32),
        dimension_numbers=nums,
        preferred_element_type=jnp.int32,
    )


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
    if _is_int(x) and _is_int(y):
        # exact integer distances (reference precedent
        # SquaredL2SimdExtensions.h:32-76): int8 MXU where dtypes allow,
        # int32 accumulation always; float accumulation is inexact past
        # 2^24 (uint8 L2 at d=960 reaches ~6.2e7).
        dots_i = exact_int_dot(x, y)
        if metric == MetricType.IP:
            return 1.0 - dots_i.astype(jnp.float32)
        xi = x.astype(jnp.int32)
        yi = y.astype(jnp.int32)
        xs_i = jnp.sum(xi * xi, axis=-1)
        ys_i = jnp.sum(yi * yi, axis=-1)
        d2_i = xs_i[:, None] - 2 * dots_i + ys_i[None, :]
        return jnp.maximum(d2_i, 0).astype(jnp.float32)

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


def _tree_sum_last(x: jax.Array) -> jax.Array:
    """Sum over the last axis with a FIXED binary-tree association.

    jnp.sum lowers to a reduce whose accumulation order is
    implementation-chosen per program — two differently-fused programs may
    reassociate differently, breaking bit-identity between the single-chip
    and tensor-parallel search paths. Explicit pairwise adds pin the order
    (XLA never reassociates distinct f32 adds), making hop distances
    bit-reproducible across program variants.
    """
    d = x.shape[-1]
    p = 1 << max(0, (d - 1)).bit_length()
    if p != d:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, p - d)]
        x = jnp.pad(x, pad)
    while p > 1:
        p //= 2
        x = x[..., :p] + x[..., p : 2 * p]
    return x[..., 0]


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
    if _is_int(queries) and _is_int(blocks):
        # exact int32 accumulation (see pairwise_distances)
        qi = queries.astype(jnp.int32)[:, None, :]
        bi = blocks.astype(jnp.int32)
        if metric == MetricType.IP:
            return 1.0 - jnp.sum(qi * bi, axis=-1).astype(jnp.float32)
        diff = qi - bi
        return jnp.sum(diff * diff, axis=-1).astype(jnp.float32)
    qf = _as_f32(queries)[:, None, :]
    bf = _as_f32(blocks)
    if metric == MetricType.IP:
        return 1.0 - _tree_sum_last(qf * bf)
    diff = qf - bf
    return _tree_sum_last(diff * diff)


@functools.partial(
    jax.jit, static_argnames=("k", "metric", "tile_size")
)
def brute_force_knn(
    dataset: jax.Array,
    queries: jax.Array,
    k: int,
    metric: MetricType = MetricType.L2,
    tile_size: int = 65536,
    n_valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Exact k-nearest-neighbors by tiled scan over the dataset.

    Returns (dists [B, k] ascending, ids [B, k]). Serves both as the
    on-device ground-truth oracle for recall tests (the reference computes
    ground truth on host or downloads it; see test_utils.py / data
    pipeline) and as the engine behind Index.search_exact — on TPU the
    full-table MXU scan IS the fast path at HBM-resident scale (cf.
    TPU-KNN, arXiv:2206.14286): it is the reference's initializeSearch
    strided scan (Index.h:845-870) generalized to every row.

    The dataset is scanned in tiles of `tile_size` rows; each tile is one
    [B, d] x [d, T] MXU matmul, merged into a running top-k. Peak memory is
    O(B * (k + tile_size)) instead of O(B * N). Rows at or past `n_valid`
    (default: all rows) are excluded — callers with over-allocated
    capacity (index arrays) pass their committed prefix length.
    """
    n, d = dataset.shape
    b = queries.shape[0]
    n_limit = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    tile = max(min(tile_size, n), 128)
    if n < tile:  # tiny table only — a large table is NEVER pad-copied
        pad = jnp.zeros((tile - n, d), dataset.dtype)
        dataset = jnp.concatenate([dataset, pad], axis=0)
        n = tile
    n_tiles = -(-n // tile)
    q_sq = squared_norms(queries)

    def scan_tile(carry, tile_idx):
        best_d, best_i = carry
        # Last tile: clamp the start so the slice stays in bounds (no
        # full-table pad copy — at 100M that pad materialized an 11.9 GB
        # HLO temp and OOM'd the compile); rows already scanned by the
        # previous tile are masked out via ids < start_raw.
        start_raw = tile_idx * tile
        start = jnp.minimum(start_raw, n - tile)
        rows = jax.lax.dynamic_slice_in_dim(dataset, start, tile, axis=0)
        dists = pairwise_distances(queries, rows, metric, x_sq=q_sq)
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        valid = (ids >= start_raw) & (ids < n_limit)
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


@functools.partial(
    jax.jit,
    static_argnames=("k", "metric", "tile_size", "rerank", "recall_target"),
)
def fast_knn(
    dataset: jax.Array,
    queries: jax.Array,
    k: int,
    metric: MetricType = MetricType.L2,
    tile_size: int = 131072,
    rerank: int = 32,
    recall_target: float = 0.95,
    n_valid: jax.Array | None = None,
) -> Tuple[jax.Array, jax.Array]:
    """Two-phase kNN scan: single-pass bf16 MXU distances + hardware
    `approx_min_k` shortlist per tile, then EXACT f32 rerank of the final
    `rerank` candidates per query (the TPU-KNN recipe, arXiv:2206.14286).

    Returned distances are exact f32 (same conventions as
    brute_force_knn); the only approximation is candidate selection — a
    true neighbor is missed only if bf16 rounding pushes it past the
    `rerank`-wide shortlist (measured recall vs the exact oracle is the
    acceptance criterion wherever this is used).

    uint8/int8 inputs run phase 1 on the native int8 MXU (exact_int_dot:
    s8 x s8 -> s32, ~4x f32 matmul throughput) — the selection key is then
    EXACT int32, so the only shortlist risk is the approx_min_k recall
    itself — and the rerank stays on the exact integer path.

    Tuning (measured v5e, B=4096, d=128): the rerank gather is
    issue-rate-bound (~150 ns/row), so small `rerank` wins — 32 beats 64
    by ~1.3-1.6x; larger tiles amortize per-tile approx_min_k — at 1M,
    tile 262144 + rerank 32 reaches 49k QPS (vs 13.9k fully exact).
    Callers with B > 4096 should keep tile_size <= 131072 (the [B, tile]
    key matrix is materialized per tile).
    """
    n, d = dataset.shape
    b = queries.shape[0]
    r = max(rerank, k)
    n_limit = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    tile = max(min(tile_size, n), 128)
    if n < tile:  # tiny table only — a large table is NEVER pad-copied
        dataset = jnp.concatenate(
            [dataset, jnp.zeros((tile - n, d), dataset.dtype)], axis=0
        )
        n = tile
    n_tiles = -(-n // tile)
    int_path = _is_int(queries) and _is_int(dataset)
    qf = queries if int_path else queries.astype(jnp.float32)

    def scan_tile(carry, tile_idx):
        best_key, best_i = carry
        # Clamped-start last tile; overlap masked below (no pad copy).
        start_raw = tile_idx * tile
        start = jnp.minimum(start_raw, n - tile)
        rows = jax.lax.dynamic_slice_in_dim(dataset, start, tile, axis=0)
        if int_path:
            # exact int32 ranking key on the int8 MXU (s8 x s8 -> s32)
            dots_i = exact_int_dot(qf, rows)
            if metric == MetricType.IP:
                key = (-dots_i).astype(jnp.float32)
            else:
                ri = rows.astype(jnp.int32)
                ys_i = jnp.sum(ri * ri, axis=-1)
                key = (ys_i[None, :] - 2 * dots_i).astype(jnp.float32)
        else:
            rf = rows.astype(jnp.float32)
            # one bf16 MXU pass (DEFAULT precision): ranking key only —
            # ||x||^2 is constant per query and dropped for L2
            dots = jax.lax.dot_general(
                qf, rf,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            if metric == MetricType.IP:
                key = -dots
            else:
                ys = jnp.sum(rf * rf, axis=-1)
                key = ys[None, :] - 2.0 * dots
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        key = jnp.where((ids >= start_raw) & (ids < n_limit), key, jnp.inf)
        tile_key, tile_pos = jax.lax.approx_min_k(
            key, r, recall_target=recall_target
        )
        tile_ids = jnp.take_along_axis(
            jnp.broadcast_to(ids, (b, tile)), tile_pos, axis=1
        )
        all_key = jnp.concatenate([best_key, tile_key], axis=1)
        all_i = jnp.concatenate([best_i, tile_ids], axis=1)
        neg_top, pos = jax.lax.top_k(-all_key, r)
        return (-neg_top, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (
        jnp.full((b, r), jnp.inf, jnp.float32),
        jnp.zeros((b, r), jnp.int32),
    )
    (cand_k, cand_i), _ = jax.lax.scan(
        scan_tile, init, jnp.arange(n_tiles, dtype=jnp.int32)
    )
    # exact rerank of the [B, r] shortlist (f32, or exact int32 for
    # integer data — query_block_distances dispatches on dtype).
    # Shortlist slots never filled by a valid row (n_valid < r) carry an
    # inf scan key; keep them inf through the rerank or their id-0 rows
    # re-score finitely and can outrank real neighbors (same fix as
    # pq_scan_knn, quantization/pq.py:406-409).
    cand_rows = jnp.take(dataset, cand_i, axis=0)
    exact = query_block_distances(qf, cand_rows, metric)
    exact = jnp.where(jnp.isinf(cand_k), jnp.inf, exact)
    order = jnp.argsort(exact, axis=1, stable=True)[:, :k]
    return (
        jnp.take_along_axis(exact, order, axis=1),
        jnp.take_along_axis(cand_i, order, axis=1),
    )
