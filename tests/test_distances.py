"""Distance kernels vs a numpy oracle.

Mirrors the reference's tier-1 tests
(/root/reference/include/flatnav/tests/test_distances.cpp): every kernel is
checked against a scalar/numpy reference on random data, including
non-aligned dims (100, 37, 7) and integer dtypes. Our tolerance is much
tighter than the reference's 1e-2 (test_distances.cpp:28-31) because fp32
matmul on CPU/TPU is well-behaved.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.ops import (
    MetricType,
    brute_force_knn,
    fast_knn,
    pairwise_distances,
    query_block_distances,
)

DIMS = [128, 100, 37, 7, 960]


def np_l2(x, y):
    x = x.astype(np.float64)
    y = y.astype(np.float64)
    return ((x[:, None, :] - y[None, :, :]) ** 2).sum(-1)


def np_ip(x, y):
    return 1.0 - x.astype(np.float64) @ y.astype(np.float64).T


@pytest.mark.parametrize("dim", DIMS)
@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_pairwise_matches_numpy_f32(rng, dim, metric):
    x = rng.standard_normal((13, dim), dtype=np.float32)
    y = rng.standard_normal((29, dim), dtype=np.float32)
    got = np.asarray(pairwise_distances(jnp.asarray(x), jnp.asarray(y), metric))
    want = np_l2(x, y) if metric == MetricType.L2 else np_ip(x, y)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3 * dim)


@pytest.mark.parametrize("dtype", [np.uint8, np.int8])
def test_pairwise_integer_dtypes_exact(rng, dtype):
    # Integer inputs must produce exact float32 results (values are small
    # enough); mirrors the reference's uint8/int8 kernels
    # (SquaredL2SimdExtensions.cpp:32-76, IPDistanceDispatcher.h:79-93).
    info = np.iinfo(dtype)
    x = rng.integers(info.min, info.max + 1, (9, 128)).astype(dtype)
    y = rng.integers(info.min, info.max + 1, (17, 128)).astype(dtype)
    got = np.asarray(
        pairwise_distances(jnp.asarray(x), jnp.asarray(y), MetricType.L2)
    )
    want = np_l2(x, y)
    np.testing.assert_array_equal(got, want.astype(np.float32))


@pytest.mark.parametrize("dtype", [np.uint8, np.int8])
def test_integer_exactness_at_d960_boundary(rng, dtype):
    """uint8 L2 at d=960 sums past 2^24 (worst case ~6.2e7) — beyond
    float32's exact-integer range. The int32-accumulation path must stay
    EXACT there (reference int32 accumulation,
    SquaredL2SimdExtensions.h:32-76). Uses extreme values so float
    accumulation would provably differ."""
    info = np.iinfo(dtype)
    d = 960
    x = rng.integers(info.min, info.max + 1, (7, d)).astype(dtype)
    y = rng.integers(info.min, info.max + 1, (11, d)).astype(dtype)
    # include the true worst case rows
    x[0] = info.max
    y[0] = info.min
    want = np_l2(x, y)  # float64 == exact int here
    got = np.asarray(
        pairwise_distances(jnp.asarray(x), jnp.asarray(y), MetricType.L2)
    )
    np.testing.assert_array_equal(got, want.astype(np.float32))
    # per-hop direct form too
    blocks = np.broadcast_to(y[None, :7], (7, 7, d)).astype(dtype)
    got_b = np.asarray(
        query_block_distances(
            jnp.asarray(x), jnp.asarray(np.ascontiguousarray(blocks)),
            MetricType.L2,
        )
    )
    np.testing.assert_array_equal(got_b, want[:, :7].astype(np.float32))
    # IP: the dot accumulates exactly in int32; the final 1-x runs in f32
    # (one rounding of the dot, mirrored in the oracle)
    got_ip = np.asarray(
        pairwise_distances(jnp.asarray(x), jnp.asarray(y), MetricType.IP)
    )
    dot_f32 = (x.astype(np.int64) @ y.astype(np.int64).T).astype(np.float32)
    np.testing.assert_array_equal(got_ip, np.float32(1.0) - dot_f32)


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_query_block_distances(rng, metric):
    b, m, d = 11, 32, 64
    q = rng.standard_normal((b, d), dtype=np.float32)
    blocks = rng.standard_normal((b, m, d), dtype=np.float32)
    got = np.asarray(
        query_block_distances(jnp.asarray(q), jnp.asarray(blocks), metric)
    )
    if metric == MetricType.L2:
        want = ((q[:, None, :] - blocks) ** 2).sum(-1)
    else:
        want = 1.0 - (q[:, None, :] * blocks).sum(-1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-3)


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_brute_force_knn_exact(rng, metric):
    n, d, b, k = 5000, 48, 37, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((b, d), dtype=np.float32)
    dists, ids = brute_force_knn(
        jnp.asarray(data), jnp.asarray(q), k, metric, tile_size=512
    )
    full = np_l2(q, data) if metric == MetricType.L2 else np_ip(q, data)
    want_ids = np.argsort(full, axis=1, kind="stable")[:, :k]
    # Compare by distance values (ties may legitimately permute ids).
    want_d = np.take_along_axis(full, want_ids, axis=1)
    np.testing.assert_allclose(
        np.asarray(dists), want_d, rtol=1e-4, atol=1e-3
    )
    assert np.mean(np.asarray(ids) == want_ids) > 0.99


def test_brute_force_knn_non_multiple_tile(rng):
    # n deliberately not a multiple of tile_size: padding must not leak.
    n, d = 1000, 16
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = data[:5] + 1e-4
    dists, ids = brute_force_knn(
        jnp.asarray(data), jnp.asarray(q), 3, MetricType.L2, tile_size=384
    )
    assert (np.asarray(ids)[:, 0] == np.arange(5)).all()
    assert np.all(np.asarray(dists)[:, 0] < 1e-4)
    assert np.all(np.asarray(ids) < n)


def test_fast_knn_matches_exact(rng):
    """Two-phase scan (bf16 + approx_min_k shortlist + exact rerank):
    returned distances are exact for the ids returned, and candidate
    recall vs the exact oracle is high."""
    import jax.numpy as jnp

    from flatnav_tpu.ops.distances import (
        MetricType, brute_force_knn, fast_knn, query_block_distances,
    )

    n, d, b, k = 20000, 64, 128, 10
    data = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    gd, gi = brute_force_knn(data, q, k, MetricType.L2, tile_size=8192)
    fd, fi = fast_knn(data, q, k, MetricType.L2, tile_size=8192, rerank=32)
    recall = np.mean([
        len(set(a.tolist()) & set(b_.tolist())) / k
        for a, b_ in zip(np.asarray(fi), np.asarray(gi))
    ])
    assert recall >= 0.99, recall
    # distances for returned ids are the exact f32 values
    want = query_block_distances(
        q, jnp.take(data, fi, axis=0), MetricType.L2
    )
    np.testing.assert_allclose(
        np.asarray(fd), np.asarray(want), rtol=1e-6, atol=1e-5
    )
    assert np.all(np.diff(np.asarray(fd), axis=1) >= 0)


def test_fast_knn_n_valid(rng):
    import jax.numpy as jnp

    from flatnav_tpu.ops.distances import MetricType, fast_knn

    n, d = 5000, 32
    data = rng.standard_normal((n, d), dtype=np.float32)
    # rows past 3000 are near-zero: would dominate if not masked
    data[3000:] *= 1e-3
    q = jnp.asarray(np.zeros((8, d), dtype=np.float32))
    _, ids = fast_knn(
        jnp.asarray(data), q, 5, MetricType.L2,
        n_valid=jnp.asarray(3000),
    )
    assert (np.asarray(ids) < 3000).all()


@pytest.mark.parametrize(
    "dt_x,dt_y",
    [(np.uint8, np.uint8), (np.int8, np.int8),
     (np.uint8, np.int8), (np.int8, np.uint8)],
)
def test_exact_int_dot_exact(rng, dt_x, dt_y):
    # the int8-MXU shifted path (uint8 -> int8 by -128 with exact int32
    # corrections) must reproduce the plain integer dot bit-for-bit,
    # including mixed-dtype pairs; reference precedent for the unpack
    # trick: SquaredL2SimdExtensions.h:32-76
    from flatnav_tpu.ops.distances import exact_int_dot

    for d in (7, 128, 960):
        x = rng.integers(
            np.iinfo(dt_x).min, np.iinfo(dt_x).max + 1, (11, d)
        ).astype(dt_x)
        y = rng.integers(
            np.iinfo(dt_y).min, np.iinfo(dt_y).max + 1, (23, d)
        ).astype(dt_y)
        got = np.asarray(exact_int_dot(jnp.asarray(x), jnp.asarray(y)))
        want = x.astype(np.int64) @ y.astype(np.int64).T
        assert got.dtype == np.int32
        np.testing.assert_array_equal(got, want.astype(np.int32))


@pytest.mark.parametrize("dtype", [np.uint8, np.int8])
def test_fast_knn_integer_path(rng, dtype):
    # integer fast_knn: int8-MXU phase-1 key is EXACT, so with rerank >= k
    # the result must match brute_force_knn wherever approx_min_k kept the
    # true neighbors; assert high recall and exact distances for the ids
    from flatnav_tpu.ops.distances import fast_knn

    info = np.iinfo(dtype)
    n, d, k = 6000, 64, 10
    data = rng.integers(info.min, info.max + 1, (n, d)).astype(dtype)
    q = rng.integers(info.min, info.max + 1, (16, d)).astype(dtype)
    gd, gi = brute_force_knn(
        jnp.asarray(data), jnp.asarray(q), k, MetricType.L2
    )
    fd, fi = fast_knn(
        jnp.asarray(data), jnp.asarray(q), k, MetricType.L2,
        tile_size=2048, rerank=32,
    )
    recall = np.mean([
        len(set(a.tolist()) & set(b_.tolist())) / k
        for a, b_ in zip(np.asarray(fi), np.asarray(gi))
    ])
    assert recall >= 0.95, recall
    # returned distances are the exact int32-accumulated values
    want = query_block_distances(
        jnp.asarray(q), jnp.take(jnp.asarray(data), fi, axis=0),
        MetricType.L2,
    )
    np.testing.assert_array_equal(np.asarray(fd), np.asarray(want))


def test_fast_knn_shortlist_wider_than_table(rng):
    """Unfilled shortlist slots (n < rerank) carry an inf scan key and
    must stay inf through the exact rerank — pre-fix their id-0 rows
    re-scored finitely and could outrank real neighbors."""
    n, d, k = 20, 16, 10
    data = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((8, d), dtype=np.float32))
    fd, fi = fast_knn(data, q, k, rerank=32)
    gd, gi = brute_force_knn(data, q, k)
    fd, fi = np.asarray(fd), np.asarray(fi)
    np.testing.assert_array_equal(fi, np.asarray(gi))
    np.testing.assert_allclose(fd, np.asarray(gd), rtol=1e-5, atol=1e-5)
    for row in fi:  # and no junk duplicates
        assert len(set(row.tolist())) == k
