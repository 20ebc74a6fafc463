"""Model-sharded exact/fast scan vs the single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.ops import MetricType, brute_force_knn
from flatnav_tpu.parallel import make_mesh, sharded_exact_search
from flatnav_tpu.parallel.sharding import data_sharded


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, model=4)


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_sharded_exact_matches_single(mesh, metric):
    rng = np.random.default_rng(0x5E)
    n, d, b, k = 4096, 32, 64, 10
    vectors = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    queries = jax.device_put(
        jnp.asarray(rng.standard_normal((b, d), dtype=np.float32)),
        data_sharded(mesh),
    )
    want_d, want_i = brute_force_knn(
        vectors, queries, k, metric, tile_size=1024
    )
    got_d, got_i = sharded_exact_search(
        vectors, jnp.asarray(n, jnp.int32), queries, mesh,
        k=k, metric=metric, tile_size=1024,
    )
    np.testing.assert_array_equal(np.asarray(got_i), np.asarray(want_i))
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-6, atol=1e-5
    )


def test_sharded_exact_partial_prefix(mesh):
    """num_nodes < capacity: uncommitted rows (including whole shards past
    the prefix) are excluded."""
    rng = np.random.default_rng(0x5F)
    n_total, n_valid, d, b, k = 4096, 1500, 16, 32, 5
    data = rng.standard_normal((n_total, d)).astype(np.float32)
    data[n_valid:] *= 1e-3  # would dominate near-zero queries if leaked
    queries = jax.device_put(
        jnp.zeros((b, d), jnp.float32), data_sharded(mesh)
    )
    got_d, got_i = sharded_exact_search(
        jnp.asarray(data), jnp.asarray(n_valid, jnp.int32), queries, mesh,
        k=k, tile_size=512,
    )
    assert (np.asarray(got_i) < n_valid).all()


def test_sharded_fast_rerank(mesh):
    rng = np.random.default_rng(0x60)
    n, d, b, k = 8192, 32, 64, 10
    vectors = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    queries = jax.device_put(
        jnp.asarray(rng.standard_normal((b, d), dtype=np.float32)),
        data_sharded(mesh),
    )
    _, want_i = brute_force_knn(vectors, queries, k, tile_size=2048)
    _, got_i = sharded_exact_search(
        vectors, jnp.asarray(n, jnp.int32), queries, mesh,
        k=k, rerank=32, tile_size=2048,
    )
    recall = np.mean([
        len(set(a.tolist()) & set(b_.tolist())) / k
        for a, b_ in zip(np.asarray(got_i), np.asarray(want_i))
    ])
    assert recall >= 0.99, recall


def test_sharded_fused_rerank(mesh):
    # fused Pallas shortlist per shard (interpret mode on the CPU mesh)
    rng = np.random.default_rng(0x61)
    n, d, b, k = 8192, 32, 64, 10
    vectors = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    queries = jax.device_put(
        jnp.asarray(rng.standard_normal((b, d), dtype=np.float32)),
        data_sharded(mesh),
    )
    _, want_i = brute_force_knn(vectors, queries, k, tile_size=2048)
    _, got_i = sharded_exact_search(
        vectors, jnp.asarray(n, jnp.int32), queries, mesh,
        k=k, rerank=32, fused=True,
    )
    recall = np.mean([
        len(set(a.tolist()) & set(b_.tolist())) / k
        for a, b_ in zip(np.asarray(got_i), np.asarray(want_i))
    ])
    assert recall >= 0.97, recall
