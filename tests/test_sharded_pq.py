"""Model-sharded PQ-ADC scan vs the single-device oracle."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.ops import MetricType, brute_force_knn
from flatnav_tpu.parallel import make_mesh, sharded_pq_scan
from flatnav_tpu.parallel.sharding import data_sharded
from flatnav_tpu.quantization import ProductQuantizer
from flatnav_tpu.quantization.pq import pq_scan_knn


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(data=2, model=4)


@pytest.fixture(scope="module")
def pq_setup():
    rng = np.random.default_rng(0x61)
    n, d, b = 4096, 32, 64
    # clustered data so PQ codes are meaningful
    centers = rng.standard_normal((16, d)).astype(np.float32) * 3
    data = (
        centers[rng.integers(0, 16, n)]
        + rng.standard_normal((n, d)).astype(np.float32)
    )
    queries = rng.standard_normal((b, d)).astype(np.float32) + centers[
        rng.integers(0, 16, b)
    ]
    pq = ProductQuantizer(dim=d, num_subquantizers=8).train(
        data[:2000], n_iters=15
    )
    codes = jnp.asarray(pq.encode(data))
    return pq, codes, jnp.asarray(data), jnp.asarray(queries)


def test_sharded_pq_adc_matches_single(mesh, pq_setup):
    pq, codes, data, queries = pq_setup
    n, k = codes.shape[0], 10
    tables = pq.adc_tables(queries)
    want_d, want_i = pq_scan_knn(
        codes, tables, k, metric=MetricType.L2, tile_size=512, rerank=32
    )
    q_sh = jax.device_put(tables, data_sharded(mesh))
    got_d, got_i = sharded_pq_scan(
        codes, q_sh, jnp.asarray(n, jnp.int32), mesh,
        k=k, metric=MetricType.L2, tile_size=512, rerank=32,
    )
    # ADC distances identical; ids identical up to exact-tie order
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-5, atol=1e-4
    )
    same = np.mean([
        len(set(a.tolist()) & set(b_.tolist())) / k
        for a, b_ in zip(np.asarray(got_i), np.asarray(want_i))
    ])
    assert same >= 0.95, same


def test_sharded_pq_raw_rerank(mesh, pq_setup):
    pq, codes, data, queries = pq_setup
    n, k = codes.shape[0], 10
    tables = pq.adc_tables(queries)
    _, want_i = brute_force_knn(data, queries, k, MetricType.L2)
    t_sh = jax.device_put(tables, data_sharded(mesh))
    q_sh = jax.device_put(queries, data_sharded(mesh))
    got_d, got_i = sharded_pq_scan(
        codes, t_sh, jnp.asarray(n, jnp.int32), mesh,
        k=k, metric=MetricType.L2, tile_size=512, rerank=128,
        vectors=data, queries=q_sh,
    )
    recall = np.mean([
        len(set(a.tolist()) & set(b_.tolist())) / k
        for a, b_ in zip(np.asarray(got_i), np.asarray(want_i))
    ])
    assert recall >= 0.9, recall
    # raw-rerank distances are exact and ascending
    gd = np.asarray(got_d)
    assert (np.diff(gd, axis=1) >= -1e-5).all()


def test_sharded_pq_partial_prefix(mesh, pq_setup):
    pq, codes, data, queries = pq_setup
    k, n_valid = 5, 1500
    tables = pq.adc_tables(queries)
    t_sh = jax.device_put(tables, data_sharded(mesh))
    _, got_i = sharded_pq_scan(
        codes, t_sh, jnp.asarray(n_valid, jnp.int32), mesh,
        k=k, metric=MetricType.L2, tile_size=512, rerank=16,
    )
    assert (np.asarray(got_i) < n_valid).all()


def test_sharded_pq4_packed_matches_unpacked(mesh, pq_setup):
    # 4-bit nibble-packed codes shard like 8-bit ones: under the SAME
    # sharding (same per-shard shortlist semantics) the packed scan must
    # be bit-identical to the unpacked one. (A single-device oracle is
    # NOT the right comparison: each shard reranks its own local top-r,
    # so the sharded engine reranks n_model*r candidates and can
    # legitimately return better exact results than one global top-r.)
    _, _, data, queries = pq_setup
    from flatnav_tpu.quantization.pq import pack_codes_4bit

    pq4 = ProductQuantizer(dim=32, num_subquantizers=8, nbits=4).train(
        np.asarray(data)[:2000], n_iters=10
    )
    codes4 = pq4.encode(data)
    packed = pack_codes_4bit(codes4)
    tables = pq4.adc_tables(queries)
    t_sh = jax.device_put(tables, data_sharded(mesh))
    n = jnp.asarray(data.shape[0], jnp.int32)
    d1, i1 = sharded_pq_scan(
        codes4, t_sh, n, mesh, k=10,
        metric=MetricType.L2, rerank=32, tile_size=512,
        vectors=data, queries=queries,
    )
    d2, i2 = sharded_pq_scan(
        packed, t_sh, n, mesh, k=10,
        metric=MetricType.L2, rerank=32, tile_size=512,
        vectors=data, queries=queries, packed_4bit=True,
    )
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(
        np.asarray(d1), np.asarray(d2), rtol=1e-5, atol=1e-5
    )
