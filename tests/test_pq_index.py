"""PQ-coded index: end-to-end construction + ADC search + save/load.

The reference's Index<ProductQuantizer> path (flatnav_pq tool + PQ as a
DistanceInterface): graph built and searched entirely over codes.
"""

import numpy as np
import pytest

from flatnav_tpu.ops import MetricType
from flatnav_tpu.quantization import PQIndex, ProductQuantizer


def _recall(found, truth):
    return sum(
        len(set(f.tolist()) & set(t.tolist())) for f, t in zip(found, truth)
    ) / truth.size


@pytest.fixture(scope="module")
def clustered_data():
    # PQ is lossy on pure-random data; clustered data is the realistic
    # regime (real embeddings cluster) and what PQ is built for.
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((64, 32)).astype(np.float32) * 4
    assign = rng.integers(0, 64, 6000)
    data = centers[assign] + 0.3 * rng.standard_normal((6000, 32)).astype(np.float32)
    queries = data[rng.choice(6000, 64, replace=False)] + 0.05 * rng.standard_normal(
        (64, 32)
    ).astype(np.float32)
    return data.astype(np.float32), queries.astype(np.float32)


def test_pq_index_end_to_end(clustered_data):
    data, queries = clustered_data
    import jax.numpy as jnp

    from flatnav_tpu.ops import brute_force_knn

    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:2000], n_iters=25
    )
    index = PQIndex(pq, dataset_size=len(data), max_edges_per_node=16)
    index.add(data, ef_construction=64)
    assert index.num_nodes == len(data)
    _, gt = brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), 10, MetricType.L2
    )
    d, labels = index.search(queries, K=10, ef_search=96)
    r = _recall(labels, np.asarray(gt))
    # The right yardstick is the QUANTIZATION ceiling: recall of exact
    # brute-force ADC ranking. The graph search must lose almost nothing
    # on top of what PQ itself loses.
    codes = pq.encode(data)
    adc = np.asarray(pq.asymmetric_distances(queries, codes))
    ceiling_top = np.argsort(adc, axis=1)[:, :10]
    ceiling = _recall(ceiling_top, np.asarray(gt))
    assert r >= 0.9 * ceiling, (
        f"PQ graph recall {r} far below ADC ceiling {ceiling}"
    )
    assert ceiling > 0.3  # PQ itself must be sane on clustered data
    # memory accounting reflects code storage, not raw vectors
    raw_bytes = 32 * 4 * len(data)
    assert index.index_memory_bytes() < raw_bytes


def test_pq_index_save_load_identical(clustered_data, tmp_path):
    data, queries = clustered_data
    pq = ProductQuantizer(dim=32, num_subquantizers=4).train(
        data[:1000], n_iters=10
    )
    index = PQIndex(pq, dataset_size=2000, max_edges_per_node=8)
    index.add(data[:2000], ef_construction=32)
    d0, l0 = index.search(queries, K=5, ef_search=32)
    # .bin (not .npz): save must honor the literal filename
    # (Index.h:481-490 accepts arbitrary names)
    path = str(tmp_path / "pq_index.bin")
    index.save(path)
    assert (tmp_path / "pq_index.bin").exists()
    assert not (tmp_path / "pq_index.bin.npz").exists()
    reloaded = PQIndex.load(path)
    d1, l1 = reloaded.search(queries, K=5, ef_search=32)
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(d0, d1)


def test_pq_index_requires_trained_quantizer():
    with pytest.raises(RuntimeError, match="trained"):
        PQIndex(ProductQuantizer(dim=16, num_subquantizers=4), 100, 8)


def test_pq_back_edges_never_decode_full_table():
    """100M-scale requirement: back-edge repair must decode only touched
    rows (O(T*(M+R)*d) scratch), never the whole code table. Verified at
    the jaxpr level: with a 500k-row capacity, no float32 intermediate of
    table scale may appear in the traced commit."""
    import jax
    import jax.numpy as jnp

    from flatnav_tpu.quantization.pq_index import back_edge_commit_pq

    rows, m_pq, nc, dsub, m, t, r = 500_000, 4, 256, 8, 8, 256, 8
    d = m_pq * dsub

    def run(codes, centroids, links, targets, requesters):
        return back_edge_commit_pq(
            codes, centroids, links, targets, requesters,
            metric=MetricType.L2,
        )

    jaxpr = jax.make_jaxpr(run)(
        jax.ShapeDtypeStruct((rows, m_pq), jnp.uint8),
        jax.ShapeDtypeStruct((m_pq, nc, dsub), jnp.float32),
        jax.ShapeDtypeStruct((rows, m), jnp.int32),
        jax.ShapeDtypeStruct((t,), jnp.int32),
        jax.ShapeDtypeStruct((t, r), jnp.int32),
    )
    budget = t * (m + r) * d * 4  # touched-rows scratch
    table_scale = rows * d  # full-table decode would be this many f32s

    def max_f32_elems(jpr):
        worst = 0
        for eqn in jpr.eqns:
            for v in eqn.outvars:
                aval = getattr(v, "aval", None)
                if aval is not None and aval.dtype == jnp.float32:
                    worst = max(worst, int(np.prod(aval.shape) or 1))
        return worst

    def walk(jpr):
        worst = max_f32_elems(jpr)
        for eqn in jpr.eqns:
            for val in eqn.params.values():
                inner = getattr(val, "jaxpr", None)
                if inner is not None:
                    worst = max(worst, walk(inner))
        return worst

    worst = walk(jaxpr.jaxpr)
    assert worst < table_scale, (
        f"found a float32 intermediate of {worst} elements "
        f"(table-scale decode = {table_scale})"
    )
    assert worst <= 4 * budget  # touched-rows scratch, small constant slack


def test_pq_scan_knn_matches_bruteforce_adc(clustered_data):
    # the one-hot MXU contraction must reproduce the gather-form ADC
    # scores exactly at f32 rerank (phase-1 bf16 only selects; the
    # shortlist is re-scored in f32), so with rerank == n the result must
    # equal a full argsort of asymmetric_distances
    import jax.numpy as jnp

    from flatnav_tpu.quantization.pq import pq_scan_knn

    data, queries = clustered_data
    data, queries = data[:1500], queries[:16]
    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:1000], n_iters=15
    )
    codes = pq.encode(data)
    tables = pq.adc_tables(queries)
    d, ids = pq_scan_knn(
        jnp.asarray(codes), tables, 10, metric=MetricType.L2,
        tile_size=512, rerank=64,
    )
    brute = np.asarray(pq.asymmetric_distances(queries, codes))
    want_ids = np.argsort(brute, axis=1, kind="stable")[:, :10]
    want_d = np.take_along_axis(brute, want_ids, axis=1)
    np.testing.assert_allclose(
        np.asarray(d), want_d, rtol=1e-5, atol=1e-4
    )
    # id sets match up to fp ties: compare via distance values
    got_d_of_ids = np.take_along_axis(brute, np.asarray(ids), axis=1)
    np.testing.assert_allclose(got_d_of_ids, want_d, rtol=1e-5, atol=1e-4)


def test_pq_scan_knn_raw_rerank(clustered_data):
    # raw-vector rerank mode: recall is shortlist-bounded, not
    # PQ-bounded — with a generous shortlist it must beat the ADC
    # ceiling and approach brute force on the raw vectors
    import jax.numpy as jnp

    from flatnav_tpu.ops import brute_force_knn
    from flatnav_tpu.quantization.pq import pq_scan_knn

    data, queries = clustered_data
    data, queries = data[:1500], queries[:16]
    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:1000], n_iters=15
    )
    codes = jnp.asarray(pq.encode(data))
    tables = pq.adc_tables(queries)
    _, gt = brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), 10, MetricType.L2
    )
    _, adc_ids = pq_scan_knn(
        codes, tables, 10, metric=MetricType.L2, tile_size=512, rerank=128
    )
    d_raw, raw_ids = pq_scan_knn(
        codes, tables, 10, metric=MetricType.L2, tile_size=512,
        rerank=128, vectors=jnp.asarray(data),
        queries=jnp.asarray(queries),
    )
    r_adc = _recall(np.asarray(adc_ids), np.asarray(gt))
    r_raw = _recall(np.asarray(raw_ids), np.asarray(gt))
    assert r_raw >= r_adc
    assert r_raw >= 0.9
    # returned distances are exact raw distances, ascending
    assert (np.diff(np.asarray(d_raw), axis=1) >= -1e-5).all()


def test_pq_index_search_scan(clustered_data):
    import jax.numpy as jnp

    from flatnav_tpu.ops import brute_force_knn

    data, queries = clustered_data
    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:2000], n_iters=25
    )
    index = PQIndex(pq, dataset_size=len(data), max_edges_per_node=16)
    index.add(data, ef_construction=64)
    _, gt = brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), 10, MetricType.L2
    )
    d, labels = index.search_scan(queries, K=10, rerank=64)
    r = _recall(labels, np.asarray(gt))
    # the scan ranks EVERY node by exact-f32 ADC, so its recall IS the
    # quantization ceiling (same yardstick as the e2e graph test above):
    # recall of the global brute-force ADC ranking, up to fp ties
    codes = pq.encode(data)
    adc = np.asarray(pq.asymmetric_distances(queries, codes))
    ceiling_top = np.argsort(adc, axis=1)[:, :10]
    ceiling = _recall(ceiling_top, np.asarray(gt))
    assert r >= 0.95 * ceiling, (r, ceiling)
    assert np.all(np.diff(d, axis=1) >= 0)


def test_pq_scan_knn_partial_prefix(clustered_data):
    # rows past n_valid carry inf scan keys; the rerank (either mode)
    # must not resurrect them with a finite re-score
    import jax.numpy as jnp

    from flatnav_tpu.quantization.pq import pq_scan_knn

    data, queries = clustered_data
    data, queries = data[:1024], queries[:8]
    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:800], n_iters=10
    )
    codes = jnp.asarray(pq.encode(data))
    tables = pq.adc_tables(queries)
    n_valid = 300
    for kw in (
        {},
        dict(vectors=jnp.asarray(data), queries=jnp.asarray(queries)),
    ):
        _, ids = pq_scan_knn(
            codes, tables, 5, metric=MetricType.L2, tile_size=256,
            rerank=16, n_valid=jnp.asarray(n_valid, jnp.int32), **kw
        )
        assert (np.asarray(ids) < n_valid).all()


def test_pq_add_rejects_short_labels(clustered_data):
    data, _ = clustered_data
    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:512], n_iters=5
    )
    idx = PQIndex(pq, dataset_size=1024, max_edges_per_node=8)
    with pytest.raises(ValueError, match="labels length"):
        idx.add(data[:100], ef_construction=16, labels=np.arange(5))


def test_pq4_pack_roundtrip_and_scan_equality(clustered_data):
    # nbits=4: pack/unpack is lossless, and the packed scan returns
    # exactly the unpacked scan's results (the nibble unpack is
    # VPU-local inside the tile; HBM sees half the bytes)
    import jax.numpy as jnp

    from flatnav_tpu.quantization.pq import (
        pack_codes_4bit,
        pq_scan_knn,
        unpack_codes_4bit,
    )

    data, queries = clustered_data
    data, queries = data[:1500], queries[:16]
    pq = ProductQuantizer(dim=32, num_subquantizers=8, nbits=4).train(
        data[:1000], n_iters=15
    )
    assert pq.num_centroids == 16
    assert pq.code_size_bytes() == 4  # 8 subspaces * 4 bits
    codes = pq.encode(data)
    assert int(jnp.max(codes)) < 16
    packed = pack_codes_4bit(codes)
    assert packed.shape == (1500, 4)
    np.testing.assert_array_equal(
        np.asarray(unpack_codes_4bit(packed)), np.asarray(codes)
    )
    tables = pq.adc_tables(queries)
    d_u, ids_u = pq_scan_knn(
        jnp.asarray(codes), tables, 10, metric=MetricType.L2,
        tile_size=512, rerank=64,
    )
    d_p, ids_p = pq_scan_knn(
        packed, tables, 10, metric=MetricType.L2,
        tile_size=512, rerank=64, packed_4bit=True,
    )
    np.testing.assert_array_equal(np.asarray(ids_u), np.asarray(ids_p))
    np.testing.assert_allclose(np.asarray(d_u), np.asarray(d_p), rtol=1e-6)


def test_pq4_raw_rerank_recall(clustered_data):
    # the coarse 4-bit codes alone rank poorly, but the raw-vector
    # rerank recovers recall — the fast-scan operating point
    import jax.numpy as jnp

    from flatnav_tpu.ops import brute_force_knn
    from flatnav_tpu.quantization.pq import pack_codes_4bit, pq_scan_knn

    data, queries = clustered_data
    data, queries = data[:1500], queries[:16]
    pq = ProductQuantizer(dim=32, num_subquantizers=8, nbits=4).train(
        data[:1000], n_iters=15
    )
    packed = pack_codes_4bit(pq.encode(data))
    tables = pq.adc_tables(queries)
    _, gt = brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), 10, MetricType.L2
    )
    _, ids = pq_scan_knn(
        packed, tables, 10, metric=MetricType.L2, tile_size=512,
        rerank=128, vectors=jnp.asarray(data),
        queries=jnp.asarray(queries), packed_4bit=True,
    )
    assert _recall(np.asarray(ids), np.asarray(gt)) >= 0.9


def test_pq4_index_save_load(clustered_data, tmp_path):
    # PQIndex round-trips a 4-bit quantizer (nbits recovered from the
    # centroid count on load)
    data, queries = clustered_data
    pq = ProductQuantizer(dim=32, num_subquantizers=8, nbits=4).train(
        data[:1000], n_iters=10
    )
    idx = PQIndex(pq, dataset_size=2048, max_edges_per_node=8)
    idx.add(data[:1000], ef_construction=32)
    path = str(tmp_path / "pq4.idx")
    idx.save(path)
    idx2 = PQIndex.load(path)
    assert idx2.pq.nbits == 4
    assert idx2.pq.num_centroids == 16
    d1, l1 = idx.search(queries[:8], K=5, ef_search=32)
    d2, l2 = idx2.search(queries[:8], K=5, ef_search=32)
    np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))


def test_pq_nbits_validation():
    with pytest.raises(ValueError, match="nbits"):
        ProductQuantizer(dim=32, num_subquantizers=8, nbits=6)
    with pytest.raises(ValueError, match="even"):
        ProductQuantizer(dim=33, num_subquantizers=3, nbits=4)


def test_pq_scan_lane_packed_matches_unpacked(clustered_data):
    """pack_codes_lanes + lane_packed=True must be bit-identical to the
    plain [N, S] layout in every mode (ADC rerank, raw rerank, 4-bit
    nibbles) — lane packing is a storage-layout decision that kills the
    4x minor-dim padding of huge device code tables (round-4 100M OOM),
    never a semantic one. Odd N exercises the host-side tile padding."""
    import jax.numpy as jnp

    from flatnav_tpu.quantization.pq import (
        pack_codes_4bit,
        pack_codes_lanes,
        pq_scan_knn,
    )

    data, queries = clustered_data
    data, queries = data[:1437], queries[:16]  # odd N
    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:1000], n_iters=15
    )
    codes = np.asarray(pq.encode(data))
    tables = pq.adc_tables(queries)
    nv = jnp.asarray(len(data), jnp.int32)
    flat, n_pad = pack_codes_lanes(codes, tile=512)
    assert flat.shape[1] == 128 and n_pad % 512 == 0
    for kwargs in (
        {},  # ADC-rerank mode
        {"vectors": jnp.asarray(data), "queries": jnp.asarray(queries)},
    ):
        d0, i0 = pq_scan_knn(
            jnp.asarray(codes), tables, 10, tile_size=512, rerank=64,
            n_valid=nv, **kwargs,
        )
        d1, i1 = pq_scan_knn(
            jnp.asarray(flat), tables, 10, tile_size=512, rerank=64,
            n_valid=nv, lane_packed=True, **kwargs,
        )
        np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
        # XLA may reassociate the rerank sum between the two gather
        # forms: identical math, 1-ulp f32 ordering noise allowed
        np.testing.assert_allclose(
            np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-5
        )
        assert int(np.asarray(i1).max()) < len(data)

    # 4-bit nibble codes ride the same packing (g = S//2)
    pq4 = ProductQuantizer(dim=32, num_subquantizers=8, nbits=4).train(
        data[:1000], n_iters=15
    )
    codes4 = np.asarray(pack_codes_4bit(pq4.encode(data)))
    tables4 = pq4.adc_tables(queries)
    flat4, _ = pack_codes_lanes(codes4, tile=512)
    d0, i0 = pq_scan_knn(
        jnp.asarray(codes4), tables4, 10, tile_size=512, rerank=64,
        n_valid=nv, packed_4bit=True,
    )
    d1, i1 = pq_scan_knn(
        jnp.asarray(flat4), tables4, 10, tile_size=512, rerank=64,
        n_valid=nv, packed_4bit=True, lane_packed=True,
    )
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
    np.testing.assert_allclose(
        np.asarray(d0), np.asarray(d1), rtol=1e-6, atol=1e-5
    )


def test_pq_scan_odd_n_no_pad_copy(clustered_data):
    """The unpacked path's last tile clamps into range (no full-table pad
    temp); overlap rows must not be double-counted — every returned id
    unique per query, none out of range."""
    import jax.numpy as jnp

    from flatnav_tpu.quantization.pq import pq_scan_knn

    data, queries = clustered_data
    data, queries = data[:1219], queries[:16]  # 1219 % 512 != 0
    pq = ProductQuantizer(dim=32, num_subquantizers=8).train(
        data[:1000], n_iters=15
    )
    codes = pq.encode(data)
    tables = pq.adc_tables(queries)
    d, ids = pq_scan_knn(
        jnp.asarray(codes), tables, 10, tile_size=512, rerank=64,
    )
    ids = np.asarray(ids)
    assert ids.max() < 1219
    for row in ids:
        assert len(set(row.tolist())) == len(row), row
    # exactness vs the gather-form oracle still holds
    brute = np.asarray(pq.asymmetric_distances(queries, codes))
    want_d = np.sort(brute, axis=1)[:, :10]
    np.testing.assert_allclose(np.asarray(d), want_d, rtol=1e-5, atol=1e-4)
