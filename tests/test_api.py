"""Public API parity tests.

Mirrors the reference's python-bindings/unit_tests/test_index.py (end-to-end
build+query, API shape) and include/flatnav/tests/test_serialization.cpp
(save -> load -> bit-identical search results across metric x dtype combos).
"""

import numpy as np
import pytest

import flatnav_tpu
from flatnav_tpu.data_type import DataType


def _recall(found, truth):
    hits = sum(
        len(set(f.tolist()) & set(t.tolist())) for f, t in zip(found, truth)
    )
    return hits / truth.size


def _brute_force_labels(data, queries, k, metric):
    import jax.numpy as jnp

    from flatnav_tpu.ops import brute_force_knn

    _, ids = brute_force_knn(jnp.asarray(data), jnp.asarray(queries), k, metric)
    return np.asarray(ids)


def test_create_validates_distance_type():
    with pytest.raises(ValueError, match="Invalid distance type"):
        flatnav_tpu.index.create(
            distance_type="cosine", dim=8, dataset_size=10, max_edges_per_node=4
        )


def test_end_to_end_build_query(rng):
    n, d, k = 2000, 32, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    queries = rng.standard_normal((50, d), dtype=np.float32)
    index = flatnav_tpu.index.create(
        distance_type="l2",
        dim=d,
        dataset_size=n,
        max_edges_per_node=16,
        collect_stats=True,
    )
    index.set_num_threads(4)  # compat no-op
    index.add(data, ef_construction=100)
    assert index.num_nodes == n
    dists, labels = index.search(queries, K=k, ef_search=128)
    assert dists.shape == (50, k) and labels.shape == (50, k)
    gt = _brute_force_labels(data, queries, k, flatnav_tpu.MetricType.L2)
    assert _recall(labels, gt) >= 0.95
    assert index.get_query_distance_computations() > 0
    assert index.get_query_distance_computations() == 0  # read-and-reset

    # search_single agreement with batched search
    d1, l1 = index.search_single(queries[0], K=k, ef_search=128)
    np.testing.assert_array_equal(l1, labels[0])
    np.testing.assert_allclose(d1, dists[0])


@pytest.mark.parametrize("distance_type", ["l2", "angular"])
@pytest.mark.parametrize(
    "data_type", [DataType.float32, DataType.uint8, DataType.int8]
)
def test_save_load_bit_identical(rng, tmp_path, distance_type, data_type):
    """test_serialization.cpp:36-76 contract for all 6 metric x dtype
    combos: reloaded index returns bit-identical results."""
    n, d, k = 600, 16, 5
    if data_type == DataType.float32:
        data = rng.standard_normal((n, d), dtype=np.float32)
        queries = rng.standard_normal((20, d), dtype=np.float32)
    else:
        info = np.iinfo(data_type.numpy_dtype)
        data = rng.integers(info.min, info.max + 1, (n, d)).astype(
            data_type.numpy_dtype
        )
        queries = rng.integers(info.min, info.max + 1, (20, d)).astype(
            data_type.numpy_dtype
        )
    index = flatnav_tpu.index.create(
        distance_type=distance_type,
        dim=d,
        dataset_size=n,
        max_edges_per_node=8,
        index_data_type=data_type,
    )
    index.add(data, ef_construction=32)
    d0, l0 = index.search(queries, K=k, ef_search=32)

    path = str(tmp_path / "index.npz")
    index.save(path)
    reloaded = flatnav_tpu.index.load_index(path)
    assert reloaded.num_nodes == n
    assert reloaded.max_edges_per_node == 8
    assert reloaded.metric == index.metric
    assert reloaded.data_type == data_type
    d1, l1 = reloaded.search(queries, K=k, ef_search=32)
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(d0, d1)


def test_save_load_arbitrary_filename(rng, tmp_path):
    """saveIndex/loadIndex accept arbitrary filenames (Index.h:481-490) —
    the file must land at the literal path, not path + '.npz'."""
    n, d = 200, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=n, max_edges_per_node=4
    )
    index.add(data, ef_construction=16)
    path = str(tmp_path / "index.bin")
    index.save(path)
    assert (tmp_path / "index.bin").exists()
    assert not (tmp_path / "index.bin.npz").exists()
    reloaded = flatnav_tpu.index.load_index(path)
    d0, l0 = index.search(data[:10], K=3, ef_search=16)
    d1, l1 = reloaded.search(data[:10], K=3, ef_search=16)
    np.testing.assert_array_equal(l0, l1)


def test_add_beyond_capacity_raises(rng):
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=8, dataset_size=50, max_edges_per_node=4
    )
    with pytest.raises(RuntimeError, match="Maximum number of nodes"):
        index.add(
            rng.standard_normal((60, 8), dtype=np.float32), ef_construction=16
        )


def test_reorder_preserves_results(rng):
    n, d, k = 800, 16, 5
    data = rng.standard_normal((n, d), dtype=np.float32)
    queries = rng.standard_normal((20, d), dtype=np.float32)
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=n, max_edges_per_node=8
    )
    index.add(data, ef_construction=48)
    gt = _brute_force_labels(data, queries, k, flatnav_tpu.MetricType.L2)
    _, l0 = index.search(queries, K=k, ef_search=48)
    r0 = _recall(l0, gt)
    index.reorder(["gorder", "rcm"])
    _, l1 = index.search(queries, K=k, ef_search=48)
    r1 = _recall(l1, gt)
    # reordering only relabels; recall must be essentially unchanged
    assert abs(r0 - r1) <= 0.03
    with pytest.raises(ValueError, match="Invalid reordering method"):
        index.reorder(["bogus"])


def test_mtx_import_roundtrip(rng, tmp_path):
    """allocate_nodes + build_graph_links path (bindings.cpp:276-324,
    Index::buildGraphLinks Index.h:187-238)."""
    n, d, m = 200, 8, 6
    data = rng.standard_normal((n, d), dtype=np.float32)
    # ring graph with skips
    edges = []
    for i in range(n):
        edges.append((i, (i + 1) % n))
        edges.append((i, (i + 7) % n))
    path = tmp_path / "graph.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write(f"{n} {n} {len(edges)}\n")
        for a, b in edges:
            f.write(f"{a + 1} {b + 1}\n")
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=n, max_edges_per_node=m
    )
    index.allocate_nodes(data)
    index.build_graph_links(str(path))
    links = np.asarray(index.graph.links[:n])
    assert (links[:, 0] == (np.arange(n) + 1) % n).all()
    assert (links[:, 1] == (np.arange(n) + 7) % n).all()
    # searching the imported graph works (ring is connected)
    d0, l0 = index.search(data[:5], K=1, ef_search=200)
    assert (l0[:, 0] == np.arange(5)).all()


def test_search_exact_matches_ground_truth(rng):
    """search_exact returns the exact kNN over committed rows — including
    a non-iota label mapping and capacity > num_nodes."""
    n, cap, d, k = 1200, 2000, 24, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    queries = rng.standard_normal((33, d), dtype=np.float32)
    labels = (np.arange(n) * 7 + 3).astype(np.int32)  # non-trivial labels
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=cap, max_edges_per_node=8
    )
    index.add(data, ef_construction=40, labels=labels)
    dists, found = index.search_exact(queries, K=k)
    gt_rows = _brute_force_labels(
        data, queries, k, flatnav_tpu.MetricType.L2
    )
    np.testing.assert_array_equal(found, labels[gt_rows])
    assert np.all(np.diff(dists, axis=1) >= 0)
    # exact search is a recall-1.0 upper bound for the graph engine
    g_dists, g_found = index.search(queries, K=k, ef_search=64)
    assert g_dists[:, 0].min() >= dists[:, 0].min() - 1e-5


def test_search_exact_norerank_and_uint8_fused(rng):
    """exact_rerank=False (no-gather key ranking) holds shortlist-quality
    ids, and 8-bit tables ride the fused kernel unpromoted with exact
    integer keys — both through the public search_exact surface."""
    n, d, k = 3000, 24, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    queries = rng.standard_normal((32, d), dtype=np.float32)
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=n, max_edges_per_node=8
    )
    index.allocate_nodes(data)
    _, e_l = index.search_exact(queries, K=k)
    _, nr_l = index.search_exact(queries, K=k, rerank=32,
                                 exact_rerank=False)
    overlap = np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(nr_l, e_l)
    ])
    assert overlap >= 0.97, overlap

    du8 = rng.integers(0, 255, (n, d)).astype(np.uint8)
    idx8 = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=n, max_edges_per_node=8,
        index_data_type=DataType.uint8,
    )
    idx8.allocate_nodes(du8)
    e_d, e_l8 = idx8.search_exact(du8[:32], K=k)
    f_d, f_l8 = idx8.search_exact(du8[:32], K=k, rerank=32)
    # integer keys are exact: wherever ids agree distances match exactly
    agree = f_l8 == e_l8
    np.testing.assert_array_equal(f_d[agree], e_d[agree])
    assert (f_l8[:, 0] == e_l8[:, 0]).mean() >= 0.95


def test_save_load_bfloat16_roundtrip(rng, tmp_path):
    """npz has no bfloat16: the bits are stored as uint16 and viewed back
    on load — pre-fix, save silently wrote raw void ('|V2') that
    load_index could not cast, losing the index."""
    n, d, k = 400, 16, 5
    data = rng.standard_normal((n, d), dtype=np.float32)
    queries = rng.standard_normal((16, d), dtype=np.float32)
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=n, max_edges_per_node=8,
        index_data_type=DataType.bfloat16,
    )
    index.add(data, ef_construction=32)
    d0, l0 = index.search(queries, K=k, ef_search=32)
    path = str(tmp_path / "bf16.npz")
    index.save(path)
    reloaded = flatnav_tpu.index.load_index(path)
    assert reloaded.data_type == DataType.bfloat16
    d1, l1 = reloaded.search(queries, K=k, ef_search=32)
    np.testing.assert_array_equal(l0, l1)
    np.testing.assert_array_equal(d0, d1)


def test_search_exact_masks_unfilled_slots(rng):
    """K > num_nodes: unbeaten result slots must carry label -1 and inf
    distance (parity with every other search path), not node 0's label."""
    n, d = 5, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=64, max_edges_per_node=4,
    )
    index.add(data, ef_construction=16)
    dists, labels = index.search_exact(data[:3], K=10)
    assert np.isinf(dists[:, n:]).all()
    assert (labels[:, n:] == -1).all()
    assert (labels[:, :n] >= 0).all()
