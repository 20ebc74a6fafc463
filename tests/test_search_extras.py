"""Extra search-path coverage: expand_factor recall parity, bfloat16/f16
storage dtypes, merge tie behavior."""

import jax.numpy as jnp
import numpy as np
import pytest

import flatnav_tpu
from flatnav_tpu.data_type import DataType
from flatnav_tpu.index import batched_search, graph_from_numpy
from flatnav_tpu.ops import MetricType, brute_force_knn
from tests.test_search import build_knn_graph, recall


@pytest.fixture(scope="module")
def graph_and_truth():
    rng = np.random.default_rng(0xE0)
    n, d, m, k = 6000, 32, 16, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((64, d), dtype=np.float32)
    links = build_knn_graph(data, m, MetricType.L2)
    g = graph_from_numpy(data, links)
    _, gt = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k, MetricType.L2)
    return g, jnp.asarray(q), np.asarray(gt), k


@pytest.mark.parametrize("expand_factor", [2, 4])
def test_expand_factor_recall_parity(graph_and_truth, expand_factor):
    g, q, gt, k = graph_and_truth
    base = batched_search(
        g.vectors, g.links, g.labels, g.num_nodes, q, k=k, ef=96,
    )
    multi = batched_search(
        g.vectors, g.links, g.labels, g.num_nodes, q, k=k, ef=96,
        expand_factor=expand_factor,
    )
    r_base = recall(np.asarray(base.labels), gt)
    r_multi = recall(np.asarray(multi.labels), gt)
    assert r_multi >= r_base - 0.05, (r_base, r_multi)
    # hops counts EXPANSIONS (reference metric_hops parity): total stays
    # ~constant while loop ITERATIONS drop by ~E (the throughput win).
    # Expansions may grow slightly (wider frontier); bound the overhead.
    assert int(multi.hops) <= int(base.hops) * 1.3


@pytest.mark.parametrize("dtype", [DataType.bfloat16, DataType.float16])
def test_low_precision_storage(rng, dtype):
    # TPU-native extra: half-width storage halves gather traffic. Build and
    # search must work and reach sane recall.
    n, d, k = 2000, 32, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((32, d), dtype=np.float32)
    index = flatnav_tpu.index.create(
        distance_type="l2", dim=d, dataset_size=n, max_edges_per_node=16,
        index_data_type=dtype,
    )
    index.add(data, ef_construction=64)
    _, gt = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k, MetricType.L2)
    _, labels = index.search(q, K=k, ef_search=96)
    r = recall(labels, np.asarray(gt))
    assert r >= 0.85, f"half-precision recall {r}"


@pytest.mark.parametrize("impl", ["gather", "binary", "sort"])
def test_merge_matches_full_sort(rng, impl):
    # every merge implementation must equal a stable full sort with
    # beam-first tie order
    import flatnav_tpu.index.search as S
    from flatnav_tpu.index.search import _merge_sorted

    b, ef, m = 16, 64, 32
    beam_raw = rng.standard_normal((b, ef)).astype(np.float32)
    new_raw = rng.standard_normal((b, m)).astype(np.float32)
    # inject duplicates and cross-list ties BEFORE sorting (both lists must
    # stay sorted — that's the merge precondition)
    beam_raw[:, 10] = beam_raw[:, 11]
    new_raw[:, 3] = beam_raw[:, 12]
    beam_raw[:, -8:] = np.inf
    new_raw[:, -4:] = np.inf
    beam_d = np.sort(beam_raw, axis=1)
    new_d = np.sort(new_raw, axis=1)
    beam_i = rng.integers(0, 1000, (b, ef)).astype(np.int32)
    new_i = rng.integers(0, 1000, (b, m)).astype(np.int32)
    beam_e = rng.random((b, ef)) < 0.5
    new_e = rng.random((b, m)) < 0.5

    old = S.MERGE_IMPL
    S.MERGE_IMPL = impl
    try:
        got = _merge_sorted(
            (jnp.asarray(beam_d), jnp.asarray(beam_i), jnp.asarray(beam_e)),
            (jnp.asarray(new_d), jnp.asarray(new_i), jnp.asarray(new_e)),
            ef,
        )
    finally:
        S.MERGE_IMPL = old
    all_d = np.concatenate([beam_d, new_d], 1)
    all_i = np.concatenate([beam_i, new_i], 1)
    all_e = np.concatenate([beam_e, new_e], 1)
    order = np.argsort(all_d, axis=1, kind="stable")
    want_d = np.take_along_axis(all_d, order, 1)[:, :ef]
    want_i = np.take_along_axis(all_i, order, 1)[:, :ef]
    want_e = np.take_along_axis(all_e, order, 1)[:, :ef]
    np.testing.assert_array_equal(np.asarray(got[0]), want_d)
    np.testing.assert_array_equal(np.asarray(got[1]), want_i)
    np.testing.assert_array_equal(np.asarray(got[2]), want_e)


@pytest.mark.parametrize("expand_factor", [1, 4])
def test_membership_impls_bit_identical(rng, expand_factor):
    """The bsearch membership/dedup lowering (sorted history + binary
    search + sort-based first-occurrence + merge slice) must be
    BIT-IDENTICAL to the naive broadcast-compare forms — membership is
    exact integer logic, only op counts differ."""
    import jax

    import flatnav_tpu.index.search as S
    from flatnav_tpu.index import graph_from_numpy
    from tests.test_search import build_knn_graph

    n, d, m = 1500, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = jnp.asarray(rng.standard_normal((24, d), dtype=np.float32))
    g = graph_from_numpy(data, build_knn_graph(data, m, MetricType.L2))
    outs = {}
    for impl in ("compare", "bsearch"):
        S.MEMBERSHIP_IMPL = impl
        try:
            fn = jax.jit(
                S._batched_search_jit.__wrapped__,
                static_argnames=(
                    "k", "ef", "metric", "num_initializations", "max_hops",
                    "expand_factor",
                ),
            )
            r = fn(
                g.vectors, g.links, g.labels, g.num_nodes, q,
                k=5, ef=32, expand_factor=expand_factor,
            )
            outs[impl] = (
                np.asarray(r.dists), np.asarray(r.labels),
                int(r.hops), int(r.dist_computations),
            )
        finally:
            S.MEMBERSHIP_IMPL = "bsearch"
    for a, b in zip(outs["compare"], outs["bsearch"]):
        np.testing.assert_array_equal(a, b)


def test_sorted_member_oracle(rng):
    from flatnav_tpu.index.search import _INT_SENTINEL, _sorted_member

    tab = np.sort(rng.choice(5000, (16, 37), replace=True), axis=1)
    tab[:, 30:] = int(_INT_SENTINEL)  # sentinel tail
    x = rng.integers(0, 5000, (16, 64)).astype(np.int32)
    got = np.asarray(_sorted_member(jnp.asarray(tab), jnp.asarray(x)))
    want = np.array(
        [[xi in set(trow[:30].tolist()) for xi in xrow]
         for trow, xrow in zip(tab, x)]
    )
    np.testing.assert_array_equal(got, want)


def test_first_occurrence_oracle(rng):
    from flatnav_tpu.index.search import _first_occurrence

    ids = rng.integers(0, 20, (8, 50)).astype(np.int32)
    got = np.asarray(_first_occurrence(jnp.asarray(ids)))
    # exactly one survivor per distinct id per row
    for row_ids, row_mask in zip(ids, got):
        for v in np.unique(row_ids):
            assert row_mask[row_ids == v].sum() == 1


@pytest.mark.parametrize("loop_impl", ["scan", "unroll"])
def test_loop_impl_matches_while(rng, loop_impl):
    """scan mode (static trip count, done-query no-ops) must be
    bit-identical to the while loop."""
    import jax

    import flatnav_tpu.index.search as S
    from flatnav_tpu.index import graph_from_numpy
    from tests.test_search import build_knn_graph

    n, d, m = 1500, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = jnp.asarray(rng.standard_normal((24, d), dtype=np.float32))
    g = graph_from_numpy(data, build_knn_graph(data, m, MetricType.L2))
    outs = {}
    for impl in ("while", loop_impl):
        S.LOOP_IMPL = impl
        try:
            fn = jax.jit(
                S._batched_search_jit.__wrapped__,
                static_argnames=(
                    "k", "ef", "metric", "num_initializations", "max_hops",
                    "expand_factor",
                ),
            )
            r = fn(
                g.vectors, g.links, g.labels, g.num_nodes, q,
                k=5, ef=32, max_hops=64, expand_factor=4,
            )
            outs[impl] = (
                np.asarray(r.dists), np.asarray(r.labels),
                int(r.hops), int(r.dist_computations),
            )
        finally:
            S.LOOP_IMPL = "while"
    for a, b in zip(outs["while"], outs[loop_impl]):
        np.testing.assert_array_equal(a, b)


def test_compact_width_noop_and_recall(rng):
    """compact_width >= E*M is a no-op (bit-identical); a narrow width
    keeps recall within a point on a navigable graph."""
    import jax

    import flatnav_tpu.index.search as S
    from flatnav_tpu.index import graph_from_numpy
    from flatnav_tpu.ops import brute_force_knn
    from tests.test_search import build_knn_graph

    n, d, m, k = 2000, 24, 8, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = jnp.asarray(rng.standard_normal((64, d), dtype=np.float32))
    g = graph_from_numpy(data, build_knn_graph(data, m, MetricType.L2))
    gt = np.asarray(
        brute_force_knn(jnp.asarray(data), q, k, MetricType.L2)[1]
    )

    def run(cw):
        r = S.batched_search(
            g.vectors, g.links, g.labels, g.num_nodes, q,
            k=k, ef=48, expand_factor=4, compact_width=cw,
        )
        return np.asarray(r.dists), np.asarray(r.labels)

    def recall(labels):
        return np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(labels, gt)
        ])

    d0, l0 = run(0)
    d_full, l_full = run(4 * m)  # cw == E*M -> compaction branch skipped
    np.testing.assert_array_equal(d_full, d0)
    np.testing.assert_array_equal(l_full, l0)
    d_c, l_c = run(24)  # narrower than E*M=32, still >= ... half
    assert recall(l_c) >= recall(l0) - 0.02


def test_search_exact_rejects_unhonorable_exact_rerank_false(rng):
    """advisor r04: exact_rerank=False is only meaningful on the fused
    shortlist path — combinations that route elsewhere must raise, not
    silently run different semantics than asked."""
    import pytest

    import flatnav_tpu

    data = rng.standard_normal((256, 16), dtype=np.float32)
    idx = flatnav_tpu.index.create(
        distance_type="l2", dim=16, dataset_size=256, max_edges_per_node=8
    )
    idx.add(data, ef_construction=32)
    with pytest.raises(ValueError, match="exact_rerank"):
        idx.search_exact(data[:4], K=5, rerank=0, exact_rerank=False)
    with pytest.raises(ValueError, match="exact_rerank"):
        idx.search_exact(data[:4], K=5, rerank=16, fused=False,
                         exact_rerank=False)
    # the honorable combination still works
    d, l = idx.search_exact(data[:4], K=5, rerank=16, exact_rerank=False)
    assert l.shape == (4, 5)
