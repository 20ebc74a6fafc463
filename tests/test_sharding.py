"""Multi-chip sharding tests on the virtual 8-device CPU mesh.

Covers the two parallelism axes (SURVEY.md §2.6): data-parallel query
sharding (thread-pool analog) and tensor-parallel node-table sharding.
Both must return results identical to the single-device search.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.index import batched_search, graph_from_numpy
from flatnav_tpu.ops import MetricType
from flatnav_tpu.parallel import (
    data_parallel_search,
    make_mesh,
    sharded_search,
)
from tests.test_search import build_knn_graph


@pytest.fixture(scope="module")
def small_graph():
    rng = np.random.default_rng(0xBEEF)
    n, d, m = 960, 24, 8  # 960 + wave_pad -> divisible shard sizes
    data = rng.standard_normal((n, d), dtype=np.float32)
    links = build_knn_graph(data, m, MetricType.L2)
    g = graph_from_numpy(data, links)
    queries = rng.standard_normal((64, d), dtype=np.float32)
    return g, jnp.asarray(queries)


def _single_device_results(g, queries, k=5, ef=32):
    res = batched_search(
        g.vectors, g.links, g.labels, g.num_nodes, queries, k=k, ef=ef
    )
    return np.asarray(res.dists), np.asarray(res.labels)


def test_data_parallel_matches_single(small_graph):
    g, queries = small_graph
    mesh = make_mesh(data=8, model=1)
    res = data_parallel_search(g, queries, mesh, k=5, ef=32)
    d0, l0 = _single_device_results(g, queries)
    np.testing.assert_array_equal(np.asarray(res.labels), l0)
    np.testing.assert_allclose(np.asarray(res.dists), d0, rtol=1e-6)


@pytest.mark.parametrize("data_ax,model_ax", [(1, 8), (2, 4), (1, 4)])
def test_model_sharded_matches_single(small_graph, data_ax, model_ax):
    g, queries = small_graph
    assert g.vectors.shape[0] % model_ax == 0
    mesh = make_mesh(
        n_devices=data_ax * model_ax, data=data_ax, model=model_ax
    )
    res = sharded_search(g, queries, mesh, k=5, ef=32)
    d0, l0 = _single_device_results(g, queries)
    # The sharded path reuses beam_search_core with psum-merged one-owner
    # contributions (x + 0 is exact) and a fixed-association tree-sum
    # distance kernel, so LABELS are exactly equal. Distances may wobble
    # by ~1 ulp where XLA forms FMAs differently across the two programs
    # (uncontrollable without breaking kernel fusion) — bounded tightly.
    np.testing.assert_array_equal(np.asarray(res.labels), l0)
    np.testing.assert_allclose(np.asarray(res.dists), d0, rtol=0, atol=1e-5)


@pytest.mark.parametrize("expand_factor", [4])
def test_model_sharded_expand_factor(small_graph, expand_factor):
    """The unified hop body brings expand_factor to the TP path for free;
    results must stay bit-identical to single-device at the same E."""
    g, queries = small_graph
    mesh = make_mesh(n_devices=8, data=2, model=4)
    res = sharded_search(
        g, queries, mesh, k=5, ef=32, expand_factor=expand_factor
    )
    res0 = batched_search(
        g.vectors, g.links, g.labels, g.num_nodes, queries, k=5, ef=32,
        expand_factor=expand_factor,
    )
    np.testing.assert_array_equal(
        np.asarray(res.labels), np.asarray(res0.labels)
    )
    np.testing.assert_allclose(
        np.asarray(res.dists), np.asarray(res0.dists), rtol=0, atol=1e-5
    )


def test_meshes_available():
    assert len(jax.devices()) == 8


def test_data_parallel_build_bit_identical():
    """Sharded construction must produce the same graph as single-device —
    the multi-chip analog of test_parallel_insertions.py, but exact."""
    from flatnav_tpu.index.build import add_batch
    from flatnav_tpu.index.graph import make_empty_graph

    rng = np.random.default_rng(5)
    n, d, m = 1200, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    g1 = add_batch(
        make_empty_graph(n, d, m), data, np.arange(n),
        ef_construction=32, metric=MetricType.L2,
    )
    mesh = make_mesh(data=8, model=1)
    g2 = add_batch(
        make_empty_graph(n, d, m), data, np.arange(n),
        ef_construction=32, metric=MetricType.L2, mesh=mesh,
    )
    np.testing.assert_array_equal(np.asarray(g1.links), np.asarray(g2.links))
    np.testing.assert_array_equal(
        np.asarray(g1.vectors), np.asarray(g2.vectors)
    )


def test_model_sharded_build_bit_identical():
    """TP construction (table rows sharded over the model axis) must
    produce the same graph as the single-device build — indexes larger
    than one chip's HBM can then be BUILT, not just searched (SURVEY §2.6
    TP row)."""
    from flatnav_tpu.index.build import add_batch
    from flatnav_tpu.index.graph import make_empty_graph

    rng = np.random.default_rng(9)
    n, d, m = 1000, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    g1 = add_batch(
        make_empty_graph(n, d, m), data, np.arange(n),
        ef_construction=32, metric=MetricType.L2,
    )
    mesh = make_mesh(n_devices=8, data=2, model=4)
    g2 = add_batch(
        make_empty_graph(n, d, m), data, np.arange(n),
        ef_construction=32, metric=MetricType.L2,
        mesh=mesh, table_spec="model",
    )
    np.testing.assert_array_equal(
        np.asarray(g1.links[:n]), np.asarray(g2.links[:n])
    )
    np.testing.assert_array_equal(
        np.asarray(g1.vectors[:n]), np.asarray(g2.vectors[:n])
    )
    # the TP-built graph is directly searchable with the TP search path
    queries = jnp.asarray(
        rng.standard_normal((32, d), dtype=np.float32)
    )
    res = sharded_search(g2, queries, mesh, k=5, ef=32)
    res0 = batched_search(
        g1.vectors, g1.links, g1.labels, g1.num_nodes, queries, k=5, ef=32
    )
    np.testing.assert_array_equal(
        np.asarray(res.labels), np.asarray(res0.labels)
    )


def test_sharded_paths_chunk_under_memory_guard(small_graph, monkeypatch):
    """With a memory limit that forces chunking, both sharded paths must
    return results identical to the unchunked single-device search (the
    guard chunks OUTSIDE the dispatch; pre-fix neither path had one and a
    too-large config kernel-faulted the worker)."""
    g, queries = small_graph
    q = jnp.asarray(queries)
    base = batched_search(
        g.vectors, g.links, g.labels, g.num_nodes, q, k=5, ef=32,
        metric=MetricType.L2,
    )
    table = (
        g.vectors.size * 4 + g.links.size * 4 + g.labels.size * 4
    )
    from flatnav_tpu.index.search import _search_temp_bytes

    limit = int(table + _search_temp_bytes(4, 32, 8, 24, 0, 1024) / 0.85 * 1.05)
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", str(limit))

    mesh_dp = make_mesh(data=8, model=1)
    res = data_parallel_search(g, q, mesh_dp, k=5, ef=32)
    np.testing.assert_array_equal(
        np.asarray(res.labels), np.asarray(base.labels)
    )

    mesh_tp = make_mesh(data=2, model=4)
    res = sharded_search(g, q, mesh_tp, k=5, ef=32)
    np.testing.assert_array_equal(
        np.asarray(res.labels), np.asarray(base.labels)
    )
