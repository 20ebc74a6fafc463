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
    np.testing.assert_allclose(np.asarray(res.dists), d0, rtol=1e-5, atol=1e-5)
    assert (np.asarray(res.labels) == l0).mean() > 0.98  # fp-tie permutations


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
