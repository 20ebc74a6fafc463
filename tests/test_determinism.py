"""Determinism: wave construction is race-free by design, so two builds of
the same data must produce BIT-IDENTICAL graphs — a stronger guarantee
than the reference's lock-based build, which is only recall-reproducible
across runs (test_parallel_insertions.py checks recall parity because the
graphs themselves differ by thread interleaving)."""

import numpy as np

from flatnav_tpu.index.build import add_batch
from flatnav_tpu.index.graph import make_empty_graph
from flatnav_tpu.ops import MetricType


def test_build_bit_deterministic(rng):
    n, d, m = 1500, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)

    def build():
        g = make_empty_graph(n, d, m)
        return add_batch(
            g, data, np.arange(n), ef_construction=48, metric=MetricType.L2
        )

    g1, g2 = build(), build()
    np.testing.assert_array_equal(np.asarray(g1.links), np.asarray(g2.links))
    np.testing.assert_array_equal(
        np.asarray(g1.vectors), np.asarray(g2.vectors)
    )
    np.testing.assert_array_equal(
        np.asarray(g1.labels), np.asarray(g2.labels)
    )


def test_search_bit_deterministic(rng):
    import jax.numpy as jnp

    from flatnav_tpu.index import batched_search
    from flatnav_tpu.index.graph import graph_from_numpy
    from tests.test_search import build_knn_graph

    n, d, m = 1000, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = jnp.asarray(rng.standard_normal((32, d), dtype=np.float32))
    g = graph_from_numpy(data, build_knn_graph(data, m, MetricType.L2))
    r1 = batched_search(g.vectors, g.links, g.labels, g.num_nodes, q, k=5, ef=32)
    r2 = batched_search(g.vectors, g.links, g.labels, g.num_nodes, q, k=5, ef=32)
    np.testing.assert_array_equal(np.asarray(r1.labels), np.asarray(r2.labels))
    np.testing.assert_array_equal(np.asarray(r1.dists), np.asarray(r2.dists))
