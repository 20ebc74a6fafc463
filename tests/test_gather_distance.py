"""Fused Pallas gather+distance kernel vs the jnp.take oracle.

On the CPU test mesh the kernel runs in Pallas interpret mode (the Mosaic
TPU compiler needs TPU hardware); the compiled path is exercised by
bench/profiling runs on the real chip. Results match query_block_distances
over a jnp.take gather to the last ulp: the ops and the tree reduction are
identical, but XLA forms FMAs per program, so exact bits can differ in the
final place (the same residual the TP-vs-single-chip tests document).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.ops.distances import MetricType, query_block_distances
from flatnav_tpu.ops.gather_distance import gather_distances

_INTERPRET = jax.default_backend() != "tpu"


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
@pytest.mark.parametrize("shape", [(16, 24, 32), (8, 512, 128), (5, 37, 7)])
def test_matches_take_path(rng, metric, shape):
    b, c, d = shape
    n = 1000
    vectors = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, n, (b, c)).astype(np.int32))
    queries = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))

    got = gather_distances(
        vectors, ids, queries, metric, interpret=_INTERPRET
    )
    want = query_block_distances(
        queries, jnp.take(vectors, ids, axis=0), metric
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-5
    )


def test_bfloat16_table(rng):
    n, b, c, d = 500, 8, 64, 64
    vectors = jnp.asarray(
        rng.standard_normal((n, d), dtype=np.float32)
    ).astype(jnp.bfloat16)
    ids = jnp.asarray(rng.integers(0, n, (b, c)).astype(np.int32))
    queries = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    got = gather_distances(
        vectors, ids, queries, MetricType.L2, interpret=_INTERPRET
    )
    want = query_block_distances(
        queries.astype(jnp.float32),
        jnp.take(vectors, ids, axis=0),
        MetricType.L2,
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
    )


def test_search_with_pallas_score(rng):
    """End-to-end search with SCORE_IMPL='pallas' finds the same neighbors
    as the take path (ulp-level score differences may permute fp ties, so
    compare distance sets, not bits)."""
    import flatnav_tpu.index.search as S
    from flatnav_tpu.index import graph_from_numpy
    from tests.test_search import build_knn_graph

    n, d, m = 800, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = jnp.asarray(rng.standard_normal((16, d), dtype=np.float32))
    g = graph_from_numpy(data, build_knn_graph(data, m, MetricType.L2))
    fn_kwargs = dict(k=5, ef=24, metric=MetricType.L2, expand_factor=2)

    def run():
        fn = jax.jit(
            S._batched_search_jit.__wrapped__,
            static_argnames=(
                "k", "ef", "metric", "num_initializations", "max_hops",
                "expand_factor",
            ),
        )
        r = fn(g.vectors, g.links, g.labels, g.num_nodes, q, **fn_kwargs)
        return np.asarray(r.dists), np.asarray(r.labels)

    d_take, l_take = run()
    S.SCORE_IMPL = "pallas"
    try:
        d_pal, l_pal = run()
    finally:
        S.SCORE_IMPL = "take"
    np.testing.assert_allclose(d_pal, d_take, rtol=1e-5, atol=1e-5)
    assert (l_pal == l_take).mean() > 0.95  # fp ties may permute a few
