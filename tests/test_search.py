"""Beam search over a prebuilt static graph (SURVEY.md §7 step 2).

Validates the hop loop, visited bitmask, and beam merge before construction
exists: an exact kNN graph (computed by brute force) is navigable enough on
small data that beam search must reach high recall vs brute-force ground
truth. This is the analog of the reference importing an externally built
base layer via buildGraphLinks (Index.h:187-238) and then searching it.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.index import batched_search, beam_search, graph_from_numpy
from flatnav_tpu.ops import MetricType, brute_force_knn


def build_knn_graph(data: np.ndarray, m: int, metric: MetricType):
    n = data.shape[0]
    # neighbors of each node = its m nearest (excluding itself)
    _, ids = brute_force_knn(jnp.asarray(data), jnp.asarray(data), m + 1, metric)
    ids = np.asarray(ids)
    links = np.where(
        ids[:, : m + 1] == np.arange(n)[:, None], -1, ids[:, : m + 1]
    )
    out = np.empty((n, m), np.int32)
    for i in range(n):
        row = links[i][links[i] >= 0][:m]
        if len(row) < m:
            row = np.concatenate([row, np.full(m - len(row), i, np.int32)])
        out[i] = row
    return out


def recall(found: np.ndarray, truth: np.ndarray) -> float:
    hits = 0
    for f, t in zip(found, truth):
        hits += len(set(f.tolist()) & set(t.tolist()))
    return hits / truth.size


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_static_graph_recall(rng, metric):
    n, d, m, k, b = 8000, 32, 16, 10, 64
    data = rng.standard_normal((n, d), dtype=np.float32)
    if metric == MetricType.IP:
        data /= np.linalg.norm(data, axis=1, keepdims=True)
    queries = rng.standard_normal((b, d), dtype=np.float32)
    if metric == MetricType.IP:
        queries /= np.linalg.norm(queries, axis=1, keepdims=True)

    links = build_knn_graph(data, m, metric)
    g = graph_from_numpy(data, links)

    gt_d, gt_i = brute_force_knn(jnp.asarray(data), jnp.asarray(queries), k, metric)
    # A raw kNN graph is only moderately navigable (no diversity pruning —
    # the very problem selectNeighbors solves); recall must be solid at
    # ef=64 and climb with the beam width.
    recalls = {}
    for ef in (64, 256):
        res = batched_search(
            g.vectors,
            g.links,
            g.labels,
            g.num_nodes,
            jnp.asarray(queries),
            k=k,
            ef=ef,
            metric=metric,
        )
        recalls[ef] = recall(np.asarray(res.labels), np.asarray(gt_i))
    assert recalls[64] >= 0.70, f"recall {recalls} too low on static kNN graph"
    assert recalls[256] >= 0.90, f"recall {recalls} does not scale with ef"
    # results sorted ascending
    d = np.asarray(res.dists)
    assert (np.diff(d, axis=1) >= -1e-6).all()
    # stats counters are live
    assert int(res.dist_computations) > b * 100
    assert int(res.hops) > 0


def test_search_returns_nearest_on_graph_with_selfloops(rng):
    # Tiny index where every point is its own nearest neighbor; self-loop
    # padding (unused slots == own id, Index.h:269-270) must be ignored.
    n, d, m = 300, 8, 12
    data = rng.standard_normal((n, d), dtype=np.float32)
    links = build_knn_graph(data, 6, MetricType.L2)
    # symmetrize so every node is reachable (a directed kNN graph can have
    # zero-in-degree nodes that NO search could find), then pad with
    # self-loops
    full = np.repeat(np.arange(n, dtype=np.int32)[:, None], m, axis=1)
    full[:, :6] = links
    counts = np.full(n, 6)
    for src in range(n):
        for dst in links[src]:
            if counts[dst] < m and src not in full[dst, : counts[dst]]:
                full[dst, counts[dst]] = src
                counts[dst] += 1
    links = full
    g = graph_from_numpy(data, links)
    res = batched_search(
        g.vectors, g.links, g.labels, g.num_nodes,
        jnp.asarray(data[:16]), k=1, ef=32, metric=MetricType.L2,
    )
    assert (np.asarray(res.labels)[:, 0] == np.arange(16)).all()
    assert np.allclose(np.asarray(res.dists)[:, 0], 0.0, atol=1e-5)


def test_beam_search_respects_num_nodes_prefix(rng):
    # Only the committed prefix may be visited: entry selection must not
    # leave the prefix, and prefix links only point inside it.
    n, d, m = 1000, 16, 8
    data = rng.standard_normal((n, d), dtype=np.float32)
    prefix = 400
    links = build_knn_graph(data[:prefix], m, MetricType.L2)
    g = graph_from_numpy(
        data, np.concatenate(
            [links, np.repeat(np.arange(prefix, n, dtype=np.int32)[:, None], m, axis=1)]
        ), num_nodes=prefix,
    )
    beam = beam_search(
        g.vectors, g.links, g.num_nodes, jnp.asarray(data[:8]), ef=24,
    )
    ids = np.asarray(beam.ids)
    finite = np.isfinite(np.asarray(beam.dists))
    assert (ids[finite] < prefix).all()
