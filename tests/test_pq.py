"""Product quantization tests.

Mirror of the reference's PQ gtest tier
(/root/reference/developmental-features/quantization/tests/): k-means
centroid sanity (test_kmeans.cpp), encode/decode roundtrip
(test_pq_manager.cpp), train->encode->decode->re-encode determinism
(test_pq_e2e.cpp), plus ADC-search recall over a PQ-coded graph.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.ops import MetricType, brute_force_knn
from flatnav_tpu.quantization import ProductQuantizer, kmeans


def test_kmeans_centroids(rng):
    # 4 well-separated clusters must be recovered
    centers = np.array([[0, 0], [10, 0], [0, 10], [10, 10]], np.float32)
    data = np.concatenate(
        [c + 0.1 * rng.standard_normal((100, 2)).astype(np.float32) for c in centers]
    )
    cents, assign = kmeans(data, 4, n_iters=20)
    cents = np.asarray(cents)
    # each true center is within 0.2 of a learned centroid
    for c in centers:
        assert np.min(((cents - c) ** 2).sum(1)) < 0.04
    assert np.asarray(assign).shape == (400,)


def test_kmeans_init_validation(rng):
    with pytest.raises(ValueError, match="unknown init"):
        kmeans(rng.standard_normal((10, 2)), 2, init="bogus")


@pytest.mark.parametrize("train_type", ["default", "hypercube", "shared"])
def test_pq_encode_decode_roundtrip(rng, train_type):
    n, d, m_pq = 2000, 32, 4
    data = rng.standard_normal((n, d)).astype(np.float32)
    pq = ProductQuantizer(dim=d, num_subquantizers=m_pq)
    pq.train(data, n_iters=15, train_type=train_type)
    codes = np.asarray(pq.encode(data))
    assert codes.shape == (n, m_pq) and codes.dtype == np.uint8
    decoded = np.asarray(pq.decode(codes))
    # quantization error bounded: reconstruction much closer than random
    err = ((decoded - data) ** 2).sum(1).mean()
    base = (data**2).sum(1).mean()
    assert err < base * 0.9
    # re-encoding a decoded vector is a fixed point (test_pq_e2e.cpp)
    codes2 = np.asarray(pq.encode(decoded))
    assert (codes == codes2).mean() > 0.999


def test_pq_asymmetric_distance_matches_decoded(rng):
    n, d, m_pq = 500, 16, 4
    data = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((7, d)).astype(np.float32)
    pq = ProductQuantizer(dim=d, num_subquantizers=m_pq).train(data, n_iters=10)
    codes = pq.encode(data)
    adc = np.asarray(pq.asymmetric_distances(q, codes))
    decoded = np.asarray(pq.decode(codes))
    exact = ((q[:, None, :] - decoded[None]) ** 2).sum(-1)
    np.testing.assert_allclose(adc, exact, rtol=1e-3, atol=1e-2)


def test_pq_sdc_tables(rng):
    d, m_pq = 16, 4
    data = rng.standard_normal((800, d)).astype(np.float32)
    pq = ProductQuantizer(dim=d, num_subquantizers=m_pq).train(data, n_iters=10)
    sdc = np.asarray(pq.sdc_tables())
    assert sdc.shape == (m_pq, 256, 256)
    assert np.allclose(np.diagonal(sdc, axis1=1, axis2=2), 0, atol=1e-3)
    assert np.allclose(sdc, sdc.transpose(0, 2, 1), atol=1e-3)


def test_pq_graph_search_recall(rng):
    """ADC beam search over a PQ-coded kNN graph: recall vs exact ground
    truth must be solid (PQ is lossy; threshold reflects 8x compression)."""
    from flatnav_tpu.index.graph import graph_from_numpy
    from flatnav_tpu.quantization.pq import pq_search
    from tests.test_search import build_knn_graph

    n, d, m, k = 4000, 32, 16, 10
    data = rng.standard_normal((n, d)).astype(np.float32)
    q = rng.standard_normal((50, d)).astype(np.float32)
    pq = ProductQuantizer(dim=d, num_subquantizers=8).train(
        data[:1000], n_iters=20
    )
    links = build_knn_graph(data, m, MetricType.L2)
    g = graph_from_numpy(data, links)
    codes_committed = np.asarray(pq.encode(data))
    # code table padded to the same rows as the graph arrays
    codes = np.zeros((g.vectors.shape[0], 8), np.uint8)
    codes[:n] = codes_committed
    _, gt = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k, MetricType.L2)
    res = pq_search(
        pq, jnp.asarray(codes), g.links, g.labels, g.num_nodes,
        q, k=k, ef=128,
    )
    gtn = np.asarray(gt)
    found = np.asarray(res.labels)
    r = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) for a, b in zip(found, gtn)]
    ) / k
    assert r >= 0.5, f"PQ-ADC graph search recall {r} too low"
    # and much better than random (k/n)
    assert r > 50 * k / n
