"""Cluster-routed pruned scan (ops/routed_scan.py).

The engine is a recorded negative result on the headline workloads (see
its module docstring + tools/profile_routed_scan.py); these tests pin
its CORRECTNESS contract so the measurement stays reproducible:
full-union equals the exact oracle, pruning only ever drops candidates,
pads are masked, and results are deterministic.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from flatnav_tpu.bench.synth import clustered
from flatnav_tpu.ops import MetricType, brute_force_knn
from flatnav_tpu.ops.routed_scan import build_routed_scan, routed_knn


def _recall(found, truth):
    k = truth.shape[1]
    return np.mean([
        len(set(a.tolist()) & set(b.tolist())) / k
        for a, b in zip(found, truth)
    ])


@pytest.fixture(scope="module")
def workload():
    # well-separated clusters: the regime routing is BUILT for (the
    # headline workloads' overlap is the measured negative result)
    data, queries = clustered(
        3000, 32, 128, center_scale=4.0, query_noise=0.5
    )
    gt_d, gt_i = brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), 5, MetricType.L2
    )
    return data, queries, np.asarray(gt_d), np.asarray(gt_i)


@pytest.fixture(scope="module")
def rs(workload):
    data, _, _, _ = workload
    return build_routed_scan(data, block=256)


def test_full_union_matches_exact_oracle(workload, rs):
    """Scanning every block must equal brute force: same ids (set-wise;
    tie order may differ) and f32 distances up to last-ulp reassociation
    (XLA picks reduction order per program shape)."""
    _, queries, gt_d, gt_i = workload
    nb = rs.block_centroids.shape[0]
    dd, ii = routed_knn(rs, jnp.asarray(queries), 5, union_blocks=nb)
    dd, ii = np.asarray(dd), np.asarray(ii)
    np.testing.assert_allclose(dd, gt_d, rtol=1e-4, atol=1e-4)
    assert _recall(ii, gt_i) == 1.0


def test_layout_is_a_permutation(workload, rs):
    data, _, _, _ = workload
    ids = np.asarray(rs.ids)
    real = ids[ids >= 0]
    assert len(real) == rs.n and len(set(real.tolist())) == rs.n
    # each real slot holds its original row's vector
    vecs = np.asarray(rs.vectors)
    np.testing.assert_array_equal(vecs[ids >= 0], data[real])


def test_pruned_recall_on_separated_clusters(workload, rs):
    """On data routing is built for, a ~2x-pruned scan stays accurate
    and never returns an invalid (pad) id."""
    _, queries, _, gt_i = workload
    nb = rs.block_centroids.shape[0]
    _, ii = routed_knn(
        rs, jnp.asarray(queries), 5, probes=4, union_blocks=nb // 2,
        group_size=32,
    )
    ii = np.asarray(ii)
    assert (ii >= 0).all()
    assert _recall(ii, gt_i) >= 0.9


def test_deterministic(workload, rs):
    _, queries, _, _ = workload
    a = routed_knn(rs, jnp.asarray(queries), 5, probes=4, union_blocks=6)
    b = routed_knn(rs, jnp.asarray(queries), 5, probes=4, union_blocks=6)
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))


def test_batch_padding_does_not_vote(workload, rs):
    """Pad queries must not influence a PRUNED union: with b_in real
    queries, the result must be invariant to the pad rows' content
    (pre-fix, pads voted with full weight and hijacked the union)."""
    from flatnav_tpu.ops.routed_scan import _routed_knn_jit

    _, queries, _, _ = workload
    nb = rs.block_centroids.shape[0]
    qs = queries[:20]
    rng = np.random.default_rng(11)
    pads = [
        np.tile(qs[:1], (12, 1)),
        rng.standard_normal((12, qs.shape[1])).astype(np.float32) * 10,
    ]
    outs = [
        _routed_knn_jit(
            rs.vectors, rs.ids, rs.block_centroids,
            jnp.asarray(np.concatenate([qs, pad])),
            k=5, metric=rs.metric, block=rs.block, probes=4,
            union=max(2, nb // 3), group=32, b_in=20,
        )
        for pad in pads
    ]
    np.testing.assert_array_equal(
        np.asarray(outs[0][1]), np.asarray(outs[1][1])
    )
    np.testing.assert_array_equal(
        np.asarray(outs[0][0]), np.asarray(outs[1][0])
    )


def test_ragged_batch_and_ip_metric():
    """Batch not a multiple of group_size; IP metric path."""
    data, queries = clustered(
        2000, 16, 50, center_scale=4.0, query_noise=0.5
    )
    data /= np.linalg.norm(data, axis=1, keepdims=True) + 1e-12
    queries /= np.linalg.norm(queries, axis=1, keepdims=True) + 1e-12
    rs = build_routed_scan(data, metric=MetricType.IP, block=256)
    nb = rs.block_centroids.shape[0]
    gt_d, gt_i = brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), 5, MetricType.IP
    )
    dd, ii = routed_knn(rs, jnp.asarray(queries), 5, union_blocks=nb,
                        group_size=32)
    assert dd.shape == (50, 5)
    np.testing.assert_allclose(
        np.asarray(dd), np.asarray(gt_d), rtol=1e-4, atol=1e-4
    )
    assert _recall(np.asarray(ii), np.asarray(gt_i)) == 1.0
