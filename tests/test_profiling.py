"""Stats aggregation + memory accounting utilities."""

import numpy as np

from flatnav_tpu.utils.profiling import SearchStats, device_memory_stats, timed


def test_search_stats_aggregation():
    s = SearchStats()
    s.record(num_queries=100, dist_comps=5000, hops=1000, secs=0.5)
    s.record(num_queries=100, dist_comps=7000, hops=1200, secs=0.5)
    assert s.distance_computations_per_query == 60.0
    assert s.hops_per_query == 11.0
    assert s.qps == 200.0
    snap = s.reset()
    assert snap.queries == 200 and s.queries == 0


def test_timed_context():
    with timed() as cell:
        x = np.ones(10).sum()
    assert cell["seconds"] >= 0 and x == 10


def test_device_memory_stats_shape():
    stats = device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU backend
