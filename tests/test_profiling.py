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


def test_memory_monitor(tmp_path):
    import json
    import time as _time

    import numpy as np

    from flatnav_tpu.utils.profiling import MemoryMonitor

    path = tmp_path / "mem.jsonl"
    with MemoryMonitor(str(path), interval_s=0.05) as mon:
        arrs = [np.ones((512, 512)) for _ in range(4)]
        _time.sleep(0.3)
        del arrs
    lines = [json.loads(l) for l in path.read_text().splitlines()]
    assert len(lines) >= 2
    assert all("t" in l and "host" in l and "device" in l for l in lines)
    assert lines[0]["host"].get("vmrss_kb", 0) > 0
    pk = mon.peak()
    assert pk["host_rss_bytes"] > 0
