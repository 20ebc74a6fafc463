"""Tracing / profiling utilities.

The reference's observability surface (SURVEY.md §5) is: opt-in atomic
counters `_distance_computations` / `_metric_hops`
(/root/reference/include/flatnav/index/Index.h:83-84, 689-691, 857-859)
drained by get_query_distance_computations (bindings.cpp:270-274), plus
wall-clock timing in the harness. Here the counters ride the jit state
(search.py returns them per batch); this module adds the host-side pieces:
a stats aggregator, timing helpers, and jax.profiler trace capture for
device-level analysis (the TPU analog of the reference's
cAdvisor/Prometheus container profiling, bin/memory-profiling/).
"""

from __future__ import annotations

import contextlib
import dataclasses
import time


@dataclasses.dataclass
class SearchStats:
    """Aggregated per-batch engine counters."""

    queries: int = 0
    distance_computations: int = 0
    hops: int = 0
    seconds: float = 0.0

    def record(self, num_queries: int, dist_comps: int, hops: int, secs: float):
        self.queries += num_queries
        self.distance_computations += int(dist_comps)
        self.hops += int(hops)
        self.seconds += secs

    @property
    def distance_computations_per_query(self) -> float:
        return self.distance_computations / max(self.queries, 1)

    @property
    def hops_per_query(self) -> float:
        return self.hops / max(self.queries, 1)

    @property
    def qps(self) -> float:
        return self.queries / self.seconds if self.seconds else 0.0

    def reset(self) -> "SearchStats":
        snapshot = dataclasses.replace(self)
        self.queries = self.distance_computations = self.hops = 0
        self.seconds = 0.0
        return snapshot


@contextlib.contextmanager
def timed():
    """Context manager yielding a mutable [start, elapsed] cell."""
    cell = {"seconds": 0.0}
    t0 = time.perf_counter()
    try:
        yield cell
    finally:
        cell["seconds"] = time.perf_counter() - t0


@contextlib.contextmanager
def device_trace(log_dir: str):
    """Capture a jax.profiler trace (view with TensorBoard/xprof)."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_memory_stats() -> dict:
    """Best-effort HBM usage for the default device (the analog of the
    reference's getTotalIndexMemory/visitedSetPoolAllocatedMemory printers,
    Index.h:505-515)."""
    import jax

    dev = jax.devices()[0]
    stats = getattr(dev, "memory_stats", lambda: None)()
    return dict(stats) if stats else {}
