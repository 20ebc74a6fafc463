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


def host_memory_stats() -> dict:
    """Host RSS/VM of this process from /proc (no psutil dependency)."""
    out = {}
    try:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith(("VmRSS", "VmHWM", "VmSize")):
                    key, val = line.split(":", 1)
                    out[key.lower() + "_kb"] = int(val.strip().split()[0])
    except OSError:
        pass
    return out


class MemoryMonitor:
    """Background host+device memory sampler -> JSONL.

    The TPU-native analog of the reference's container monitoring stack
    (experiments/metrics/docker-compose.yml: cAdvisor + Prometheus +
    Grafana sampling container memory during benchmark runs): a daemon
    thread samples host RSS (/proc) and device HBM stats every
    `interval_s` into a JSONL file that plotting or CI can consume.

        with MemoryMonitor("/tmp/mem.jsonl", interval_s=1.0):
            run_benchmark()

    Each line: {"t": <s since start>, "host": {...}, "device": {...}}.
    `peak()` returns the max host RSS and device bytes_in_use seen.
    """

    def __init__(self, path: str, interval_s: float = 1.0):
        import threading

        self.path = path
        self.interval_s = interval_s
        self._stop = threading.Event()
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._peak_host = 0
        self._peak_dev = 0

    def _run(self):
        import json

        t0 = time.perf_counter()
        with open(self.path, "w") as f:
            while not self._stop.is_set():
                host = host_memory_stats()
                try:
                    dev = device_memory_stats()
                except Exception:
                    dev = {}
                self._peak_host = max(
                    self._peak_host, host.get("vmrss_kb", 0) * 1024
                )
                self._peak_dev = max(
                    self._peak_dev, dev.get("bytes_in_use", 0)
                )
                f.write(json.dumps({
                    "t": round(time.perf_counter() - t0, 3),
                    "host": host,
                    "device": dev,
                }) + "\n")
                f.flush()
                self._stop.wait(self.interval_s)

    def peak(self) -> dict:
        return {
            "host_rss_bytes": self._peak_host,
            "device_bytes_in_use": self._peak_dev,
        }

    def __enter__(self) -> "MemoryMonitor":
        self._thread.start()
        return self

    def __exit__(self, *exc):
        self._stop.set()
        self._thread.join(timeout=5.0)
        return False
