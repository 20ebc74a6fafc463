"""Device-memory guard for batched_search (round-2 crash fix).

Round 2 found that graph search at ef=2048/B=4096 on a 10M-row index
reproducibly kernel-faulted the TPU worker (the runtime dies instead of
raising when the hop working set overflows HBM). batched_search now
estimates the working set at trace time and (a) transparently chunks the
query batch — bit-identical results, queries are independent — or (b)
raises a Python ValueError when even one query cannot fit.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from flatnav_tpu.index.search import (
    batched_search,
    safe_query_batch,
    _search_temp_bytes,
)
from flatnav_tpu.ops import MetricType


def _toy_graph(n=512, d=16, m=8, seed=0):
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, d)).astype(np.float32)
    links = rng.integers(0, n, (n + 1, m)).astype(np.int32)
    labels = np.arange(n, dtype=np.int32)
    return jnp.asarray(vecs), jnp.asarray(links), jnp.asarray(labels)


def test_no_limit_passthrough(monkeypatch):
    monkeypatch.delenv("FLATNAV_TPU_MEM_LIMIT", raising=False)
    # CPU backend: no limit known -> batch unchanged
    assert safe_query_batch(4096, 128, m=32, d=128) == 4096


def test_limit_zero_disables(monkeypatch):
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "0")
    assert safe_query_batch(4096, 2048, m=32, d=128) == 4096


def test_subbatch_shrinks_with_limit(monkeypatch):
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "16e9")
    full = safe_query_batch(
        4096, 128, m=32, d=128, expand_factor=64,
        table_rows=10_000_000, table_bytes=2_560_000_000,
    )
    big_ef = safe_query_batch(
        4096, 2048, m=32, d=128, expand_factor=64,
        table_rows=10_000_000, table_bytes=2_560_000_000,
    )
    # the headline config is untouched; the crash config gets chunked
    assert full == 4096
    assert big_ef < 4096
    assert big_ef >= 1


def test_r3_fault_envelope_chunks(monkeypatch):
    # round-3 calibration: the 1M/ef=2048/B=4096/E=16 shape kernel-faulted
    # the worker on fresh compiles at the old 1-byte merge accounting —
    # under 4-byte accounting the guard must chunk it on a 16 GB device,
    # while the 0.95-recall operating points (ef<=512) stay unchunked
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "16e9")
    faulting = safe_query_batch(
        4096, 2048, m=32, d=128, expand_factor=16,
        table_rows=1_000_000, table_bytes=644_000_000,
    )
    assert faulting < 4096
    op_point = safe_query_batch(
        4096, 512, m=32, d=128, expand_factor=64,
        table_rows=1_000_000, table_bytes=644_000_000,
    )
    assert op_point == 4096


def test_impossible_config_raises(monkeypatch):
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "1e6")
    with pytest.raises(ValueError, match="cannot fit"):
        safe_query_batch(
            4096, 4096, m=32, d=1024, expand_factor=64,
            table_rows=10_000_000, table_bytes=0,
        )


def test_estimate_monotone():
    a = _search_temp_bytes(4096, 1024, 2048, 128, 0, 10_000_000)
    b = _search_temp_bytes(4096, 2048, 2048, 128, 0, 10_000_000)
    assert b > a
    # halving the batch halves the estimate
    c = _search_temp_bytes(2048, 2048, 2048, 128, 0, 10_000_000)
    assert abs(c * 2 - b) <= 8


def test_chunked_results_bit_identical(monkeypatch):
    vecs, links, labels = _toy_graph()
    q = jnp.asarray(
        np.random.default_rng(1).standard_normal((64, 16)).astype(np.float32)
    )
    n_nodes = jnp.asarray(512, jnp.int32)

    monkeypatch.delenv("FLATNAV_TPU_MEM_LIMIT", raising=False)
    full = batched_search(
        vecs, links, labels, n_nodes, q, k=5, ef=32, metric=MetricType.L2
    )

    # pick a limit that forces chunking (temp estimate ~2.5 KB/query here)
    limit = int(
        vecs.size * 4 + links.size * 4 + labels.size * 4
        + _search_temp_bytes(16, 32, 8, 16, 0, 512) / 0.85 * 1.01
    )
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", str(limit))
    # env takes priority even off-TPU; the guard runs eagerly per call
    # (chunking lives outside the jit boundary), no cache clear needed
    sub = safe_query_batch(
        64, 32, m=8, d=16,
        table_rows=512,
        table_bytes=vecs.size * 4 + links.size * 4 + labels.size * 4,
    )
    assert 1 <= sub < 64
    chunked = batched_search(
        vecs, links, labels, n_nodes, q, k=5, ef=32, metric=MetricType.L2
    )

    np.testing.assert_array_equal(
        np.asarray(full.labels), np.asarray(chunked.labels)
    )
    np.testing.assert_array_equal(
        np.asarray(full.dists), np.asarray(chunked.dists)
    )
    # counters aggregate to the same totals
    assert int(full.dist_computations) == int(chunked.dist_computations)
    assert int(full.hops) == int(chunked.hops)


def test_wave_guard_passthrough_and_shrink(monkeypatch):
    # Build-side analog (round 3): add_batch caps the insertion wave the
    # same way batched_search chunks queries. d=128 keeps the full wave;
    # d=960 (GIST-class, ~64 GB at full width) must shrink, not fault.
    from flatnav_tpu.index.build import _safe_wave_size

    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "16e9")
    kw = dict(
        ef_construction=100, m=32, expand_factor=32,
        intra_candidates=32, capacity=1_000_000,
    )
    assert _safe_wave_size(
        8192, d=128, table_bytes=644_000_000, **kw
    ) == 8192
    w = _safe_wave_size(8192, d=960, table_bytes=3_968_000_000, **kw)
    assert 64 <= w < 8192


def test_wave_guard_impossible_raises(monkeypatch):
    from flatnav_tpu.index.build import _safe_wave_size

    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "1e8")
    with pytest.raises(ValueError, match="cannot fit"):
        _safe_wave_size(
            8192, ef_construction=100, m=32, d=4096, expand_factor=64,
            intra_candidates=32, capacity=1_000_000, table_bytes=0,
        )


def test_wave_guard_build_completes(monkeypatch):
    # With a limit that forces sub-full waves, the build must still finish
    # and yield a searchable graph (narrow waves change the wave
    # partition, never validity).
    from flatnav_tpu.index.build import _safe_wave_size, add_batch
    from flatnav_tpu.index.graph import make_empty_graph

    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "5e6")
    n, d, m = 300, 8, 8
    capped = _safe_wave_size(
        8192, ef_construction=32, m=m, d=d, expand_factor=32,
        intra_candidates=8, capacity=n, table_bytes=2 * n * d * 4,
    )
    assert capped < n  # the limit really splits this build into waves
    rng = np.random.default_rng(7)
    data = rng.standard_normal((n, d)).astype(np.float32)
    g = make_empty_graph(n, d, m)
    g = add_batch(
        g, data, np.arange(n), ef_construction=32, metric=MetricType.L2
    )
    assert int(g.num_nodes) == n
    q = jnp.asarray(data[:16])
    res = batched_search(
        g.vectors, g.links, g.labels, g.num_nodes, q, k=1, ef=32,
        metric=MetricType.L2,
    )
    # every point finds itself
    np.testing.assert_array_equal(
        np.asarray(res.labels)[:, 0], np.arange(16)
    )


def test_m_search_prefix_degree(monkeypatch):
    monkeypatch.delenv("FLATNAV_TPU_MEM_LIMIT", raising=False)
    vecs, links, labels = _toy_graph()
    q = jnp.asarray(
        np.random.default_rng(2).standard_normal((32, 16)).astype(np.float32)
    )
    n_nodes = jnp.asarray(512, jnp.int32)
    full = batched_search(
        vecs, links, labels, n_nodes, q, k=5, ef=32, metric=MetricType.L2
    )
    same = batched_search(
        vecs, links, labels, n_nodes, q, k=5, ef=32, metric=MetricType.L2,
        m_search=links.shape[1],
    )
    np.testing.assert_array_equal(
        np.asarray(full.labels), np.asarray(same.labels)
    )
    half = batched_search(
        vecs, links, labels, n_nodes, q, k=5, ef=32, metric=MetricType.L2,
        m_search=4,
    )
    hd = np.asarray(half.dists)
    assert np.isfinite(hd).all()
    assert (np.diff(hd, axis=1) >= 0).all()
    # fewer links expanded -> no more distance computations than full
    assert int(half.dist_computations) <= int(full.dist_computations)


def test_guard_accounts_for_max_hops(monkeypatch):
    """A huge explicit max_hops grows the visited history and its per-hop
    membership compare; the guard must shrink the sub-batch accordingly
    (pre-fix it hardcoded the default history width and passed configs
    that kernel-faulted)."""
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "2e9")
    from flatnav_tpu.index.search import safe_query_batch

    kw = dict(m=32, d=128, expand_factor=16, table_rows=1_000_000,
              table_bytes=512_000_000)
    sub_default = safe_query_batch(4096, 128, **kw)
    sub_big = safe_query_batch(4096, 128, max_hops=20_000, **kw)
    assert sub_big < sub_default


def test_wave_guard_validates_padded_bucket(monkeypatch):
    """The dispatch pads every wave to a power-of-two bucket; the guard
    must validate the PADDED width (pre-fix a non-pow2 max_wave ran up to
    ~2x more lanes than validated)."""
    monkeypatch.setenv("FLATNAV_TPU_MEM_LIMIT", "1e9")
    from flatnav_tpu.index.build import _next_pow2, _safe_wave_size

    w = _safe_wave_size(
        5000, ef_construction=64, m=16, d=128, expand_factor=16,
        intra_candidates=16, capacity=100_000, table_bytes=100_000_000,
    )
    # whatever the guard returns, its padded bucket must also pass
    w2 = _safe_wave_size(
        _next_pow2(w), ef_construction=64, m=16, d=128, expand_factor=16,
        intra_candidates=16, capacity=100_000, table_bytes=100_000_000,
    )
    assert _next_pow2(w) <= _next_pow2(w2) * 2 and w <= 5000


def test_empty_add_is_a_noop(rng):
    from flatnav_tpu.index.build import add_batch
    from flatnav_tpu.index.graph import make_empty_graph

    g = make_empty_graph(100, 8, 4)
    g2 = add_batch(
        g, np.empty((0, 8), np.float32), np.empty(0, np.int32),
        ef_construction=16, metric=MetricType.L2,
    )
    assert int(g2.num_nodes) == 0
    # and on a non-empty index too
    data = rng.standard_normal((50, 8)).astype(np.float32)
    g2 = add_batch(g2, data, np.arange(50), ef_construction=16,
                   metric=MetricType.L2)
    g3 = add_batch(
        g2, np.empty((0, 8), np.float32), np.empty(0, np.int32),
        ef_construction=16, metric=MetricType.L2,
    )
    assert int(g3.num_nodes) == 50


def test_graph_from_numpy_rejects_overflow(rng):
    from flatnav_tpu.index.graph import graph_from_numpy

    vecs = rng.standard_normal((20, 8)).astype(np.float32)
    links = np.zeros((20, 4), np.int32)
    with pytest.raises(ValueError, match="exceed capacity"):
        graph_from_numpy(vecs, links, capacity=10)


def test_tpu_without_memory_stats_uses_default(monkeypatch):
    # round-3 GIST regression: the axon tunnel's PJRT client returns
    # memory_stats() = None — the guard must fall back to the
    # conservative 16 GiB default instead of silently disabling (a
    # disabled guard let a 32 GB d=960 wave gather kill the worker)
    import flatnav_tpu.index.search as search_mod

    class FakeDev:
        platform = "tpu"

        def memory_stats(self):
            return None

    monkeypatch.delenv("FLATNAV_TPU_MEM_LIMIT", raising=False)
    monkeypatch.setattr(
        search_mod.jax, "local_devices", lambda: [FakeDev()]
    )
    assert search_mod._device_mem_limit() == search_mod._TPU_DEFAULT_HBM

    class FakeDevEmpty(FakeDev):
        def memory_stats(self):
            return {}

    monkeypatch.setattr(
        search_mod.jax, "local_devices", lambda: [FakeDevEmpty()]
    )
    assert search_mod._device_mem_limit() == search_mod._TPU_DEFAULT_HBM
