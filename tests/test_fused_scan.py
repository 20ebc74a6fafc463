"""Fused scan+select kernel (ops/fused_scan.py) vs the exact oracle.

Acceptance mirrors fast_knn's: the returned distances must be EXACT f32
(rerank output), and measured recall vs brute_force_knn is the quality
criterion — on random/clustered data with rerank=32 the fused engine's
shortlist should match approx_min_k-class recall (>= 0.99 @ k=10). Runs
in Pallas interpret mode on the CPU mesh (conftest forces cpu), compiled
on TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from flatnav_tpu.bench.synth import clustered
from flatnav_tpu.ops import MetricType, brute_force_knn, fused_knn


def _recall(found, want, k):
    return float(
        np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / k
             for a, b in zip(found, want)]
        )
    )


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_fused_matches_oracle_recall(rng, metric):
    n, d, nq, k = 6000, 64, 64, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((nq, d), dtype=np.float32)
    if metric == MetricType.IP:
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    data, q = jnp.asarray(data), jnp.asarray(q)
    ed, ei = brute_force_knn(data, q, k, metric)
    fd, fi = fused_knn(data, q, k, metric, rerank=32)
    assert fi.shape == (nq, k) and fd.shape == (nq, k)
    # bucket-collision loss scales as ~k^2/(2*NB); at n=6000 there are
    # only 512 buckets (1M has 65536), so small tables sit near 0.98 —
    # and shrinking L (more buckets) must recover it
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.97
    _, fi4 = fused_knn(data, q, k, metric, rerank=32, bucket_l=4)
    assert _recall(np.asarray(fi4), np.asarray(ei), k) >= 0.99
    # returned distances are exact: wherever ids agree, distances agree
    agree = np.asarray(fi) == np.asarray(ei)
    np.testing.assert_allclose(
        np.asarray(fd)[agree], np.asarray(ed)[agree], rtol=1e-5, atol=1e-4
    )


def test_fused_clustered_workload(rng):
    # the headline workload shape in miniature: contiguous-free id space,
    # strided buckets — recall must hold at the bench acceptance level
    data, q = clustered(8000, 32, 48)
    k = 10
    ed, ei = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k)
    fd, fi = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=32)
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.97


def test_fused_contiguous_cluster_ids(rng):
    # adversarial layout: near-duplicate rows CONTIGUOUS in id space, with
    # within-cluster distance gaps below bf16 phase-1 resolution. The
    # strided bucketing (bucket = column mod T/L) must add NO loss beyond
    # fast_knn's shared bf16 limit (measured: both engines 0.5125 at
    # rerank=32 on this data), and a wider rerank must recover fully —
    # the documented escape hatch for near-duplicate tables.
    from flatnav_tpu.ops import fast_knn

    n, d, k = 4096, 32, 10
    base = rng.standard_normal((64, d), dtype=np.float32) * 8
    data = np.repeat(base, n // 64, axis=0) + 0.1 * rng.standard_normal(
        (n, d)
    ).astype(np.float32)
    q = base[:16] + 0.05 * rng.standard_normal((16, d)).astype(np.float32)
    ed, ei = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k)
    # platform-fair comparator: the fused kernel casts inputs to bf16
    # explicitly (on TPU fast_knn's DEFAULT-precision matmul does the
    # same; on this CPU test backend DEFAULT is full f32) — pre-round
    # fast_knn's inputs through bf16 so both engines see one precision
    rd = lambda x: np.asarray(
        jnp.asarray(x).astype(jnp.bfloat16).astype(jnp.float32)
    )
    _, ref_i = fast_knn(
        jnp.asarray(rd(data)), jnp.asarray(rd(q)), k, rerank=32
    )
    _, fi = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=32)
    ref_r = _recall(np.asarray(ref_i), np.asarray(ei), k)
    got_r = _recall(np.asarray(fi), np.asarray(ei), k)
    assert got_r >= ref_r - 0.05, (got_r, ref_r)
    # wider rerank is the documented escape hatch for near-duplicate
    # tables whose distance gaps sit below bf16 phase-1 resolution
    _, fi64 = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=64)
    assert _recall(np.asarray(fi64), np.asarray(ei), k) >= 0.99


def test_fused_gist_shape(rng):
    # GIST1M-class miniature: d=960 is NOT a lane multiple (pads to
    # 1024) and is the largest per-row tile the north-star configs use —
    # guards the d_pad path the 1M x 960 runs ride
    # (benchmarks/run_northstar.py --config gist)
    n, d, nq, k = 2048, 960, 16, 10
    data, q = clustered(n, d, nq)
    ed, ei = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k)
    fd, fi = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=32)
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.97
    agree = np.asarray(fi) == np.asarray(ei)
    np.testing.assert_allclose(
        np.asarray(fd)[agree], np.asarray(ed)[agree], rtol=1e-4, atol=1e-3
    )


def test_fused_n_valid_and_padding(rng):
    # n far from tile multiples + over-allocated capacity: rows past
    # n_valid must never appear, unfilled shortlist slots stay inf
    n_cap, n_valid, d, k = 5000, 300, 48, 10
    data = rng.standard_normal((n_cap, d), dtype=np.float32)
    # poison the invalid tail with zeros (closest possible rows to a
    # zero-centered query if the mask leaked)
    data[n_valid:] = 0.0
    q = 0.01 * rng.standard_normal((9, d)).astype(np.float32)
    # rerank=64: near-zero queries against unit-scale rows are an
    # intentional scale mismatch — phase-1 keys are then pure-norm
    # comparisons at the bf16 noise floor, so the shortlist needs width
    # (this test is about the n_valid mask, not phase-1 resolution)
    fd, fi = fused_knn(
        jnp.asarray(data), jnp.asarray(q), k,
        n_valid=jnp.asarray(n_valid, jnp.int32), rerank=64,
    )
    assert int(np.asarray(fi).max()) < n_valid
    ed, ei = brute_force_knn(
        jnp.asarray(data), jnp.asarray(q), k,
        n_valid=jnp.asarray(n_valid, jnp.int32),
    )
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.99


def test_fused_tiny_table_all_slots(rng):
    # table smaller than the shortlist: every valid row must be returned
    # (k slots past n_valid carry inf distances)
    n, d, k = 20, 16, 10
    data = rng.standard_normal((n, d), dtype=np.float32)
    q = rng.standard_normal((3, d), dtype=np.float32)
    fd, fi = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=32)
    ed, ei = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k)
    assert _recall(np.asarray(fi), np.asarray(ei), k) == 1.0
    np.testing.assert_allclose(
        np.asarray(fd), np.asarray(ed), rtol=1e-5, atol=1e-4
    )


@pytest.mark.parametrize("metric", [MetricType.L2, MetricType.IP])
def test_fused_no_rerank_mode(rng, metric):
    # exact_rerank=False skips the HBM row gather and ranks by the
    # kernel's f32 keys; ids must stay at shortlist quality and the
    # calibrated distances must sit within bf16 input rounding of exact
    n, d, nq, k = 6000, 64, 64, 10
    data, q = clustered(n, d, nq)
    data, q = data.astype(np.float32), q.astype(np.float32)
    if metric == MetricType.IP:
        data /= np.linalg.norm(data, axis=1, keepdims=True)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
    data, q = jnp.asarray(data), jnp.asarray(q)
    ed, ei = brute_force_knn(data, q, k, metric)
    fd, fi = fused_knn(data, q, k, metric, rerank=32, exact_rerank=False)
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.97
    # calibrated key distances: exact for bf16-rounded inputs, so within
    # ~2^-8 relative of the true f32 distances (plus the dropped-constant
    # restore). Compare where ids agree.
    agree = np.asarray(fi) == np.asarray(ei)
    scale = float(np.abs(np.asarray(ed)).max()) + 1.0
    np.testing.assert_allclose(
        np.asarray(fd)[agree], np.asarray(ed)[agree],
        rtol=0.02, atol=0.02 * scale,
    )
    # ascending order within each row
    fdv = np.asarray(fd)
    assert np.all(np.diff(fdv, axis=1) >= -1e-6)


def test_fused_no_rerank_n_valid(rng):
    # the inf mask must survive the no-gather path too
    n_cap, n_valid, d, k = 3000, 200, 48, 10
    data = rng.standard_normal((n_cap, d), dtype=np.float32)
    data[n_valid:] = 0.0
    q = 0.01 * rng.standard_normal((9, d)).astype(np.float32)
    fd, fi = fused_knn(
        jnp.asarray(data), jnp.asarray(q), k,
        n_valid=jnp.asarray(n_valid, jnp.int32), rerank=64,
        exact_rerank=False,
    )
    assert int(np.asarray(fi).max()) < n_valid
    assert np.all(np.isfinite(np.asarray(fd)))  # k=10 < n_valid=200


def test_fused_uint8_native_path(rng):
    # uint8 tables ride the kernel UNPROMOTED (per-tile bf16 cast, exact
    # for 8-bit values; f32 accumulation exact for d*255^2 < 2^24): the
    # phase-1 keys are exact integer rankings, so only bucket collisions
    # can lose a neighbor, and the rerank distances are the exact int32
    # path's. The 100M-resident-table design rides this path.
    data = rng.integers(0, 255, (3000, 32)).astype(np.uint8)
    q = rng.integers(0, 255, (8, 32)).astype(np.uint8)
    k = 5
    ed, ei = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k)
    fd, fi = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=32)
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.95
    agree = np.asarray(fi) == np.asarray(ei)
    np.testing.assert_allclose(
        np.asarray(fd)[agree], np.asarray(ed)[agree], rtol=0, atol=0
    )
    # int8 too (|v| <= 128 exact in bf16)
    data8 = (data.astype(np.int16) - 128).astype(np.int8)
    q8 = (q.astype(np.int16) - 128).astype(np.int8)
    e8d, e8i = brute_force_knn(jnp.asarray(data8), jnp.asarray(q8), k)
    f8d, f8i = fused_knn(jnp.asarray(data8), jnp.asarray(q8), k, rerank=32)
    assert _recall(np.asarray(f8i), np.asarray(e8i), k) >= 0.95
    # no-rerank mode on the native path: calibrated keys are exact for
    # integer data (no bf16 input rounding at all), so distances where
    # ids agree must match the oracle bit-for-bit
    fnd, fni = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=32,
                         exact_rerank=False)
    agree = np.asarray(fni) == np.asarray(ei)
    np.testing.assert_allclose(
        np.asarray(fnd)[agree], np.asarray(ed)[agree], rtol=0, atol=0
    )


def test_auto_shapes_bound_every_footprint():
    """_pick_shapes must keep (a) the double-buffered row tile and the
    [qb, t] f32 key block inside their VMEM budgets, (b) qb at/above the
    MXU-efficient floor whenever the batch allows (round 4 ran 10M at
    qb=32 — a 4x MXU underutilization), and (c) the per-chunk
    [qc, nb] f32+i32 bucket summary under the module bound — at N=10M,
    B=4096 the round-4 flat default (L=16, no chunking) compiled 19 GiB
    of summaries, a compile-time HBM OOM on the real chip."""
    from flatnav_tpu.ops.fused_scan import (
        _KEY_BYTES, _L, _QB, _QB_MIN, _ROWS_BYTES, _SUMMARY_BYTES, _TILE,
        _pick_shapes, _round_up,
    )

    for n, b, d_pad, isz in [
        (10_000_000, 4096, 128, 1), (100_000_000, 8192, 128, 1),
        (1_000_000, 8192, 128, 2), (100_000, 8192, 128, 2),
        (100_000, 1, 128, 2), (2048, 64, 128, 2),
        (1_000_000, 8192, 1024, 2),  # gist-class d=960
    ]:
        L, t, qb, qc = _pick_shapes(
            n, b, d_pad, isz, _TILE, _QB, None, _SUMMARY_BYTES)
        assert t % (128 * L) == 0, (n, b, L, t)
        assert t * d_pad * isz <= _ROWS_BYTES, (n, b, t)
        assert qb * t * 4 <= _KEY_BYTES, (n, b, qb, t)
        if b >= _QB_MIN:
            assert qb >= _QB_MIN, (n, b, qb)
        n_tiles = -(-n // t)
        nb = n_tiles * (t // L)
        assert 8 * qc * nb <= _SUMMARY_BYTES, (n, b, L, qc, 8 * qc * nb)
        assert qc % qb == 0 and qc >= qb
        if n >= 4096 * _L:
            assert nb >= 4096, (n, b, L)
        # chunk count covers the batch
        assert _round_up(b, qc) // qc * qc >= b
    # the headline workload keeps its compiled shape (committed caches)
    assert _pick_shapes(100_000, 8192, 128, 2, _TILE, _QB, None,
                        _SUMMARY_BYTES) == (16, 2048, 512, 8192)


def test_fused_internal_query_chunking_matches_unchunked(rng):
    """Forcing a tiny summary budget chunks the query batch internally
    (lax.map); results must be identical to the single-chunk program —
    chunking is a memory-shape decision, never a semantic one."""
    n, d, nq, k = 6000, 64, 96, 10
    data = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((nq, d), dtype=np.float32))
    d1, i1 = fused_knn(data, q, k, rerank=32)
    # budget that forces >= 3 chunks: nb ~ n/L buckets, 8 bytes each
    tiny = 8 * 32 * (6144 // 4)
    d2, i2 = fused_knn(data, q, k, rerank=32, summary_bytes=tiny)
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(d1), np.asarray(d2),
                               rtol=0, atol=0)


def test_fused_unpadded_tail_tile_is_masked(rng):
    """The table is consumed in place (no pad copy): the grid's last,
    partially-out-of-bounds row tile must be masked in-kernel — garbage
    reads past N must never reach the shortlist. Checked by planting the
    true nearest neighbors in the final partial tile."""
    n, d, k = 2048 + 37, 24, 5  # n far from any tile multiple
    data = rng.standard_normal((n, d), dtype=np.float32) + 10.0
    q = data[-7:] + 1e-3 * rng.standard_normal((7, d), dtype=np.float32)
    data, q = jnp.asarray(data.astype(np.float32)), jnp.asarray(
        q.astype(np.float32))
    ed, ei = brute_force_knn(data, q, k)
    fd, fi = fused_knn(data, q, k, rerank=64)
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.95
    assert int(np.asarray(fi).max()) < n  # no out-of-bounds id survives
    assert np.isfinite(np.asarray(fd)).all()
    # n_valid cutting into the tail is honored exactly
    nv = n - 17
    fd2, fi2 = fused_knn(data, q, k, rerank=64, n_valid=jnp.int32(nv))
    assert int(np.asarray(fi2).max()) < nv


def test_native_int_gated_past_d257(rng):
    """advisor r04: the unpromoted 8-bit path's exactness argument
    (f32 accumulation exact for d*255^2 < 2^24) holds only to d=257;
    deeper integer tables must ride the promoted path and still return
    exact integer distances."""
    from flatnav_tpu.ops.fused_scan import _NATIVE_INT_MAX_D

    assert _NATIVE_INT_MAX_D == 257
    n, d, nq, k = 3000, 320, 32, 5  # d > 257
    data = rng.integers(0, 256, (n, d)).astype(np.uint8)
    q = rng.integers(0, 256, (nq, d)).astype(np.uint8)
    ed, ei = brute_force_knn(jnp.asarray(data), jnp.asarray(q), k)
    fd, fi = fused_knn(jnp.asarray(data), jnp.asarray(q), k, rerank=64)
    assert _recall(np.asarray(fi), np.asarray(ei), k) >= 0.95
    agree = np.asarray(fi) == np.asarray(ei)
    np.testing.assert_allclose(
        np.asarray(fd)[agree], np.asarray(ed)[agree], rtol=0, atol=0
    )
