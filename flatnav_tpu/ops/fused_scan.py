"""Fused scan+select Pallas TPU kernel: the third-generation scan engine.

`fast_knn` (ops/distances.py) computes a [B, tile] ranking-key matrix with
one MXU matmul, then hands it to `jax.lax.approx_min_k`. On TPU those are
two separate HBM programs: the key matrix is written to HBM by the matmul
and read back by the selection pass — at B=4096, N=1M that is ~16 GB of
HBM round-trip per batch, an order of magnitude more traffic than the
dataset itself (256 MB in bf16). `tools/profile_scan_bound.py` measures
the engine selection-bound, not matmul-bound, for exactly this reason.

This kernel fuses the selection's first stage (strided bucket minima —
the same binning `approx_min_k` performs internally, cf. the TPU-KNN
PartialReduce recipe, arXiv:2206.14286 §4) into the matmul's consumer
while the scores are still in VMEM:

    HBM traffic per (query-block, tile):   rows      [T, d]   bf16  in
                                           bucket min [QB, T/L] f32  out
                                           bucket arg [QB, T/L] i32  out

i.e. the [B, N] key matrix never exists; HBM sees the rows plus a 1/L-size
summary (L=16 default -> 8x less traffic counting the id plane). A second,
tiny `approx_min_k` over the [B, N/L] bucket minima picks the shortlist,
and the exact f32 rerank is shared with `fast_knn` (same inf-masking).

Recall semantics are approx_min_k-like by construction: a true neighbor is
lost only if (a) another row in its L-bucket scores better — buckets
stride the tile (bucket = column mod T/L), so contiguous id runs spread
across T/L buckets and collisions are ~random — or (b) bf16 rounding
pushes its bucket past the `rerank`-wide shortlist. Both are measured
against the exact oracle in tests/test_fused_scan.py.

Reference analog: the whole-table scan replaces the reference's
initializeSearch strided sampling (Index.h:845-870) generalized to every
row; the two-phase select replaces its std::priority_queue top-k.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flatnav_tpu.ops.distances import (
    MetricType,
    query_block_distances,
    squared_norms,
)

#: default queries per grid step / rows per tile / bucket width. S = T/L
#: (the bucket count per tile, also the kernel's lane width) must be a
#: multiple of 128; QB*T f32 scores must fit VMEM alongside the row tile.
_QB = 512
_TILE = 2048
_L = 16


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


#: bound on the phase-1 [B, N/L] f32+i32 bucket-summary footprint when
#: bucket_l is auto-picked. 4 GiB keeps every measured config's compiled
#: shape (100k/1M at B<=8192 sit at <= 3.8 GiB) while stopping the
#: pathological ones: N=10M at B=4096 with the flat default L=16 compiles
#: 19 GiB of summaries — a compile-time HBM OOM (measured, round 4).
_SUMMARY_BYTES = 4 << 30


def _pick_bucket_l(n: int, b: int) -> int:
    """Auto bucket width: start at _L, shrink for tiny tables (keep the
    kernel meaningful), then GROW until the [B, N/L] f32+i32 summaries
    fit _SUMMARY_BYTES — never dropping below ~4096 buckets."""
    L = _L
    while L > 1 and n // L < 4096:
        L //= 2
    b_eff = _round_up(max(b, 1), 8)
    while 8 * b_eff * (n // L) > _SUMMARY_BYTES and n // (2 * L) >= 4096:
        L *= 2
    return L


def _scan_kernel(q_ref, rows_ref, pen_ref, min_ref, id_ref, *, L: int):
    """One (query-block, row-tile) grid step.

    q_ref    [QB, d]  bf16   query block (d zero-padded to 128k)
    rows_ref [T, d]   bf16   dataset tile
    pen_ref  [1, T]   f32    additive key penalty per row: the L2 ||y||^2
                             term, +inf for invalid/padded rows, 0 for IP
    min_ref  [QB, S]  f32    bucket minima (S = T/L buckets, strided)
    id_ref   [QB, S]  i32    global row id attaining each bucket min
    """
    qb = q_ref.shape[0]
    t = rows_ref.shape[0]
    s = t // L
    j = pl.program_id(0)

    # one bf16 MXU pass; the f32 accumulate is the ranking key's precision.
    # Integer tables arrive UNPROMOTED (u8/i8 rows in HBM/VMEM — no 2x
    # bf16 table copy) and are cast per-tile here; |values| <= 255 are
    # exact in bf16 and d * 255^2 < 2^24 keeps the f32 accumulation exact,
    # so the integer path's keys are EXACT rankings (same argument as
    # fast_knn's uint8 phase-1, benchmarks/run_bigann_10m.py docstring).
    rows = rows_ref[:]
    if rows.dtype != jnp.bfloat16:
        # Mosaic's cast lowering has no unsigned->float rule (jax 0.9.0
        # pallas/mosaic/lowering.py:_convert_helper raises on u8->bf16,
        # first hit on the real chip at 10M uint8 — CPU interpret mode
        # accepts any cast and hides this); hop through int32, which is
        # lossless for 8-bit values and lowers as sitofp.
        if jnp.issubdtype(rows.dtype, jnp.unsignedinteger):
            rows = rows.astype(jnp.int32)
        rows = rows.astype(jnp.bfloat16)
    dots = jax.lax.dot_general(
        q_ref[:],
        rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    # ranking key: L2 = ||y||^2 - 2<q,y> (||q||^2 constant per query,
    # dropped); IP uses the same -2<q,y> form (pen = 0) — a positive
    # scaling of -<q,y>, rank-identical, and the rerank restores exact
    # distances. pen is +inf on invalid rows (inf + finite = inf).
    key = pen_ref[0, :][None, :] - 2.0 * dots

    # strided bucket min: bucket b holds columns {b, b+S, ..., b+(L-1)S},
    # so a contiguous run of ids spreads across S buckets before reuse.
    # Static lane-aligned slices; L-1 VPU mins — negligible vs the matmul.
    bmin = key[:, 0:s]
    for l in range(1, L):
        bmin = jnp.minimum(bmin, key[:, l * s : (l + 1) * s])
    # arg pass: smallest slice index l attaining the min (ties -> lowest
    # global id, matching the stable sorts elsewhere in the engine)
    argl = jnp.full((qb, s), L, jnp.int32)
    for l in range(L - 1, -1, -1):
        argl = jnp.where(key[:, l * s : (l + 1) * s] == bmin, l, argl)
    b_iota = jax.lax.broadcasted_iota(jnp.int32, (qb, s), 1)
    min_ref[:] = bmin
    id_ref[:] = j * t + argl * s + b_iota


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "rerank", "bucket_l", "tile_size", "query_block",
        "interpret", "exact_rerank",
    ),
)
def fused_knn(
    dataset: jax.Array,
    queries: jax.Array,
    k: int,
    metric: MetricType = MetricType.L2,
    rerank: int = 32,
    bucket_l: int | None = None,
    tile_size: int = _TILE,
    query_block: int = _QB,
    n_valid: jax.Array | None = None,
    interpret: bool | None = None,
    exact_rerank: bool = True,
):
    """Two-phase kNN scan with the matmul+bucket-min fused in VMEM.

    Drop-in contract of `fast_knn` (exact f32/int32 rerank distances,
    ascending, [B, k] + [B, k] int32 ids; unfilled slots carry inf/-1 is
    NOT applied here — ids of invalid slots are masked inf like fast_knn).
    uint8/int8 tables run natively (per-tile bf16 cast in the kernel is
    exact for 8-bit values and the f32 accumulation is exact for
    d * 255^2 < 2^24, i.e. d <= 257): phase-1 keys are EXACT integer
    rankings and the table keeps its 1-byte/element HBM footprint. Wider
    integer types are promoted via float32.

    Tuning knobs: `bucket_l` trades phase-B input size (N/L) against
    bucket-collision recall loss; `tile_size`/`query_block` size the VMEM
    working set (QB*T f32 scores + T*d bf16 rows must fit ~16 MB).

    `exact_rerank=False` skips the final HBM row gather + f32 rescore and
    ranks the shortlist by the kernel's own f32-accumulated keys instead.
    The gather is DMA-issue-rate-bound (~150 ns/row measured, B*rerank
    rows/batch — ~20 ms at B=4096, rerank=32; see ops/distances.py:311),
    so this mode removes the engine's single largest cost. Returned
    distances are calibrated from the keys (key + ||q||^2 for L2,
    1 + key/2 for IP): exact for bf16-ROUNDED inputs, i.e. within input
    rounding (~2^-8 relative) of the true f32 distances; ranking quality
    is measured vs the exact oracle in tests/test_fused_scan.py.
    """
    if interpret is None:
        interpret = jax.default_backend() == "cpu"
    n, d = dataset.shape
    b = queries.shape[0]
    r = max(rerank, k)
    n_limit = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)

    # auto bucket width: keep >= ~4096 buckets so top-k bucket collisions
    # stay rare (expected pair collisions ~ k^2/(2*nb)); small tables
    # degrade L toward 1 (the kernel then emits full keys — correct,
    # just with less traffic saved, which tiny tables don't need anyway)
    if bucket_l is None:
        L = _pick_bucket_l(n, b)
    else:
        L = bucket_l
    t = max(128 * L, min(tile_size, _round_up(n, 128 * L)))
    if t % (128 * L):
        raise ValueError(f"tile_size {t} must be a multiple of 128*L")
    qb = min(query_block, _round_up(b, 8))
    # large L forces t >= 128*L past the requested tile_size; shrink the
    # query block with it so the kernel's [qb, t] f32 key block stays
    # <= 4 MiB beside the double-buffered row tiles (~16 MB VMEM/core)
    if t > tile_size:
        qb = min(qb, max(8, (1 << 20) // t))
    n_pad = _round_up(n, t)
    b_pad = _round_up(b, qb)
    d_pad = _round_up(d, 128)

    # 8-bit integer tables ride the kernel UNPROMOTED (the per-tile bf16
    # cast in _scan_kernel is exact for |v| <= 255): the table's HBM
    # footprint stays 1 byte/element — the property that lets a
    # 100M x 128 uint8 table live resident on one chip. Wider integer
    # types keep the old promote-via-float32 path.
    native_int = dataset.dtype in (jnp.uint8, jnp.int8)
    ds_bf = dataset if native_int else dataset.astype(jnp.bfloat16)
    q_bf = queries.astype(jnp.bfloat16)
    if n_pad != n:
        ds_bf = jnp.pad(ds_bf, ((0, n_pad - n), (0, 0)))
    if b_pad != b:
        q_bf = jnp.pad(q_bf, ((0, b_pad - b), (0, 0)))
    if d_pad != d:
        ds_bf = jnp.pad(ds_bf, ((0, 0), (0, d_pad - d)))
        q_bf = jnp.pad(q_bf, ((0, 0), (0, d_pad - d)))

    # per-row additive penalty: ||y||^2 for L2, 0 for IP; +inf past
    # n_valid and on padding. The norms MUST come from the bf16-ROUNDED
    # rows (the same values the kernel's dots see): then
    # key = ||y_bf||^2 - 2<q_bf, y_bf> = ||q_bf - y_bf||^2 - ||q_bf||^2,
    # i.e. an exact ranking of distances to the rounded rows (the
    # per-query constant is rank-irrelevant). Exact-f32 norms against
    # bf16 dots add a ±||y||^2 * 2^-9 per-row bias that is not the
    # distance to ANY consistent vector — measured 0.58 -> 0.81 recall
    # on a near-duplicate table (tests/test_fused_scan.py).
    row_ids = jnp.arange(n_pad, dtype=jnp.int32)
    if metric == MetricType.L2:
        pen = squared_norms(ds_bf.astype(jnp.float32))
    else:
        pen = jnp.zeros((n_pad,), jnp.float32)
    pen = jnp.where(row_ids < n_limit, pen, jnp.inf)[None, :]

    s = t // L
    nb = n_pad // L  # total buckets
    # Grid order: row tiles OUTER, query blocks INNER. Pallas re-fetches
    # an input block only when its index-map output changes, so each
    # [T, d] row tile is DMA'd from HBM exactly once and stays VMEM-
    # resident while every query block sweeps it — table traffic is
    # N*d bytes total instead of (B/QB)*N*d (8x less at B=4096, QB=512;
    # the re-fetched query blocks are ~1000x smaller than the table).
    grid = (n_pad // t, b_pad // qb)
    kern = functools.partial(_scan_kernel, L=L)
    bmin, bids = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((qb, d_pad), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((t, d_pad), lambda j, i: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((qb, s), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((qb, s), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b_pad, nb), jnp.float32),
            jax.ShapeDtypeStruct((b_pad, nb), jnp.int32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=2 * b_pad * n_pad * d_pad,
            bytes_accessed=(
                grid[0] * b_pad * d_pad * 2
                + n_pad * d_pad * 2
                + b_pad * nb * 8
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(q_bf, ds_bf, pen)
    bmin, bids = bmin[:b], bids[:b]

    # phase B: shortlist from the 1/L-size bucket summary
    if nb <= r:
        cand_key, cand_i = bmin, bids
    else:
        cand_key, pos = jax.lax.approx_min_k(bmin, r)
        cand_i = jnp.take_along_axis(bids, pos, axis=1)

    if not exact_rerank:
        # rank by the kernel keys; calibrate them back to distances.
        # L2: key = ||y_bf||^2 - 2<q_bf, y_bf>  ->  + ||q||^2
        # IP: key = -2<q_bf, y_bf>              ->  1 + key/2
        order = jnp.argsort(cand_key, axis=1, stable=True)[:, :k]
        kk = jnp.take_along_axis(cand_key, order, axis=1)
        if metric == MetricType.L2:
            dist = kk + squared_norms(queries.astype(jnp.float32))[:, None]
        else:
            dist = 1.0 + 0.5 * kk
        dist = jnp.where(jnp.isinf(kk), jnp.inf, dist)
        return dist, jnp.take_along_axis(cand_i, order, axis=1)

    # exact rerank (shared conventions with fast_knn, distances.py:379-392):
    # invalid/padded winners carry an inf key — keep them inf so their
    # clipped row-0 rescore can't outrank real neighbors.
    qk = queries
    cand_rows = jnp.take(dataset, jnp.minimum(cand_i, n - 1), axis=0)
    exact = query_block_distances(qk, cand_rows, metric)
    exact = jnp.where(jnp.isinf(cand_key), jnp.inf, exact)
    order = jnp.argsort(exact, axis=1, stable=True)[:, :k]
    return (
        jnp.take_along_axis(exact, order, axis=1),
        jnp.take_along_axis(cand_i, order, axis=1),
    )


__all__ = ["fused_knn"]
