"""Cluster-routed pruned scan (EXPERIMENTAL — measured negative result).

The fast two-phase scan (ops.fast_knn) is selection-bound, not
matmul-bound (measured: tools/profile_scan_bound.py — approx_min_k over
the full table ~= the whole engine, >> the bf16 matmul), so the only way
past it is to scan FEWER ELEMENTS. This module is the honest attempt —
IVF-style block routing re-shaped for the MXU — and the measurement of
why it LOSES on this workload family (tools/profile_routed_scan.py,
docs/benchmarking.md "Why pruned scans lose on TPU here"):

  * routing ceiling: on clustered-100k x 128 (the headline workload)
    the fraction of true neighbors whose block is among a query's top-P
    routed blocks is 0.86 at a 25% scan fraction — below the 0.95
    target before any engine loss is added. On the calibrated c26
    variant the ceiling is fine (0.96 at 16%), but
  * union capture: scanning per-GROUP block unions (the only shape that
    keeps the scan a dense [G, d] x [d, U*block] MXU matmul) captures
    only ~50% of each query's probe list — queries' secondary probes
    are query-specific, so a group of 128 queries votes for ~all blocks
    (191 of 196 measured). Per-QUERY pruned gathers would fix coverage
    but degrade the matmul to batch-1 GEMVs (VPU-bound) plus per-row
    gathers (DMA-issue-bound, ~150 ns/row, tools/profile_score.py).

This replicates the TPU-KNN paper's core finding (arXiv:2206.14286):
at HBM-resident scale the dense full scan at peak FLOP/s IS the right
TPU design, and pruned/inverted-file methods do not map. The module
stays as the working artifact behind that recorded boundary; the
engines that carry the headline remain fast_knn (HBM-resident) and the
PQ-ADC scan (beyond-HBM).

Design (all shapes static; hot ops are dense MXU contractions or
contiguous-slice DMAs — no per-row gathers):

  build (offline, once per table):
    1. k-means centroids on a sample (quantization/kmeans.py — the same
       trainer the PQ layer uses), one centroid per `block` rows;
    2. BALANCED assignment: every row goes to its nearest centroid with
       spare capacity (capacity = block; overfull cells evict their
       farthest members to the next-nearest cell). Each cell then IS one
       fixed-size block — routing granularity equals layout granularity,
       which measured ~2x better neighbor-block coverage than cutting an
       unbalanced sort into fixed blocks;
    3. lay cells out contiguously (the routed analog of the reference's
       cache-locality reordering, util/Reordering.h:26-117), padding
       each to exactly `block` rows (pad slots carry id -1 and are
       masked at query time).

  search (jit, static shapes):
    1. route: [B, nb] query->block-centroid distances (one MXU matmul)
       -> top-`probes` blocks per query;
    2. group queries by their primary block (one argsort) so neighbors
       in routing space are batch neighbors too;
    3. per group of `group_size` queries: vote a UNION of `union_blocks`
       blocks, slice them out of the sorted table (contiguous DMA), and
       scan the union EXACTLY in f32 ([G, d] x [d, U*block] on the MXU).

  Like fast_knn, distances returned are exact f32; the only
  approximation is which blocks get scanned. Recall is workload-shaped:
  on clustered data (the regime the 0.95-recall north star is defined
  on) a group's queries share almost all their hot blocks; on uniform
  data the union saturates and recall drops — callers must measure
  recall and qualify the engine at their target, exactly as bench.py
  does for the fast engine.

There is no counterpart in the reference (its only scan is the
initializeSearch strided sample, Index.h:845-870); this explored — and
measured the boundary of — TPU-native headroom past the fast scan.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from flatnav_tpu.ops.distances import (
    MetricType,
    _as_f32,
    pairwise_distances,
)


class RoutedScan(NamedTuple):
    """Cluster-sorted table + block summaries (built once, searched many).

    vectors:   [nb*block, d] table rows laid out cell-by-cell (original
               dtype; each cell padded to exactly ``block`` rows)
    ids:       [nb*block] int32 original row index per slot, -1 on pads
    block_centroids: [nb, d] float32 mean of each cell's real members
    n:         committed (real) rows
    block:     rows per block/cell
    metric:    distance metric the router and scanner use
    """

    vectors: jax.Array
    ids: jax.Array
    block_centroids: jax.Array
    n: int
    block: int
    metric: MetricType


def _balanced_assign(
    cand_ids: np.ndarray, cand_d: np.ndarray, nb: int, cap: int
) -> np.ndarray:
    """Capacity-constrained nearest-cell assignment (host, offline).

    cand_ids/cand_d: [n, T] each row's T nearest cells, ascending.
    Greedy in ascending best-distance order (rows that NEED their top
    cell most claim it first); a full cell falls through to the row's
    next candidate; rows whose whole candidate list is full go to the
    emptiest cell (rare — only under extreme imbalance).
    """
    n = cand_ids.shape[0]
    counts = np.zeros(nb, np.int64)
    assign = np.full(n, -1, np.int64)
    for i in np.argsort(cand_d[:, 0], kind="stable"):
        for c in cand_ids[i]:
            if counts[c] < cap:
                assign[i] = c
                counts[c] += 1
                break
        else:
            c = int(np.argmin(counts))
            assign[i] = c
            counts[c] += 1
    return assign


def build_routed_scan(
    vectors: np.ndarray | jax.Array,
    metric: MetricType = MetricType.L2,
    block: int = 2048,
    train_sample: int = 131072,
    n_iters: int = 20,
    seed: int = 0,
) -> RoutedScan:
    """One-time routing build: k-means -> balanced cells -> block layout.

    Keeps a second (cell-ordered) copy of the table: same cost as the
    fast engine's bf16 shadow copy at f32 tables, and the price of
    turning per-row gathers into contiguous block slices.
    """
    from flatnav_tpu.quantization.kmeans import kmeans

    vectors = np.asarray(vectors)
    n, d = vectors.shape
    block = int(max(128, min(block, n)))
    nb = max(1, -(-n // block))

    rng = np.random.default_rng(seed)
    if n > train_sample:
        sample = vectors[rng.choice(n, train_sample, replace=False)]
    else:
        sample = vectors
    cents, _ = kmeans(
        np.asarray(sample, np.float32), nb, n_iters=n_iters, seed=seed
    )

    # each row's T nearest cells, computed on device in tiles
    t_cand = min(nb, 8)
    tile = 16384
    dev_vecs = jnp.asarray(vectors)
    cand_ids, cand_d = [], []
    for lo in range(0, n, tile):
        dists = pairwise_distances(
            _as_f32(dev_vecs[lo : lo + tile]), cents, metric
        )
        neg_top, idx = jax.lax.top_k(-dists, t_cand)
        cand_ids.append(np.asarray(idx))
        cand_d.append(np.asarray(-neg_top))
    assign = _balanced_assign(
        np.concatenate(cand_ids), np.concatenate(cand_d), nb, block
    )

    # lay cells out contiguously, each padded to exactly `block` rows;
    # pad slots get id -1 (masked at query time) and repeat the cell's
    # first real row so the matmul stays dense and finite
    slot_ids = np.full(nb * block, -1, np.int64)
    order = np.argsort(assign, kind="stable")
    counts = np.bincount(assign, minlength=nb)
    starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    offsets = np.arange(n) - starts[assign[order]]
    slot_ids[assign[order] * block + offsets] = order
    # pad slots repeat a real row from their own cell (any one works —
    # they are masked at query time); empty cells fall back to row 0
    first_real = np.maximum(slot_ids.reshape(nb, block).max(axis=1), 0)
    row_src = np.where(
        slot_ids >= 0, np.maximum(slot_ids, 0),
        np.repeat(first_real, block),
    )
    layout = vectors[row_src]

    real = (slot_ids >= 0).reshape(nb, block)
    sums = np.where(
        real[:, :, None], np.asarray(layout, np.float32).reshape(
            nb, block, d),
        0.0,
    ).sum(axis=1)
    denom = np.maximum(real.sum(axis=1, keepdims=True), 1)
    block_cents = sums / denom

    return RoutedScan(
        vectors=jnp.asarray(layout),
        ids=jnp.asarray(slot_ids.astype(np.int32)),
        block_centroids=jnp.asarray(block_cents.astype(np.float32)),
        n=n,
        block=block,
        metric=metric,
    )


def routed_knn(
    rs: RoutedScan,
    queries: jax.Array,
    k: int,
    probes: int = 8,
    union_blocks: int = 32,
    group_size: int = 256,
) -> Tuple[jax.Array, jax.Array]:
    """Pruned exact-over-union kNN. Returns (dists [B, k], ids [B, k]),
    distances ascending and exact f32 (ties in block-layout order); only
    block SELECTION is approximate.

    probes:       blocks each query votes for (weighted by routing rank)
    union_blocks: blocks scanned per query group (the work knob:
                  fraction scanned ~= union_blocks * block / n)
    group_size:   queries per union (bigger amortizes the slice DMA,
                  smaller keeps unions tight)
    """
    nb = rs.block_centroids.shape[0]
    probes = min(probes, nb)
    union = min(union_blocks, nb)
    b_in, d = queries.shape
    group = max(8, min(group_size, b_in))

    # pad the query batch to a whole number of groups
    n_groups = -(-b_in // group)
    b_pad = n_groups * group
    if b_pad != b_in:
        queries = jnp.concatenate(
            [queries, jnp.broadcast_to(queries[:1],
                                       (b_pad - b_in, d))], axis=0
        )

    return _routed_knn_jit(
        rs.vectors, rs.ids, rs.block_centroids, queries,
        k=k, metric=rs.metric, block=rs.block, probes=probes,
        union=union, group=group, b_in=b_in,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "block", "probes", "union", "group", "b_in"
    ),
)
def _routed_knn_jit(
    vectors, ids, block_cents, queries,
    *, k, metric, block, probes, union, group, b_in,
):
    b_pad, d = queries.shape
    nb = block_cents.shape[0]
    n_groups = b_pad // group

    # 1. route every query against every block centroid (one MXU matmul;
    #    [B, nb] is tiny next to the table)
    route_d = pairwise_distances(_as_f32(queries), block_cents, metric)
    _, top_blocks = jax.lax.top_k(-route_d, probes)  # [B, P]

    # 2. sort queries by primary block so a group's unions stay tight
    order = jnp.argsort(top_blocks[:, 0], stable=True).astype(jnp.int32)
    inv = jnp.argsort(order, stable=True).astype(jnp.int32)
    q_sorted = jnp.take(queries, order, axis=0)
    tb_sorted = jnp.take(top_blocks, order, axis=0)
    # batch-padding copies of queries[0] must not vote: they would crowd
    # real queries' blocks out of the union
    vq_sorted = jnp.take(
        (jnp.arange(b_pad) < b_in).astype(jnp.float32), order
    )

    q_groups = q_sorted.reshape(n_groups, group, d)
    tb_groups = tb_sorted.reshape(n_groups, group, probes)
    vq_groups = vq_sorted.reshape(n_groups, group)

    # rank-weighted votes: a query's primary block outvotes `probes`
    # secondary picks, so primaries are evicted last under union pressure
    vote_w = (probes - jnp.arange(probes)).astype(jnp.float32)
    vote_w = vote_w.at[0].set(float(probes * probes))

    def scan_group(carry, inp):
        q_g, tb_g, vq_g = inp  # [group, d], [group, P], [group]
        votes = jnp.zeros((nb,), jnp.float32).at[tb_g.reshape(-1)].add(
            (vote_w[None, :] * vq_g[:, None]).reshape(-1)
        )
        _, keep = jax.lax.top_k(votes, union)  # [U] block ids

        # contiguous block slices (vmapped dynamic_slice = U sequential
        # DMAs of block*d elements — bandwidth-bound, not issue-bound)
        rows = jax.vmap(
            lambda blk: jax.lax.dynamic_slice_in_dim(
                vectors, blk * block, block, axis=0
            )
        )(keep)  # [U, block, d]
        flat_pos = (
            keep[:, None] * block
            + jax.lax.broadcasted_iota(jnp.int32, (union, block), 1)
        ).reshape(-1)  # layout positions [U*block]
        slot_ids = jnp.take(ids, flat_pos)  # -1 on pad slots

        dists = pairwise_distances(
            q_g, rows.reshape(union * block, d), metric
        )  # exact f32 [group, U*block]
        dists = jnp.where((slot_ids >= 0)[None, :], dists, jnp.inf)
        neg_k, pos = jax.lax.top_k(-dists, k)
        ids_k = jnp.take(slot_ids, pos.reshape(-1)).reshape(group, k)
        return carry, (-neg_k, ids_k)

    _, (d_k, i_k) = jax.lax.scan(
        scan_group, None, (q_groups, tb_groups, vq_groups)
    )
    d_k = d_k.reshape(b_pad, k)
    i_k = i_k.reshape(b_pad, k)

    # unsort and drop padding; top_k already returns distances ascending
    # (ties in block-layout order)
    return (
        jnp.take(d_k, inv, axis=0)[:b_in],
        jnp.take(i_k, inv, axis=0)[:b_in],
    )
