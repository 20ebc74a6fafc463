"""Wave-based graph construction: the TPU-native Index::add/addBatch.

The reference inserts points one at a time under fine-grained locks
(/root/reference/include/flatnav/index/Index.h:353-378 `add`, 300-329
`addBatch` over a thread pool): each insert beam-searches the current graph,
prunes candidates with the HNSW diversity heuristic (`selectNeighbors`,
Index.h:714-763), then commits forward edges and repairs back edges
(`connectNeighbors`, Index.h:765-834).

On TPU there are no locks or per-point control flow. Construction proceeds
in *insertion waves*: a batch of W new points runs the batched beam search
against the committed prefix, a batched diversity prune picks each point's
neighbors, and edges are committed wave-synchronously:

  1. forward edges: scatter each new node's pruned neighbor list into the
     links table (self-loop padding, Index.h:269-270);
  2. back edges: all (target <- new) requests in the wave are grouped by
     target on the host (the deterministic replacement for the reference's
     per-node mutex ordering, Index.h:780-830); each unique target gets its
     existing links plus all requesters, filled into free slots if they fit
     (Index.h:783-790) or re-pruned to M with the same diversity heuristic
     if they overflow (Index.h:792-825).

Graphs built this way differ from the reference's (insertion order matters
there too: its parallel build already produces thread-interleaving-dependent
graphs). Parity is therefore recall-based, exactly like the reference's own
parallel-insert test (python-bindings/unit_tests/test_parallel_insertions.py:
recall parity between serial and parallel builds).

Wave sizes grow geometrically and are capped at a fraction of the committed
graph so that each wave's staleness (new points cannot see each other) stays
small; shapes are bucketed to powers of two to bound jit recompiles.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from flatnav_tpu.index.graph import MAX_WAVE, GraphArrays
from flatnav_tpu.index.search import beam_search
from flatnav_tpu.ops.distances import (
    MetricType,
    pairwise_distances,
    query_block_distances,
)


def _next_pow2(x: int) -> int:
    return 1 << max(0, (x - 1)).bit_length()


def select_neighbors(
    cand_dists: jax.Array,  # [W, C] ascending, +inf invalid
    cand_ids: jax.Array,  # [W, C]
    cand_vecs: jax.Array,  # [W, C, d] float32
    m: int,
    metric: MetricType,
) -> Tuple[jax.Array, jax.Array]:
    """Batched HNSW diversity pruning (Index.h:714-763 `selectNeighbors`).

    Scans candidates in ascending distance-to-query order; keeps candidate
    c_i iff fewer than `m` are kept so far and no already-kept c_j satisfies
    dist(c_j, c_i) < dist(q, c_i) (Index.h:739-748).

    Returns (kept_ids [W, m] with -1 padding, kept_count [W],
    kept_dists [W, m] — the back-edge commit orders by these).

    When the [W, C, C] pairwise matrix fits a memory budget it is
    precomputed as one MXU einsum, leaving only cheap mask updates in the
    sequential scan (the scan itself is inherently order-dependent —
    Index.h:732-756 — so only the distances batch).
    """
    w, c = cand_dists.shape
    precompute = w * c * c * 4 <= (1 << 30)
    is_int = jnp.issubdtype(cand_vecs.dtype, jnp.integer)
    # exact int32 accumulation for integer data; f32 for everything else
    cand_vecs = cand_vecs.astype(jnp.int32 if is_int else jnp.float32)

    if precompute:
        dots = jnp.einsum(
            "wid,wjd->wij",
            cand_vecs,
            cand_vecs,
            preferred_element_type=jnp.int32 if is_int else jnp.float32,
            precision=None if is_int else jax.lax.Precision.HIGHEST,
        )
        if metric == MetricType.IP:
            pair_d = 1.0 - dots.astype(jnp.float32)
        else:
            sq = jnp.sum(cand_vecs * cand_vecs, axis=-1)  # [W, C]
            pair_d = jnp.maximum(
                sq[:, :, None] - 2 * dots + sq[:, None, :], 0
            ).astype(jnp.float32)

    def col_dist(i):
        if precompute:
            return pair_d[:, :, i]
        vec_i = jnp.take(cand_vecs, i, axis=1)
        if metric == MetricType.IP:
            # HIGHEST precision like the precomputed path: near-tie prune
            # decisions must not depend on which memory path was taken
            return 1.0 - jnp.einsum(
                "wcd,wd->wc", cand_vecs, vec_i,
                preferred_element_type=jnp.int32 if is_int else jnp.float32,
                precision=None if is_int else jax.lax.Precision.HIGHEST,
            ).astype(jnp.float32)
        diff = cand_vecs - vec_i[:, None, :]
        return jnp.sum(diff * diff, axis=-1).astype(jnp.float32)

    # The scan is inherently sequential (each decision depends on all prior
    # kept candidates, Index.h:732-756), but loop ITERATIONS carry runtime
    # overhead (the tunnel taxes every device-loop step) — so process
    # UNROLL candidates per fori step (an unrolled inner python loop
    # preserves exact sequential semantics).
    UNROLL = 16
    n_steps = -(-c // UNROLL)

    def one(g, kept_mask, count):
        valid = g < c
        i = jnp.minimum(g, c - 1)
        dq_i = jax.lax.dynamic_slice_in_dim(cand_dists, i, 1, axis=1)[:, 0]
        col = col_dist(i)
        closer = jnp.logical_and(kept_mask, col < dq_i[:, None])
        ok = ~jnp.any(closer, axis=1)
        take = jnp.logical_and(
            jnp.logical_and(jnp.isfinite(dq_i), count < m), ok
        )
        take = jnp.logical_and(take, valid)
        # tail steps past c must not clobber the (already decided) column
        old = jax.lax.dynamic_slice(kept_mask, (0, i), (w, 1))[:, 0]
        new = jnp.where(valid, take, old)
        kept_mask = jax.lax.dynamic_update_slice(
            kept_mask, new[:, None], (0, i)
        )
        return kept_mask, count + take.astype(jnp.int32)

    def step(ci, state):
        kept_mask, count = state
        for off in range(UNROLL):
            kept_mask, count = one(ci * UNROLL + off, kept_mask, count)
        return kept_mask, count

    kept_mask, count = jax.lax.fori_loop(
        0,
        n_steps,
        step,
        (jnp.zeros((w, c), jnp.bool_), jnp.zeros((w,), jnp.int32)),
    )
    # Reference early-return parity (Index.h:715-717): with at most m
    # candidates, keep ALL of them unpruned — the diversity filter only
    # kicks in when there is something to choose between. This preserves
    # connectivity in low-candidate regimes (early waves, small graphs).
    valid_mask = jnp.isfinite(cand_dists)
    valid_count = jnp.sum(valid_mask, axis=1).astype(jnp.int32)
    few = valid_count <= m
    kept_mask = jnp.where(few[:, None], valid_mask, kept_mask)
    count = jnp.where(few, valid_count, count)
    # Compress kept entries to the front, preserving ascending-dist order.
    order = jnp.argsort(~kept_mask, axis=1, stable=True)  # kept first
    sorted_ids = jnp.take_along_axis(cand_ids, order, axis=1)[:, :m]
    sorted_d = jnp.take_along_axis(cand_dists, order, axis=1)[:, :m]
    if c < m:  # fewer candidate slots than the edge budget
        sorted_ids = jnp.pad(sorted_ids, ((0, 0), (0, m - c)), constant_values=-1)
        sorted_d = jnp.pad(sorted_d, ((0, 0), (0, m - c)), constant_values=jnp.inf)
    slot = jnp.arange(m, dtype=jnp.int32)[None, :]
    kept_ids = jnp.where(slot < count[:, None], sorted_ids, -1)
    kept_dists = jnp.where(slot < count[:, None], sorted_d, jnp.inf)
    return kept_ids, count, kept_dists


class WaveSelection(NamedTuple):
    kept_ids: jax.Array  # [W, m_sel], -1 padded
    kept_dists: jax.Array  # [W, m_sel], +inf padded (dist(query, kept))
    dist_computations: jax.Array
    hops: jax.Array


@functools.partial(
    jax.jit,
    static_argnames=(
        "ef_construction",
        "m_sel",
        "metric",
        "num_initializations",
        "intra_candidates",
        "expand_factor",
    ),
)
def wave_search_select(
    vectors: jax.Array,
    links: jax.Array,
    num_nodes: jax.Array,
    new_vecs: jax.Array,  # [W, d] (storage dtype)
    n_valid: jax.Array,  # scalar: real (unpadded) wave length
    *,
    ef_construction: int,
    m_sel: int,
    metric: MetricType,
    num_initializations: int = 100,
    intra_candidates: int = 0,
    expand_factor: int = 16,
) -> WaveSelection:
    """Phase 1 of a wave: beam search + diversity prune for W new points.

    Equivalent to the beamSearch(ef_construction) + selectNeighbors(M/2)
    sequence inside Index::add (Index.h:368-377; selection_M = max(M/2, 1)
    at Index.h:374).

    Intra-wave visibility: under the reference's sequential semantics every
    insert sees all earlier points; a naive wave sees only the committed
    prefix, which degrades the graph for large waves. We restore the
    sequential view TPU-style: one [W, W] MXU distance block between wave
    members provides each lane with its `intra_candidates` *exact* nearest
    earlier-lane peers (ids n0 + lane), merged into the candidate set
    before pruning. Earlier-lane masking keeps the "sees all earlier
    points" invariant and determinism; exactness means intra-wave
    candidates are at least as good as what a sequential beam search would
    have found.
    """
    # storage dtype flows through: integer data keeps the exact int32
    # distance path, floats are widened inside the kernels
    beam = beam_search(
        vectors,
        links,
        num_nodes,
        new_vecs,
        ef=ef_construction,
        metric=metric,
        num_initializations=num_initializations,
        expand_factor=expand_factor,
    )
    cand_d, cand_i = beam.dists, beam.ids

    w = new_vecs.shape[0]
    c2 = min(intra_candidates, w) if intra_candidates else 0
    if c2 > 0:
        intra = pairwise_distances(new_vecs, new_vecs, metric)  # [W, W]
        lane = jnp.arange(w, dtype=jnp.int32)
        allowed = jnp.logical_and(
            lane[None, :] < lane[:, None], lane[None, :] < n_valid
        )
        intra = jnp.where(allowed, intra, jnp.inf)
        neg_top, idx = jax.lax.top_k(-intra, c2)
        intra_d = -neg_top
        intra_ids = jnp.where(
            jnp.isfinite(intra_d), num_nodes + idx, -1
        )
        cand_d = jnp.concatenate([cand_d, intra_d], axis=1)
        cand_i = jnp.concatenate([cand_i, intra_ids], axis=1)
        cand_d, cand_i = jax.lax.sort(
            (cand_d, cand_i), dimension=1, num_keys=1, is_stable=True
        )

    safe_ids = jnp.maximum(cand_i, 0)
    cand_vecs = jnp.take(vectors, safe_ids, axis=0)  # storage dtype
    kept_ids, _, kept_d = select_neighbors(
        cand_d, cand_i, cand_vecs, m_sel, metric
    )
    return WaveSelection(kept_ids, kept_d, beam.dist_computations, beam.hops)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def commit_vectors(
    vectors: jax.Array,
    labels: jax.Array,
    num_nodes: jax.Array,
    new_vecs: jax.Array,  # [wave, d]
    new_labels: jax.Array,  # [wave]
):
    """Allocate node data (the transformData copy of allocateNode,
    Index.h:262-267) for a whole wave. Runs *before* the wave search so
    intra-wave candidate ids (n0 + lane) are gatherable from `vectors`.
    Padding-lane rows beyond n_valid are rewritten by the next wave."""
    vectors = jax.lax.dynamic_update_slice_in_dim(
        vectors, new_vecs.astype(vectors.dtype), num_nodes, axis=0
    )
    labels = jax.lax.dynamic_update_slice(labels, new_labels, (num_nodes,))
    return vectors, labels


@functools.partial(jax.jit, donate_argnums=(0,))
def commit_links(
    links: jax.Array,
    num_nodes: jax.Array,
    kept_ids: jax.Array,  # [wave, m_sel]
    n_valid: jax.Array,  # scalar: real (unpadded) wave length
):
    """Forward edges + self-loop init of allocateNode/connectNeighbors
    (Index.h:269-270, 776-779); advances the committed count."""
    m = links.shape[1]
    wave, m_sel = kept_ids.shape
    lane = jnp.arange(wave, dtype=jnp.int32)
    node_ids = num_nodes + lane
    valid_lane = lane < n_valid
    padded = jnp.pad(kept_ids, ((0, 0), (0, m - m_sel)), constant_values=-1)
    fwd = jnp.where(padded >= 0, padded, node_ids[:, None])
    fwd = jnp.where(valid_lane[:, None], fwd, node_ids[:, None])
    links = jax.lax.dynamic_update_slice_in_dim(links, fwd, num_nodes, axis=0)
    return links, num_nodes + n_valid


def _back_edge_core(
    gather_vecs,
    links: jax.Array,
    targets: jax.Array,  # [T] node ids, -1 padded (masked below)
    requesters: jax.Array,  # [T, R] new-node ids, -1 padded
    metric: MetricType,
) -> jax.Array:
    """Phase 3: back-edge insert/repair for all touched targets in a wave.

    For each target: free self-loop slots absorb requesters in closest-first
    order (Index.h:783-790); on overflow the target's links are re-pruned
    with the diversity heuristic over {existing links} + {requesters}
    (Index.h:792-825), then self-loop padded.

    `gather_vecs(ids)` returns distance-ready vectors (storage dtype for raw
    tables — the kernels widen floats / accumulate ints exactly —, decoded
    float32 for PQ) for an arbitrary-shaped id
    array — a raw-table gather for flat indexes, a gather+decode of only
    the touched rows for PQ indexes (never a full-table decode).
    """
    m = links.shape[1]
    t, r = requesters.shape
    row_valid = targets >= 0
    # Padding lanes write the dedicated scratch row (links.shape[0]-1) so a
    # duplicate-index scatter can never race a real row's update.
    scratch = jnp.int32(links.shape[0] - 1)
    safe_targets = jnp.where(row_valid, targets, scratch)

    existing = jnp.take(links, safe_targets, axis=0)  # [T, M]
    exist_valid = existing != safe_targets[:, None]
    req_valid = requesters >= 0

    cand_ids = jnp.concatenate([existing, requesters], axis=1)  # [T, M+R]
    cand_valid = jnp.concatenate([exist_valid, req_valid], axis=1)
    total = jnp.sum(cand_valid, axis=1)
    overflow = total > m

    # ---- fill path: compress valid candidates to the front --------------
    order = jnp.argsort(~cand_valid, axis=1, stable=True)
    packed = jnp.take_along_axis(cand_ids, order, axis=1)[:, :m]
    slot = jnp.arange(m, dtype=jnp.int32)[None, :]
    filled = jnp.where(slot < total[:, None], packed, safe_targets[:, None])

    # ---- prune path ------------------------------------------------------
    tgt_vecs = gather_vecs(safe_targets)
    safe_cand = jnp.where(cand_valid, cand_ids, 0)
    cand_vecs = gather_vecs(safe_cand)
    dists = query_block_distances(tgt_vecs, cand_vecs, metric)
    dists = jnp.where(cand_valid, dists, jnp.inf)
    sd, si = jax.lax.sort(
        (dists, jnp.where(cand_valid, cand_ids, -1)),
        dimension=1,
        num_keys=1,
        is_stable=True,
    )
    sv = jnp.take_along_axis(
        cand_vecs,
        jnp.argsort(dists, axis=1, stable=True)[:, :, None],
        axis=1,
    )
    kept_ids, count, _ = select_neighbors(sd, si, sv, m, metric)
    pruned = jnp.where(kept_ids >= 0, kept_ids, safe_targets[:, None])

    new_rows = jnp.where(overflow[:, None], pruned, filled)
    new_rows = jnp.where(row_valid[:, None], new_rows, existing)
    return links.at[safe_targets].set(new_rows)


@functools.partial(jax.jit, static_argnames=("metric",), donate_argnums=(1,))
def back_edge_commit(
    vectors: jax.Array,
    links: jax.Array,
    targets: jax.Array,
    requesters: jax.Array,
    *,
    metric: MetricType,
) -> jax.Array:
    """Back-edge insert/repair over a raw vector table (see
    _back_edge_core)."""
    def gather(ids):
        # storage dtype: the distance kernel and select_neighbors pick the
        # exact int32 path for integer tables, widen floats themselves
        return jnp.take(vectors, ids, axis=0)

    return _back_edge_core(gather, links, targets, requesters, metric)


# ---------------------------------------------------------------------------
# Host-side wave orchestration
# ---------------------------------------------------------------------------

#: canonical back-edge batch shapes — jit compiles are expensive on TPU, so
#: targets are processed in at most these (rows, requester-width) shapes.
#: An 8192-wave touches up to ~60k unique targets; a big T chunk keeps that
#: to a handful of device dispatches (each dispatch pays the sequential
#: prune loop + tunnel latency). Scratch at the caps:
#: cand_vecs [T, M+R, d] = 16384*64*128*4 ≈ 0.5 GB at M=32, d=128.
_BE_T_SMALL = 256
_BE_T_CHUNK = 16384
_BE_R_SMALL = 8
#: requesters kept per target per wave, CLOSEST first — a target retains at
#: most M edges after re-pruning, so 32 (= typical M) loses nothing real
_BE_R_CAP = 32


def _commit_back_edges(commit_fn, links, tgt, src_rep, dist_rep=None):
    """Group (target <- source) requests by target and apply a back-edge
    commit function (`commit_fn(links, targets, requesters) -> links`) in
    canonical shape buckets.

    Requesters beyond _BE_R_CAP per target per wave are dropped, CLOSEST
    (by dist(source, target), which selectNeighbors already computed)
    first, source id as the deterministic tie-break: a target's links can
    hold at most M entries after re-pruning, so only the closest few dozen
    candidates can survive anyway; the cap keeps the jit shape set tiny.
    """
    if dist_rep is None:
        dist_rep = np.zeros_like(src_rep, dtype=np.float32)
    order = np.lexsort((src_rep, dist_rep, tgt))  # target, then distance
    tgt, src_rep = tgt[order], src_rep[order]
    uniq, start_idx, counts = np.unique(
        tgt, return_index=True, return_counts=True
    )
    r_max = int(counts.max())
    r_bucket = _BE_R_SMALL if r_max <= _BE_R_SMALL else _BE_R_CAP
    col = np.arange(len(tgt)) - np.repeat(start_idx, counts)
    rowi = np.repeat(np.arange(len(uniq)), counts)
    keep = col < r_bucket  # cap requesters per target
    req = np.full((len(uniq), r_bucket), -1, np.int32)
    req[rowi[keep], col[keep]] = src_rep[keep]

    t_chunk = _BE_T_SMALL if len(uniq) <= _BE_T_SMALL else _BE_T_CHUNK
    for lo in range(0, len(uniq), t_chunk):
        hi = min(lo + t_chunk, len(uniq))
        tgt_arr = np.full(t_chunk, -1, np.int32)
        tgt_arr[: hi - lo] = uniq[lo:hi]
        req_arr = np.full((t_chunk, r_bucket), -1, np.int32)
        req_arr[: hi - lo] = req[lo:hi]
        links = commit_fn(links, jnp.asarray(tgt_arr), jnp.asarray(req_arr))
    return links

#: power-of-two shape buckets used to bound jit recompilation
_MIN_WAVE = 64
_MAX_WAVE = MAX_WAVE
#: tables larger than this get a per-wave host sync (see the wave loop)
_SYNC_TABLE_BYTES = 2_000_000_000


def _safe_wave_size(
    max_wave: int,
    *,
    ef_construction: int,
    m: int,
    d: int,
    expand_factor: int,
    intra_candidates: int,
    capacity: int,
    table_bytes: int,
) -> int:
    """Largest wave whose estimated device working set fits HBM.

    Build-side analog of search.safe_query_batch (the round-2 crash-guard):
    a wave's beam search materializes the same per-hop intermediates as a
    query batch of the same width (search._search_temp_bytes), plus the
    intra-wave [W, W] exact block and the [W, ef+intra, d] candidate gather
    feeding diversity pruning. At d=128 the default 8192-wave fits a 16 GB
    chip; at d=960 (GIST-class) it would need ~64 GB and kill the TPU
    worker — the guard halves the wave instead. Quality is unaffected:
    wave members get exact intra-wave candidates at any width
    (wave_search_select), so narrower waves only trade device occupancy.
    """
    from flatnav_tpu.index.search import (
        _device_mem_limit,
        _search_temp_bytes,
    )

    limit = _device_mem_limit()
    if not limit:
        return max_wave
    avail = 0.85 * (limit - table_bytes)
    em = max(min(expand_factor, ef_construction), 1) * m
    cand = ef_construction + intra_candidates

    def temp(w: int) -> int:
        # the dispatch pads every wave to a power-of-two bucket
        # (add_batch: bucket = _next_pow2(w)) — validate the PADDED width
        # or a non-pow2 max_wave runs up to ~2x the validated lanes
        w = max(_next_pow2(w), _MIN_WAVE)
        return (
            _search_temp_bytes(w, ef_construction, em, d, 0, capacity)
            + w * w * 4  # intra-wave pairwise block
            + 2 * w * cand * d * 4  # candidate-row gather + prune scratch
        )

    w = max_wave
    while w > _MIN_WAVE and temp(w) > avail:
        w //= 2
    if temp(w) > avail:
        raise ValueError(
            f"build config cannot fit device memory even at the minimum "
            f"{_MIN_WAVE}-point wave: ef_construction={ef_construction}, "
            f"expand_factor={expand_factor}, d={d} needs "
            f"~{temp(w) / 1e9:.2f} GB of wave working set against "
            f"~{avail / 1e9:.2f} GB available beside the "
            f"{table_bytes / 1e9:.2f} GB table. Reduce ef_construction or "
            f"expand_factor, or build model-sharded across chips "
            f"(add_batch(mesh=..., table_spec='model'))."
        )
    return w


def _wave_size(committed: int, remaining: int, max_wave: int) -> int:
    """Full-width waves: because wave members get EXACT intra-wave
    candidates (wave_search_select), graph quality does not depend on the
    committed/wave ratio — so every wave uses the max width. This keeps the
    jit shape count at ~1 wave bucket per build (compiles are expensive on
    TPU) and maximizes device occupancy."""
    del committed
    return int(min(max_wave, remaining))


def add_batch(
    graph: GraphArrays,
    data: np.ndarray,
    labels: np.ndarray,
    *,
    ef_construction: int,
    metric: MetricType,
    num_initializations: int = 100,
    max_wave: int = _MAX_WAVE,
    intra_candidates: int | None = None,
    stats: dict | None = None,
    mesh=None,
    table_spec: str = "replicated",
    expand_factor: int = 32,
) -> GraphArrays:
    """Insert `data` ([n, d]) with `labels` ([n]) into the index.

    Host-side analog of Index::addBatch (Index.h:300-329): orchestrates the
    wave loop; all per-point math runs on device.

    With `mesh`, waves shard over the mesh's `data` axis — the multi-chip
    analog of the reference's insert thread pool (Multithreading.h:18-48 +
    addBatch Index.h:320-328). `table_spec` picks the node-table layout:

      * "replicated" (default): the graph is replicated per chip; linear
        insert throughput while the index fits one chip's HBM.
      * "model": vectors/links/labels rows shard over the mesh's `model`
        axis (padded to divide evenly), so indexes LARGER than one chip's
        HBM can be built — XLA's SPMD partitioner distributes the wave
        ops' gathers/scatters/updates over the row shards (SURVEY.md §2.6
        TP row; reference-scale grids experiments/Makefile:8-23).

    The wave pipeline is deterministic and sharding never changes values
    (one-owner merges), so every layout produces BIT-IDENTICAL graphs to
    the single-device build (stronger than the reference's recall-level
    parity, test_parallel_insertions.py) — asserted in tests/test_sharding.
    """
    n = data.shape[0]
    cap = graph.capacity
    m = graph.max_edges
    m_sel = max(m // 2, 1)  # Index.h:374
    if intra_candidates is None:
        intra_candidates = 2 * m_sel
    max_wave = min(max_wave, _MAX_WAVE)
    max_wave = _safe_wave_size(
        max_wave,
        ef_construction=ef_construction,
        m=m,
        d=int(graph.vectors.shape[1]),
        expand_factor=expand_factor,
        intra_candidates=intra_candidates,
        capacity=cap,
        table_bytes=graph.vectors.nbytes + graph.links.nbytes,
    )
    committed = int(graph.num_nodes)
    if committed + n > cap:
        raise RuntimeError(
            "Maximum number of nodes reached. Consider increasing the "
            "`max_node_count` parameter to create a larger index."
        )  # message parity with Index.h:356-359
    if n == 0:
        return graph

    vectors, links, lab = graph.vectors, graph.links, graph.labels
    num_nodes = graph.num_nodes
    pos = 0
    data = np.ascontiguousarray(data)
    labels = np.asarray(labels, dtype=np.int32)

    if mesh is not None:
        from flatnav_tpu.parallel.sharding import (
            MODEL_AXIS,
            data_sharded,
            replicated,
            row_sharded,
        )

        rep = replicated(mesh)
        wave_sharding = data_sharded(mesh)
        if table_spec == "model":
            n_model = mesh.shape[MODEL_AXIS]

            def _pad_rows(a, self_loop: bool):
                pad = (-a.shape[0]) % n_model
                if pad == 0:
                    return a
                if self_loop:  # junk tail rows stay in the untouched state
                    tail = jnp.broadcast_to(
                        jnp.arange(
                            a.shape[0], a.shape[0] + pad, dtype=jnp.int32
                        )[:, None],
                        (pad, a.shape[1]),
                    )
                else:
                    tail = jnp.zeros((pad,) + a.shape[1:], a.dtype)
                return jnp.concatenate([a, tail], axis=0)

            table_put = row_sharded(mesh)
            vectors = jax.device_put(_pad_rows(vectors, False), table_put)
            links = jax.device_put(_pad_rows(links, True), table_put)
            lab = jax.device_put(_pad_rows(lab, False), table_put)
        else:
            vectors = jax.device_put(vectors, rep)
            links = jax.device_put(links, rep)
            lab = jax.device_put(lab, rep)
        num_nodes = jax.device_put(num_nodes, rep)
    else:
        wave_sharding = None

    # Bootstrap: the very first node gets no edges (Index.h:369-371:
    # new_node_id == 0 returns right after allocation).
    if committed == 0:
        first_vec = jnp.asarray(data[:1]).astype(vectors.dtype)
        vectors = jax.lax.dynamic_update_slice_in_dim(vectors, first_vec, 0, axis=0)
        lab = lab.at[0].set(int(labels[0]))
        num_nodes = jnp.asarray(1, jnp.int32)
        committed = 1
        pos = 1

    bucket_used = 0
    while pos < n:
        w = _wave_size(committed, n - pos, max_wave)
        bucket = max(_next_pow2(w), _MIN_WAVE)
        # reuse the widest already-compiled wave shape for the tail wave:
        # padded lanes are masked out by n_valid, and one avoided compile
        # chain (~1 min on the remote TPU) beats the padded compute
        bucket = max(bucket, bucket_used)
        bucket_used = bucket
        wave_data = data[pos : pos + w]
        wave_labels = labels[pos : pos + w]
        if w < bucket:  # pad lanes with the first row; masked out by n_valid
            pad = bucket - w
            wave_data = np.concatenate([wave_data, np.repeat(wave_data[:1], pad, 0)])
            wave_labels = np.concatenate([wave_labels, np.zeros(pad, np.int32)])

        new_vecs = (
            jax.device_put(wave_data, wave_sharding)
            if wave_sharding is not None
            else jnp.asarray(wave_data)
        )
        n_valid = jnp.asarray(w, jnp.int32)
        vectors, lab = commit_vectors(
            vectors, lab, num_nodes, new_vecs, jnp.asarray(wave_labels)
        )
        sel = wave_search_select(
            vectors,
            links,
            num_nodes,
            new_vecs,
            n_valid,
            ef_construction=ef_construction,
            m_sel=m_sel,
            metric=metric,
            num_initializations=num_initializations,
            intra_candidates=intra_candidates,
            expand_factor=expand_factor,
        )
        if stats is not None:
            stats["distance_computations"] = stats.get(
                "distance_computations", 0
            ) + int(sel.dist_computations)
            stats["hops"] = stats.get("hops", 0) + int(sel.hops)

        links, num_nodes = commit_links(
            links, num_nodes, sel.kept_ids, n_valid
        )

        # ---- back edges (host grouping, device compute) ------------------
        kept = np.asarray(sel.kept_ids[:w])  # [w, m_sel]
        kept_d = np.asarray(sel.kept_dists[:w])  # dist(src, tgt)
        src = committed + np.arange(w, dtype=np.int32)
        tgt = kept.reshape(-1)
        src_rep = np.repeat(src, m_sel)
        dist_rep = kept_d.reshape(-1)
        sel_mask = tgt >= 0
        tgt, src_rep = tgt[sel_mask], src_rep[sel_mask]
        dist_rep = dist_rep[sel_mask]
        if tgt.size:
            def commit(links_, t_, r_, _v=vectors):
                return back_edge_commit(_v, links_, t_, r_, metric=metric)

            links = _commit_back_edges(commit, links, tgt, src_rep, dist_rep)

        # Large tables: retire this wave's dispatches before the next wave
        # queues. The async pipeline otherwise keeps back_edge_commit(k),
        # commit_vectors(k+1) and the k+1 search in flight together — at
        # d=960/1M that is ~3 live table copies (~11.5 GB) plus search
        # temps, which RESOURCE_EXHAUSTs the ~15 GB usable HBM (measured
        # round 4: the 1M x 960 build OOMs at ANY wave width without this,
        # and runs at wave 256 with it). One tiny readback per wave
        # (block_until_ready does not reliably block on tunneled
        # backends); sub-2 GB tables keep the fully-async pipeline. The
        # mesh path pipelines the same working set per DEVICE (the table
        # is row-sharded), so its threshold scales by the mesh size
        # (advisor r04).
        per_device_bytes = vectors.nbytes // (1 if mesh is None
                                              else max(1, mesh.size))
        if per_device_bytes > _SYNC_TABLE_BYTES:
            np.asarray(links[:1, :1])

        committed += w
        pos += w

    return GraphArrays(vectors, links, lab, num_nodes, graph.capacity)
