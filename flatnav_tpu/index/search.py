"""Batched greedy beam search over the flat navigable-small-world graph.

This is the TPU-native re-design of the reference's query engine
(/root/reference/include/flatnav/index/Index.h): one jit-compiled program
advances a whole batch of queries in lockstep through the graph instead of
one CPU thread chasing pointers per query.

Mapping from the reference:

  * `beamSearch` + `processCandidateNode` (Index.h:606-707): the two heaps
    (bounded max-heap `neighbors`, unbounded min-heap `candidates`) are
    merged into one fixed-size sorted *beam* of (distance, id, expanded)
    triples per query. Each hop expands the best unexpanded beam entry,
    gathers its M neighbor rows, evaluates distances for unvisited ones, and
    merges them back with a key-value sort + truncate (the top-k analog of
    heap eviction at Index.h:693-704). This "expand best unexpanded in the
    top-ef frontier" formulation is the standard batched/array variant of
    HNSW beam search; the only semantic difference is that a candidate
    evicted from the top-ef frontier is never expanded, which the reference
    could do — acceptance is recall-based, mirroring how the reference
    itself validates parallel inserts (test_parallel_insertions.py).

  * Termination: the reference breaks when the best candidate is worse than
    the worst of a full result heap (Index.h:630-632). In the merged-beam
    form that condition is subsumed: a query is done exactly when its beam
    holds no unexpanded entry. The batch finishes when all queries are done
    (`lax.while_loop` predicate), matching the reference's per-thread loop.

  * VisitedSet (util/VisitedSetPool.h): the pool abstraction disappears —
    per-batch dedup state lives inside the jit program. Two selectable
    implementations (VISITED_IMPL): the default scatter-free "history"
    dedup (beam + expanded-history membership; N-independent memory) and
    the reference-faithful bit-packed "bitmask" table whose mark step is
    an exact bitwise OR expressed as scatter-add.

  * `initializeSearch` (Index.h:845-870): the strided entry-point scan is a
    single [B, num_init] distance block + argmin. (When 0 < num_nodes mod
    step, the reference scans up to num_init+1 points; we scan exactly
    num_init — an off-by-one the recall tests are insensitive to.)

  * Stats: `_distance_computations` / `_metric_hops` atomics
    (Index.h:83-84, 689-691, 857-859) become jit-carried scalar counters
    returned with the results.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from flatnav_tpu.ops.distances import (
    MetricType,
    pairwise_distances,
    query_block_distances,
)


class BeamResults(NamedTuple):
    dists: jax.Array  # [B, ef] ascending, +inf padding
    ids: jax.Array  # [B, ef] node ids (meaningless where dist == +inf)
    dist_computations: jax.Array  # scalar int32 counter; sums over the
    # whole dispatch, so one dispatch is bounded to ~2.1e9 evals before
    # wrap (B=4096 at ef=2048 on 10M is ~2.7e8 — an order of margin).
    # int64 needs jax_enable_x64, which would widen every index array.
    hops: jax.Array  # scalar: total expansion steps across the batch


class SearchResults(NamedTuple):
    dists: jax.Array  # [B, K]
    labels: jax.Array  # [B, K]
    dist_computations: jax.Array
    hops: jax.Array


#: beam-merge implementation (all produce bit-identical beams):
#:   "gather" — rank-compare + take_along_axis; no scatters, no full sort
#:   "sort"   — full-width stable lax.sort (bitonic network)
#:   "binary" — ranks + scatter (AVOID on TPU: dynamic-index scatters
#:              serialize; measured 7-30x slower end-to-end)
#: Module-level so benchmarks can A/B the lowerings.
MERGE_IMPL = "gather"

#: visited-set implementation:
#:   "history" — scatter-free exact dedup: candidates are rejected if they
#:     are in the current beam or in the expanded-id history (an
#:     append-only buffer written with contiguous dynamic_update_slice).
#:     Nodes that were evaluated, never entered or were evicted from the
#:     beam unexpanded CAN be re-evaluated (distances are nearly free on
#:     TPU — the gather+distance is ~1% of a hop); duplicates in the beam
#:     and re-expansions remain impossible, so termination and results
#:     are unaffected. The distance_computations counter therefore counts
#:     slightly MORE than the reference's (which never re-evaluates,
#:     VisitedSetPool.h) — a documented deviation.
#:   "bitmask" — the reference-faithful bit-packed visited table; its
#:     per-hop scatter-add serializes on TPU (measured ~half the hop).
VISITED_IMPL = "history"

#: hop-loop implementation:
#:   "while" — lax.while_loop with early exit when every query's beam is
#:     fully expanded (fewest iterations).
#:   "scan"  — lax.scan over exactly hop_cap iterations; done queries
#:     no-op (the body is idempotent once a beam is fully expanded). On
#:     some runtimes scan's static trip count executes several times
#:     cheaper per iteration than while_loop; combined with a tight
#:     max_hops it can win despite running the full cap.
#:   "unroll" — the scan semantics with the loop construct removed: the
#:     hop body is inlined hop_cap times into one straight-line XLA
#:     program. No loop construct means no per-iteration executor
#:     overhead (on runtimes that step loop iterations through the host
#:     this is the difference between 1 and hop_cap dispatches) and XLA
#:     may fuse across hop boundaries. Costs compile time ~ hop_cap.
LOOP_IMPL = "while"

#: membership/dedup lowering (results are BIT-IDENTICAL; only op counts
#: differ — tests/test_search_extras.py asserts the equality):
#:   "compare" — broadcast-compare forms: O(B*EM*ef), O(B*EM*hist) and
#:     O(B*EM^2) VPU ops per hop. Tens of G-ops at E=64 — and still 13x
#:     FASTER per hop than "bsearch" on v5e (151 vs 1936 ms/hop measured
#:     at B=4096/E=64/ef=128): dense elementwise compares are what the
#:     VPU is for, while bsearch's log-width take_along_axis probes are
#:     per-element gathers, the single slowest primitive on TPU.
#:   "bsearch" — sorted structures + branchless binary search: fewer ops
#:     on paper (O(B*EM*log) membership, O(B*EM*logEM) dedup), the right
#:     lowering on CPU meshes and for very large E*M*hist products where
#:     the compare forms' O(n^2) finally bites.
MEMBERSHIP_IMPL = "compare"

#: entry-scan ("initializeSearch", Index.h:845-870) lowering:
#:   "direct" — score_block over per-query broadcast candidate ids: the
#:     generic path every distance backend supports (PQ-ADC, sharded).
#:     For the raw-vector backend it gathers [B, NI, d].
#:   "matmul" — raw-vector backend only: gather the NI strided rows ONCE
#:     ([NI, d]) and compute all B x NI entry distances as one MXU
#:     contraction (pairwise_distances). O(B*NI) gather bytes drop to
#:     O(NI); the scan cost becomes nearly free, making num_initializations
#:     a cheap recall knob (a 4096-wide entry scan seeds the beam close to
#:     the target and cuts hop count). fp rounding differs from "direct"
#:     (matmul vs diff-square accumulation), so results are not bit-equal
#:     across the two lowerings — recall is equivalent.
ENTRY_IMPL = "matmul"

#: hop scoring lowering for the raw-vector backend:
#:   "take"   — jnp.take gather + query_block_distances: XLA materializes
#:     the gathered [B, E*M, d] block through HBM (written by the gather,
#:     read back by the distance), paying the gather bytes twice.
#:   "pallas" — the fused gather+distance kernel
#:     (ops/gather_distance.py): candidate rows stream HBM -> VMEM via
#:     double-buffered row DMAs and reduce to distances on-chip — half the
#:     HBM traffic, O(tile) scratch. float tables only (int tables keep
#:     the exact int32 path); falls back to "take" off-TPU.
SCORE_IMPL = "take"

# plain Python int, NOT jnp.int32(...): a module-level device array would
# initialize the JAX backend at import time, locking the platform before
# callers can override it (jax.config.update("jax_platforms", ...))
_INT_SENTINEL = 2**31 - 1


# ---------------------------------------------------------------------------
# Device-memory guard (round-2 finding: graph search at ef=2048/B=4096 on a
# 10M-row index reproducibly kernel-faulted the TPU worker — the hop body's
# working set scales with B * ef * min(E*M, ef) through the merge network
# plus B * C * d through the gathered score rows, and past HBM the runtime
# dies instead of raising). batched_search estimates the working set at
# trace time from static shapes and transparently CHUNKS the query batch
# (queries are independent — results are bit-identical); if even one query
# cannot fit, it raises a Python ValueError before any kernel launches.
#
# Calibration against the observed envelope (v5e 16 GB): the round-2
# fault at 10M/ef=2048/B=4096/E=64 and the round-3 fault at
# 1M/ef=2048/B=4096/E=16 (~19.5 GB under 4-byte merge accounting) both
# land over the ~11-13 GB usable; the 0.95-recall operating points
# (ef<=384) stay far under it and are never chunked. The accounting is
# deliberately conservative for huge-ef shapes — whether XLA keeps the
# merge compare as bool or materializes a 4-byte form varies per compile,
# and the failure mode is a worker kill, not an error. Override with
# FLATNAV_TPU_MEM_LIMIT=<bytes> (0 disables the guard and chunking).
# ---------------------------------------------------------------------------


#: assumed HBM when a real TPU reports no memory stats (v5e = 16 GiB).
#: The axon tunnel's PJRT client returns memory_stats() = None — round 3's
#: GIST build died on a 32 GB wave gather because the guard silently
#: disabled itself here. A conservative default keeps the guard live;
#: override with FLATNAV_TPU_MEM_LIMIT on larger chips.
_TPU_DEFAULT_HBM = 16 * 1024**3


def _device_mem_limit() -> int | None:
    env = os.environ.get("FLATNAV_TPU_MEM_LIMIT")
    if env is not None:
        v = int(float(env))
        return v if v > 0 else None
    try:
        dev = jax.local_devices()[0]
        if dev.platform != "tpu":
            return None  # host backends page; kernel faults are TPU-only
        stats = dev.memory_stats()
        if not stats:
            return _TPU_DEFAULT_HBM
        return int(stats.get("bytes_limit", 0)) or _TPU_DEFAULT_HBM
    except Exception:
        return None


def _search_temp_bytes(
    b: int, ef: int, em: int, d: int, compact_width: int, table_rows: int,
    hist_width: int = 0, hist_width_default: int = 0,
) -> int:
    """Estimated bytes of materialized per-hop intermediates for a B-query
    dispatch (sum of the terms XLA demonstrably does NOT fuse away).

    hist_width: expanded-id history width (hop_cap * expand_factor);
    hist_width_default: the width the config would have at max_hops=0 —
    the membership-compare term charges only growth PAST it, keeping the
    default-config accounting exactly as empirically calibrated."""
    c = compact_width if (compact_width and compact_width < em) else em
    default_hist = hist_width_default if hist_width_default else 2 * ef + 128
    hw = hist_width if hist_width else default_hist
    score = 2 * b * c * d * 4  # gathered rows + distance intermediate (f32)
    # merge-network [B, ef, c] broadcast: counted at 4 bytes/element, not
    # bool — whether XLA keeps the bool compare or materializes an
    # int32/f32 form is compile-dependent (round 3: a fresh compile of
    # 1M/ef=2048/B=4096/E=16 kernel-faulted twice at a ~6.6 GB 1-byte
    # estimate while the previous day's cached executable of the same
    # shape ran; 4-byte accounting puts it at ~19.5 GB, over the limit)
    merge = b * ef * min(c, ef) * 4
    hist = b * hw * 4  # expanded-id history
    # the per-hop [B, c, hist] membership compare grows with a
    # non-default hop cap; only the EXCESS is charged so the accounting
    # stays exactly as empirically calibrated at the default width
    member_excess = b * c * max(hw - default_hist, 0) * 4
    vis = (
        b * (-(-table_rows // 32)) * 4 if VISITED_IMPL == "bitmask" else 0
    )
    sorts = 3 * b * (ef + c) * 4  # sort triples (dist, id, flag)
    return score + merge + hist + member_excess + vis + sorts


def safe_query_batch(
    b: int,
    ef: int,
    *,
    m: int,
    d: int,
    expand_factor: int = 1,
    compact_width: int = 0,
    table_rows: int = 0,
    table_bytes: int = 0,
    max_hops: int = 0,
) -> int:
    """Largest per-dispatch query sub-batch whose estimated working set
    fits the device; returns `b` unchanged when no limit is known (host
    backends). Raises ValueError when even a single query cannot fit —
    the Python-side error the TPU runtime does not give us."""
    limit = _device_mem_limit()
    if not limit:
        return b
    avail = 0.85 * (limit - table_bytes)
    e_f = max(min(expand_factor, ef), 1)
    em = e_f * m
    # history width tracks the caller's hop cap (beam_search:425) — a
    # large explicit max_hops grows the visited history and its per-hop
    # membership compare, which the guard must account for
    default_cap = max((2 * ef + 128) // e_f, 16)
    hop_cap = max_hops if max_hops else default_cap
    hw, hw0 = hop_cap * e_f, default_cap * e_f
    sub = b
    while sub > 1 and _search_temp_bytes(
        sub, ef, em, d, compact_width, table_rows, hw, hw0
    ) > avail:
        sub //= 2
    if _search_temp_bytes(
        sub, ef, em, d, compact_width, table_rows, hw, hw0
    ) > avail:
        need = _search_temp_bytes(
            1, ef, em, d, compact_width, table_rows, hw, hw0
        )
        raise ValueError(
            f"search config cannot fit device memory even at batch=1: "
            f"ef={ef}, expand_factor={expand_factor} (E*M={em}), d={d} "
            f"needs ~{need/1e9:.2f} GB of hop working set per query "
            f"against ~{avail/1e9:.2f} GB available beside the "
            f"{table_bytes/1e9:.2f} GB table. Reduce ef or "
            f"expand_factor, set compact_width, or shard the table "
            f"across chips (parallel.sharded_graph)."
        )
    return sub


def _first_occurrence(ids: jax.Array) -> jax.Array:
    """Mask of the first occurrence of each value per row ([B, C] -> bool).

    Sort-based: duplicates become adjacent in id order; the mask is mapped
    back through the inverse permutation. Any single survivor per id is
    equivalent downstream (same id => same distance), so this is
    result-identical to the O(C^2) pairwise form.
    """
    order = jnp.argsort(ids, axis=1, stable=True)
    sorted_ids = jnp.take_along_axis(ids, order, axis=1)
    first = jnp.concatenate(
        [
            jnp.ones(ids.shape[:1] + (1,), jnp.bool_),
            sorted_ids[:, 1:] != sorted_ids[:, :-1],
        ],
        axis=1,
    )
    inv = jnp.argsort(order, axis=1, stable=True)
    return jnp.take_along_axis(first, inv, axis=1)


def _sorted_member(sorted_tab: jax.Array, x: jax.Array) -> jax.Array:
    """Row-wise membership of x [B, C] in sorted_tab [B, W] (ascending,
    _INT_SENTINEL-padded), via branchless offset-doubling lower_bound:
    log2(W) take_along_axis gathers instead of a [B, C, W] compare."""
    w = sorted_tab.shape[1]
    pos = jnp.zeros(x.shape, jnp.int32)
    s = 1 << max(0, (w - 1)).bit_length()
    while s:
        nxt = pos + s
        idx = jnp.minimum(nxt, w) - 1
        v = jnp.take_along_axis(sorted_tab, idx, axis=1)
        pos = jnp.where(jnp.logical_and(nxt <= w, v < x), nxt, pos)
        s >>= 1
    v = jnp.take_along_axis(
        sorted_tab, jnp.minimum(pos, w - 1), axis=1
    )
    return jnp.logical_and(pos < w, v == x)


def _merge_sorted(beam, new, ef: int):
    """Merge the sorted beam [B, ef] with sorted new entries [B, M] into a
    sorted [B, ef] beam — the top-k eviction of Index.h:693-704.

    All implementations are bit-identical; tie order matches a stable sort
    with beam entries first. Merge ranks are unique by the merge-path
    argument. See MERGE_IMPL for the tradeoffs per lowering.
    """
    (beam_d, beam_i, beam_e) = beam
    (new_d, new_i, new_e) = new
    b, m = new_d.shape
    if MERGE_IMPL == "sort":
        all_d = jnp.concatenate([beam_d, new_d], axis=1)
        all_i = jnp.concatenate([beam_i, new_i], axis=1)
        all_e = jnp.concatenate([beam_e, new_e], axis=1)
        sd, si, se = jax.lax.sort(
            (all_d, all_i, all_e), dimension=1, num_keys=1, is_stable=True
        )
        return sd[:, :ef], si[:, :ef], se[:, :ef]

    if MERGE_IMPL == "gather":
        # merged rank of new[j] = j + #{beam <= new[j]} (beam-first ties);
        # ranks are unique by the merge-path argument. For each output slot
        # k < ef: j_count = #{new ranks < k} new elements precede it; the
        # slot holds new[j_count] if some new rank == k, else
        # beam[k - j_count]. Pure compare+gather — no scatters (TPU
        # scatters with dynamic indices serialize), no full-width sort.
        rank_new = jnp.arange(m, dtype=jnp.int32)[None, :] + jnp.sum(
            beam_d[:, None, :] <= new_d[:, :, None], axis=2, dtype=jnp.int32
        )  # [B, M]
        k = jnp.arange(ef, dtype=jnp.int32)[None, :, None]  # [1, ef, 1]
        below = rank_new[:, None, :] < k  # [B, ef, M]
        j_count = jnp.sum(below, axis=2, dtype=jnp.int32)  # [B, ef]
        take_new = jnp.any(rank_new[:, None, :] == k, axis=2)  # [B, ef]
        i_idx = jnp.clip(
            jnp.arange(ef, dtype=jnp.int32)[None, :] - j_count, 0, ef - 1
        )
        j_idx = jnp.clip(j_count, 0, m - 1)

        def pick(new_a, beam_a):
            return jnp.where(
                take_new,
                jnp.take_along_axis(new_a, j_idx, axis=1),
                jnp.take_along_axis(beam_a, i_idx, axis=1),
            )

        return pick(new_d, beam_d), pick(new_i, beam_i), pick(new_e, beam_e)

    rowix = jnp.arange(b, dtype=jnp.int32)[:, None]
    # merge ranks via broadcast-compare + sum — fully vectorized on the VPU
    # (jnp.searchsorted's default 'scan' lowering is a sequential binary
    # search: measured 30x slower end-to-end inside the hop loop on TPU)
    pos_beam = jnp.arange(ef, dtype=jnp.int32)[None, :] + jnp.sum(
        new_d[:, None, :] < beam_d[:, :, None], axis=2, dtype=jnp.int32
    )
    pos_new = jnp.arange(m, dtype=jnp.int32)[None, :] + jnp.sum(
        beam_d[:, None, :] <= new_d[:, :, None], axis=2, dtype=jnp.int32
    )
    total = ef + m
    out_d = jnp.full((b, total), jnp.inf, beam_d.dtype)
    out_i = jnp.zeros((b, total), beam_i.dtype)
    out_e = jnp.ones((b, total), jnp.bool_)
    out_d = out_d.at[rowix, pos_beam].set(beam_d).at[rowix, pos_new].set(new_d)
    out_i = out_i.at[rowix, pos_beam].set(beam_i).at[rowix, pos_new].set(new_i)
    out_e = out_e.at[rowix, pos_beam].set(beam_e).at[rowix, pos_new].set(new_e)
    return out_d[:, :ef], out_i[:, :ef], out_e[:, :ef]


def beam_search_core(
    links: jax.Array,
    num_nodes: jax.Array,
    batch: int,
    table_rows: int,
    score_block,
    *,
    ef: int,
    num_initializations: int = 100,
    max_hops: int = 0,
    expand_factor: int = 1,
    compact_width: int = 0,
    links_block=None,
    entry_block=None,
) -> BeamResults:
    """Distance-backend-agnostic beam search loop (trace-time helper; call
    from inside a jitted wrapper).

    `score_block(ids [B, C] int32) -> [B, C] float32` evaluates the distance
    from query b to node ids[b, c] — raw vectors (beam_search), PQ-ADC code
    tables (quantization.pq), a row-sharded table with a psum merge
    (parallel.sharded_graph), or any future backend.

    `links_block(ids [B, E] int32) -> [B, E*M] int32` resolves neighbor
    lists; defaults to a direct table gather. The sharded backend supplies
    an ownership-masked gather + psum. Everything else — the hop loop,
    visited state, beam merge — is backend-independent, so single-chip and
    tensor-parallel searches share ONE hop body (and stay bit-identical).

    `entry_block(cand [NI] int32) -> [B, NI] f32` scores the shared entry
    candidates (see ENTRY_IMPL); defaults to score_block over per-query
    broadcast ids.

    `compact_width` (CC, 0 = off): gather/score only the first CC
    fresh-first candidates per hop instead of all E*M. The hot gather is
    row-ISSUE-RATE-bound on TPU (~4 GB/s at 512 B rows, measured), so
    row count is the cost — compaction multiplies hop throughput by
    ~E*M/CC. Fresh candidates beyond CC in a hop are DROPPED (they were
    already the overflow past the ids the beam could admit); duplicates
    and visited ids are dropped first, so recall impact is small for
    CC >= ef and the setting is swept by the benchmark like ef. Results
    are deterministic but not bit-identical to the uncompacted hop.
    """
    m = links.shape[1]
    b = batch
    if links_block is None:
        def links_block(ids):
            return jnp.take(links, ids.reshape(-1), axis=0).reshape(
                b, ids.shape[1] * m
            )
    rowix = jnp.arange(b, dtype=jnp.int32)
    e_f = max(min(expand_factor, ef), 1)
    em = e_f * m
    use_history = VISITED_IMPL == "history"
    use_bsearch = MEMBERSHIP_IMPL == "bsearch"
    # the history buffer bounds the hop loop; generous default tail
    # (typical EXPANSIONS per query ~ ef + small overshoot; each iteration
    # performs e_f expansions, so the iteration cap scales down with E and
    # the history width hop_cap * e_f stays ~constant)
    hop_cap = max_hops if max_hops else max((2 * ef + 128) // e_f, 16)

    # entry points: batched initializeSearch (Index.h:845-870)
    step = jnp.maximum(num_nodes // num_initializations, 1)
    cand = jnp.arange(num_initializations, dtype=jnp.int32) * step
    cand_valid = cand < num_nodes
    cand = jnp.where(cand_valid, cand, 0)
    if entry_block is not None:
        d0 = entry_block(cand)
    else:
        d0 = score_block(
            jnp.broadcast_to(cand[None, :], (b, num_initializations))
        )
    d0 = jnp.where(cand_valid[None, :], d0, jnp.inf)
    best = jnp.argmin(d0, axis=1)
    entry_ids = cand[best]
    entry_dists = jnp.take_along_axis(d0, best[:, None], axis=1)[:, 0]

    beam_d = jnp.full((b, ef), jnp.inf, jnp.float32).at[:, 0].set(entry_dists)
    beam_i = jnp.zeros((b, ef), jnp.int32).at[:, 0].set(entry_ids)
    beam_e = jnp.ones((b, ef), jnp.bool_).at[:, 0].set(False)

    if use_history and use_bsearch:
        # expanded-id history [B, hop_cap * E], SORTED ascending with
        # sentinel padding; per hop the E new ids merge in via one sort
        # and membership probes are log-width binary searches
        visited = jnp.full((b, hop_cap * e_f), _INT_SENTINEL, jnp.int32)
    elif use_history:
        # expanded-id history [B, hop_cap * E], -1 padded, appended by
        # contiguous dynamic_update_slice each hop (never a scatter)
        visited = jnp.full((b, hop_cap * e_f), -1, jnp.int32)
    else:
        n_words = -(-table_rows // 32)
        visited = jnp.zeros((b, n_words), jnp.uint32)
        visited = visited.at[rowix, entry_ids >> 5].add(
            jnp.left_shift(jnp.uint32(1), (entry_ids & 31).astype(jnp.uint32))
        )

    # Reference adds num_initializations to the counter up front
    # (Index.h:857-859) plus 1 for the entry-node distance (Index.h:619).
    dcomp0 = jnp.asarray(b * (num_initializations + 1), jnp.int32)

    # First-occurrence mask scaffolding for intra-hop dedup (width = E*M
    # when expanding E beam entries per hop) — compare impl only; the
    # bsearch impl dedups via sort (O(EM logEM) instead of O(EM^2)).
    if not use_bsearch:
        lower_tri = jnp.tril(jnp.ones((em, em), jnp.bool_), k=-1)

    def cond(state):
        _, _, beam_e, _, _, _, it = state
        return jnp.logical_and(jnp.any(~beam_e), it < hop_cap)

    def body(state):
        beam_d, beam_i, beam_e, visited, dcomp, hops, it = state
        unexp = ~beam_e
        # first E unexpanded positions per row (beam is sorted, so these
        # are the E best — the batched generalization of "pop the best
        # candidate", Index.h:628-634)
        pos = jnp.arange(ef, dtype=jnp.int32)[None, :]
        cand_pos = jnp.where(unexp, pos, ef)
        if e_f == 1:
            sel = jnp.argmax(unexp, axis=1)[:, None]  # cheaper than top_k
            sel_valid = jnp.any(unexp, axis=1)[:, None]
        else:
            neg_top, _ = jax.lax.top_k(-cand_pos, e_f)
            sel = -neg_top  # [B, E] ascending positions
            sel_valid = sel < ef
        sel = jnp.minimum(sel, ef - 1)
        cur_ids = jnp.where(sel_valid, jnp.take_along_axis(beam_i, sel, axis=1), 0)
        # mark expanded WITHOUT a scatter (TPU scatters serialize): one
        # broadcast compare against the selected positions
        hit = jnp.any(
            jnp.logical_and(pos[:, :, None] == sel[:, None, :], sel_valid[:, None, :]),
            axis=2,
        )
        beam_e = jnp.logical_or(beam_e, hit)

        nbrs = links_block(cur_ids)  # [B, E*M]
        valid_src = jnp.repeat(sel_valid, m, axis=1)  # [B, E*M]

        if use_history and use_bsearch:
            # merge this hop's expansions into the sorted history (one
            # sort), then probe membership with binary searches.
            # Candidate is fresh iff not in the (finite) beam and never
            # expanded; evicted-unexpanded nodes may re-enter (re-eval is
            # ~free; correctness unaffected — see VISITED_IMPL docs)
            new_ids = jnp.where(sel_valid, cur_ids, _INT_SENTINEL)
            visited = jax.lax.sort(
                jnp.concatenate([visited, new_ids], axis=1), dimension=1
            )[:, : hop_cap * e_f]
            sorted_beam = jax.lax.sort(
                jnp.where(jnp.isfinite(beam_d), beam_i, _INT_SENTINEL),
                dimension=1,
            )
            in_beam = _sorted_member(sorted_beam, nbrs)
            in_hist = _sorted_member(visited, nbrs)
            fresh = ~jnp.logical_or(in_beam, in_hist)
        elif use_history:
            # record this hop's expansions (contiguous write)
            visited = jax.lax.dynamic_update_slice(
                visited,
                jnp.where(sel_valid, cur_ids, -1),
                (0, it * e_f),
            )
            in_beam = jnp.any(
                jnp.logical_and(
                    nbrs[:, :, None] == beam_i[:, None, :],
                    jnp.isfinite(beam_d)[:, None, :],
                ),
                axis=2,
            )
            in_hist = jnp.any(
                nbrs[:, :, None] == visited[:, None, :], axis=2
            )
            fresh = ~jnp.logical_or(in_beam, in_hist)
        else:
            words = nbrs >> 5
            bits = jnp.left_shift(jnp.uint32(1), (nbrs & 31).astype(jnp.uint32))
            vis_words = jnp.take_along_axis(visited, words, axis=1)
            fresh = (vis_words & bits) == 0
        fresh = jnp.logical_and(fresh, valid_src)
        # keep only the first occurrence of each id within the hop
        if use_bsearch:
            first_occ = _first_occurrence(nbrs)
        else:
            dup = nbrs[:, :, None] == nbrs[:, None, :]
            first_occ = ~jnp.any(dup & lower_tri[None], axis=2)
        fresh = jnp.logical_and(fresh, first_occ)

        if not use_history:
            visited = visited.at[rowix[:, None], words].add(
                jnp.where(fresh, bits, jnp.uint32(0))
            )

        # fresh-first compaction (history impl only — the bitmask impl
        # marks candidates visited above, which must stay in sync with
        # what gets scored): keep the first CC candidates with fresh ones
        # sorted to the front, so the hot gather below touches CC rows
        # instead of E*M
        if compact_width and use_history and compact_width < em:
            order = jnp.argsort(
                (~fresh).astype(jnp.int32), axis=1, stable=True
            )[:, :compact_width]
            nbrs = jnp.take_along_axis(nbrs, order, axis=1)
            fresh = jnp.take_along_axis(fresh, order, axis=1)

        nd = score_block(nbrs)  # [B, <=E*M] (hot: fused gather + distance)
        nd = jnp.where(fresh, nd, jnp.inf)

        dcomp = dcomp + jnp.sum(fresh, dtype=jnp.int32)
        hops = hops + jnp.sum(sel_valid, dtype=jnp.int32)

        # sort only the E*M new entries, then merge into the beam; new
        # entries ranked past ef can never enter an ef-wide beam, so the
        # merge sees at most ef of them (identical results, ~EM/ef less
        # merge work when E*M > ef)
        sd_new, si_new, se_new = jax.lax.sort(
            (nd, nbrs, ~fresh), dimension=1, num_keys=1, is_stable=True
        )
        if nd.shape[1] > ef:
            sd_new = sd_new[:, :ef]
            si_new = si_new[:, :ef]
            se_new = se_new[:, :ef]
        nbd, nbi, nbe = _merge_sorted(
            (beam_d, beam_i, beam_e), (sd_new, si_new, se_new), ef
        )
        return (nbd, nbi, nbe, visited, dcomp, hops, it + 1)

    state = (
        beam_d,
        beam_i,
        beam_e,
        visited,
        dcomp0,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    if LOOP_IMPL == "scan":
        def scan_body(carry, _):
            return body(carry), None

        state, _ = jax.lax.scan(scan_body, state, None, length=hop_cap)
        beam_d, beam_i, _, _, dcomp, hops, _ = state
    elif LOOP_IMPL == "unroll":
        # bit-identical to scan: the body is idempotent once a query's
        # beam is fully expanded, so running the full cap is safe
        for _ in range(hop_cap):
            state = body(state)
        beam_d, beam_i, _, _, dcomp, hops, _ = state
    else:
        beam_d, beam_i, _, _, dcomp, hops, _ = jax.lax.while_loop(
            cond, body, state
        )
    return BeamResults(beam_d, beam_i, dcomp, hops)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ef", "metric", "num_initializations", "max_hops",
        "expand_factor", "compact_width", "m_search",
    ),
)
def beam_search(
    vectors: jax.Array,
    links: jax.Array,
    num_nodes: jax.Array,
    queries: jax.Array,
    *,
    ef: int,
    metric: MetricType = MetricType.L2,
    num_initializations: int = 100,
    max_hops: int = 0,
    expand_factor: int = 1,
    compact_width: int = 0,
    m_search: int = 0,
) -> BeamResults:
    """Batched beam search over raw stored vectors; returns the full
    ef-wide beam per query.

    vectors: [cap(+pad), d] (any supported storage dtype)
    links:   [cap(+pad)+1, M] int32 (self-loop convention, scratch last row)
    num_nodes: scalar int32, committed prefix length
    queries: [B, d]

    `m_search` (0 = all): use only the first m_search links per node at
    query time. connectNeighbors commits selectNeighbors' output, which
    is distance-sorted (Index.h:714-763, 765-834), so the link-list
    prefix holds the closest/most-diverse neighbors — a degree-M' view
    of the degree-M graph. The hot gather is row-ISSUE-RATE-bound
    (~150 ns/row measured), so halving the expanded links nearly halves
    hop cost; recall cost is measured by the benchmark sweep like ef.
    """
    if m_search and m_search < links.shape[1]:
        links = links[:, :m_search]
    # integer queries against an integer table keep their dtype so the
    # distance kernel's exact int32 accumulation applies (reference
    # precedent SquaredL2SimdExtensions.h:32-76); everything else runs f32
    if not (
        jnp.issubdtype(queries.dtype, jnp.integer)
        and jnp.issubdtype(vectors.dtype, jnp.integer)
    ):
        queries = queries.astype(jnp.float32)

    if SCORE_IMPL == "pallas" and not jnp.issubdtype(
        vectors.dtype, jnp.integer
    ):
        from flatnav_tpu.ops.gather_distance import gather_distances

        interpret = jax.default_backend() != "tpu"

        def score_block(ids: jax.Array) -> jax.Array:
            return gather_distances(
                vectors, ids, queries, metric, interpret=interpret
            )
    else:
        def score_block(ids: jax.Array) -> jax.Array:
            rows = jnp.take(vectors, ids, axis=0)  # [B, C, d] gather (hot)
            return query_block_distances(queries, rows, metric)

    entry_block = None
    if ENTRY_IMPL == "matmul":
        def entry_block(cand: jax.Array) -> jax.Array:
            # ONE [NI, d] gather + one MXU contraction for all B x NI
            # entry distances (vs B copies of the candidate rows)
            rows = jnp.take(vectors, cand, axis=0)
            return pairwise_distances(queries, rows, metric)

    return beam_search_core(
        links,
        num_nodes,
        queries.shape[0],
        vectors.shape[0],
        score_block,
        ef=ef,
        num_initializations=num_initializations,
        max_hops=max_hops,
        expand_factor=expand_factor,
        compact_width=compact_width,
        entry_block=entry_block,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "ef", "metric", "num_initializations", "max_hops",
        "expand_factor", "compact_width", "m_search",
    ),
)
def _batched_search_jit(
    vectors, links, labels, num_nodes, queries, *,
    k, ef, metric=MetricType.L2, num_initializations=100, max_hops=0,
    expand_factor=1, compact_width=0, m_search=0,
) -> SearchResults:
    beam = beam_search(
        vectors,
        links,
        num_nodes,
        queries,
        ef=max(ef, k),
        metric=metric,
        num_initializations=num_initializations,
        max_hops=max_hops,
        expand_factor=expand_factor,
        compact_width=compact_width,
        m_search=m_search,
    )
    top_d = beam.dists[:, :k]
    top_i = beam.ids[:, :k]
    top_labels = jnp.where(
        jnp.isfinite(top_d), jnp.take(labels, top_i, axis=0), -1
    )
    return SearchResults(
        top_d, top_labels, beam.dist_computations, beam.hops
    )


def batched_search(
    vectors: jax.Array,
    links: jax.Array,
    labels: jax.Array,
    num_nodes: jax.Array,
    queries: jax.Array,
    *,
    k: int,
    ef: int,
    metric: MetricType = MetricType.L2,
    num_initializations: int = 100,
    max_hops: int = 0,
    expand_factor: int = 1,
    compact_width: int = 0,
    m_search: int = 0,
) -> SearchResults:
    """Top-K search: Index::search (Index.h:387-409) over a query batch.

    `ef` is clamped up to at least k by the caller-facing API, matching
    `std::max(ef_search, K)` at Index.h:390. `expand_factor` > 1 expands
    that many beam entries per hop (fewer, wider hops — a throughput knob
    with near-neutral recall).

    Memory safety: the query batch is transparently split into
    sub-dispatches when the estimated hop working set would overflow
    device memory (see safe_query_batch) — queries are independent, so
    results are bit-identical to the unchunked dispatch. Chunking happens
    OUTSIDE the jit boundary: every full-width sub-batch reuses ONE
    compiled executable instead of inlining a copy of the hop program per
    chunk into a single program (which multiplied compile time by the
    chunk count). A config that cannot fit even one query raises
    ValueError instead of kernel-faulting the TPU worker.
    """
    b = queries.shape[0]
    m_eff = (
        m_search if m_search and m_search < links.shape[1]
        else links.shape[1]
    )
    table_bytes = (
        vectors.size * vectors.dtype.itemsize
        + links.size * 4
        + labels.size * 4
    )
    sub = safe_query_batch(
        b,
        max(ef, k),
        m=m_eff,
        d=vectors.shape[1],
        expand_factor=expand_factor,
        compact_width=compact_width,
        table_rows=vectors.shape[0],
        table_bytes=table_bytes,
        max_hops=max_hops,
    )
    kw = dict(
        k=k, ef=ef, metric=metric,
        num_initializations=num_initializations, max_hops=max_hops,
        expand_factor=expand_factor, compact_width=compact_width,
        m_search=m_search,
    )
    if sub >= b:
        return _batched_search_jit(
            vectors, links, labels, num_nodes, queries, **kw
        )
    parts = [
        _batched_search_jit(
            vectors, links, labels, num_nodes, queries[lo : lo + sub], **kw
        )
        for lo in range(0, b, sub)
    ]
    return SearchResults(
        jnp.concatenate([p.dists for p in parts], axis=0),
        jnp.concatenate([p.labels for p in parts], axis=0),
        sum((p.dist_computations for p in parts[1:]),
            parts[0].dist_computations),
        sum((p.hops for p in parts[1:]), parts[0].hops),
    )
