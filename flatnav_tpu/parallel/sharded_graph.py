"""Node-table-sharded (tensor-parallel) beam search over a device mesh.

For indexes whose node table exceeds one chip's HBM (BigANN-100M-scale,
SURVEY.md §2.6 "TP" row), `vectors`/`links`/`labels` are row-sharded over
the mesh's `model` axis. Queries and beam state are replicated across the
model axis and advance in lockstep; each hop:

  1. every shard resolves the expanded node's links if it owns the node
     (local gather), then a psum merges the one-owner contributions into a
     replicated [B, M] neighbor-id block;
  2. dedup runs REPLICATED (history-based, see search.VISITED_IMPL docs:
     candidates are rejected if in the current beam or in the expanded-id
     history) — no per-shard visited state and no fresh-mask collective;
     every shard evaluates distances for the fresh neighbors IT owns and a
     psum merges the one-owner distance contributions;
  3. the beam merge runs replicated on all shards.

Per-hop traffic is two psums of [B, M] scalars over ICI (neighbor ids,
then distances) — tiny next to the HBM gather work, which is what actually
shards.

Composes with the `data` axis: queries shard over `data`, the table over
`model` (each data-row of the mesh holds a full table copy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flatnav_tpu.index.search import BeamResults, SearchResults, _merge_sorted
from flatnav_tpu.ops.distances import MetricType, query_block_distances
from flatnav_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def _local_entry_points(
    vectors, row_offset, n_rows_local, num_nodes, queries, num_init, metric
):
    """Sharded initializeSearch: each shard scores the strided candidates it
    owns; pmin merges. (Index.h:845-870)"""
    step = jnp.maximum(num_nodes // num_init, 1)
    cand = jnp.arange(num_init, dtype=jnp.int32) * step  # global ids
    local = cand - row_offset
    owned = jnp.logical_and(local >= 0, local < n_rows_local)
    owned = jnp.logical_and(owned, cand < num_nodes)
    rows = jnp.take(vectors, jnp.where(owned, local, 0), axis=0)
    d = query_block_distances(
        queries, jnp.broadcast_to(rows[None], (queries.shape[0],) + rows.shape), metric
    )
    d = jnp.where(owned[None, :], d, jnp.inf)
    d = jax.lax.pmin(d, MODEL_AXIS)  # replicated [B, num_init]
    best = jnp.argmin(d, axis=1)
    entry_ids = cand[best]
    entry_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    return entry_ids, entry_d


def _sharded_beam_search_local(
    vectors,  # [n_local, d] this shard's rows
    links,  # [n_local, M]
    num_nodes,  # replicated scalar
    queries,  # [B_local, d] (replicated across model axis)
    *,
    ef: int,
    metric: MetricType,
    num_initializations: int,
    capacity: int,
) -> BeamResults:
    """Per-shard body (runs under shard_map over the model axis)."""
    n_local = vectors.shape[0]
    m = links.shape[1]
    b = queries.shape[0]
    queries = queries.astype(jnp.float32)
    rowix = jnp.arange(b, dtype=jnp.int32)
    shard_idx = jax.lax.axis_index(MODEL_AXIS)
    row_offset = shard_idx * n_local

    entry_ids, entry_d = _local_entry_points(
        vectors, row_offset, n_local, num_nodes, queries,
        num_initializations, metric,
    )

    beam_d = jnp.full((b, ef), jnp.inf, jnp.float32).at[:, 0].set(entry_d)
    beam_i = jnp.zeros((b, ef), jnp.int32).at[:, 0].set(entry_ids)
    beam_e = jnp.ones((b, ef), jnp.bool_).at[:, 0].set(False)

    hop_cap = 2 * ef + 128
    hist = jnp.full((b, hop_cap), -1, jnp.int32)
    tri = jnp.tril(jnp.ones((m, m), jnp.bool_), k=-1)

    def cond(state):
        _, _, beam_e, _, _, _, it = state
        return jnp.logical_and(jnp.any(~beam_e), it < hop_cap)

    def body(state):
        beam_d, beam_i, beam_e, hist, dcomp, hops, it = state
        unexp = ~beam_e
        active = jnp.any(unexp, axis=1)
        sel = jnp.argmax(unexp, axis=1)
        cur_id = jnp.where(active, beam_i[rowix, sel], 0)
        pos = jnp.arange(ef, dtype=jnp.int32)[None, :]
        beam_e = jnp.logical_or(beam_e, pos == sel[:, None])

        # 1. links lookup by owner, merged with psum (one-hot ownership)
        local = cur_id - row_offset
        own = jnp.logical_and(local >= 0, local < n_local)
        nbr_local = jnp.take(links, jnp.where(own, local, 0), axis=0)
        nbr_contrib = jnp.where(own[:, None], nbr_local + 1, 0)
        nbrs = jax.lax.psum(nbr_contrib, MODEL_AXIS) - 1  # [B, M] global ids
        nbrs_valid = jnp.logical_and(nbrs >= 0, active[:, None])

        # 2. replicated history dedup (identical on all shards)
        hist = jax.lax.dynamic_update_slice(
            hist, jnp.where(active, cur_id, -1)[:, None], (0, it)
        )
        in_beam = jnp.any(
            jnp.logical_and(
                nbrs[:, :, None] == beam_i[:, None, :],
                jnp.isfinite(beam_d)[:, None, :],
            ),
            axis=2,
        )
        in_hist = jnp.any(nbrs[:, :, None] == hist[:, None, :], axis=2)
        dup = nbrs[:, :, None] == nbrs[:, None, :]
        first_occ = ~jnp.any(dup & tri[None], axis=2)
        fresh = jnp.logical_and(
            jnp.logical_and(~jnp.logical_or(in_beam, in_hist), first_occ),
            nbrs_valid,
        )

        # 3. distances for owned fresh neighbors; psum merges one-owner rows
        nbr_loc = nbrs - row_offset
        owned_n = jnp.logical_and(nbr_loc >= 0, nbr_loc < n_local)
        fresh_local = jnp.logical_and(fresh, owned_n)
        nloc = jnp.where(fresh_local, nbr_loc, 0)
        vecs = jnp.take(vectors, nloc, axis=0)
        nd_local = query_block_distances(queries, vecs, metric)
        nd = jax.lax.psum(jnp.where(fresh_local, nd_local, 0.0), MODEL_AXIS)
        nd = jnp.where(fresh, nd, jnp.inf)

        dcomp = dcomp + jnp.sum(fresh_local, dtype=jnp.int32)
        hops = hops + jnp.sum(active, dtype=jnp.int32)

        # 4. replicated merge (same merge as the single-chip path)
        sd_new, si_new, se_new = jax.lax.sort(
            (nd, jnp.maximum(nbrs, 0), ~fresh),
            dimension=1, num_keys=1, is_stable=True,
        )
        nbd, nbi, nbe = _merge_sorted(
            (beam_d, beam_i, beam_e), (sd_new, si_new, se_new), ef
        )
        return nbd, nbi, nbe, hist, dcomp, hops, it + 1

    # init count contributes once (not once per shard) under the final psum
    dcomp0 = jnp.where(
        shard_idx == 0, b * (num_initializations + 1), 0
    ).astype(jnp.int32)
    state = (
        beam_d,
        beam_i,
        beam_e,
        hist,
        dcomp0,
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    beam_d, beam_i, _, _, dcomp, hops, _ = jax.lax.while_loop(
        cond, body, state
    )
    dcomp = jax.lax.psum(dcomp, MODEL_AXIS)
    return BeamResults(beam_d, beam_i, dcomp, hops)


def sharded_search(
    graph,
    queries,
    mesh: Mesh,
    *,
    k: int,
    ef: int,
    metric: MetricType = MetricType.L2,
    num_initializations: int = 100,
) -> SearchResults:
    """Top-K search over a row-sharded node table.

    vectors/links/labels rows must divide evenly by the model-axis size
    (the stored arrays are already padded past capacity, see graph.py).
    Queries shard over the data axis and replicate over model.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rows = graph.vectors.shape[0]
    if rows % n_model:
        raise ValueError(f"{rows} table rows not divisible by {n_model}")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None),  # vectors
            P(MODEL_AXIS, None),  # links (scratch row trimmed by caller)
            P(MODEL_AXIS),  # labels
            P(),  # num_nodes
            P(DATA_AXIS, None),  # queries
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None), P(), P()),
        check_vma=False,
    )
    def run(vectors, links, labels, num_nodes, queries):
        beam = _sharded_beam_search_local(
            vectors,
            links,
            num_nodes,
            queries,
            ef=max(ef, k),
            metric=metric,
            num_initializations=num_initializations,
            capacity=graph.capacity,
        )
        top_d = beam.dists[:, :k]
        top_i = beam.ids[:, :k]
        # label lookup: owner contributes, psum merges
        shard_idx = jax.lax.axis_index(MODEL_AXIS)
        local = top_i - shard_idx * labels.shape[0]
        own = jnp.logical_and(local >= 0, local < labels.shape[0])
        lab_local = jnp.take(labels, jnp.where(own, local, 0), axis=0)
        labs = jax.lax.psum(jnp.where(own, lab_local + 1, 0), MODEL_AXIS) - 1
        labs = jnp.where(jnp.isfinite(top_d), labs, -1)
        return top_d, labs, beam.dist_computations, beam.hops

    # trim the links scratch row so rows divide evenly like vectors
    d, labs, dcomp, hops = run(
        graph.vectors,
        graph.links[:rows],
        graph.labels,
        graph.num_nodes,
        queries,
    )
    return SearchResults(d, labs, dcomp, hops)
