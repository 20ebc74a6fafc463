"""Node-table-sharded (tensor-parallel) beam search over a device mesh.

For indexes whose node table exceeds one chip's HBM (BigANN-100M-scale,
SURVEY.md §2.6 "TP" row), `vectors`/`links`/`labels` are row-sharded over
the mesh's `model` axis. Queries and beam state are replicated across the
model axis and advance in lockstep; each hop:

  1. every shard resolves the expanded node's links if it owns the node
     (local gather), then a psum merges the one-owner contributions into a
     replicated [B, M] neighbor-id block;
  2. every shard checks + marks visited bits and evaluates distances for
     the neighbors IT owns; a psum merges the per-(query, slot) one-owner
     contributions (distance blocks and fresh masks);
  3. the beam merge (sort + truncate) runs replicated on all shards.

Per-hop traffic is two psums of [B, M] scalars over ICI — tiny next to the
HBM gather work, which is what actually shards. The visited bitmask also
shards by node ownership ([B, n_local/32] per chip), so per-query state
scales down with the shard count.

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

    n_words = -(-n_local // 32)
    visited = jnp.zeros((b, n_words), jnp.uint32)

    def mark_visited(visited, ids, mask):
        """Set bits for globally-ided nodes this shard owns; returns
        (visited', fresh mask local-contribution)."""
        local = ids - row_offset
        owned = jnp.logical_and(local >= 0, local < n_local)
        owned = jnp.logical_and(owned, mask)
        safe = jnp.where(owned, local, 0)
        words = safe >> 5
        bits = jnp.left_shift(jnp.uint32(1), (safe & 31).astype(jnp.uint32))
        vis_words = jnp.take_along_axis(visited, words, axis=1)
        fresh = jnp.logical_and((vis_words & bits) == 0, owned)
        # intra-block dedup (first occurrence) for exact OR-via-add
        dup = ids[:, :, None] == ids[:, None, :]
        tri = jnp.tril(jnp.ones((ids.shape[1],) * 2, jnp.bool_), k=-1)
        first_occ = ~jnp.any(dup & tri[None], axis=2)
        fresh = jnp.logical_and(fresh, first_occ)
        visited = visited.at[rowix[:, None], words].add(
            jnp.where(fresh, bits, jnp.uint32(0))
        )
        return visited, fresh

    # mark entry nodes
    visited, _ = mark_visited(
        visited, entry_ids[:, None], jnp.ones((b, 1), jnp.bool_)
    )

    def cond(state):
        _, _, beam_e, _, _, _ = state
        return jnp.any(~beam_e)

    def body(state):
        beam_d, beam_i, beam_e, visited, dcomp, hops = state
        unexp = ~beam_e
        active = jnp.any(unexp, axis=1)
        sel = jnp.argmax(unexp, axis=1)
        cur_id = jnp.where(active, beam_i[rowix, sel], 0)
        beam_e = beam_e.at[rowix, sel].set(True)

        # 1. links lookup by owner, merged with psum (one-hot ownership)
        local = cur_id - row_offset
        own = jnp.logical_and(local >= 0, local < n_local)
        nbr_local = jnp.take(links, jnp.where(own, local, 0), axis=0)
        nbr_contrib = jnp.where(own[:, None], nbr_local + 1, 0)
        nbrs = jax.lax.psum(nbr_contrib, MODEL_AXIS) - 1  # [B, M] global ids
        nbrs_valid = jnp.logical_and(nbrs >= 0, active[:, None])

        # 2. visited + distances for owned neighbors
        visited, fresh_local = mark_visited(visited, nbrs, nbrs_valid)
        nloc = jnp.where(fresh_local, nbrs - row_offset, 0)
        vecs = jnp.take(vectors, nloc, axis=0)
        nd_local = query_block_distances(queries, vecs, metric)
        nd_contrib = jnp.where(fresh_local, nd_local, 0.0)
        nd = jax.lax.psum(nd_contrib, MODEL_AXIS)
        fresh = jax.lax.psum(
            fresh_local.astype(jnp.int32), MODEL_AXIS
        ).astype(jnp.bool_)
        nd = jnp.where(fresh, nd, jnp.inf)

        dcomp = dcomp + jnp.sum(fresh_local, dtype=jnp.int32)
        hops = hops + jnp.sum(active, dtype=jnp.int32)

        # 3. replicated merge (same binary merge as the single-chip path)
        sd_new, si_new, se_new = jax.lax.sort(
            (nd, jnp.maximum(nbrs, 0), ~fresh),
            dimension=1, num_keys=1, is_stable=True,
        )
        nbd, nbi, nbe = _merge_sorted(
            (beam_d, beam_i, beam_e), (sd_new, si_new, se_new), ef
        )
        return nbd, nbi, nbe, visited, dcomp, hops

    state = (
        beam_d,
        beam_i,
        beam_e,
        visited,
        jnp.asarray(b * (num_initializations + 1), jnp.int32),
        jnp.zeros((), jnp.int32),
    )
    beam_d, beam_i, _, _, dcomp, hops = jax.lax.while_loop(cond, body, state)
    dcomp = jax.lax.psum(dcomp, MODEL_AXIS) - (
        b * (num_initializations + 1) * (jax.lax.axis_size(MODEL_AXIS) - 1)
    )
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
