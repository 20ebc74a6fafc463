"""Node-table-sharded (tensor-parallel) beam search over a device mesh.

For indexes whose node table exceeds one chip's HBM (BigANN-100M-scale,
SURVEY.md §2.6 "TP" row), `vectors`/`links`/`labels` are row-sharded over
the mesh's `model` axis. Queries and beam state are replicated across the
model axis and advance in lockstep through the SAME hop body as the
single-chip engine (`index.search.beam_search_core`); only the two
table-resolving callbacks differ:

  * `links_block`: every shard gathers the neighbor lists of the expanded
    nodes IT owns; a psum merges the one-owner contributions into a
    replicated [B, E*M] id block.
  * `score_block`: every shard evaluates distances for the candidate rows
    it owns; a psum merges the one-owner contributions.

Because each element has exactly ONE owner, the psum adds a value to
zeros — bit-exact against the single-device gather — and the distance
kernel reduces with a fixed-association tree sum, so the sharded search
returns EXACTLY the single-chip labels (tested in tests/test_sharding.py;
distances agree to ~1 ulp, the residual being XLA's per-program FMA
formation). This matches the result-identity standard the reference sets
for serialization (test_serialization.cpp:64-75).

Per-hop traffic is two psums of [B, E*M] scalars over ICI — tiny next to
the HBM gather work, which is what actually shards. Composes with the
`data` axis: queries shard over `data`, the table over `model` (each
data-row of the mesh holds a full table copy).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

import flatnav_tpu.index.search as _search
from flatnav_tpu.index.search import (
    SearchResults,
    beam_search_core,
)
from flatnav_tpu.ops.distances import (
    MetricType,
    pairwise_distances,
    query_block_distances,
)
from flatnav_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def _sharded_beam_search_local(
    vectors,  # [n_local, d] this shard's rows
    links,  # [n_local, M]
    num_nodes,  # replicated scalar
    queries,  # [B_local, d] (replicated across model axis)
    *,
    ef: int,
    metric: MetricType,
    num_initializations: int,
    rows_global: int,
    max_hops: int = 0,
    expand_factor: int = 1,
):
    """Per-shard body (runs under shard_map over the model axis): the
    single-chip beam_search_core with ownership-masked, psum-merged table
    callbacks."""
    n_local = vectors.shape[0]
    m = links.shape[1]
    b = queries.shape[0]
    if not (
        jnp.issubdtype(queries.dtype, jnp.integer)
        and jnp.issubdtype(vectors.dtype, jnp.integer)
    ):
        queries = queries.astype(jnp.float32)
    shard_idx = jax.lax.axis_index(MODEL_AXIS)
    row_offset = shard_idx * n_local

    def _ownership(ids):
        local = ids - row_offset
        own = jnp.logical_and(local >= 0, local < n_local)
        return jnp.where(own, local, 0), own

    def score_block(ids):
        local, own = _ownership(ids)
        rows = jnp.take(vectors, local, axis=0)
        d = query_block_distances(queries, rows, metric)
        return jax.lax.psum(jnp.where(own, d, 0.0), MODEL_AXIS)

    def links_block(ids):  # [B, E] -> [B, E*M] global neighbor ids
        local, own = _ownership(ids)
        nbr = jnp.take(links, local, axis=0)  # [B, E, M] local rows
        contrib = jnp.where(own[:, :, None], nbr + 1, 0)
        merged = jax.lax.psum(contrib, MODEL_AXIS) - 1
        return merged.reshape(b, ids.shape[1] * m)

    entry_block = None
    if _search.ENTRY_IMPL == "matmul":
        # mirror the single-chip matmul entry scan (search.ENTRY_IMPL):
        # each shard runs the same [B, NI] contraction over its owned rows
        # (junk rows for non-owned ids, masked out), psum merges the
        # one-owner contributions — elementwise the same math as the
        # single-chip lowering
        def entry_block(cand):
            local = cand - row_offset
            own = jnp.logical_and(local >= 0, local < n_local)
            rows = jnp.take(vectors, jnp.where(own, local, 0), axis=0)
            pd = pairwise_distances(queries, rows, metric)
            return jax.lax.psum(
                jnp.where(own[None, :], pd, 0.0), MODEL_AXIS
            )

    return beam_search_core(
        links,
        num_nodes,
        b,
        rows_global,
        score_block,
        ef=ef,
        num_initializations=num_initializations,
        max_hops=max_hops,
        expand_factor=expand_factor,
        links_block=links_block,
        entry_block=entry_block,
    )


def sharded_search(
    graph,
    queries,
    mesh: Mesh,
    *,
    k: int,
    ef: int,
    metric: MetricType = MetricType.L2,
    num_initializations: int = 100,
    max_hops: int = 0,
    expand_factor: int = 1,
) -> SearchResults:
    """Top-K search over a row-sharded node table.

    vectors/links/labels rows must divide evenly by the model-axis size
    (the stored arrays are already padded past capacity, see graph.py).
    Queries shard over the data axis and replicate over model. Results are
    bit-identical to the single-device `batched_search`.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rows = graph.vectors.shape[0]
    if rows % n_model:
        raise ValueError(f"{rows} table rows not divisible by {n_model}")

    # memory guard at PER-CHIP width: the beam/merge/score intermediates
    # are replicated across the model axis (only the table shrinks), so a
    # config that overflows one chip kills the worker exactly like the
    # single-device case (see search.safe_query_batch). Chunk the global
    # batch outside the shard_map dispatch.
    from flatnav_tpu.index.search import safe_query_batch

    n_data = mesh.shape[DATA_AXIS] if DATA_AXIS in mesh.shape else 1
    b = queries.shape[0]
    sub_local = safe_query_batch(
        max(b // max(n_data, 1), 1), max(ef, k),
        m=graph.links.shape[1], d=graph.vectors.shape[1],
        expand_factor=expand_factor,
        table_rows=rows // n_model,
        table_bytes=(
            graph.vectors.size * graph.vectors.dtype.itemsize
            + graph.links.size * 4 + graph.labels.size * 4
        ) // n_model,
        max_hops=max_hops,
    )
    sub = sub_local * max(n_data, 1)
    if sub < b:
        parts = [
            sharded_search(
                graph, queries[lo : lo + sub], mesh, k=k, ef=ef,
                metric=metric, num_initializations=num_initializations,
                max_hops=max_hops, expand_factor=expand_factor,
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
            rows_global=rows,
            max_hops=max_hops,
            expand_factor=expand_factor,
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
        # counters are replicated over model; total over the query shards
        dcomp = jax.lax.psum(beam.dist_computations, DATA_AXIS)
        hops = jax.lax.psum(beam.hops, DATA_AXIS)
        return top_d, labs, dcomp, hops

    # trim the links scratch row so rows divide evenly like vectors
    d, labs, dcomp, hops = run(
        graph.vectors,
        graph.links[:rows],
        graph.labels,
        graph.num_nodes,
        queries,
    )
    return SearchResults(d, labs, dcomp, hops)
