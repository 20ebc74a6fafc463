"""Multi-chip search: query-sharded (data-parallel) beam search.

The reference parallelizes batched queries over a thread pool
(/root/reference/python-bindings/src/flatnav/bindings.cpp:198-211 +
util/Multithreading.h). The TPU equivalent shards the query batch across
the mesh's `data` axis with the graph replicated: each chip runs the same
jit-compiled beam search on its query shard, zero cross-chip traffic per
hop, linear QPS scaling.

Node-table (model-axis) sharding for indexes beyond one chip's HBM lives in
`sharded_graph.py` (per-hop candidate merging over ICI).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from flatnav_tpu.index.search import (
    SearchResults,
    _batched_search_jit,
    safe_query_batch,
)
from flatnav_tpu.ops.distances import MetricType
from flatnav_tpu.parallel.sharding import DATA_AXIS


@functools.partial(
    jax.jit,
    static_argnames=("mesh", "k", "ef", "metric", "num_initializations"),
)
def _sharded_search_impl(
    vectors,
    links,
    labels,
    num_nodes,
    queries,
    *,
    mesh: Mesh,
    k: int,
    ef: int,
    metric: MetricType,
    num_initializations: int,
) -> SearchResults:
    rep = NamedSharding(mesh, P())
    shard = NamedSharding(mesh, P(DATA_AXIS))
    vectors = jax.lax.with_sharding_constraint(vectors, rep)
    links = jax.lax.with_sharding_constraint(links, rep)
    labels = jax.lax.with_sharding_constraint(labels, rep)
    queries = jax.lax.with_sharding_constraint(queries, shard)
    # the inner jitted search, not the guarded wrapper: the guard would
    # model the GLOBAL batch (each device only holds b/n_data queries)
    # and inline per-chunk copies of the hop program into this trace —
    # chunking is the caller's job, per device (data_parallel_search)
    res = _batched_search_jit(
        vectors,
        links,
        labels,
        num_nodes,
        queries,
        k=k,
        ef=ef,
        metric=metric,
        num_initializations=num_initializations,
    )
    return SearchResults(
        jax.lax.with_sharding_constraint(res.dists, shard),
        jax.lax.with_sharding_constraint(res.labels, shard),
        res.dist_computations,
        res.hops,
    )


def data_parallel_search(
    graph,
    queries,
    mesh: Mesh,
    *,
    k: int,
    ef: int,
    metric: MetricType = MetricType.L2,
    num_initializations: int = 100,
) -> SearchResults:
    """Batched search with queries sharded over the mesh's data axis.

    The query batch must be divisible by the data-axis size (pad on host).
    """
    n_data = mesh.shape[DATA_AXIS]
    b = queries.shape[0]
    if b % n_data:
        raise ValueError(
            f"query batch {b} not divisible by data axis {n_data}"
        )
    # memory guard at PER-DEVICE width (the graph is replicated, so each
    # chip pays the full hop working set for its b/n_data query shard);
    # chunk the global batch outside the jit like batched_search does
    table_bytes = (
        graph.vectors.size * graph.vectors.dtype.itemsize
        + graph.links.size * 4 + graph.labels.size * 4
    )
    sub_local = safe_query_batch(
        b // n_data, max(ef, k), m=graph.links.shape[1],
        d=graph.vectors.shape[1],
        table_rows=graph.vectors.shape[0], table_bytes=table_bytes,
    )
    kw = dict(mesh=mesh, k=k, ef=ef, metric=metric,
              num_initializations=num_initializations)

    def run(q):
        return _sharded_search_impl(
            graph.vectors, graph.links, graph.labels, graph.num_nodes,
            q, **kw,
        )

    sub = sub_local * n_data
    if sub >= b:
        return run(queries)
    import jax.numpy as jnp

    parts = [run(queries[lo : lo + sub]) for lo in range(0, b, sub)]
    return SearchResults(
        jnp.concatenate([p.dists for p in parts], axis=0),
        jnp.concatenate([p.labels for p in parts], axis=0),
        sum((p.dist_computations for p in parts[1:]),
            parts[0].dist_computations),
        sum((p.hops for p in parts[1:]), parts[0].hops),
    )
