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

from flatnav_tpu.index.search import SearchResults, batched_search
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
    res = batched_search(
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
    return _sharded_search_impl(
        graph.vectors,
        graph.links,
        graph.labels,
        graph.num_nodes,
        queries,
        mesh=mesh,
        k=k,
        ef=ef,
        metric=metric,
        num_initializations=num_initializations,
    )
