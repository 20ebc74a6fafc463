"""Dense graph storage: the TPU-native replacement for the node arena.

The reference packs each node as `[data][M x uint32 links][label]` in one
`char*` arena (/root/reference/include/flatnav/index/Index.h:55-64, 176-178)
for CPU cache locality. On TPU the idiomatic layout is struct-of-arrays in
HBM — three dense arrays that XLA can gather/scatter and shard:

    vectors [capacity, d]  (storage dtype: float32/uint8/int8/...)
    links   [capacity, M]  int32
    labels  [capacity]     int32

Memory per node is d*sizeof(dtype) + 4*M + 4 bytes, identical to the
reference's arena math (Index.h:176-178), so the headline "~38% less memory
than HNSW" carries over unchanged.

Unused link slots use the reference's self-loop convention — slot value ==
own node id (Index.h:269-270, 783-790). Self-loops are harmless during
search because the owning node is already in the visited set when its links
are expanded.

Capacity is fixed at creation, exactly like the reference (Index.h:355-360):
`add` beyond capacity raises.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from flatnav_tpu.ops.distances import MetricType


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphArrays:
    """Device-resident index state (a JAX pytree).

    `num_nodes` is carried as a device scalar so construction waves can run
    fully jitted with static shapes; the Python-level Index wrapper mirrors
    it as a host int for validation/errors.
    """

    vectors: jax.Array  # [capacity, d], storage dtype
    links: jax.Array  # [capacity, M], int32
    labels: jax.Array  # [capacity], int32
    num_nodes: jax.Array  # scalar int32

    @property
    def capacity(self) -> int:
        return self.vectors.shape[0]

    @property
    def dim(self) -> int:
        return self.vectors.shape[1]

    @property
    def max_edges(self) -> int:
        return self.links.shape[1]


def make_empty_graph(
    capacity: int,
    dim: int,
    max_edges: int,
    dtype: Any = jnp.float32,
) -> GraphArrays:
    """Allocate the full-capacity arrays up front (Index.h:159-179 ctor).

    Links are initialized to self-loops via iota so that an untouched row is
    already in the reference's "all edges unused" state (Index.h:269-270).
    """
    iota = jnp.arange(capacity, dtype=jnp.int32)
    return GraphArrays(
        vectors=jnp.zeros((capacity, dim), dtype=dtype),
        links=jnp.broadcast_to(iota[:, None], (capacity, max_edges)).copy(),
        labels=jnp.zeros((capacity,), dtype=jnp.int32),
        num_nodes=jnp.zeros((), dtype=jnp.int32),
    )


def node_size_bytes(dim: int, dtype, max_edges: int) -> int:
    """Reference memory math: data + 4*M links + 4-byte label
    (Index.h:176-178)."""
    return dim * np.dtype(dtype).itemsize + 4 * max_edges + 4


def graph_from_numpy(
    vectors: np.ndarray,
    links: np.ndarray,
    labels: np.ndarray | None = None,
    num_nodes: int | None = None,
    capacity: int | None = None,
) -> GraphArrays:
    """Build a GraphArrays from host arrays (e.g. a deserialized index or an
    imported .mtx graph, cf. Index::buildGraphLinks Index.h:187-238)."""
    n, d = vectors.shape
    cap = capacity or n
    m = links.shape[1]
    if labels is None:
        labels = np.arange(n, dtype=np.int32)
    if cap > n:
        pad_v = np.zeros((cap - n, d), vectors.dtype)
        vectors = np.concatenate([vectors, pad_v], axis=0)
        pad_l = np.repeat(
            np.arange(n, cap, dtype=np.int32)[:, None], m, axis=1
        )
        links = np.concatenate([links.astype(np.int32), pad_l], axis=0)
        labels = np.concatenate(
            [labels.astype(np.int32), np.zeros(cap - n, np.int32)]
        )
    return GraphArrays(
        vectors=jnp.asarray(vectors),
        links=jnp.asarray(links, dtype=jnp.int32),
        labels=jnp.asarray(labels, dtype=jnp.int32),
        num_nodes=jnp.asarray(num_nodes if num_nodes is not None else n, jnp.int32),
    )


__all__ = [
    "GraphArrays",
    "MetricType",
    "make_empty_graph",
    "graph_from_numpy",
    "node_size_bytes",
]
