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

Two allocation details protect the batched construction path:

  * All row arrays are over-allocated by `wave_pad(capacity)` rows beyond
    the logical capacity. Construction commits power-of-two-padded waves
    with `dynamic_update_slice`, which CLAMPS out-of-range start indices —
    without the padding, a final wave whose bucket overruns capacity would
    silently shift its writes backward and corrupt tail rows.
  * The links array carries one extra scratch row (its last row): batched
    scatter updates (back-edge commits) pad their target lists to a fixed
    shape, and padding lanes write to the scratch row so they can never
    collide with a real row (duplicate-index scatters have unspecified
    winner order). The scratch row is never read — gathers only use ids
    < num_nodes <= capacity.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

#: construction waves are padded to power-of-two buckets up to this size
MAX_WAVE = 8192


def wave_pad(capacity: int) -> int:
    """Rows to over-allocate so any padded wave fits below the boundary."""
    pow2 = 1 << max(0, (capacity - 1)).bit_length()
    return min(MAX_WAVE, max(64, pow2))


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class GraphArrays:
    """Device-resident index state (a JAX pytree).

    `num_nodes` is carried as a device scalar so construction waves can run
    fully jitted with static shapes; the Python-level Index wrapper mirrors
    it as a host int for validation/errors. `capacity` is static pytree
    metadata (one jit specialization per index capacity).
    """

    vectors: jax.Array  # [capacity + pad, d], storage dtype
    links: jax.Array  # [capacity + pad + 1, M], int32 (last row = scratch)
    labels: jax.Array  # [capacity + pad], int32
    num_nodes: jax.Array  # scalar int32
    capacity: int = dataclasses.field(metadata=dict(static=True), default=0)

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
    rows = capacity + wave_pad(capacity)
    iota = jnp.arange(rows + 1, dtype=jnp.int32)
    return GraphArrays(
        vectors=jnp.zeros((rows, dim), dtype=dtype),
        links=jnp.broadcast_to(iota[:, None], (rows + 1, max_edges)).copy(),
        labels=jnp.zeros((rows,), dtype=jnp.int32),
        num_nodes=jnp.zeros((), dtype=jnp.int32),
        capacity=capacity,
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
    if n > cap:
        raise ValueError(
            f"{n} committed rows exceed capacity {cap}; the rest of the "
            f"engine relies on num_nodes <= capacity"
        )
    rows = cap + wave_pad(cap)
    m = links.shape[1]
    if labels is None:
        labels = np.arange(n, dtype=np.int32)
    pad_v = np.zeros((rows - n, d), vectors.dtype)
    vectors = np.concatenate([vectors, pad_v], axis=0)
    pad_l = np.repeat(
        np.arange(n, rows + 1, dtype=np.int32)[:, None], m, axis=1
    )
    links = np.concatenate([links.astype(np.int32), pad_l], axis=0)
    labels = np.concatenate(
        [labels.astype(np.int32), np.zeros(rows - n, np.int32)]
    )
    return GraphArrays(
        vectors=jnp.asarray(vectors),
        links=jnp.asarray(links, dtype=jnp.int32),
        labels=jnp.asarray(labels, dtype=jnp.int32),
        num_nodes=jnp.asarray(
            num_nodes if num_nodes is not None else n, jnp.int32
        ),
        capacity=cap,
    )


__all__ = [
    "GraphArrays",
    "MAX_WAVE",
    "make_empty_graph",
    "graph_from_numpy",
    "node_size_bytes",
    "wave_pad",
]
