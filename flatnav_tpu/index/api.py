"""User-facing Index API, mirroring the reference's Python bindings.

The reference exposes six concrete pybind11 classes (IndexL2Float/Uint8/Int8,
IndexIPFloat/Uint8/Int8) behind a `flatnav.index.create(...)` factory
(/root/reference/python-bindings/src/flatnav/bindings.cpp:358-505). Here one
dtype/metric-parameterized class replaces all six — JAX handles dtypes — and
`create` keeps the exact reference signature and validation:

    create(distance_type in {"l2", "angular"}, dim, dataset_size,
           max_edges_per_node, verbose=False, collect_stats=False,
           index_data_type=DataType.float32)

Method surface parity (bindings.cpp:432-505):
  add, search, search_single, save, load_index (module function),
  allocate_nodes + build_graph_links (HNSW-base-layer import path),
  reorder, set_num_threads/num_threads (accepted for compatibility; the
  TPU analog of the thread pool is the query/insert batch, see
  set_query_batch_size), max_edges_per_node, get_query_distance_computations.
"""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from flatnav_tpu import data_type as dt
from flatnav_tpu.index import build as build_mod
from flatnav_tpu.index import serialize as ser
from flatnav_tpu.index.graph import (
    GraphArrays,
    make_empty_graph,
    node_size_bytes,
)
from flatnav_tpu.index.search import batched_search
from flatnav_tpu.ops.distances import MetricType, brute_force_knn, fast_knn
from flatnav_tpu.ops.fused_scan import fused_knn

_DISTANCE_TYPES = {"l2": MetricType.L2, "angular": MetricType.IP, "ip": MetricType.IP}


class Index:
    """A flat navigable-small-world index (capacity fixed at creation,
    Index.h:159-179)."""

    def __init__(
        self,
        metric: MetricType,
        dim: int,
        dataset_size: int,
        max_edges_per_node: int,
        index_data_type: dt.DataType = dt.DataType.float32,
        verbose: bool = False,
        collect_stats: bool = False,
        _graph: Optional[GraphArrays] = None,
    ):
        if max_edges_per_node <= 0 or dim <= 0 or dataset_size <= 0:
            raise ValueError("dim, dataset_size, max_edges_per_node must be > 0")
        self._metric = metric
        self._data_type = index_data_type
        self._collect_stats = collect_stats
        self._verbose = verbose
        self._num_threads = 1  # compat knob; batch size is what matters here
        self._query_batch_size = 1024
        self._expand_factor = 16  # beam entries expanded per device step
        self._distance_computations = 0
        self._build_stats: dict = {}
        self._graph = (
            _graph
            if _graph is not None
            else make_empty_graph(
                dataset_size, dim, max_edges_per_node, index_data_type.jax_dtype
            )
        )
        if verbose:
            print(self.index_summary())

    # ------------------------------------------------------------------ info
    @property
    def max_edges_per_node(self) -> int:
        return self._graph.max_edges

    @property
    def dim(self) -> int:
        return self._graph.dim

    @property
    def num_nodes(self) -> int:
        return int(self._graph.num_nodes)

    @property
    def capacity(self) -> int:
        return self._graph.capacity

    @property
    def metric(self) -> MetricType:
        return self._metric

    @property
    def data_type(self) -> dt.DataType:
        return self._data_type

    @property
    def graph(self) -> GraphArrays:
        return self._graph

    def index_memory_bytes(self) -> int:
        """Total index memory by the reference's arena math
        (Index.h:176-178, getTotalIndexMemory at 505-515)."""
        return (
            node_size_bytes(
                self.dim, self._data_type.numpy_dtype, self.max_edges_per_node
            )
            * self.capacity
        )

    def index_summary(self) -> str:
        """Analog of getIndexSummary (Index.h:538-548)."""
        return (
            "\n----------------Index Parameters----------------\n"
            f"Metric: {self._metric.value}\n"
            f"Data type: {self._data_type.value}\n"
            f"Dimension: {self.dim}\n"
            f"Max edges per node (M): {self.max_edges_per_node}\n"
            f"Capacity (max node count): {self.capacity}\n"
            f"Current num nodes: {self.num_nodes}\n"
            f"Index memory: {self.index_memory_bytes() / 1e9:.3f} GB\n"
            "-------------------------------------------------"
        )

    # -------------------------------------------------------------- threading
    def set_num_threads(self, num_threads: int) -> None:
        """Compat with the reference API (bindings.cpp setNumThreads). The
        TPU engine has no host thread pool; kept as a recorded knob."""
        if num_threads <= 0:
            raise ValueError("num_threads must be > 0")
        self._num_threads = num_threads

    @property
    def num_threads(self) -> int:
        return self._num_threads

    def set_query_batch_size(self, batch_size: int) -> None:
        """TPU-native knob: how many queries run per jit-compiled batch."""
        if batch_size <= 0:
            raise ValueError("batch_size must be > 0")
        self._query_batch_size = batch_size

    def set_expand_factor(self, expand_factor: int) -> None:
        """TPU-native knob: beam entries expanded per device step (fewer,
        wider hops; recall is neutral-to-positive, throughput higher)."""
        if expand_factor <= 0:
            raise ValueError("expand_factor must be > 0")
        self._expand_factor = expand_factor

    # ------------------------------------------------------------------- add
    def add(
        self,
        data: np.ndarray,
        ef_construction: int,
        num_initializations: int = 100,
        labels: Optional[Sequence[int]] = None,
    ) -> None:
        """Insert a batch of vectors (bindings.cpp:64-119 addImpl +
        Index::addBatch, Index.h:300-329). Default labels continue the
        GLOBAL insertion iota (num_nodes..num_nodes+n) — deviating from
        the reference's per-call 0..n default (bindings.cpp:86-88), which
        silently duplicates labels across multiple add() calls; see
        docs/python_api.md."""
        if num_initializations <= 0:
            raise ValueError("num_initializations must be greater than 0.")
        data = np.asarray(data)
        if data.ndim == 1:
            data = data[None, :]
        if data.ndim != 2 or data.shape[1] != self.dim:
            raise ValueError(
                f"Data has incorrect dimensions: {data.shape}; expected "
                f"[N, {self.dim}]"
            )
        n = data.shape[0]
        if labels is None:
            start = self.num_nodes
            labels_arr = np.arange(start, start + n, dtype=np.int32)
        else:
            labels_arr = np.asarray(labels, dtype=np.int32)
            if labels_arr.shape[0] != n:
                raise ValueError("labels must have the same length as data")
        self._graph = build_mod.add_batch(
            self._graph,
            data.astype(self._data_type.numpy_dtype, copy=False),
            labels_arr,
            ef_construction=ef_construction,
            metric=self._metric,
            num_initializations=num_initializations,
            stats=self._build_stats if self._collect_stats else None,
        )

    # ---------------------------------------------------------------- search
    def search(
        self,
        queries: np.ndarray,
        K: int,
        ef_search: int,
        num_initializations: int = 100,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Batched kNN query. Returns (dists [B, K] float32,
        labels [B, K] int). Mirrors searchImpl (bindings.cpp:161-228);
        the thread-parallel query loop becomes one device batch."""
        if num_initializations <= 0:
            raise ValueError(
                "num_initializations must be greater than 0."
            )  # Index.h:846-849
        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        if queries.shape[1] != self.dim:
            raise ValueError(
                f"Queries have incorrect dimensions {queries.shape}; "
                f"expected [B, {self.dim}]"
            )
        b = queries.shape[0]
        out_d = np.empty((b, K), np.float32)
        out_l = np.empty((b, K), np.int32)
        bs = self._query_batch_size
        g = self._graph
        pending = []  # dispatch ALL batches before materializing any:
        # device dispatch is async, so chunks pipeline through the device
        # instead of serializing on per-chunk host transfers
        for lo in range(0, b, bs):
            hi = min(lo + bs, b)
            chunk = queries[lo:hi]
            pad = 0
            if hi - lo < bs and b > bs and not self._collect_stats:
                # pad partial trailing chunk to the bucket to avoid a
                # recompile. With collect_stats the tail runs UNPADDED
                # instead: the jit counter sums over every lane, so pad
                # lanes would inflate the per-query distance-computation
                # stats the benchmarks compare against the reference —
                # exactness is worth the one extra compiled shape.
                pad = bs - (hi - lo)
                chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)])
            # integer indexes keep integer queries so the exact int32
            # distance path applies (reference parity,
            # SquaredL2SimdExtensions.h:32-76); others query in float32
            if np.issubdtype(self._data_type.numpy_dtype, np.integer):
                qdev = jnp.asarray(
                    chunk.astype(self._data_type.numpy_dtype, copy=False)
                )
            else:
                qdev = jnp.asarray(chunk, dtype=jnp.float32)
            res = batched_search(
                g.vectors,
                g.links,
                g.labels,
                g.num_nodes,
                qdev,
                k=K,
                ef=max(ef_search, K),  # Index.h:390
                metric=self._metric,
                num_initializations=num_initializations,
                expand_factor=self._expand_factor,
            )
            pending.append((lo, hi, res))
        for lo, hi, res in pending:
            out_d[lo:hi] = np.asarray(res.dists)[: hi - lo]
            out_l[lo:hi] = np.asarray(res.labels)[: hi - lo]
            if self._collect_stats:
                self._distance_computations += int(res.dist_computations)
        return out_d, out_l

    def search_single(
        self,
        query: np.ndarray,
        K: int,
        ef_search: int,
        num_initializations: int = 100,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Single-query search (bindings.cpp:121-159). Returns
        (dists [K], labels [K])."""
        d, l = self.search(
            np.asarray(query)[None, :], K, ef_search, num_initializations
        )
        return d[0], l[0]

    def search_exact(
        self, queries: np.ndarray, K: int, rerank: int = 0,
        fused: bool = True, exact_rerank: bool = True,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """EXACT batched kNN over the committed rows (recall 1.0) via the
        tiled MXU scan (ops.brute_force_knn).

        TPU-native extension with no reference analog: on the MXU the
        full-table scan is the reference's initializeSearch strided scan
        (Index.h:845-870) generalized to every row, and at HBM-resident
        scale (N up to a few million) it is FASTER than graph traversal —
        per-hop row gathers are issue-rate-bound on TPU while dense
        contractions run at MXU speed (cf. TPU-KNN, arXiv:2206.14286).
        Distance conventions match `search` (squared L2 / 1 - <q, x>).
        Returns (dists [B, K] float32, labels [B, K] int32).

        `rerank > 0` (float data only) switches to the two-phase scan:
        one bf16 MXU pass + a `rerank`-wide shortlist, exactly reranked
        in f32 — several times faster; near-1.0 (not guaranteed-1.0)
        recall. By default the shortlist phase runs the fused Pallas
        kernel (ops.fused_knn: matmul + bucket-min reduced in VMEM, so
        the [B, N] key matrix never touches HBM — measured 1.7x
        ops.fast_knn at 1M x 128); `fused=False` keeps the approx_min_k
        form (ops.fast_knn) for float data and the exact int32 scan for
        integers. 8-bit integer tables ride the fused kernel UNPROMOTED
        (exact integer phase-1 keys; ops/fused_scan.py native-int path).
        `exact_rerank=False` skips the rerank's HBM row gather
        (DMA-issue-rate-bound, ~150 ns/row) and ranks by the kernel's
        keys — distances are then key-calibrated (exact for integer
        tables within the native-int depth bound, within bf16 input
        rounding otherwise); it requires the fused shortlist path
        (rerank > 0, fused=True) — other engines always rank by exact
        distances, so the combination raises instead of silently
        running different semantics than asked.
        """
        if not exact_rerank and (rerank <= 0 or not fused):
            raise ValueError(
                "exact_rerank=False requires the fused shortlist path "
                "(rerank > 0 and fused=True); fast_knn and the exact "
                "scan always rank by exact distances"
            )
        queries = np.asarray(queries)
        if queries.ndim == 1:
            queries = queries[None, :]
        if queries.shape[1] != self.dim:
            raise ValueError(
                f"Queries have incorrect dimensions {queries.shape}; "
                f"expected [B, {self.dim}]"
            )
        b = queries.shape[0]
        out_d = np.empty((b, K), np.float32)
        out_l = np.empty((b, K), np.int32)
        bs = self._query_batch_size
        g = self._graph
        if np.issubdtype(self._data_type.numpy_dtype, np.integer):
            qdtype = self._data_type.numpy_dtype
        else:
            qdtype = np.float32
        pending = []
        for lo in range(0, b, bs):
            hi = min(lo + bs, b)
            chunk = queries[lo:hi]
            if hi - lo < bs and b > bs:
                pad = bs - (hi - lo)
                chunk = np.concatenate([chunk, np.repeat(chunk[:1], pad, 0)])
            qdev = jnp.asarray(chunk.astype(qdtype, copy=False))
            int_q = np.issubdtype(qdtype, np.integer)
            if rerank > 0 and (not int_q or (
                fused and g.vectors.dtype in (jnp.uint8, jnp.int8)
            )):
                if fused:
                    dists, ids = fused_knn(
                        g.vectors, qdev, K, self._metric,
                        rerank=rerank, n_valid=g.num_nodes,
                        exact_rerank=exact_rerank,
                    )
                else:
                    dists, ids = fast_knn(
                        g.vectors, qdev, K, self._metric,
                        rerank=rerank, n_valid=g.num_nodes,
                    )
            else:
                if not exact_rerank:
                    raise ValueError(
                        "exact_rerank=False is unavailable for this "
                        "dtype: integer queries outside the fused "
                        "kernel's native 8-bit path route to the exact "
                        "scan, which always ranks by exact distances"
                    )
                dists, ids = brute_force_knn(
                    g.vectors, qdev, K, self._metric, n_valid=g.num_nodes,
                )
            # unbeaten result slots (num_nodes < K) carry inf distance and
            # id 0: mask their labels to -1 like every other search path
            labels = jnp.where(
                jnp.isinf(dists), -1, jnp.take(g.labels, ids, axis=0)
            )
            pending.append((lo, hi, dists, labels))
        for lo, hi, dists, labels in pending:
            out_d[lo:hi] = np.asarray(dists)[: hi - lo]
            out_l[lo:hi] = np.asarray(labels)[: hi - lo]
        if self._collect_stats:
            self._distance_computations += b * int(self.num_nodes)
        return out_d, out_l

    def get_query_distance_computations(self) -> int:
        """Read-and-reset distance-computation counter
        (bindings.cpp:270-274)."""
        total = self._distance_computations
        self._distance_computations = 0
        return total

    def get_build_stats(self) -> dict:
        return dict(self._build_stats)

    def get_graph_outdegree_table(self) -> List[List[int]]:
        """Outbound edges per node, excluding self-loop padding
        (Index::getGraphOutdegreeTable, Index.h:240-251; exposed at
        bindings.cpp:467)."""
        n = self.num_nodes
        links = np.asarray(self._graph.links[:n])
        own = np.arange(n, dtype=links.dtype)[:, None]
        return [row[row != i].tolist() for i, row in zip(own[:, 0], links)]

    # ------------------------------------------------------- persistence/etc
    def save(self, filename: str) -> None:
        ser.save_index(
            filename,
            self._graph,
            self._metric,
            extra={"index_data_type": self._data_type.value},
        )

    # --------------------------------------------------------------- imports
    def allocate_nodes(
        self, data: np.ndarray, labels: Optional[Sequence[int]] = None
    ) -> "Index":
        """Allocate nodes without building edges (bindings.cpp:308-324),
        used with build_graph_links to import an externally built graph."""
        data = np.asarray(data)
        n = data.shape[0]
        n0 = self.num_nodes
        if n0 + n > self.capacity:
            raise RuntimeError("Maximum number of nodes reached.")
        if labels is None:
            labels_arr = np.arange(n0, n0 + n, dtype=np.int32)
        else:
            labels_arr = np.asarray(labels, dtype=np.int32)
        g = self._graph
        vectors = g.vectors.at[n0 : n0 + n].set(
            jnp.asarray(data.astype(self._data_type.numpy_dtype, copy=False))
        )
        labels_dev = g.labels.at[n0 : n0 + n].set(jnp.asarray(labels_arr))
        self._graph = GraphArrays(
            vectors, g.links, labels_dev, jnp.asarray(n0 + n, jnp.int32),
            g.capacity,
        )
        return self

    def build_graph_links(self, mtx_filename: str) -> None:
        """Import edges from a MatrixMarket file (Index::buildGraphLinks,
        Index.h:187-238): each node's first outdegree slots get its
        neighbors; the rest stay self-loops."""
        n = self.num_nodes
        m = self.max_edges_per_node
        from flatnav_tpu import native

        native_links = native.read_mtx(mtx_filename, n, m)
        if native_links is not None:
            g = self._graph
            self._graph = GraphArrays(
                g.vectors,
                g.links.at[:n].set(jnp.asarray(native_links)),
                g.labels,
                g.num_nodes,
                g.capacity,
            )
            return
        adjacency: List[List[int]] = [[] for _ in range(n)]
        with open(mtx_filename) as f:
            header = f.readline()
            if not header.startswith("%%MatrixMarket"):
                raise ValueError("Invalid MatrixMarket header")
            line = f.readline()
            while line.startswith("%"):
                line = f.readline()
            rows, cols, _ = (int(x) for x in line.split())
            if rows != n or cols != n:
                raise ValueError(
                    f"Matrix dimensions {rows}x{cols} do not match index "
                    f"size {n}"
                )
            for line in f:
                if not line.strip():
                    continue
                a, b_ = (int(x) for x in line.split()[:2])
                # 1-indexed per MatrixMarket
                if len(adjacency[a - 1]) < m:
                    adjacency[a - 1].append(b_ - 1)
        links = np.repeat(np.arange(n, dtype=np.int32)[:, None], m, axis=1)
        for i, row in enumerate(adjacency):
            links[i, : len(row)] = row
        g = self._graph
        new_links = g.links.at[:n].set(jnp.asarray(links))
        self._graph = GraphArrays(g.vectors, new_links, g.labels, g.num_nodes, g.capacity)

    # ------------------------------------------------------------- reordering
    def reorder(self, strategies: Sequence[str]) -> None:
        """Graph reordering (doGraphReordering, Index.h:412-427): gorder and
        rcm permutations applied via relabel."""
        from flatnav_tpu import reorder as reorder_mod

        n = self.num_nodes
        for strategy in strategies:
            s = strategy.lower()
            links = np.asarray(self._graph.links[:n])
            if s == "gorder":
                perm = reorder_mod.gorder(links, n, window_size=5)
            elif s == "rcm":
                perm = reorder_mod.rcm_order(links, n)
            else:
                raise ValueError(
                    f"Invalid reordering method: {strategy}"
                )  # Index.h:421-422
            self._relabel(perm)

    def _relabel(self, perm: np.ndarray) -> None:
        """Apply permutation P (new id of old node i = perm[i]), the analog
        of Index::relabel (Index.h:872-926) — done as a dense permute
        instead of in-place cycle chasing."""
        n = self.num_nodes
        g = self._graph
        inv = np.empty(n, dtype=np.int32)
        inv[perm] = np.arange(n, dtype=np.int32)
        vectors = np.asarray(g.vectors[:n])[inv]
        labels = np.asarray(g.labels[:n])[inv]
        links = perm[np.asarray(g.links[:n])][inv]
        new_g = GraphArrays(
            g.vectors.at[:n].set(jnp.asarray(vectors)),
            g.links.at[:n].set(jnp.asarray(links)),
            g.labels.at[:n].set(jnp.asarray(labels)),
            g.num_nodes,
            g.capacity,
        )
        self._graph = new_g


def create(
    distance_type: str,
    dim: int,
    dataset_size: int,
    max_edges_per_node: int,
    verbose: bool = False,
    collect_stats: bool = False,
    index_data_type: dt.DataType = dt.DataType.float32,
) -> Index:
    """Factory mirroring flatnav.index.create (bindings.cpp:484-504)."""
    key = distance_type.lower()
    if key not in _DISTANCE_TYPES:
        raise ValueError(
            f"Invalid distance type: {distance_type}. Valid options are "
            "'l2' and 'angular'."
        )  # bindings.cpp:409-424 validation parity
    return Index(
        metric=_DISTANCE_TYPES[key],
        dim=dim,
        dataset_size=dataset_size,
        max_edges_per_node=max_edges_per_node,
        index_data_type=index_data_type,
        verbose=verbose,
        collect_stats=collect_stats,
    )


def load_index(
    filename: str, verbose: bool = False, collect_stats: bool = False
) -> Index:
    """Load a saved index (Index::loadIndex, Index.h:442-479)."""
    graph, metric, meta = ser.load_index(filename)
    return Index(
        metric=metric,
        dim=meta["dim"],
        dataset_size=meta["capacity"],
        max_edges_per_node=meta["max_edges"],
        index_data_type=dt.DataType(meta.get("index_data_type", meta["dtype"])),
        verbose=verbose,
        collect_stats=collect_stats,
        _graph=graph,
    )
