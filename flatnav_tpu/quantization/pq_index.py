"""PQ-coded index: construction and search over codes (encode-on-insert).

Reference parity: `Index<ProductQuantizer, int>` stores PQ codes instead of
raw vectors — `transformDataImpl` encodes each inserted point
(/root/reference/developmental-features/quantization/ProductQuantization.h:
349-356) and all construction/search distances go through the quantizer
(asymmetric for query-vs-node, symmetric for node-vs-node).

TPU mapping exploits two identities that make the reference's distance
tables unnecessary as separate code paths:

  * ADC(q, code) == L2(q, decode(code)) — the per-query table sum IS the
    distance to the reconstruction;
  * SDC(code_a, code_b) == L2(decode(code_a), decode(code_b)) — the
    symmetric table sum IS the distance between reconstructions.

So the wave pipeline stores codes (M_pq bytes/node — this is where the
memory and gather-bandwidth savings come from), gathers codes in the hot
loops, and decodes small candidate sets on the fly to reuse the raw
diversity-prune and back-edge machinery bit-for-bit.

Node memory: M_pq + 4*M + 4 bytes (vs d*4 + 4*M + 4 raw), e.g. 8x data
compression for d=128, M_pq=8 at some recall cost (PQ is lossy).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from flatnav_tpu.index.build import (
    _commit_back_edges,
    _safe_wave_size,
    commit_links,
    select_neighbors,
)
from flatnav_tpu.index.graph import MAX_WAVE, wave_pad
from flatnav_tpu.ops.distances import MetricType, pairwise_distances
from flatnav_tpu.quantization.pq import (
    ProductQuantizer,
    _adc_tables_impl,
    _decode,
    _encode,
    pq_beam_search,
)


class PQWaveSelection(NamedTuple):
    kept_ids: jax.Array
    kept_dists: jax.Array
    dist_computations: jax.Array
    hops: jax.Array


@functools.partial(jax.jit, static_argnames=("metric",), donate_argnums=(2,))
def back_edge_commit_pq(
    codes: jax.Array,  # [rows, M_pq] uint8
    centroids: jax.Array,  # [M_pq, 256, dsub]
    links: jax.Array,
    targets: jax.Array,
    requesters: jax.Array,
    *,
    metric: MetricType,
) -> jax.Array:
    """PQ back-edge insert/repair: decodes ONLY the touched rows
    (targets + their links + requesters, O(T*(M+R)*d) scratch), never the
    full code table — the 100M-scale requirement PQ exists to serve
    (reference decode: ProductQuantization.h:286-306)."""
    from flatnav_tpu.index.build import _back_edge_core

    def gather(ids):
        c = jnp.take(codes, ids, axis=0)
        flat = c.reshape(-1, c.shape[-1])
        return _decode(centroids, flat).reshape(*ids.shape, -1)

    return _back_edge_core(gather, links, targets, requesters, metric)


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _commit_codes(codes, labels, num_nodes, new_codes, new_labels):
    codes = jax.lax.dynamic_update_slice_in_dim(
        codes, new_codes, num_nodes, axis=0
    )
    labels = jax.lax.dynamic_update_slice(labels, new_labels, (num_nodes,))
    return codes, labels


@functools.partial(
    jax.jit,
    static_argnames=(
        "ef_construction",
        "m_sel",
        "metric",
        "num_initializations",
        "intra_candidates",
    ),
)
def _pq_wave_search_select(
    codes: jax.Array,  # [rows, M_pq] committed codes (wave rows included)
    links: jax.Array,
    num_nodes: jax.Array,
    centroids: jax.Array,  # [M_pq, 256, dsub]
    new_raw: jax.Array,  # [W, d] raw wave vectors (used for ADC tables only)
    n_valid: jax.Array,
    *,
    ef_construction: int,
    m_sel: int,
    metric: MetricType,
    num_initializations: int = 100,
    intra_candidates: int = 0,
) -> PQWaveSelection:
    """PQ analog of build.wave_search_select: ADC beam search over codes +
    exact intra-wave candidates against wave reconstructions + diversity
    prune over decoded candidates."""
    qf = new_raw.astype(jnp.float32)
    tables = _adc_tables_impl(centroids, qf, metric)
    beam = pq_beam_search(
        codes,
        links,
        num_nodes,
        tables,
        ef=ef_construction,
        metric=metric,
        num_initializations=num_initializations,
    )
    cand_d, cand_i = beam.dists, beam.ids

    w = new_raw.shape[0]
    c2 = min(intra_candidates, w) if intra_candidates else 0
    if c2 > 0:
        # intra-wave: ADC(q_i, code_j) == L2/IP(q_i, decode(code_j))
        wave_codes = jax.lax.dynamic_slice_in_dim(codes, num_nodes, w, axis=0)
        decoded = _decode(centroids, wave_codes)  # [W, d]
        intra = pairwise_distances(qf, decoded, metric)
        lane = jnp.arange(w, dtype=jnp.int32)
        allowed = jnp.logical_and(
            lane[None, :] < lane[:, None], lane[None, :] < n_valid
        )
        intra = jnp.where(allowed, intra, jnp.inf)
        neg_top, idx = jax.lax.top_k(-intra, c2)
        intra_d = -neg_top
        intra_ids = jnp.where(jnp.isfinite(intra_d), num_nodes + idx, -1)
        cand_d = jnp.concatenate([cand_d, intra_d], axis=1)
        cand_i = jnp.concatenate([cand_i, intra_ids], axis=1)
        cand_d, cand_i = jax.lax.sort(
            (cand_d, cand_i), dimension=1, num_keys=1, is_stable=True
        )

    # prune over decoded candidates — SDC identity makes this exactly the
    # reference's symmetric-distance pruning (ProductQuantization.h:395-411)
    safe_ids = jnp.maximum(cand_i, 0)
    cand_codes = jnp.take(codes, safe_ids, axis=0)  # [W, C, M_pq]
    flat = cand_codes.reshape(-1, cand_codes.shape[-1])
    cand_vecs = _decode(centroids, flat).reshape(
        cand_codes.shape[0], cand_codes.shape[1], -1
    )
    kept_ids, _, kept_d = select_neighbors(
        cand_d, cand_i, cand_vecs, m_sel, metric
    )
    return PQWaveSelection(kept_ids, kept_d, beam.dist_computations, beam.hops)


class PQIndex:
    """A flat-NSW index over PQ codes (encode-on-insert, reference
    Index<ProductQuantizer> parity). API mirrors flatnav_tpu.index.Index."""

    def __init__(
        self,
        pq: ProductQuantizer,
        dataset_size: int,
        max_edges_per_node: int,
        collect_stats: bool = False,
    ):
        if not pq.is_trained:
            raise RuntimeError("ProductQuantizer must be trained first")
        self.pq = pq
        self._metric = pq.metric
        self._collect_stats = collect_stats
        self._build_stats: dict = {}
        self._distance_computations = 0
        cap = dataset_size
        rows = cap + wave_pad(cap)
        iota = jnp.arange(rows + 1, dtype=jnp.int32)
        self._codes = jnp.zeros((rows, pq.num_subquantizers), jnp.uint8)
        self._links = jnp.broadcast_to(
            iota[:, None], (rows + 1, max_edges_per_node)
        ).copy()
        self._labels = jnp.zeros((rows,), jnp.int32)
        self._num_nodes = jnp.zeros((), jnp.int32)
        self._capacity = cap

    # ------------------------------------------------------------------ info
    @property
    def num_nodes(self) -> int:
        return int(self._num_nodes)

    @property
    def capacity(self) -> int:
        return self._capacity

    @property
    def max_edges_per_node(self) -> int:
        return self._links.shape[1]

    def index_memory_bytes(self) -> int:
        """codes + links + label per node (the PQ memory win)."""
        return (
            self.pq.code_size_bytes() + 4 * self.max_edges_per_node + 4
        ) * self._capacity

    # ------------------------------------------------------------------- add
    def add(
        self,
        data: np.ndarray,
        ef_construction: int,
        num_initializations: int = 100,
        labels=None,
        max_wave: int = MAX_WAVE,
    ) -> None:
        data = np.asarray(data, dtype=np.float32)
        n = data.shape[0]
        if self.num_nodes + n > self._capacity:
            raise RuntimeError("Maximum number of nodes reached.")
        # the graph arrays over-allocate wave_pad rows sized for MAX_WAVE
        # (graph.py) — a wider wave would let the final commit's
        # dynamic_update_slice clamp backward over committed rows
        max_wave = min(max_wave, MAX_WAVE)
        # same HBM guard as the raw path (build.add_batch): the prune
        # decodes a [W, ef+intra, d] f32 candidate block, the same
        # working-set shape _safe_wave_size models, so a GIST-class d
        # would otherwise kill the TPU worker
        m_sel_guard = max(self.max_edges_per_node // 2, 1)
        max_wave = _safe_wave_size(
            max_wave,
            ef_construction=ef_construction,
            m=self.max_edges_per_node,
            d=self.pq.dim,
            expand_factor=1,
            intra_candidates=2 * m_sel_guard,
            capacity=self._capacity,
            table_bytes=self._codes.nbytes + self._links.nbytes,
        )
        if labels is None:
            labels = np.arange(self.num_nodes, self.num_nodes + n, dtype=np.int32)
        labels = np.asarray(labels, dtype=np.int32)
        if labels.shape[0] != n:
            raise ValueError(
                f"labels length {labels.shape[0]} != data rows {n}"
            )
        if n == 0:
            return
        m = self.max_edges_per_node
        m_sel = max(m // 2, 1)
        centroids = self.pq.codebook.centroids
        committed = self.num_nodes
        pos = 0

        if committed == 0:
            code0 = _encode(centroids, jnp.asarray(data[:1]))
            self._codes = self._codes.at[0].set(code0[0])
            self._labels = self._labels.at[0].set(int(labels[0]))
            self._num_nodes = jnp.asarray(1, jnp.int32)
            committed, pos = 1, 1

        bucket_used = 0
        while pos < n:
            w = int(min(max_wave, n - pos))
            # reuse the widest compiled wave shape (see build.add_batch)
            bucket = max(1 << max(0, (w - 1)).bit_length(), 64, bucket_used)
            bucket_used = bucket
            wave_raw = data[pos : pos + w]
            wave_labels = labels[pos : pos + w]
            if w < bucket:
                pad = bucket - w
                wave_raw = np.concatenate([wave_raw, np.repeat(wave_raw[:1], pad, 0)])
                wave_labels = np.concatenate([wave_labels, np.zeros(pad, np.int32)])
            raw_dev = jnp.asarray(wave_raw)
            new_codes = _encode(centroids, raw_dev)
            n_valid = jnp.asarray(w, jnp.int32)
            self._codes, self._labels = _commit_codes(
                self._codes, self._labels, self._num_nodes, new_codes,
                jnp.asarray(wave_labels),
            )
            sel = _pq_wave_search_select(
                self._codes,
                self._links,
                self._num_nodes,
                centroids,
                raw_dev,
                n_valid,
                ef_construction=ef_construction,
                m_sel=m_sel,
                metric=self._metric,
                num_initializations=num_initializations,
                intra_candidates=2 * m_sel,
            )
            if self._collect_stats:
                self._build_stats["distance_computations"] = (
                    self._build_stats.get("distance_computations", 0)
                    + int(sel.dist_computations)
                )
            self._links, self._num_nodes = commit_links(
                self._links, self._num_nodes, sel.kept_ids, n_valid
            )
            # back edges: decode only the touched rows (back_edge_commit_pq)
            kept = np.asarray(sel.kept_ids[:w])
            kept_d = np.asarray(sel.kept_dists[:w])
            src = committed + np.arange(w, dtype=np.int32)
            tgt = kept.reshape(-1)
            src_rep = np.repeat(src, m_sel)
            dist_rep = kept_d.reshape(-1)
            mask = tgt >= 0
            tgt, src_rep, dist_rep = tgt[mask], src_rep[mask], dist_rep[mask]
            if tgt.size:
                def commit(links_, t_, r_, _c=self._codes):
                    return back_edge_commit_pq(
                        _c, centroids, links_, t_, r_, metric=self._metric
                    )

                self._links = _commit_back_edges(
                    commit, self._links, tgt, src_rep, dist_rep
                )
            committed += w
            pos += w

    # ---------------------------------------------------------------- search
    def search(self, queries, K: int, ef_search: int, num_initializations: int = 100):
        from flatnav_tpu.index.search import safe_query_batch

        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        b = queries.shape[0]
        # same HBM guard as the raw path (search.safe_query_batch): chunk
        # the dispatch when the hop working set would overflow the device
        # (conservative: models the decoded f32 width, wider than codes)
        sub = safe_query_batch(
            b, max(ef_search, K), m=self.max_edges_per_node,
            d=self.pq.dim,
            table_bytes=self._codes.nbytes + self._links.nbytes,
        )
        outs_d, outs_l = [], []
        for lo in range(0, b, sub):
            tables = self.pq.adc_tables(queries[lo : lo + sub])
            beam = pq_beam_search(
                self._codes,
                self._links,
                self._num_nodes,
                tables,
                ef=max(ef_search, K),
                metric=self._metric,
                num_initializations=num_initializations,
            )
            top_d = beam.dists[:, :K]
            top_i = beam.ids[:, :K]
            labels = jnp.where(
                jnp.isfinite(top_d),
                jnp.take(self._labels, top_i, axis=0), -1,
            )
            if self._collect_stats:
                self._distance_computations += int(beam.dist_computations)
            outs_d.append(np.asarray(top_d))
            outs_l.append(np.asarray(labels))
        if len(outs_d) == 1:
            return outs_d[0], outs_l[0]
        return np.concatenate(outs_d), np.concatenate(outs_l)

    def search_scan(
        self, queries, K: int, rerank: int = 32, tile_size: int = 32768
    ):
        """ADC full-table scan (pq.pq_scan_knn): graph-free engine scoring
        every committed code via a one-hot MXU contraction — the
        beyond-HBM-scale counterpart of Index.search_exact (codes are
        S bytes/node vs d*dtype for raw vectors). Returns
        (dists [B, K] f32 exact-ADC, labels [B, K] int32)."""
        from flatnav_tpu.quantization.pq import pq_scan_knn

        queries = np.asarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None, :]
        tables = self.pq.adc_tables(queries)
        d, ids = pq_scan_knn(
            self._codes,
            tables,
            K,
            metric=self._metric,
            tile_size=tile_size,
            rerank=rerank,
            n_valid=self._num_nodes,
        )
        labels = jnp.where(
            jnp.isfinite(d), jnp.take(self._labels, ids, axis=0), -1
        )
        return np.asarray(d), np.asarray(labels)

    def get_query_distance_computations(self) -> int:
        total = self._distance_computations
        self._distance_computations = 0
        return total

    # ------------------------------------------------------------------ save
    def save(self, path: str) -> None:
        import json

        n = self.num_nodes
        # versioned JSON metadata like index/serialize.py (the legacy
        # positional `meta` array is kept so older readers still work)
        meta = {
            "format_version": 1,
            "metric": self._metric.value,
            "capacity": self._capacity,
            "max_edges": self.max_edges_per_node,
            "num_nodes": n,
        }
        # Open the file ourselves: np.savez(path) appends ".npz" to bare
        # paths, but save must honor the literal filename (reference
        # saveIndex accepts arbitrary names, Index.h:481-490).
        with open(path, "wb") as f:
            np.savez(
                f,
                codes=np.asarray(self._codes[:n]),
                links=np.asarray(self._links[:n]),
                labels=np.asarray(self._labels[:n]),
                centroids=np.asarray(self.pq.codebook.centroids),
                meta=np.asarray(
                    [self._capacity, self.max_edges_per_node,
                     1 if self._metric == MetricType.IP else 0]
                ),
                metadata=np.frombuffer(
                    json.dumps(meta).encode("utf-8"), dtype=np.uint8
                ),
            )

    @classmethod
    def load(cls, path: str) -> "PQIndex":
        import json

        from flatnav_tpu.quantization.pq import PQCodebook

        with np.load(path) as z:
            if "metadata" in z.files:
                meta = json.loads(bytes(z["metadata"]).decode("utf-8"))
                if meta.get("format_version", 0) > 1:
                    raise ValueError(
                        f"PQ index file {path} has format version "
                        f"{meta['format_version']} > supported 1"
                    )
                cap, m = int(meta["capacity"]), int(meta["max_edges"])
                is_ip = meta["metric"] == MetricType.IP.value
            else:  # legacy positional metadata
                cap, m, is_ip = (int(x) for x in z["meta"])
            centroids = jnp.asarray(z["centroids"])
            codes, links, labels = z["codes"], z["links"], z["labels"]
        m_pq, nc, dsub = centroids.shape
        pq = ProductQuantizer(
            dim=m_pq * dsub,
            num_subquantizers=m_pq,
            nbits=int(nc - 1).bit_length(),  # 16 -> 4, 256 -> 8
            metric=MetricType.IP if is_ip else MetricType.L2,
        )
        pq.codebook = PQCodebook(centroids)
        idx = cls(pq, cap, m)
        n = codes.shape[0]
        idx._codes = idx._codes.at[:n].set(jnp.asarray(codes))
        idx._links = idx._links.at[:n].set(jnp.asarray(links))
        idx._labels = idx._labels.at[:n].set(jnp.asarray(labels))
        idx._num_nodes = jnp.asarray(n, jnp.int32)
        return idx
