"""Product Quantization: codebooks, codes, ADC/SDC distances, graph search.

Re-design of the reference's experimental PQ layer
(/root/reference/developmental-features/quantization/ProductQuantization.h):
the dim is split into `num_subquantizers` subspaces, each with a 2^nbits
codebook trained by k-means (train at 210-276). A PQ'd index stores codes
instead of raw vectors (`transformDataImpl` encodes on insert, 349-356);
search uses the asymmetric distance (per-query table over centroids,
367-385) and pruning uses the symmetric code-to-code distance via
precomputed tables (395-411, built at 475-494).

TPU mapping: training is a vmap of on-device k-means over subspaces; encode
is a vmapped distance-block argmin; ADC search plugs into the shared
`beam_search_core` via a table-lookup `score_block` — the hot loop gathers
[B, M] uint8 code rows instead of float vectors, cutting per-hop HBM
traffic by 4*d/num_subquantizers.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from flatnav_tpu.index.search import BeamResults, SearchResults, beam_search_core
from flatnav_tpu.ops.distances import MetricType, query_block_distances
from flatnav_tpu.quantization.kmeans import kmeans


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class PQCodebook:
    """centroids: [M_pq, ncentroids, d_sub] float32."""

    centroids: jax.Array

    @property
    def num_subquantizers(self) -> int:
        return self.centroids.shape[0]

    @property
    def num_centroids(self) -> int:
        return self.centroids.shape[1]

    @property
    def subdim(self) -> int:
        return self.centroids.shape[2]


def _split(data: jax.Array, m_pq: int) -> jax.Array:
    n, d = data.shape
    return data.reshape(n, m_pq, d // m_pq).swapaxes(0, 1)  # [M_pq, n, dsub]


@functools.partial(jax.jit, static_argnames=())
def _encode(centroids: jax.Array, data: jax.Array) -> jax.Array:
    """codes [n, M_pq] uint8 (computePQCode, ProductQuantization.h:159-202)."""
    sub = _split(data.astype(jnp.float32), centroids.shape[0])

    def per_sub(cents, pts):  # [nc, dsub], [n, dsub]
        d = (
            jnp.sum(pts * pts, 1, keepdims=True)
            - 2.0 * pts @ cents.T
            + jnp.sum(cents * cents, 1)[None, :]
        )
        return jnp.argmin(d, axis=1)

    codes = jax.vmap(per_sub)(centroids, sub)  # [M_pq, n]
    return codes.T.astype(jnp.uint8)


@jax.jit
def _decode(centroids: jax.Array, codes: jax.Array) -> jax.Array:
    """[n, d] float32 reconstruction (decode, ProductQuantization.h:286-306)."""
    m_pq = centroids.shape[0]

    def per_sub(cents, c):  # [nc, dsub], [n]
        return jnp.take(cents, c.astype(jnp.int32), axis=0)

    sub = jax.vmap(per_sub)(centroids, codes.T.astype(jnp.int32))
    return sub.swapaxes(0, 1).reshape(codes.shape[0], -1)


@functools.partial(jax.jit, static_argnames=("metric",))
def _adc_tables_impl(centroids, queries, metric):
    """Per-query distance tables [B, M_pq, ncentroids]
    (computeDistanceTable, ProductQuantization.h:367-385).

    For IP, table entries are -<q_sub, c> so that sum_m table = -<q, x>;
    the caller adds the constant 1 to match `1 - <q, x>`.
    """
    m_pq = centroids.shape[0]
    b, d = queries.shape
    qs = queries.astype(jnp.float32).reshape(b, m_pq, d // m_pq)
    qs = qs.swapaxes(0, 1)  # [M_pq, B, dsub]

    def per_sub(cents, q):
        if metric == MetricType.IP:
            return -(q @ cents.T)
        return (
            jnp.sum(q * q, 1, keepdims=True)
            - 2.0 * q @ cents.T
            + jnp.sum(cents * cents, 1)[None, :]
        )

    t = jax.vmap(per_sub)(centroids, qs)  # [M_pq, B, nc]
    return t.swapaxes(0, 1)  # [B, M_pq, nc]


@jax.jit
def _sdc_tables(centroids: jax.Array) -> jax.Array:
    """Symmetric tables [M_pq, nc, nc] (ProductQuantization.h:475-494)."""

    def per_sub(cents):
        return (
            jnp.sum(cents * cents, 1, keepdims=True)
            - 2.0 * cents @ cents.T
            + jnp.sum(cents * cents, 1)[None, :]
        )

    return jax.vmap(per_sub)(centroids.astype(jnp.float32))


class ProductQuantizer:
    """FAISS-style product quantizer (ProductQuantization.h:91-571).

    Train types DEFAULT / HOT_START / SHARED / HYPERCUBE
    (ProductQuantization.h:534-543) map to the `train_type` argument.
    """

    def __init__(
        self,
        dim: int,
        num_subquantizers: int = 8,
        nbits: int = 8,
        metric: MetricType = MetricType.L2,
    ):
        if dim % num_subquantizers:
            raise ValueError(
                f"dim {dim} not divisible by {num_subquantizers} subquantizers"
            )
        if nbits not in (4, 8):
            raise ValueError(
                "nbits must be 8 (256 centroids, the reference's layout) or "
                "4 (16 centroids — the TPU-native fast-scan point: the "
                "one-hot ADC contraction's FLOPs scale with 2^nbits, so "
                "nc=16 cuts the MXU work 16x per scanned code)"
            )
        if nbits == 4 and num_subquantizers % 2:
            raise ValueError("nbits=4 requires an even num_subquantizers "
                             "(two codes pack per byte)")
        self.dim = dim
        self.num_subquantizers = num_subquantizers
        self.nbits = nbits
        self.num_centroids = 1 << nbits
        self.metric = metric
        self.codebook: Optional[PQCodebook] = None

    @property
    def is_trained(self) -> bool:
        return self.codebook is not None

    def code_size_bytes(self) -> int:
        return self.num_subquantizers * self.nbits // 8

    def train(
        self,
        data: np.ndarray,
        n_iters: int = 62,
        train_type: str = "default",
        seed: int = 0,
    ) -> "ProductQuantizer":
        """Per-subspace k-means (train, ProductQuantization.h:210-276).

        train_type (ProductQuantization.h:534-543):
          default   — fresh k-means per subspace
          hot_start — continue Lloyd iterations from the existing codebook
          shared    — one codebook shared across subspaces
          hypercube — hypercube initialization
        """
        data = np.asarray(data, dtype=np.float32)
        init = "hypercube" if train_type == "hypercube" else "default"
        subs = data.reshape(data.shape[0], self.num_subquantizers, -1)
        if train_type == "hot_start":
            if not self.is_trained:
                raise RuntimeError("hot_start requires an existing codebook")
            from flatnav_tpu.quantization.kmeans import _lloyd

            all_c = []
            for m in range(self.num_subquantizers):
                cents, _ = _lloyd(
                    jnp.asarray(subs[:, m]),
                    self.codebook.centroids[m],
                    n_iters,
                )
                all_c.append(cents)
            self.codebook = PQCodebook(jnp.stack(all_c))
            return self
        if train_type == "shared":
            # one codebook shared across subspaces
            flat = subs.reshape(-1, subs.shape[2])
            cents, _ = kmeans(flat, self.num_centroids, n_iters, init, seed)
            centroids = jnp.broadcast_to(
                cents[None], (self.num_subquantizers,) + cents.shape
            )
        else:
            all_c = []
            for m in range(self.num_subquantizers):
                cents, _ = kmeans(
                    subs[:, m], self.num_centroids, n_iters, init, seed + m
                )
                all_c.append(cents)
            centroids = jnp.stack(all_c)
        self.codebook = PQCodebook(centroids)
        return self

    def _require_trained(self):
        if not self.is_trained:
            raise RuntimeError("ProductQuantizer must be trained first")

    def encode(self, data) -> jax.Array:
        self._require_trained()
        return _encode(self.codebook.centroids, jnp.asarray(data))

    def decode(self, codes) -> jax.Array:
        self._require_trained()
        return _decode(self.codebook.centroids, jnp.asarray(codes))

    def adc_tables(self, queries) -> jax.Array:
        """Per-query asymmetric distance tables [B, M_pq, 256]."""
        self._require_trained()
        return _adc_tables_impl(
            self.codebook.centroids, jnp.asarray(queries), self.metric
        )

    def sdc_tables(self) -> jax.Array:
        self._require_trained()
        return _sdc_tables(self.codebook.centroids)

    def asymmetric_distances(self, queries, codes) -> jax.Array:
        """[B, n] distances query -> code (getAsymmetricDistance path)."""
        tables = self.adc_tables(queries)  # [B, M_pq, 256]
        codes = jnp.asarray(codes)
        d = score_codes(
            tables,
            jnp.broadcast_to(codes[None], (tables.shape[0],) + codes.shape),
        )
        if self.metric == MetricType.IP:
            d = 1.0 + d
        return d


def pack_codes_lanes(codes: np.ndarray, tile: int = 32768):
    """Host-side lane packing for huge code tables: [N, g] uint8 ->
    ([N_pad*g//128, 128] uint8, N_pad).

    A TPU HBM array's minor dimension is padded to 128 lanes, so a
    [100M, 32] uint8 code table occupies 12.8 GB device-side — 4x its
    3.2 GB of payload — and any full-table HLO temp (round 4's pad/
    concatenate at the old pq.py:392) doubles that again: the measured
    23.8 GB compile-time OOM at the one scale the PQ engine exists for.
    Packing the row-major byte stream into full 128-lane rows stores the
    payload 1:1; `pq_scan_knn(..., lane_packed=True)` unpacks per tile
    in VMEM. Rows are padded host-side (numpy) to a whole number of scan
    tiles — pass the true row count as n_valid.

    Requires 128 % g == 0 (g = bytes/row: num_subquantizers for 8-bit
    codes, num_subquantizers//2 for nibble-packed 4-bit codes).
    """
    codes = np.ascontiguousarray(codes, dtype=np.uint8)
    n, g = codes.shape
    if 128 % g:
        raise ValueError(f"lane packing requires 128 %% bytes/row == 0 "
                         f"(got {g})")
    if (tile * g) % 128:
        raise ValueError(f"tile {tile} x {g} B/row must fill whole lanes")
    n_pad = -(-n // tile) * tile
    flat = np.zeros((n_pad * g // 128, 128), np.uint8)
    flat.reshape(-1)[: n * g] = codes.reshape(-1)
    return flat, n_pad


def pack_codes_4bit(codes) -> jax.Array:
    """[N, S] 4-bit values -> [N, S//2] uint8 (even subspace in the low
    nibble). Halves the scanned HBM bytes for nbits=4 quantizers."""
    codes = jnp.asarray(codes)
    n, s = codes.shape
    assert s % 2 == 0, s
    c = codes.astype(jnp.uint8).reshape(n, s // 2, 2)
    return (c[..., 0] | (c[..., 1] << 4)).astype(jnp.uint8)


def unpack_codes_4bit(packed: jax.Array) -> jax.Array:
    """[N, S//2] uint8 -> [N, S] values in [0, 16) (pack_codes_4bit inverse)."""
    lo = packed & jnp.uint8(0x0F)
    hi = packed >> 4
    return jnp.stack([lo, hi], axis=-1).reshape(packed.shape[0], -1)


def score_codes(tables: jax.Array, codes: jax.Array) -> jax.Array:
    """ADC scoring: tables [B, M_pq, nc], codes [B, C, M_pq] -> [B, C].

    sum over subquantizers of table[b, m, codes[b, c, m]].
    """
    idx = codes.astype(jnp.int32).swapaxes(1, 2)  # [B, M_pq, C]
    looked = jnp.take_along_axis(tables, idx, axis=2)  # [B, M_pq, C]
    return looked.sum(axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "ef", "metric", "num_initializations", "max_hops", "expand_factor"
    ),
)
def pq_beam_search(
    codes: jax.Array,  # [cap(+pad), M_pq] uint8
    links: jax.Array,
    num_nodes: jax.Array,
    tables: jax.Array,  # [B, M_pq, 256] ADC tables for this query batch
    *,
    ef: int,
    metric: MetricType = MetricType.L2,
    num_initializations: int = 100,
    max_hops: int = 0,
    expand_factor: int = 1,
) -> BeamResults:
    """Beam search over PQ codes with ADC scoring — the PQ analog of
    beam_search (Index<ProductQuantizer> in the reference plugs PQ in as a
    DistanceInterface; here it plugs in as a score_block)."""
    offset = 1.0 if metric == MetricType.IP else 0.0

    def score_block(ids: jax.Array) -> jax.Array:
        rows = jnp.take(codes, ids, axis=0)  # [B, C, M_pq] uint8 gather
        return score_codes(tables, rows) + offset

    return beam_search_core(
        links,
        num_nodes,
        tables.shape[0],
        codes.shape[0],
        score_block,
        ef=ef,
        num_initializations=num_initializations,
        max_hops=max_hops,
        expand_factor=expand_factor,
    )


@functools.partial(
    jax.jit,
    static_argnames=(
        "k", "metric", "tile_size", "rerank", "packed_4bit", "lane_packed",
    ),
)
def pq_scan_knn(
    codes: jax.Array,  # [N, S] uint8 (or [N, S//2] when packed_4bit; or
    #                    lane-packed [N_pad*g//128, 128] — see pack_codes_lanes)
    tables: jax.Array,  # [B, S, nc] f32 ADC tables (pq.adc_tables)
    k: int,
    metric: MetricType = MetricType.L2,
    tile_size: int = 32768,
    rerank: int = 32,
    n_valid: jax.Array | None = None,
    vectors: jax.Array | None = None,
    queries: jax.Array | None = None,
    packed_4bit: bool = False,
    lane_packed: bool = False,
):
    """ADC full-table scan on the MXU: the beyond-HBM-scale engine.

    The per-node ADC score sum_s T[b, s, code[n, s]] is a gather in its
    natural form — the slowest primitive on TPU (~150 ns/row measured).
    Re-expressed as a ONE-HOT CONTRACTION it becomes a matmul the MXU
    eats: for a tile of nodes, onehot(codes) [tile, S*nc] (built on the
    VPU per tile, query-independent) contracts with the flattened tables
    [B, S*nc] in one bf16 MXU pass — identical structure to fast_knn's
    phase 1 with S*nc as the feature dimension. A hardware approx_min_k
    shortlist per tile feeds the rerank.

    The contraction runs at MXU peak (measured ~95 TFLOP/s at 10M), so
    throughput is set by its FLOP count 2*N*S*nc per query — 2^nbits is
    the lever, not bandwidth. A 4-bit quantizer (nc=16) cuts the scan
    work 16x per code; with `packed_4bit=True` the codes array holds two
    codes per byte ([N, S//2]) so HBM traffic halves too, and the
    in-tile nibble unpack is VPU-local. That is the fast-scan operating
    point: m_pq=16/nbits=4 at d=128 scans 8 bytes/node at ~2x a raw
    uint8 scan's FLOPs — with the raw-vector rerank below recovering the
    recall the coarser codes give up.

    Rerank modes:
    - `vectors` + `queries` given: RAW-VECTOR rerank — gather the [B, r]
      shortlist's raw rows (r rows/query at ~150 ns issue: three orders
      of magnitude fewer rows than the scan) and rank by exact
      distance. Recall is then shortlist-bounded, not PQ-bounded (the
      scan reads 8-32x fewer bytes than a raw scan; only the r-row
      rerank touches raw data). This is the right mode whenever the raw
      table fits HBM (e.g. 10M x 128 uint8 = 2.6 GB).
    - otherwise: exact-f32 ADC rerank (one-hot select on the VPU, no
      gathers) — recall bounded by PQ quantization error; the only mode
      once raw vectors exceed device memory.

    vs the reference: ProductQuantization.h scores one code at a time
    through the per-query distance table (getAsymmetricDistance,
    ProductQuantization.h:367-385); this is that operation batched over
    [B x N] on the MXU. ADC-mode distances are exact-f32 ADC values
    (+1 offset for IP, matching asymmetric_distances); raw-mode
    distances are exact.

    At 100M-scale pass `lane_packed=True` with codes from
    `pack_codes_lanes` (and the true row count as n_valid): a [N, g]
    uint8 device array pads g to 128 lanes (4x HBM waste at g=32 — with
    the old in-jit pad/concatenate temp, the measured 23.8 GB compile
    OOM of round 4); the packed layout stores payload bytes 1:1 and the
    per-tile reshape is VMEM-local. The table is never copied in-program
    in any mode (the last tile clamps and masks instead of padding).
    """
    b, s2, nc = tables.shape
    g = (s2 // 2) if packed_4bit else s2  # code bytes per row
    if lane_packed:
        # lane-packed layout (pack_codes_lanes): the flat byte stream in
        # full 128-lane rows — payload-1:1 HBM residency (a [N, g] uint8
        # array pads g to 128 lanes device-side: 4x waste at g=32, the
        # round-4 100M OOM). Rows are pre-padded to whole tiles.
        assert codes.shape[1] == 128, codes.shape
        assert 128 % g == 0, g
        n = codes.shape[0] * 128 // g
        assert n_valid is not None, (
            "lane_packed scans the host-padded row count; pass the true "
            "count as n_valid")
    else:
        n = codes.shape[0]
        s_in = codes.shape[1] * 2 if packed_4bit else codes.shape[1]
        assert s_in == s2, (s_in, s2)
    s = s2
    if packed_4bit:
        assert nc <= 16, ("packed_4bit requires a 4-bit quantizer "
                          f"(got {nc} centroids)")
    r = max(rerank, k)
    n_limit = jnp.asarray(n if n_valid is None else n_valid, jnp.int32)
    n_limit = jnp.minimum(n_limit, n)
    if not lane_packed and n < 128:
        # tables below one minimum tile still pad (a <16 KB copy); every
        # larger table is consumed in place via the clamped last tile
        codes = jnp.concatenate(
            [codes, jnp.zeros((128 - n, codes.shape[1]), codes.dtype)],
            axis=0,
        )
        n = 128
    tile = max(min(tile_size, n), 128)
    if lane_packed:
        assert (tile * g) % 128 == 0 and n % tile == 0, (tile, g, n)
    n_tiles = -(-n // tile)
    offset = 1.0 if metric == MetricType.IP else 0.0
    t_flat = tables.reshape(b, s * nc)
    cent_iota = jnp.arange(nc, dtype=jnp.int32)[None, None, :]

    def scan_tile(carry, tile_idx):
        best_key, best_i = carry
        start0 = tile_idx * tile
        if lane_packed:
            start = start0  # rows pre-padded to whole tiles host-side
            rows = jax.lax.dynamic_slice_in_dim(
                codes, start0 * g // 128, tile * g // 128, axis=0
            ).reshape(tile, g)
        else:
            # the last tile CLAMPS into range instead of padding the
            # table (the pad/concatenate materialized a full-table HLO
            # temp — 23.8 GB at 100M uint8, round 4); re-scanned overlap
            # rows are masked below (ids < start0)
            start = jnp.minimum(start0, n - tile)
            rows = jax.lax.dynamic_slice_in_dim(codes, start, tile, axis=0)
        if packed_4bit:
            # HBM saw the packed nibbles; the widening is VPU-local
            rows = unpack_codes_4bit(rows)
        # compare at u8 width: the s32 compare materialized both eq
        # operands as s32[tile, S, nc] HLO temps (2 x 2 GB at
        # tile=131072, nc=256 — the round-5 100M pq compile OOM with
        # 13.4 GB of arguments already resident); u8 keeps the
        # broadcast operands byte-wide (codes are always < 256)
        onehot = (
            rows[:, :, None] == cent_iota.astype(rows.dtype)
        ).astype(jnp.bfloat16).reshape(tile, s * nc)
        # [B, S*nc] x [tile, S*nc] -> [B, tile] on the MXU (bf16 pass)
        key = jax.lax.dot_general(
            t_flat.astype(jnp.bfloat16), onehot,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        ids = start + jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1)
        key = jnp.where((ids >= start0) & (ids < n_limit), key, jnp.inf)
        tile_key, tile_pos = jax.lax.approx_min_k(key, r)
        tile_ids = jnp.take_along_axis(
            jnp.broadcast_to(ids, (b, tile)), tile_pos, axis=1
        )
        all_key = jnp.concatenate([best_key, tile_key], axis=1)
        all_i = jnp.concatenate([best_i, tile_ids], axis=1)
        neg_top, pos = jax.lax.top_k(-all_key, r)
        return (-neg_top, jnp.take_along_axis(all_i, pos, axis=1)), None

    init = (
        jnp.full((b, r), jnp.inf, jnp.float32),
        jnp.zeros((b, r), jnp.int32),
    )
    (cand_k, cand_i), _ = jax.lax.scan(
        scan_tile, init, jnp.arange(n_tiles, dtype=jnp.int32)
    )
    if vectors is not None and queries is not None:
        # raw-vector rerank: r gathered rows/query vs n scanned codes
        rows = jnp.take(vectors, cand_i, axis=0)  # [B, r, d]
        exact = query_block_distances(queries, rows, metric)
    else:
        # exact-f32 ADC rerank of the [B, r] shortlist: one-hot select
        # on the VPU (sum over where(code==c, T[b,s,c], 0)) — gather-free
        if lane_packed:
            # a code row spans g bytes inside a 128-lane row: gather the
            # lane row, then select the row's byte window
            per = 128 // g
            lane_rows = jnp.take(codes, cand_i // per, axis=0)  # [B,r,128]
            bb, rr, _ = lane_rows.shape
            cand_codes = jnp.take_along_axis(
                lane_rows.reshape(bb, rr, per, g),
                (cand_i % per).astype(jnp.int32)[..., None, None],
                axis=2,
            )[:, :, 0, :]  # [B, r, g]
        else:
            cand_codes = jnp.take(codes, cand_i, axis=0)  # [B, r, S]
        if packed_4bit:
            bb, rr, _ = cand_codes.shape
            cand_codes = unpack_codes_4bit(
                cand_codes.reshape(bb * rr, -1)).reshape(bb, rr, s)
        sel = (
            cand_codes.astype(jnp.int32)[:, :, :, None]
            == cent_iota[None]
        )  # [B, r, S, nc]
        exact = jnp.sum(
            jnp.where(sel, tables[:, None, :, :], 0.0), axis=(2, 3)
        ) + offset
    # shortlist slots never filled by a valid row carry an inf scan key
    # (rows past n_valid, or r > valid candidates) — the rerank must not
    # resurrect them with a finite re-score
    exact = jnp.where(jnp.isinf(cand_k), jnp.inf, exact)
    order = jnp.argsort(exact, axis=1, stable=True)[:, :k]
    return (
        jnp.take_along_axis(exact, order, axis=1),
        jnp.take_along_axis(cand_i, order, axis=1),
    )


def pq_search(
    pq: ProductQuantizer,
    codes: jax.Array,
    links: jax.Array,
    labels: jax.Array,
    num_nodes: jax.Array,
    queries,
    *,
    k: int,
    ef: int,
    num_initializations: int = 100,
) -> SearchResults:
    """Top-K ADC search over a PQ-coded graph index."""
    tables = pq.adc_tables(queries)
    beam = pq_beam_search(
        codes,
        links,
        num_nodes,
        tables,
        ef=max(ef, k),
        metric=pq.metric,
        num_initializations=num_initializations,
    )
    top_d = beam.dists[:, :k]
    top_i = beam.ids[:, :k]
    top_labels = jnp.where(
        jnp.isfinite(top_d), jnp.take(labels, top_i, axis=0), -1
    )
    return SearchResults(top_d, top_labels, beam.dist_computations, beam.hops)
