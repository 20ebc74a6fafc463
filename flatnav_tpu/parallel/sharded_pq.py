"""Model-axis-sharded PQ-ADC scan over a device mesh.

The PQ scan engine (quantization.pq.pq_scan_knn — the beyond-HBM-bytes
path: 8-32x fewer scanned bytes than a raw scan) shards exactly like the
raw scan engines (parallel.sharded_exact): PQ codes row-shard over the
mesh's `model` axis, every shard runs the one-hot MXU contraction over
its rows with LOCAL ids, the optional raw-vector rerank uses the shard's
own raw rows (a candidate row lives on exactly one shard), ids are
offset to GLOBAL, and one all-gather + exact top-k merge produces the
global result. Queries/tables shard over `data` and replicate over
`model`.

Per-query ICI traffic is O(n_model * k) scalars. With 16-byte codes a
single v5e chip holds ~1B rows of codes; the model axis multiplies that
— this is the engine for tables whose RAW vectors exceed a pod slice's
HBM (reference role: Index<ProductQuantizer>, developmental-features/
quantization).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flatnav_tpu.ops.distances import MetricType
from flatnav_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS
from flatnav_tpu.quantization.pq import pq_scan_knn


def sharded_pq_scan(
    codes: jax.Array,  # [rows(+pad), S] uint8 PQ codes
    tables: jax.Array,  # [B, S, nc] f32 ADC tables (pq.adc_tables)
    num_nodes: jax.Array,  # scalar committed prefix
    mesh: Mesh,
    *,
    k: int,
    metric: MetricType = MetricType.L2,
    rerank: int = 32,
    tile_size: int = 32768,
    vectors: jax.Array | None = None,  # [rows(+pad), d] for raw rerank
    queries: jax.Array | None = None,  # [B, d] for raw rerank
    packed_4bit: bool = False,  # codes hold two 4-bit values per byte
):
    """PQ-ADC kNN over a row-sharded code table. Returns (dists [B, k],
    ids [B, k]) with GLOBAL row ids, sharded over the data axis.

    With `vectors` + `queries`, each shard reranks its shortlist against
    its own raw rows (exact distances, shortlist-bounded recall);
    otherwise ranking is exact-f32 ADC (PQ-bounded recall, the only mode
    once raw vectors exceed the mesh's HBM).
    """
    n_model = mesh.shape[MODEL_AXIS]
    rows = codes.shape[0]
    if rows % n_model:
        raise ValueError(f"{rows} code rows not divisible by {n_model}")
    raw = vectors is not None and queries is not None
    if raw and vectors.shape[0] != rows:
        raise ValueError(
            f"vectors rows {vectors.shape[0]} != code rows {rows}"
        )

    vec_spec = P(MODEL_AXIS, None) if raw else P()
    q_spec = P(DATA_AXIS, None) if raw else P()
    vec_arg = vectors if raw else jnp.zeros((0,), jnp.float32)
    q_arg = queries if raw else jnp.zeros((0,), jnp.float32)

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(
            P(MODEL_AXIS, None), P(DATA_AXIS, None, None), P(),
            vec_spec, q_spec,
        ),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )
    def run(codes_local, tables_local, num_nodes, vec_local, q_local):
        n_local = codes_local.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * n_local
        local_valid = jnp.clip(num_nodes - offset, 0, n_local)
        d_loc, i_loc = pq_scan_knn(
            codes_local, tables_local, k, metric=metric,
            tile_size=tile_size, rerank=rerank, n_valid=local_valid,
            vectors=vec_local if raw else None,
            queries=q_local if raw else None,
            packed_4bit=packed_4bit,
        )
        i_glob = i_loc + offset
        all_d = jax.lax.all_gather(d_loc, MODEL_AXIS, axis=0)  # [S, B, k]
        all_i = jax.lax.all_gather(i_glob, MODEL_AXIS, axis=0)
        b = tables_local.shape[0]
        cat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, n_model * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_model * k)
        order = jnp.argsort(cat_d, axis=1, stable=True)[:, :k]
        return (
            jnp.take_along_axis(cat_d, order, axis=1),
            jnp.take_along_axis(cat_i, order, axis=1),
        )

    return run(codes, tables, num_nodes, vec_arg, q_arg)
