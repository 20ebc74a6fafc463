"""Model-axis-sharded exact/fast kNN scan over a device mesh.

The scan engines (ops.brute_force_knn / ops.fast_knn — the TPU-native fast
path at HBM-resident scale, see Index.search_exact) shard the same way the
graph table does (SURVEY.md §2.6 TP row): vectors row-shard over the
mesh's `model` axis, each shard runs the tiled MXU scan over its rows
with GLOBAL row ids, and one all-gather of the per-shard [B, k]
shortlists + a top-k merge produces the global result. Queries shard over
`data` and replicate over `model`, exactly like `sharded_search`.

Per-query ICI traffic is O(n_model * k) scalars — negligible next to the
per-shard scan — so the scan engine scales to tables beyond one chip's
HBM with near-linear speedup over the model axis (each shard scans N/S
rows).

Results match the single-device scan: distances are computed by the same
kernels per shard; the final merge is an exact stable top-k over all
shard candidates (a row lives on exactly one shard, so candidate sets
partition N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from flatnav_tpu.ops.distances import (
    MetricType,
    brute_force_knn,
    fast_knn,
)
from flatnav_tpu.ops.fused_scan import fused_knn
from flatnav_tpu.parallel.sharding import DATA_AXIS, MODEL_AXIS


def sharded_exact_search(
    vectors: jax.Array,  # [rows(+pad), d] storage dtype
    num_nodes: jax.Array,  # scalar committed prefix
    queries: jax.Array,  # [B, d]
    mesh: Mesh,
    *,
    k: int,
    metric: MetricType = MetricType.L2,
    rerank: int = 0,
    tile_size: int = 65536,
    fused: bool = False,
):
    """Exact (rerank=0) or two-phase fast (rerank>0) kNN over a
    row-sharded table. Returns (dists [B, k], ids [B, k]) with GLOBAL row
    ids, sharded over the data axis like the queries. `fused=True` runs
    the rerank>0 shortlist phase with the fused Pallas scan
    (ops.fused_knn) on each shard instead of approx_min_k.
    """
    n_model = mesh.shape[MODEL_AXIS]
    rows = vectors.shape[0]
    if rows % n_model:
        raise ValueError(f"{rows} table rows not divisible by {n_model}")

    @functools.partial(
        jax.shard_map,
        mesh=mesh,
        in_specs=(P(MODEL_AXIS, None), P(), P(DATA_AXIS, None)),
        out_specs=(P(DATA_AXIS, None), P(DATA_AXIS, None)),
        check_vma=False,
    )
    def run(vec_local, num_nodes, q_local):
        n_local = vec_local.shape[0]
        shard = jax.lax.axis_index(MODEL_AXIS)
        offset = shard * n_local
        # committed rows owned by this shard: clamp the global prefix
        local_valid = jnp.clip(num_nodes - offset, 0, n_local)
        if rerank > 0 and fused:
            d_loc, i_loc = fused_knn(
                vec_local, q_local, k, metric,
                rerank=rerank, n_valid=local_valid,
            )
        elif rerank > 0:
            d_loc, i_loc = fast_knn(
                vec_local, q_local, k, metric,
                tile_size=tile_size, rerank=rerank, n_valid=local_valid,
            )
        else:
            d_loc, i_loc = brute_force_knn(
                vec_local, q_local, k, metric,
                tile_size=tile_size, n_valid=local_valid,
            )
        i_glob = i_loc + offset
        # gather every shard's [B, k] shortlist and merge exactly
        all_d = jax.lax.all_gather(d_loc, MODEL_AXIS, axis=0)  # [S, B, k]
        all_i = jax.lax.all_gather(i_glob, MODEL_AXIS, axis=0)
        b = q_local.shape[0]
        cat_d = jnp.moveaxis(all_d, 0, 1).reshape(b, n_model * k)
        cat_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_model * k)
        order = jnp.argsort(cat_d, axis=1, stable=True)[:, :k]
        return (
            jnp.take_along_axis(cat_d, order, axis=1),
            jnp.take_along_axis(cat_i, order, axis=1),
        )

    return run(vectors, num_nodes, queries)
