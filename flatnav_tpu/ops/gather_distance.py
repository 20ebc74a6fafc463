"""Fused gather+distance Pallas TPU kernel for the beam-search hop.

The hop's hot op scores candidate ids against their query:
`d[b, c] = dist(queries[b], vectors[ids[b, c]])` (the batched analog of the
reference's per-neighbor distance loop in processCandidateNode,
/root/reference/include/flatnav/index/Index.h:667-705).

The XLA lowering (`jnp.take` + elementwise) materializes the gathered
[B, C, d] block through HBM — written by the gather, read back by the
distance — so the hop pays the gather bytes TWICE and peaks memory at
B*C*d. This kernel streams candidate rows HBM -> VMEM with double-buffered
async row DMAs and reduces them to distances in VMEM, so HBM sees only the
unavoidable row reads plus the [B, C] result: half the traffic, O(TILE)
scratch instead of O(B*C*d).

Distance conventions match ops.distances.query_block_distances exactly
(squared L2 / 1 - <q, x>), including the fixed binary-tree f32 reduction;
results agree with the jnp.take path to the last ulp (XLA's per-program
FMA formation is the only residual — the same one the TP-vs-single-chip
equality tests document).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from flatnav_tpu.ops.distances import MetricType

#: queries per grid step (f32 sublane tile) and candidate-chunk width
#: (rows in flight per DMA wave; 2 chunks double-buffer in VMEM)
_TILE_B = 8
_TILE_C = 512


def _tree_sum_cols(x: jax.Array) -> jax.Array:
    """Fixed binary-tree f32 sum over the last axis (bit-compatible with
    ops.distances._tree_sum_last; duplicated to keep the kernel body free
    of host-module imports)."""
    d = x.shape[-1]
    p = 1 << max(0, (d - 1)).bit_length()
    if p != d:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, p - d)])
    while p > 1:
        p //= 2
        x = x[..., :p] + x[..., p : 2 * p]
    return x[..., 0]


def _kernel(ids_ref, q_ref, vec_ref, out_ref, buf, sems, *, ip: bool):
    tb, tc = ids_ref.shape
    d = vec_ref.shape[1]

    def row_copy(t, j, slot):
        # all rows of a slot share ONE DMA semaphore (semaphore memory is
        # tiny — a per-row array exceeds it); each wait() decrements one
        # copy's worth, so waiting j times drains the slot exactly
        return pltpu.make_async_copy(
            vec_ref.at[ids_ref[t, j]],
            buf.at[slot, j],
            sems.at[slot],
        )

    def issue(t, slot):
        def one(j, carry):
            row_copy(t, j, slot).start()
            return carry

        jax.lax.fori_loop(0, tc, one, 0)

    def wait_all(t, slot):
        def one(j, carry):
            row_copy(t, j, slot).wait()
            return carry

        jax.lax.fori_loop(0, tc, one, 0)

    issue(0, 0)
    for t in range(tb):
        if t + 1 < tb:
            issue(t + 1, (t + 1) % 2)
        wait_all(t, t % 2)
        rows = buf[t % 2].astype(jnp.float32)  # [TC, d]
        q = q_ref[t, :].astype(jnp.float32).reshape(1, d)
        if ip:
            out_ref[t, :] = 1.0 - _tree_sum_cols(rows * q)
        else:
            diff = rows - q
            out_ref[t, :] = _tree_sum_cols(diff * diff)


@functools.partial(jax.jit, static_argnames=("metric", "interpret"))
def gather_distances(
    vectors: jax.Array,
    ids: jax.Array,
    queries: jax.Array,
    metric: MetricType = MetricType.L2,
    interpret: bool = False,
) -> jax.Array:
    """Fused `dist(queries[b], vectors[ids[b, c]])` -> [B, C] float32.

    vectors: [N, d] (float32/bfloat16/float16); stays in HBM.
    ids:     [B, C] int32, all in [0, N).
    queries: [B, d].

    Matches
    `query_block_distances(queries, jnp.take(vectors, ids, axis=0), metric)`
    to the last ulp for float inputs (same ops and tree reduction; FMA
    formation differs per program). Integer tables use the
    int32-accumulation path in ops.distances instead.
    """
    b, c = ids.shape
    n, d = vectors.shape
    tb, tc = _TILE_B, min(_TILE_C, max(c, 8))
    pad_b = -b % tb
    pad_c = -c % tc
    if pad_b or pad_c:
        # padded ids point at row 0 (always a valid row); results sliced off
        ids = jnp.pad(ids, ((0, pad_b), (0, pad_c)))
        queries = jnp.pad(queries, ((0, pad_b), (0, 0)))
    bb, cc = b + pad_b, c + pad_c

    out = pl.pallas_call(
        functools.partial(_kernel, ip=(metric == MetricType.IP)),
        grid=(bb // tb, cc // tc),
        in_specs=[
            pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((tb, d), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),  # vectors stay in HBM
        ],
        out_specs=pl.BlockSpec((tb, tc), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bb, cc), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, tc, d), vectors.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(ids, queries, vectors)
    return out[:b, :c]
