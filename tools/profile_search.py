#!/usr/bin/env python
"""Per-hop ablation profile of the beam-search loop on the current device.

Times each component of the hop body in isolation (steady state, device
arrays resident) to show where the per-hop budget goes: neighbor-row
gather + distance (the HBM-bound core), the beam merge sort, the visited
bitmask ops, and the links gather. Used to direct kernel work (e.g.
whether a fused Pallas gather+distance kernel or a cheaper merge is the
next win).

Run: PYTHONPATH=. python tools/profile_search.py [--n 100000] [--b 2048]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from flatnav_tpu.ops.distances import MetricType, query_block_distances  # noqa: E402


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--ef", type=int, default=128)
    args = ap.parse_args()
    n, d, m, b, ef = args.n, args.d, args.m, args.b, args.ef

    rng = np.random.default_rng(0)
    vectors = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    vectors_bf16 = vectors.astype(jnp.bfloat16)
    links = jnp.asarray(rng.integers(0, n, (n, m)).astype(np.int32))
    queries = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    ids = jnp.asarray(rng.integers(0, n, (b, m)).astype(np.int32))
    cur = jnp.asarray(rng.integers(0, n, (b,)).astype(np.int32))
    visited = jnp.zeros((b, -(-n // 32)), jnp.uint32)
    beam_d = jnp.sort(
        jnp.asarray(rng.standard_normal((b, ef), dtype=np.float32)), axis=1
    )
    beam_i = jnp.asarray(rng.integers(0, n, (b, ef)).astype(np.int32))
    beam_e = jnp.zeros((b, ef), jnp.bool_)
    nd = jnp.asarray(rng.standard_normal((b, m), dtype=np.float32))

    @jax.jit
    def gather_distance(vectors, queries, ids):
        rows = jnp.take(vectors, ids, axis=0)
        return query_block_distances(queries, rows, MetricType.L2)

    @jax.jit
    def links_gather(links, cur):
        return jnp.take(links, cur, axis=0)

    @jax.jit
    def visited_ops(visited, ids):
        words = ids >> 5
        bits = jnp.left_shift(jnp.uint32(1), (ids & 31).astype(jnp.uint32))
        vis = jnp.take_along_axis(visited, words, axis=1)
        fresh = (vis & bits) == 0
        visited = visited.at[
            jnp.arange(ids.shape[0])[:, None], words
        ].add(jnp.where(fresh, bits, jnp.uint32(0)))
        return visited, fresh

    @jax.jit
    def merge_sort(beam_d, beam_i, beam_e, nd, ids):
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        all_i = jnp.concatenate([beam_i, ids], axis=1)
        all_e = jnp.concatenate([beam_e, jnp.zeros_like(ids, jnp.bool_)], axis=1)
        sd, si, se = jax.lax.sort(
            (all_d, all_i, all_e), dimension=1, num_keys=1, is_stable=True
        )
        return sd[:, :ef], si[:, :ef], se[:, :ef]

    @jax.jit
    def merge_topk(beam_d, beam_i, beam_e, nd, ids):
        all_d = jnp.concatenate([beam_d, nd], axis=1)
        all_i = jnp.concatenate([beam_i, ids], axis=1)
        all_e = jnp.concatenate([beam_e, jnp.zeros_like(ids, jnp.bool_)], axis=1)
        neg, pos = jax.lax.top_k(-all_d, ef)
        return (
            -neg,
            jnp.take_along_axis(all_i, pos, axis=1),
            jnp.take_along_axis(all_e, pos, axis=1),
        )

    @jax.jit
    def merge_binary(beam_d, beam_i, beam_e, nd, ids):
        # sort only the M new entries, then positional merge of two sorted
        # lists via searchsorted + scatter
        sd_new, si_new = jax.lax.sort((nd, ids), dimension=1, num_keys=1)
        pos_beam = jnp.arange(ef)[None, :] + jax.vmap(
            lambda a, v: jnp.searchsorted(a, v)
        )(sd_new, beam_d)
        pos_new = jnp.arange(nd.shape[1])[None, :] + jax.vmap(
            lambda a, v: jnp.searchsorted(a, v, side="right")
        )(beam_d, sd_new)
        total = ef + nd.shape[1]
        rowix = jnp.arange(beam_d.shape[0])[:, None]
        out_d = jnp.zeros((beam_d.shape[0], total), beam_d.dtype)
        out_i = jnp.zeros((beam_d.shape[0], total), beam_i.dtype)
        out_e = jnp.zeros((beam_d.shape[0], total), jnp.bool_)
        out_d = out_d.at[rowix, pos_beam].set(beam_d).at[rowix, pos_new].set(sd_new)
        out_i = out_i.at[rowix, pos_beam].set(beam_i).at[rowix, pos_new].set(si_new)
        out_e = out_e.at[rowix, pos_beam].set(beam_e)
        return out_d[:, :ef], out_i[:, :ef], out_e[:, :ef]

    gd = timeit(gather_distance, vectors, queries, ids)
    gd16 = timeit(gather_distance, vectors_bf16, queries, ids)
    lg = timeit(links_gather, links, cur)
    vo = timeit(visited_ops, visited, ids)
    ms = timeit(merge_sort, beam_d, beam_i, beam_e, nd, ids)
    mt = timeit(merge_topk, beam_d, beam_i, beam_e, nd, ids)
    mb = timeit(merge_binary, beam_d, beam_i, beam_e, nd, ids)

    gather_bytes = b * m * d * 4
    print(f"device: {jax.devices()[0]}  B={b} N={n} d={d} M={m} ef={ef}")
    print(f"gather+distance f32 : {gd*1e6:9.1f} us  ({gather_bytes/gd/1e9:.1f} GB/s effective)")
    print(f"gather+distance bf16: {gd16*1e6:9.1f} us  ({gather_bytes/2/gd16/1e9:.1f} GB/s effective)")
    print(f"links gather        : {lg*1e6:9.1f} us")
    print(f"visited gather+scat : {vo*1e6:9.1f} us")
    print(f"merge: full sort    : {ms*1e6:9.1f} us")
    print(f"merge: top_k        : {mt*1e6:9.1f} us")
    print(f"merge: binary merge : {mb*1e6:9.1f} us")
    hop = gd + lg + vo + ms
    print(f"hop total (sort)    : {hop*1e6:9.1f} us -> {b/hop/1e6:.2f}M q-hops/s")


if __name__ == "__main__":
    main()
