#!/usr/bin/env python
"""Attribute the scan engines' gap to MXU speed-of-light (VERDICT r02
item 6: 'a measured proof of the binding limit').

Times, at the benchmark shape (N x d table, B queries), each stage of
the fast-scan pipeline IN ISOLATION on the same tiling:

  matmul      one bf16 MXU contraction per tile + a jnp.min reduce
              (no selection at all) -> the pure-FLOPs bound
  minx8       matmul + 8-way split min reduce (selection-free, keeps
              XLA from folding the scan away)
  approx      matmul + hardware approx_min_k per tile (fast_knn phase 1)
  fastknn     the full two-phase engine (incl. shortlist carry + exact
              f32 rerank)
  exact       brute_force_knn (3-pass f32 matmul + top_k)

If `approx` ~= `fastknn` >> `matmul`, the engine is approx_min_k /
selection-bound, not matmul-bound — int8/bf16 phase-1 changes cannot
speed it up, which is what the 10M uint8 retime showed (8.2k qps with
the int8 path vs 8.8k recorded before it). RUN ALONE.
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

from flatnav_tpu.ops.distances import (  # noqa: E402
    MetricType,
    brute_force_knn,
    fast_knn,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tile", type=int, default=262144)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    n, d, b, tile = args.n, args.d, args.b, args.tile
    n_tiles = -(-n // tile)

    rng = np.random.default_rng(0)
    vecs = jnp.asarray(
        rng.standard_normal((n_tiles * tile, d), dtype=np.float32)
    )
    vecs_bf = vecs.astype(jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))
    q_bf = q.astype(jnp.bfloat16)
    flops = 2.0 * n_tiles * tile * b * d
    print(f"device={jax.devices()[0]} N={n} d={d} B={b} tile={tile} "
          f"scan={flops/1e12:.2f} TFLOP", flush=True)

    @jax.jit
    def matmul_only(vt, qt):
        def body(carry, i):
            rows = jax.lax.dynamic_slice_in_dim(vt, i * tile, tile, 0)
            s = jax.lax.dot_general(
                qt, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            return jnp.minimum(carry, jnp.min(s, axis=1)), None

        init = jnp.full((b,), jnp.inf, jnp.float32)
        out, _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
        return out

    @jax.jit
    def approx_phase(vt, qt):
        def body(carry, i):
            rows = jax.lax.dynamic_slice_in_dim(vt, i * tile, tile, 0)
            s = jax.lax.dot_general(
                qt, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            tk, tp = jax.lax.approx_min_k(s, 32)
            prev_k, prev_i = carry
            allk = jnp.concatenate([prev_k, tk], 1)
            alli = jnp.concatenate([prev_i, tp + i * tile], 1)
            negk, pos = jax.lax.top_k(-allk, 32)
            return (-negk, jnp.take_along_axis(alli, pos, 1)), None

        init = (jnp.full((b, 32), jnp.inf, jnp.float32),
                jnp.zeros((b, 32), jnp.int32))
        (ks, _), _ = jax.lax.scan(body, init, jnp.arange(n_tiles))
        return ks

    def timed(label, fn):
        np.asarray(fn())  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        print(f"{label:>8}: {dt*1e3:8.1f} ms  "
              f"{flops/dt/1e12:6.1f} TFLOP/s-equiv  "
              f"{b/dt:8.0f} qps", flush=True)
        return dt

    timed("matmul", lambda: matmul_only(vecs_bf, q_bf))
    timed("approx", lambda: approx_phase(vecs_bf, q_bf))
    timed("fastknn", lambda: fast_knn(
        vecs, q, args.k, MetricType.L2, tile_size=tile, rerank=32,
        n_valid=jnp.asarray(n, jnp.int32))[1])
    timed("exact", lambda: brute_force_knn(
        vecs, q, args.k, MetricType.L2,
        n_valid=jnp.asarray(n, jnp.int32))[1])


if __name__ == "__main__":
    main()
