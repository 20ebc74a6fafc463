#!/usr/bin/env python
"""A/B the hop-scoring lowering (SCORE_IMPL: jnp.take vs the fused Pallas
gather+distance kernel) at hop shapes, standalone (outside the hop loop)
and end-to-end (inside beam_search). Materialized timing.

RUN ALONE — host contention poisons the tunnel executor.
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

import flatnav_tpu.index.search as S  # noqa: E402
from flatnav_tpu.ops.distances import (  # noqa: E402
    MetricType,
    query_block_distances,
)
from flatnav_tpu.ops.gather_distance import gather_distances  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--c", type=int, default=2048, help="candidates/query")
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--e2e", action="store_true",
                    help="also run full beam_search take-vs-pallas")
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    vectors = jnp.asarray(
        rng.standard_normal((args.n, args.d), dtype=np.float32)
    )
    ids = jnp.asarray(
        rng.integers(0, args.n, (args.b, args.c)).astype(np.int32)
    )
    queries = jnp.asarray(
        rng.standard_normal((args.b, args.d), dtype=np.float32)
    )
    gb = args.b * args.c * args.d * 4 / 1e9
    print(f"device={jax.devices()[0]} B={args.b} C={args.c} d={args.d} "
          f"N={args.n}  gather={gb:.2f} GB", flush=True)

    @jax.jit
    def take_form(vectors, ids, queries):
        rows = jnp.take(vectors, ids, axis=0)
        return query_block_distances(queries, rows, MetricType.L2)

    for name, fn in (
        ("take", lambda: take_form(vectors, ids, queries)),
        ("pallas", lambda: gather_distances(
            vectors, ids, queries, MetricType.L2)),
    ):
        tc = time.perf_counter()
        np.asarray(fn())
        compile_s = time.perf_counter() - tc
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn())
            times.append(time.perf_counter() - t0)
        best = min(times)
        print(f"score={name:7s}: best {best*1e3:8.1f} ms "
              f"({gb/best:6.1f} GB/s effective) "
              f"median {sorted(times)[len(times)//2]*1e3:8.1f} ms "
              f"compile {compile_s:5.1f}s", flush=True)

    if args.e2e:
        links = jnp.asarray(
            rng.integers(0, args.n, (args.n + 1, 32)).astype(np.int32)
        )
        num_nodes = jnp.asarray(args.n, jnp.int32)
        for impl in ("take", "pallas"):
            S.SCORE_IMPL = impl
            try:
                fn = jax.jit(
                    S.beam_search.__wrapped__,
                    static_argnames=(
                        "ef", "metric", "num_initializations", "max_hops",
                        "expand_factor",
                    ),
                )
                tc = time.perf_counter()
                r = fn(vectors, links, num_nodes, queries,
                       ef=128, expand_factor=64)
                np.asarray(r.dists)
                compile_s = time.perf_counter() - tc
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    r = fn(vectors, links, num_nodes, queries,
                           ef=128, expand_factor=64)
                    np.asarray(r.dists)
                    times.append(time.perf_counter() - t0)
                best = min(times)
                print(f"e2e score={impl:7s}: best {best*1e3:8.1f} ms "
                      f"({args.b/best:8.0f} qps) compile {compile_s:5.1f}s",
                      flush=True)
            finally:
                S.SCORE_IMPL = "take"


if __name__ == "__main__":
    main()
