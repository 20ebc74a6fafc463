#!/usr/bin/env python
"""Tune the scan engines: tile_size / rerank / batch sweeps for
brute_force_knn and fast_knn. Materialized timing. RUN ALONE.
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
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[32768, 65536, 131072, 262144])
    ap.add_argument("--reranks", type=int, nargs="+", default=[32, 64, 128])
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.standard_normal((args.n, args.d), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((args.b, args.d), dtype=np.float32))
    print(f"device={jax.devices()[0]} N={args.n} d={args.d} B={args.b}",
          flush=True)

    def bench(label, fn):
        t0 = time.perf_counter()
        np.asarray(fn()[1])
        comp = time.perf_counter() - t0
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(fn()[1])
            ts.append(time.perf_counter() - t0)
        print(f"{label}: best {min(ts)*1e3:8.1f} ms -> "
              f"{args.b/min(ts):9.0f} qps (compile {comp:5.1f}s)",
              flush=True)

    for t in args.tiles:
        if t > args.n:
            continue
        bench(f"brute tile={t:6d}          ",
              lambda t=t: brute_force_knn(
                  vecs, q, args.k, MetricType.L2, tile_size=t))
    for t in args.tiles:
        if t > args.n:
            continue
        for r in args.reranks:
            bench(f"fast  tile={t:6d} rerank={r:4d}",
                  lambda t=t, r=r: fast_knn(
                      vecs, q, args.k, MetricType.L2,
                      tile_size=t, rerank=r))


if __name__ == "__main__":
    main()
