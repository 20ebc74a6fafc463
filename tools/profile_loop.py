#!/usr/bin/env python
"""A/B the hop-LOOP lowering (while / scan / unroll) at the bench
operating point, with MATERIALIZED timing (block_until_ready does not
reliably block on tunneled backends).

The hypothesis under test: the runtime steps device-loop iterations
through the host executor, so removing the loop construct entirely
(LOOP_IMPL="unroll" — the hop body inlined hop_cap times into one
straight-line program) removes a per-hop overhead that dominates at the
measured operating points.

RUN ALONE — single-chip contention corrupts timings.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--points", nargs="+", default=["64:128", "16:192"],
                    help="expand_factor:ef pairs")
    ap.add_argument("--loops", nargs="+", default=["while", "scan", "unroll"])
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    vectors = jnp.asarray(
        rng.standard_normal((args.n, args.d), dtype=np.float32)
    )
    links = jnp.asarray(
        rng.integers(0, args.n, (args.n + 1, args.m)).astype(np.int32)
    )
    queries = jnp.asarray(
        rng.standard_normal((args.b, args.d), dtype=np.float32)
    )
    num_nodes = jnp.asarray(args.n, jnp.int32)
    print(f"device={jax.devices()[0]} B={args.b} N={args.n} d={args.d} "
          f"M={args.m}")

    for point in args.points:
        e, ef = (int(v) for v in point.split(":"))
        hop_cap = max((2 * ef + 128) // e, 16)
        for loop in args.loops:
            S.LOOP_IMPL = loop
            try:
                fn = jax.jit(
                    S.beam_search.__wrapped__,
                    static_argnames=(
                        "ef", "metric", "num_initializations", "max_hops",
                        "expand_factor",
                    ),
                )
                tc0 = time.perf_counter()
                res = fn(vectors, links, num_nodes, queries,
                         ef=ef, expand_factor=e)
                np.asarray(res.dists)
                compile_s = time.perf_counter() - tc0
                times = []
                for _ in range(args.reps):
                    t0 = time.perf_counter()
                    res = fn(vectors, links, num_nodes, queries,
                             ef=ef, expand_factor=e)
                    np.asarray(res.dists)
                    times.append(time.perf_counter() - t0)
                best = min(times)
                print(
                    f"E={e:3d} ef={ef:4d} cap={hop_cap:3d} "
                    f"loop={loop:6s}: best {best*1e3:8.1f} ms "
                    f"({args.b/best:9.0f} qps) "
                    f"median {sorted(times)[len(times)//2]*1e3:8.1f} ms "
                    f"compile {compile_s:6.1f}s",
                    flush=True,
                )
            finally:
                S.LOOP_IMPL = "while"


if __name__ == "__main__":
    main()
