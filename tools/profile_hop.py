#!/usr/bin/env python
"""End-to-end per-hop timing of the REAL beam-search loop (not component
microbenchmarks, which mislead: XLA compiles the loop body as one program,
so standalone op timings don't compose).

Uses max_hops to fix the loop length and measures wall time per hop at the
bench operating point. A/Bs the merge implementation and expand_factor.

RUN ON AN IDLE DEVICE — single-chip TPU contention silently corrupts
timings.
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

import flatnav_tpu.index.search as search_mod  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--ef", type=int, default=512)
    ap.add_argument("--hops", type=int, default=64)
    ap.add_argument("--merges", nargs="+", default=["sort", "gather"])
    ap.add_argument("--expand", type=int, nargs="+", default=[1])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    vectors = jnp.asarray(rng.standard_normal((args.n, args.d), dtype=np.float32))
    links = jnp.asarray(rng.integers(0, args.n, (args.n + 1, args.m)).astype(np.int32))
    queries = jnp.asarray(rng.standard_normal((args.b, args.d), dtype=np.float32))
    num_nodes = jnp.asarray(args.n, jnp.int32)

    print(f"device={jax.devices()[0]} B={args.b} N={args.n} d={args.d} "
          f"M={args.m} ef={args.ef} hops={args.hops}")
    for merge in args.merges:
        for e in args.expand:
            search_mod.MERGE_IMPL = merge
            fn = search_mod.beam_search.__wrapped__  # bypass jit cache keyed
            jitted = jax.jit(
                fn,
                static_argnames=(
                    "ef", "metric", "num_initializations", "max_hops",
                    "expand_factor",
                ),
            )
            res = jitted(
                vectors, links, num_nodes, queries,
                ef=args.ef, max_hops=args.hops, expand_factor=e,
            )
            jax.block_until_ready(res.dists)
            t0 = time.perf_counter()
            reps = 3
            for _ in range(reps):
                res = jitted(
                    vectors, links, num_nodes, queries,
                    ef=args.ef, max_hops=args.hops, expand_factor=e,
                )
            jax.block_until_ready(res.dists)
            dt = (time.perf_counter() - t0) / reps
            per_hop = dt / args.hops
            print(
                f"merge={merge:6s} E={e}: {dt*1e3:8.1f} ms total, "
                f"{per_hop*1e6:8.1f} us/hop, "
                f"{args.b/ per_hop/1e6:6.2f}M q-hops/s"
            )


if __name__ == "__main__":
    main()
