#!/usr/bin/env python
"""In-loop ablation of the beam-search hop: toggle each component of the
hop body inside a real lax.while_loop and measure per-hop cost. This is
the only reliable way to attribute time on TPU — component microbenchmarks
don't compose, and the compiled loop is one program.

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

from flatnav_tpu.ops.distances import MetricType, query_block_distances  # noqa: E402


def run_variant(vectors, links, queries, *, ef, hops, skip=()):
    b = queries.shape[0]
    m = links.shape[1]
    n = vectors.shape[0]
    n_words = -(-n // 32)
    rowix = jnp.arange(b, dtype=jnp.int32)

    @jax.jit
    def go(vectors, links, queries):
        beam_d = jnp.full((b, ef), jnp.inf, jnp.float32).at[:, 0].set(0.0)
        beam_i = jnp.zeros((b, ef), jnp.int32)
        beam_e = jnp.ones((b, ef), jnp.bool_).at[:, 0].set(False)
        visited = jnp.zeros((b, n_words), jnp.uint32)
        tri = jnp.tril(jnp.ones((m, m), jnp.bool_), k=-1)

        def body(state):
            beam_d, beam_i, beam_e, visited, it = state
            unexp = ~beam_e
            sel = jnp.argmax(unexp, axis=1)
            cur = beam_i[rowix, sel]
            beam_e2 = beam_e.at[rowix, sel].set(True)

            if "links" in skip:
                nbrs = (cur[:, None] + jnp.arange(m)[None, :] + it) % n
            else:
                nbrs = jnp.take(links, cur, axis=0)

            if "visited" in skip:
                fresh = jnp.ones((b, m), jnp.bool_)
            else:
                words = nbrs >> 5
                bits = jnp.left_shift(
                    jnp.uint32(1), (nbrs & 31).astype(jnp.uint32)
                )
                vw = jnp.take_along_axis(visited, words, axis=1)
                fresh = (vw & bits) == 0
                dup = nbrs[:, :, None] == nbrs[:, None, :]
                fresh &= ~jnp.any(dup & tri[None], axis=2)
                visited = visited.at[rowix[:, None], words].add(
                    jnp.where(fresh, bits, jnp.uint32(0))
                )

            if "distance" in skip:
                nd = (nbrs % 1000).astype(jnp.float32) + it
            else:
                vecs = jnp.take(vectors, nbrs, axis=0)
                nd = query_block_distances(queries, vecs, MetricType.L2)
            nd = jnp.where(fresh, nd, jnp.inf)

            if "merge" in skip:
                # replace worst m beam slots (keeps loop-carried shapes)
                beam_d2 = jnp.concatenate([beam_d[:, : ef - m], nd], axis=1)
                beam_i2 = jnp.concatenate([beam_i[:, : ef - m], nbrs], axis=1)
                beam_e3 = jnp.concatenate(
                    [beam_e2[:, : ef - m], ~fresh], axis=1
                )
            else:
                sd, si, se = jax.lax.sort(
                    (
                        jnp.concatenate([beam_d, nd], axis=1),
                        jnp.concatenate([beam_i, nbrs], axis=1),
                        jnp.concatenate([beam_e2, ~fresh], axis=1),
                    ),
                    dimension=1,
                    num_keys=1,
                    is_stable=True,
                )
                beam_d2, beam_i2, beam_e3 = sd[:, :ef], si[:, :ef], se[:, :ef]
            return beam_d2, beam_i2, beam_e3, visited, it + 1

        def cond(state):
            return state[-1] < hops

        out = jax.lax.while_loop(
            cond, body, (beam_d, beam_i, beam_e, visited, jnp.int32(0))
        )
        return out[0], out[3]

    r = go(vectors, links, queries)
    jax.block_until_ready(r)
    reps = 3
    t0 = time.perf_counter()
    for i in range(reps):
        r = go(vectors, links, queries)
        jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps / hops


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--b", type=int, default=2048)
    ap.add_argument("--ef", type=int, default=512)
    ap.add_argument("--hops", type=int, default=128)
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    vectors = jnp.asarray(rng.standard_normal((args.n, args.d), dtype=np.float32))
    links = jnp.asarray(
        rng.integers(0, args.n, (args.n + 1, args.m)).astype(np.int32)
    )
    queries = jnp.asarray(rng.standard_normal((args.b, args.d), dtype=np.float32))
    print(
        f"device={jax.devices()[0]} B={args.b} N={args.n} d={args.d} "
        f"M={args.m} ef={args.ef} hops={args.hops}"
    )
    variants = [
        ("full", ()),
        ("no-merge", ("merge",)),
        ("no-visited", ("visited",)),
        ("no-distance", ("distance",)),
        ("no-links", ("links",)),
        ("only-merge", ("visited", "distance", "links")),
        ("only-distance", ("visited", "merge", "links")),
    ]
    for name, skip in variants:
        per_hop = run_variant(
            vectors, links, queries, ef=args.ef, hops=args.hops, skip=skip
        )
        print(f"{name:14s}: {per_hop*1e6:9.1f} us/hop", flush=True)


if __name__ == "__main__":
    main()
