#!/usr/bin/env python
"""Graph-engine operating-point hunt at 100k (VERDICT r02 item 4).

Goal: close the graph-engine gap to the reference single core (2,603 qps
@ 0.9535 measured round 2; ours 2,097 @ 0.9511) by sweeping the two
row-count levers the round-2 bench never exercised together:
compact_width (gather only CC fresh-first candidates per hop) and
m_search (expand only the first M' distance-sorted links), on top of
(ef, expand_factor).

Loads the committed .bench_cache graph for the headline workload (run
`python bench.py --rebuild-cache` first), measures recall for each grid
point, times qualifying points, and writes the winners into the bench
sweep cache so the driver's warm bench run times them.

Usage: python tools/hunt_graph_100k.py [--target 0.95] [--apply]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from flatnav_tpu.bench.synth import clustered  # noqa: E402
from flatnav_tpu.index import batched_search  # noqa: E402
from flatnav_tpu.index.graph import graph_from_numpy  # noqa: E402
from flatnav_tpu.ops import MetricType, brute_force_knn  # noqa: E402

N, D, M, NQ, K, BATCH = 100_000, 128, 32, 8192, 10, 4096


def log(m):
    print(f"[hunt] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--target", type=float, default=0.95)
    ap.add_argument("--repeats", type=int, default=3)
    ap.add_argument("--apply", action="store_true",
                    help="write the winners into .bench_cache/sweep_*.json")
    ap.add_argument("--top", type=int, default=3)
    ap.add_argument("--entry", action="store_true",
                    help="num_initializations-focused grid")
    ap.add_argument("--quick", action="store_true",
                    help="targeted ~10-point grid (each new shape pays a "
                    "1-3 min remote compile; the full grid is ~90)")
    args = ap.parse_args()

    data, queries = clustered(N, D, NQ)
    import hashlib

    h = hashlib.sha256()
    h.update(np.ascontiguousarray(data[:64], dtype=np.float32).tobytes())
    h.update(f"{N}:{D}:{M}:100:{K}:{args.target}".encode())
    key = h.hexdigest()[:16]
    gpath = os.path.join(_REPO, ".bench_cache", f"graph_{key}.npz")
    if not os.path.exists(gpath):
        log(f"no cached graph at {gpath}; run bench.py --rebuild-cache")
        sys.exit(1)
    with np.load(gpath) as z:
        links = z["links"]
    g = graph_from_numpy(data, links, num_nodes=N, capacity=N)
    log(f"loaded cached graph {key}")

    gt = np.asarray(
        brute_force_knn(jnp.asarray(data), jnp.asarray(queries), K)[1]
    )
    q_dev = jnp.asarray(queries)

    def run(ef, e, cw, ms, ni=100):
        outs = []
        for lo in range(0, NQ, BATCH):
            r = batched_search(
                g.vectors, g.links, g.labels, g.num_nodes,
                q_dev[lo : lo + BATCH], k=K, ef=ef, metric=MetricType.L2,
                expand_factor=e, compact_width=cw, m_search=ms,
                num_initializations=ni,
            )
            outs.append(r.labels)
        return np.concatenate([np.asarray(o) for o in outs], 0)

    def recall(found):
        return sum(
            len(set(a.tolist()) & set(b.tolist()))
            for a, b in zip(found, gt)
        ) / gt.size

    # grid: levers that cut gathered rows/hop. Baselines from round 2:
    # (192, 16, 0, 0) and (128, 64, 0, 0).
    if args.quick:
        # m_search is the only lever that cuts DMA-issued rows per hop
        # (gathers are issue-rate bound, ~150 ns/row); pair it with
        # higher ef to recover recall lost to the narrower expansion.
        grid = [
            (192, 16, 0, 0),   # round-2 winner, re-anchor
            (192, 16, 0, 16),
            (256, 16, 0, 16),
            (384, 16, 0, 16),
            (256, 32, 0, 16),
            (256, 16, 0, 12),
            (384, 16, 0, 12),
            (192, 16, 256, 0),
            (256, 16, 384, 16),
        ]
    elif args.entry:
        # num_initializations with ENTRY_IMPL="matmul" is one MXU
        # contraction — a 4096-wide entry scan is nearly free and seeds
        # the beam close to the answer, cutting hops (the only cost that
        # matters: gathered rows/hop x hops).
        grid = [
            (192, 16, 0, 0, 100),   # re-anchor
            (192, 16, 0, 0, 1024),
            (192, 16, 0, 0, 4096),
            (128, 16, 0, 0, 4096),
            (100, 16, 0, 0, 4096),
            (128, 16, 0, 0, 8192),
            (100, 16, 0, 0, 8192),
            (64, 16, 0, 0, 8192),
            (128, 16, 0, 16, 8192),
        ]
    else:
        grid = []
        for ms in (0, 16, 12):
            for e, efs in ((16, (128, 192, 256, 384)),
                           (64, (100, 128, 192, 256)),
                           (32, (128, 192, 256))):
                for cw in (0, 256, 384):
                    for ef in efs:
                        em = e * (ms or M)
                        if cw and cw >= em:
                            continue
                        grid.append((ef, e, cw, ms))

    results = []
    for point in grid:
        ef, e, cw, ms = point[:4]
        ni = point[4] if len(point) > 4 else 100
        t0 = time.time()
        r = recall(run(ef, e, cw, ms, ni))
        dt = time.time() - t0
        log(f"ef={ef} E={e} cw={cw} ms={ms} ni={ni}: recall={r:.4f} "
            f"({dt:.1f}s)")
        if r < args.target:
            continue
        times = []
        for _ in range(args.repeats):
            t0 = time.time()
            run(ef, e, cw, ms, ni)
            times.append(time.time() - t0)
        qps = NQ / min(times)
        log(f"  -> {qps:.0f} qps")
        results.append(
            {"ef": ef, "expand": e, "cw": cw, "ms": ms, "ni": ni,
             "recall": round(r, 4), "qps": round(qps, 1)}
        )

    results.sort(key=lambda x: -x["qps"])
    print(json.dumps(results[: max(args.top * 3, 9)], indent=2))

    if args.apply and results:
        spath = os.path.join(_REPO, ".bench_cache", f"sweep_{key}.json")
        cands = [
            [r["ef"], r["expand"], r["cw"], r["ms"], r.get("ni", 100)]
            for r in results[: args.top]
        ]
        with open(spath, "w") as f:
            json.dump({"candidates": cands, "fast_recall": None}, f)
        log(f"wrote {spath}: {cands}")


if __name__ == "__main__":
    main()
