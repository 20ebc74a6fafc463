#!/usr/bin/env python
"""A/B diagnosis of the round-2 10M uint8 graph-recall collapse.

Round 2 found graph recall collapsing to 0.21-0.37 on the synthetic
BigANN-class 10M uint8 workload (benchmarks/results_bigann_10m.json)
while the scan engines stayed at ~1.0. Hypothesis: the generator, not
the engine — at 10M the clustered() generator produces ~39k clusters
whose centers (center_scale=0.7) overlap heavily after uint8
quantization, so NO flat graph with M=32 is navigable on it. This script
separates the two candidate causes at 1M scale (fast to build):

  B) uint8, 1M, natural cluster count (~3.9k)  -> isolates the DTYPE
     effect vs the known-good f32 1M result (results_clustered_1m.json)
  C) uint8, 1M, 10M-style cluster count (~39k, centers_per_64k=2560)
     -> isolates the CLUSTER-COUNT/overlap effect at equal N

and optionally validates with the REFERENCE C++ engine on the same data
(bench_ref supports uint8): if the reference collapses on C too, the
workload is proven at fault with the reference's own algorithm.

Writes benchmarks/results_ab_uint8.json.

Usage: python benchmarks/run_ab_uint8.py [--no-baseline] [--rebuild]
"""

import argparse
import json
import os
import subprocess
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
from flatnav_tpu.index.build import add_batch  # noqa: E402
from flatnav_tpu.index.graph import make_empty_graph  # noqa: E402
from flatnav_tpu.index.serialize import load_index, save_index  # noqa: E402
from flatnav_tpu.ops import MetricType, brute_force_knn  # noqa: E402

N, D, M, NQ, K, EFC = 1_000_000, 128, 32, 4096, 10, 100
BATCH = 4096

ARMS = {
    # natural cluster count at 1M (what 1M f32 uses): dtype effect
    "B_uint8_3.9k_clusters": dict(centers_per_64k=256),
    # 10M-style cluster count at 1M: cluster-overlap effect
    "C_uint8_39k_clusters": dict(centers_per_64k=2560),
}


def log(m):
    print(f"[ab] {m}", file=sys.stderr, flush=True)


def run_arm(name, gen_kwargs, args):
    data, queries = clustered(N, D, NQ, dtype=np.uint8, **gen_kwargs)
    cache = f"/tmp/ab_{name}.npz"
    if os.path.exists(cache) and not args.rebuild:
        g, _, meta = load_index(cache)
        build_s = float(meta.get("build_seconds", 0.0))
        log(f"{name}: loaded cached index")
    else:
        t0 = time.time()
        g = add_batch(
            make_empty_graph(N, D, M, dtype=jnp.uint8), data,
            np.arange(N), ef_construction=EFC, metric=MetricType.L2,
        )
        assert int(g.num_nodes) == N
        build_s = time.time() - t0
        log(f"{name}: build {build_s:.1f}s")
        save_index(cache, g, MetricType.L2,
                   extra={"build_seconds": round(build_s, 1)})

    gt = np.asarray(
        brute_force_knn(jnp.asarray(data), jnp.asarray(queries), K)[1]
    )
    q_dev = jnp.asarray(queries)

    def recall(found):
        return float(np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / K
             for a, b in zip(found, gt)]
        ))

    sweep = []
    for ef in (256, 512, 1024, 2048):
        # ef=2048 fresh compiles can kernel-fault the worker on this
        # platform (B-independent; see STATUS.md round-3 notes) — a
        # fault ends the sweep but keeps the arm's recorded points,
        # and the reference baseline below still runs (fresh process
        # semantics are not needed: bench_ref is a subprocess).
        try:
            outs = []
            for lo in range(0, NQ, BATCH):
                r = batched_search(
                    g.vectors, g.links, g.labels, g.num_nodes,
                    q_dev[lo : lo + BATCH], k=K, ef=ef,
                    metric=MetricType.L2, expand_factor=16,
                )
                outs.append(np.asarray(r.labels))
        except Exception as e:
            log(f"{name}: ef={ef} WORKER FAULT ({type(e).__name__}) — "
                f"ending sweep")
            sweep.append({"ef": ef, "fault": True})
            break
        r = recall(np.concatenate(outs, 0))
        log(f"{name}: ef={ef} recall={r:.4f}")
        sweep.append({"ef": ef, "recall": r})
        if r >= 0.95:
            break

    ref = None
    if not args.no_baseline:
        binary = os.path.join(_REPO, "tools/reference_baseline/bench_ref")
        if os.path.exists(binary):
            df, qf, gf = "/tmp/ab_data.u8", "/tmp/ab_q.u8", "/tmp/ab_gt.i32"
            nq_ref = 1000
            data.tofile(df)
            queries[:nq_ref].tofile(qf)
            gt[:nq_ref].astype(np.int32).tofile(gf)
            log(f"{name}: running reference C++ engine on the same data")
            out = subprocess.run(
                [binary, df, qf, gf, str(N), str(nq_ref), str(D),
                 "0.95", str(M), str(EFC), str(K), "uint8"],
                capture_output=True, text=True, timeout=14400,
            )
            if out.returncode == 0:
                ref = json.loads(out.stdout.strip().splitlines()[-1])
                log(f"{name}: reference recall={ref['recall']} "
                    f"@ ef={ref['ef_search']}")
            else:
                log(f"{name}: baseline failed: {out.stderr[-300:]}")

    return {
        "generator": dict(gen_kwargs, n=N, dim=D, dtype="uint8"),
        "build_seconds": round(build_s, 1),
        "graph_sweep": sweep,
        "reference_single_core": ref,
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--arm", choices=sorted(ARMS), default=None,
                    help="run a single arm (default: both)")
    args = ap.parse_args()

    results = {}
    for name, kw in ARMS.items():
        if args.arm and name != args.arm:
            continue
        results[name] = run_arm(name, kw, args)

    path = os.path.join(_REPO, "benchmarks/results_ab_uint8.json")
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(results)
    prev["context"] = (
        "f32 1M natural-cluster control: see results_clustered_1m.json "
        "(graph 0.93-0.95 band); 10M uint8 collapse: "
        "results_bigann_10m.json (0.21-0.37)"
    )
    with open(path, "w") as f:
        json.dump(prev, f, indent=2)
    print(json.dumps(prev))


if __name__ == "__main__":
    main()
