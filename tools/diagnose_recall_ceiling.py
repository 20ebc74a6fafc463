#!/usr/bin/env python
"""Diagnose a graph-recall plateau: navigation failure vs distance ties.

Given an index (npz checkpoint) and its workload, this measures:

1. Tie multiplicity around k on EXACT distances — how many candidates sit
   at/below the k-th neighbor distance (at exact/1e-6/1e-3 tolerance). If
   id-recall is capped while multiplicity ~ k, ties are NOT the cause.
2. id-recall vs distance-recall of the graph engine at one operating
   point. dist-recall counts a found neighbor as correct when its
   distance <= the true k-th distance; dist-recall >> id-recall means the
   engine finds equally-near points with different ids (tie-breaking),
   while dist-recall == id-recall means genuine navigation failure.

Round-3 finding on the clustered 1M stand-in (efc=200): zero exact ties
and dist-recall == id-recall == 0.9202 at ef=1536 — the plateau is real
navigation difficulty from cluster-count-proportional-to-n overlap, and
the reference C++ engine plateaus identically on the same data (0.9574
only at ef=3072; see benchmarks/results_clustered_efc200.json). Real
SIFT1M-class data is easier; see the calibrated fixed-cluster variant
(results_clustered-c26_efc200.json).

Usage:
  python tools/diagnose_recall_ceiling.py INDEX.npz [--n 1000000]
      [--dim 128] [--ef 1536] [--expand 16] [--centers-per-64k N]
      [--dtype float32]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from flatnav_tpu.bench.synth import clustered  # noqa: E402
from flatnav_tpu.index import batched_search  # noqa: E402
from flatnav_tpu.index.serialize import load_index  # noqa: E402
from flatnav_tpu.ops import MetricType, brute_force_knn  # noqa: E402

K, BATCH = 10, 4096


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("index")
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--num-queries", type=int, default=8192)
    ap.add_argument("--ef", type=int, default=1536)
    ap.add_argument("--expand", type=int, default=16)
    ap.add_argument("--centers-per-64k", type=int, default=None)
    ap.add_argument("--dtype", default="float32")
    args = ap.parse_args()

    gen_kw = {}
    if args.centers_per_64k is not None:
        gen_kw["centers_per_64k"] = args.centers_per_64k
    data, queries = clustered(
        args.n, args.dim, args.num_queries, dtype=np.dtype(args.dtype),
        **gen_kw,
    )
    g, metric, _ = load_index(args.index)
    q_dev = jnp.asarray(queries)
    nq = args.num_queries

    gt_d, gt_i = [], []
    for lo in range(0, nq, BATCH):
        d_, i_ = brute_force_knn(
            jnp.asarray(data), q_dev[lo : lo + BATCH], 64, metric
        )
        gt_d.append(np.asarray(d_))
        gt_i.append(np.asarray(i_))
    gt_d = np.concatenate(gt_d)
    gt_i = np.concatenate(gt_i)
    dk = gt_d[:, K - 1 : K]
    for name, eps in (("exact", 0.0), ("rel1e-6", 1e-6), ("rel1e-3", 1e-3)):
        mult = (gt_d <= dk * (1.0 + eps)).sum(1)
        print(
            f"tie multiplicity ({name}): mean {mult.mean():.2f} (k={K}); "
            f"frac queries with ties past k: {(mult > K).mean():.4f}"
        )

    t0 = time.time()
    outs_i, outs_d = [], []
    for lo in range(0, nq, BATCH):
        r = batched_search(
            g.vectors, g.links, g.labels, g.num_nodes,
            q_dev[lo : lo + BATCH], k=K, ef=args.ef, metric=metric,
            expand_factor=args.expand,
        )
        outs_i.append(np.asarray(r.labels))
        outs_d.append(np.asarray(r.dists))
    fi = np.concatenate(outs_i)
    fd = np.concatenate(outs_d)
    idr = np.mean(
        [len(set(a.tolist()) & set(b.tolist())) / K
         for a, b in zip(fi, gt_i[:, :K])]
    )
    dr = float((fd[:, :K] <= dk * (1 + 1e-6) + 1e-6).mean())
    print(
        f"graph ef={args.ef} E={args.expand}: id-recall {idr:.4f} "
        f"dist-recall {dr:.4f} ({time.time() - t0:.1f}s)"
    )
    if dr - idr > 0.01:
        print("=> tie-breaking: the engine finds equally-near points "
              "with different ids")
    else:
        print("=> navigation: missing neighbors are genuinely farther "
              "than the found ones")


if __name__ == "__main__":
    main()
