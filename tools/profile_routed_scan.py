#!/usr/bin/env python
"""Measure why IVF-style pruned scans lose to the dense fast scan here.

Quantifies the two bounds that killed the cluster-routed engine
(ops/routed_scan.py) on this workload family, reproducing the numbers
cited in its module docstring and docs/benchmarking.md:

  1. ROUTING CEILING — the fraction of true k-NN whose balanced-cell
     block lands in the query's top-P routed blocks, as a function of
     the scan fraction P*block/n. No pruned engine can exceed this
     recall while scanning that fraction.
  2. UNION CAPTURE — the fraction of each query's top-P probe list that
     a per-group vote union of U blocks actually scans (the only shape
     that keeps the pruned scan a dense MXU matmul), plus the number of
     distinct blocks a group votes for.

And the end-to-end recall of the working routed engine at those
settings, next to the measured ceiling. Matches the TPU-KNN finding
(arXiv:2206.14286) that dense scans at peak FLOP/s beat inverted-file
pruning on TPU at HBM-resident scale. RUN ALONE (one device job at a
time).

Usage:
  python tools/profile_routed_scan.py [--n 100000] [--dim 128]
      [--centers-per-64k 256] [--block 512]
"""

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from flatnav_tpu.bench.synth import clustered  # noqa: E402
from flatnav_tpu.ops import (  # noqa: E402
    MetricType,
    brute_force_knn,
    pairwise_distances,
)
from flatnav_tpu.ops.distances import _as_f32  # noqa: E402
from flatnav_tpu.ops.routed_scan import (  # noqa: E402
    build_routed_scan,
    routed_knn,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--num-queries", type=int, default=1024)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--centers-per-64k", type=int, default=256)
    ap.add_argument("--block", type=int, default=512)
    args = ap.parse_args()
    n, d, nq, k = args.n, args.dim, args.num_queries, args.k

    data, queries = clustered(
        n, d, nq, centers_per_64k=args.centers_per_64k
    )
    _, gt_i = brute_force_knn(
        jnp.asarray(data), jnp.asarray(queries), k, MetricType.L2,
        tile_size=32768,
    )
    gt_i = np.asarray(gt_i)

    rs = build_routed_scan(data, block=args.block)
    nb = rs.block_centroids.shape[0]

    # block of every true neighbor
    ids_np = np.asarray(rs.ids)
    pos_of = np.full(n, -1, np.int64)
    real = ids_np >= 0
    pos_of[ids_np[real]] = np.flatnonzero(real)
    nbr_block = pos_of[gt_i] // rs.block

    route_d = np.asarray(pairwise_distances(
        _as_f32(jnp.asarray(queries)), rs.block_centroids, MetricType.L2
    ))
    rank = np.argsort(route_d, axis=1)

    out = {
        "workload": f"clustered-c{args.centers_per_64k} {n}x{d}",
        "block": rs.block, "n_blocks": nb,
        "routing_ceiling": [],
        "union_capture": [],
        "end_to_end": [],
    }
    for P in (8, 16, 32, 48):
        if P > nb:
            continue
        cov = float(np.mean([
            np.isin(nbr_block[i], rank[i, :P]).mean() for i in range(nq)
        ]))
        out["routing_ceiling"].append(
            {"probes": P, "scan_fraction": round(P * rs.block / n, 4),
             "recall_ceiling": round(cov, 4)}
        )
        print(f"[routed] ceiling P={P} (scan {P*rs.block/n:.0%}): {cov:.4f}",
              file=sys.stderr)

    # union capture at the engine's group/union shapes
    for P, U, G in ((16, 32, 128), (32, 48, 128), (32, 64, 256)):
        topb = rank[:, :P]
        order = np.argsort(topb[:, 0], kind="stable")
        tb_sorted = topb[order]
        w = (P - np.arange(P)).astype(np.float64)
        w[0] = P * P
        caps, distincts = [], []
        for g0 in range(0, nq, G):
            tb_g = tb_sorted[g0 : g0 + G]
            votes = np.zeros(nb)
            np.add.at(votes, tb_g.ravel(),
                      np.tile(w, (tb_g.shape[0], 1)).ravel())
            keep = np.argsort(-votes, kind="stable")[:U]
            caps.append(np.isin(tb_g, keep).mean())
            distincts.append(int((votes > 0).sum()))
        row = {"probes": P, "union": U, "group": G,
               "probe_capture": round(float(np.mean(caps)), 4),
               "distinct_voted_blocks": round(float(np.mean(distincts)), 1)}
        out["union_capture"].append(row)
        print(f"[routed] capture P={P} U={U} G={G}: "
              f"{row['probe_capture']:.3f} of probes scanned "
              f"({row['distinct_voted_blocks']:.0f}/{nb} blocks voted)",
              file=sys.stderr)

        _, ii = routed_knn(rs, jnp.asarray(queries), k, probes=P,
                           union_blocks=U, group_size=G)
        r = float(np.mean([
            len(set(a.tolist()) & set(b.tolist())) / k
            for a, b in zip(np.asarray(ii), gt_i)
        ]))
        out["end_to_end"].append(
            {"probes": P, "union": U, "group": G,
             "scan_fraction": round(U * rs.block / n, 4),
             "recall": round(r, 4)}
        )
        print(f"[routed] end-to-end P={P} U={U} G={G}: recall {r:.4f}",
              file=sys.stderr)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
