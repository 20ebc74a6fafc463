#!/usr/bin/env python
"""Load an index, run a query sweep, report recall and latency.

CLI analog of the reference's query_npy tool
(/root/reference/tools/query_npy.cpp:73-158): loads a saved index, queries
it over a sweep of ef_search values, and reports mean recall and per-query
latency against a ground-truth file. Optional graph reordering before the
sweep (query_npy.cpp:34-41).

  python tools/query.py <index.npz> <queries file> <gtruth file>
      --ef-search 100 200 500 --k 100 [--reorder] [--batch 2048]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("index")
    ap.add_argument("queries")
    ap.add_argument("gtruth")
    ap.add_argument("--ef-search", type=int, nargs="+", default=[100])
    ap.add_argument("--k", type=int, default=100)
    ap.add_argument("--batch", type=int, default=2048)
    ap.add_argument("--reorder", action="store_true")
    args = ap.parse_args()

    import flatnav_tpu
    from tools.construct import load_vectors

    index = flatnav_tpu.index.load_index(args.index, verbose=True)
    queries = load_vectors(args.queries)
    gtruth = load_vectors(args.gtruth).astype(np.int64)

    if args.reorder:
        t0 = time.time()
        index.reorder(["gorder"])
        print(f"gorder reordering: {time.time() - t0:.1f}s")

    index.set_query_batch_size(args.batch)
    nq = queries.shape[0]
    for ef in args.ef_search:
        # warmup (compile)
        index.search(queries[: args.batch], K=args.k, ef_search=ef)
        t0 = time.time()
        _, labels = index.search(queries, K=args.k, ef_search=ef)
        total = time.time() - t0
        k = min(args.k, gtruth.shape[1])
        from flatnav_tpu.bench.metrics import recall_at_k

        recall = recall_at_k(labels, gtruth)  # shared clamped definition
        print(
            f"ef_search={ef}: recall@{k}={recall:.4f} "
            f"qps={nq / total:.0f} mean_latency={total / nq * 1e6:.1f}us"
        )


if __name__ == "__main__":
    main()
