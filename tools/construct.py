#!/usr/bin/env python
"""Build and save an index from a dataset file.

CLI analog of the reference's construct_npy tool
(/root/reference/tools/construct_npy.cpp:92-133 argument contract):

  python tools/construct.py <metric: 0=l2, 1=angular> <data file>
      <M> <ef_construction> <output index file>
      [--data-type float32|uint8|int8] [--quantized]

Dataset files: .npy (via the native reader when available), .fvecs/.bvecs,
.fbin/.u8bin/.i8bin.
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def load_vectors(path: str) -> np.ndarray:
    if path.endswith(".npy"):
        from flatnav_tpu import native

        arr = native.npy_read(path)
        return arr if arr is not None else np.load(path)
    from flatnav_tpu.bench.data_loader import get_data_loader

    loader = get_data_loader(path, path, path)
    return loader._load(path) if hasattr(loader, "_load") else np.load(path)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("metric", type=int, choices=[0, 1], help="0=l2 1=angular")
    ap.add_argument("data", help="dataset file (.npy/.fvecs/.fbin/...)")
    ap.add_argument("m", type=int, help="max edges per node (M)")
    ap.add_argument("ef_construction", type=int)
    ap.add_argument("output", help="output index file (.npz)")
    ap.add_argument(
        "--data-type", default="float32",
        choices=["float32", "uint8", "int8", "float16", "bfloat16"],
    )
    ap.add_argument("--limit", type=int, default=None)
    ap.add_argument(
        "--quantized", action="store_true",
        help="product-quantized build (PQIndex; reference "
             "construct_npy.cpp:61-75)",
    )
    ap.add_argument("--pq-m", type=int, default=8,
                    help="PQ subquantizers (with --quantized)")
    args = ap.parse_args()

    import flatnav_tpu
    from flatnav_tpu.data_type import DataType

    data = load_vectors(args.data)
    if args.limit:
        data = data[: args.limit]
    n, dim = data.shape
    print(f"loaded {n} x {dim} {data.dtype} vectors from {args.data}")

    if args.quantized:
        from flatnav_tpu.ops import MetricType
        from flatnav_tpu.quantization import PQIndex, ProductQuantizer

        metric = MetricType.L2 if args.metric == 0 else MetricType.IP
        t0 = time.time()
        pq = ProductQuantizer(
            dim=dim, num_subquantizers=args.pq_m, metric=metric
        ).train(np.asarray(data[: min(n, 262_144)], np.float32))
        print(f"PQ train time: {time.time() - t0:.1f}s")
        index = PQIndex(pq, dataset_size=n, max_edges_per_node=args.m)
        t0 = time.time()
        index.add(np.asarray(data, np.float32),
                  ef_construction=args.ef_construction)
        print(f"build time: {time.time() - t0:.1f}s")
        index.save(args.output)
        print(f"saved PQ index to {args.output}")
        return

    index = flatnav_tpu.index.create(
        distance_type="l2" if args.metric == 0 else "angular",
        dim=dim,
        dataset_size=n,
        max_edges_per_node=args.m,
        index_data_type=DataType(args.data_type),
        verbose=True,
    )
    t0 = time.time()
    index.add(np.asarray(data), ef_construction=args.ef_construction)
    print(f"build time: {time.time() - t0:.1f}s")
    index.save(args.output)
    print(f"saved index to {args.output}")


if __name__ == "__main__":
    main()
