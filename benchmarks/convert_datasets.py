#!/usr/bin/env python
"""Dataset converters: HDF5 / TexMex / big-ann formats -> npy triplets.

Port of the reference's converters
(/root/reference/convert_ann_benchmark_datasets.py,
convert_bigann_datasets.py, convert_spacev_dataset.py): produces
<name>.train.npy / <name>.test.npy / <name>.gtruth.npy, with optional L2
normalization for angular datasets (the reference normalizes at download
time, bin/download_ann_benchmarks_datasets.sh --normalize).

h5py is optional (gated import) — this environment has no network egress,
so the converters are exercised against locally produced files.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def normalize_rows(x: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(x, axis=1, keepdims=True)
    return (x / np.maximum(norms, 1e-12)).astype(np.float32)


def convert_hdf5(path: str, out_dir: str, normalize: bool = False) -> None:
    """ann-benchmarks HDF5 -> npy triplet."""
    import h5py  # gated: not baked into every image

    name = os.path.splitext(os.path.basename(path))[0]
    os.makedirs(out_dir, exist_ok=True)
    with h5py.File(path, "r") as f:
        train = np.asarray(f["train"], dtype=np.float32)
        test = np.asarray(f["test"], dtype=np.float32)
        gtruth = np.asarray(f["neighbors"], dtype=np.int32)
    if normalize:
        train, test = normalize_rows(train), normalize_rows(test)
    np.save(os.path.join(out_dir, f"{name}.train.npy"), train)
    np.save(os.path.join(out_dir, f"{name}.test.npy"), test)
    np.save(os.path.join(out_dir, f"{name}.gtruth.npy"), gtruth)


def convert_bigann(
    data_path: str, out_dir: str, sizes=(10_000_000, 100_000_000)
) -> None:
    """big-ann .u8bin/.fbin -> train_10m/train_100m npy slices
    (convert_bigann_datasets.py behavior)."""
    from flatnav_tpu.bench.data_loader import BinaryDatasetLoader

    loader = BinaryDatasetLoader(data_path, data_path, data_path)
    os.makedirs(out_dir, exist_ok=True)
    for size in sizes:
        arr = loader._load(data_path, 0, size)
        tag = f"{size // 1_000_000}m"
        np.save(os.path.join(out_dir, f"train_{tag}.npy"), arr)


def convert_spacev(parts_dir: str, out_dir: str, limit: int | None = None):
    """SPTAG SpaceV multi-part int8 binary -> npy
    (convert_spacev_dataset.py behavior: parts are raw i8 row blocks
    prefixed by [int32 n][int32 d] in the first part)."""
    part_files = sorted(
        os.path.join(parts_dir, p)
        for p in os.listdir(parts_dir)
        if p.startswith("vectors")
    )
    rows = []
    dim = None
    remaining = limit
    for i, part in enumerate(part_files):
        with open(part, "rb") as f:
            if i == 0:
                _, dim = np.frombuffer(f.read(8), dtype=np.int32)
            data = np.frombuffer(f.read(), dtype=np.int8)
        arr = data.reshape(-1, dim)
        if remaining is not None:
            arr = arr[:remaining]
            remaining -= arr.shape[0]
        rows.append(arr)
        if remaining == 0:
            break
    out = np.concatenate(rows)
    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "spacev.train.npy"), out)
    return out.shape


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    h = sub.add_parser("hdf5")
    h.add_argument("path")
    h.add_argument("out_dir")
    h.add_argument("--normalize", action="store_true")
    b = sub.add_parser("bigann")
    b.add_argument("path")
    b.add_argument("out_dir")
    b.add_argument("--sizes", type=int, nargs="+", default=[10_000_000])
    s = sub.add_parser("spacev")
    s.add_argument("parts_dir")
    s.add_argument("out_dir")
    s.add_argument("--limit", type=int, default=None)
    args = ap.parse_args()
    if args.cmd == "hdf5":
        convert_hdf5(args.path, args.out_dir, args.normalize)
    elif args.cmd == "bigann":
        convert_bigann(args.path, args.out_dir, tuple(args.sizes))
    else:
        convert_spacev(args.parts_dir, args.out_dir, args.limit)


if __name__ == "__main__":
    main()
