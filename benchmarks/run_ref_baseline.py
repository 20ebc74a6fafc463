#!/usr/bin/env python
"""Standalone reference-C++ baseline runner (CPU-only, no JAX import).

Runs `tools/reference_baseline/bench_ref` (the reference FlatNav engine,
/root/reference/include compiled as-is) on the SAME synthetic workload a
north-star runner uses, so the baseline can execute in parallel with the
TPU phase on this 1-vCPU host instead of serializing after it
(run_northstar.py's in-process baseline holds the TPU client idle for the
whole single-core C++ build/sweep).

Ground truth for the baseline's query slice is recomputed here on CPU via
chunked numpy matmuls — the generator (flatnav_tpu/bench/synth.py) is
seed-deterministic, so data/queries/gt match the TPU run's bit-for-bit
modulo distance ties, which recall@10 tolerates.

The measured point is merged into the given results JSON's
`reference_single_core` field (polling for the file if the TPU runner
hasn't written it yet) and always persisted to a sidecar
`<results>.refside.json` so nothing is lost if the poll times out.

Usage:
  python benchmarks/run_ref_baseline.py --config gist --efc 100 \
      --centers-per-64k 26 [--n 1000000] [--target 0.95] [--nq 2000] \
      [--wait-hours 6]
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

from flatnav_tpu.bench.synth import clustered  # noqa: E402

CONFIGS = {
    "clustered": dict(dim=128, metric="l2", normalize=False,
                      dtype=np.float32),
    "angular": dict(dim=100, metric="ip", normalize=True,
                    dtype=np.float32),
    "gist": dict(dim=960, metric="l2", normalize=False, dtype=np.float32),
    "bigann": dict(dim=128, metric="l2", normalize=False, dtype=np.uint8),
}

SCRATCH = os.environ.get(
    "FLATNAV_SCRATCH", os.path.join(_REPO, ".scratch"))


def log(m):
    print(f"[refbase] {m}", file=sys.stderr, flush=True)


def cpu_ground_truth(data, queries, k, metric):
    """Exact kNN on CPU: chunked f32 matmuls, f64 norms for stability."""
    q = queries.astype(np.float32)
    out = np.empty((len(q), k), np.int32)
    qn = (q.astype(np.float64) ** 2).sum(1)
    chunk = max(1, 2**27 // max(1, data.shape[1] * 4))  # ~512 MB tiles
    best_d = np.full((len(q), k), np.inf)
    best_i = np.zeros((len(q), k), np.int64)
    for lo in range(0, len(data), chunk):
        blk = data[lo : lo + chunk].astype(np.float32)
        dots = q @ blk.T
        if metric == "l2":
            bn = (blk.astype(np.float64) ** 2).sum(1)
            d = qn[:, None] + bn[None, :] - 2.0 * dots
        else:  # ip distance = 1 - <q, x>
            d = 1.0 - dots
        cat_d = np.concatenate([best_d, d], 1)
        cat_i = np.concatenate(
            [best_i, np.broadcast_to(np.arange(lo, lo + len(blk)),
                                     (len(q), len(blk)))], 1)
        sel = np.argpartition(cat_d, k - 1, axis=1)[:, :k]
        best_d = np.take_along_axis(cat_d, sel, 1)
        best_i = np.take_along_axis(cat_i, sel, 1)
    order = np.argsort(best_d, axis=1, kind="stable")
    out[:] = np.take_along_axis(best_i, order, 1)[:, :k]
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), required=True)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--efc", type=int, default=100)
    ap.add_argument("--target", type=float, default=0.95)
    ap.add_argument("--nq", type=int, default=2000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--centers-per-64k", type=int, default=None)
    ap.add_argument("--n-centers", type=int, default=None,
                    help="ABSOLUTE cluster count (matches the 10M "
                         "natural variant, run_bigann_10m.py "
                         "--n-centers)")
    ap.add_argument("--results", default=None,
                    help="results JSON to merge into (default: the "
                         "north-star runner's path for this config)")
    ap.add_argument("--wait-hours", type=float, default=8.0)
    args = ap.parse_args()
    cfg = CONFIGS[args.config]
    dim, dtype = cfg["dim"], cfg["dtype"]

    gen_kw = {}
    variant = args.config
    if args.centers_per_64k is not None:
        gen_kw["centers_per_64k"] = args.centers_per_64k
        variant = f"{args.config}-c{args.centers_per_64k}"
    if args.n_centers is not None:
        gen_kw["n_centers"] = args.n_centers
        variant = f"{args.config}-nc{args.n_centers}"
    results = args.results or os.path.join(
        _REPO, f"benchmarks/results_{variant}_efc{args.efc}.json")

    binary = os.path.join(_REPO, "tools/reference_baseline/bench_ref")
    if not os.path.exists(binary):
        subprocess.run(
            ["bash", os.path.join(
                _REPO, "tools/reference_baseline/build_baseline.sh")],
            check=True)

    t0 = time.time()
    data, queries = clustered(args.n, dim, args.nq,
                              dtype=dtype, **gen_kw)
    if cfg["normalize"]:
        data = data / (np.linalg.norm(data, axis=1, keepdims=True) + 1e-12)
        queries = queries / (
            np.linalg.norm(queries, axis=1, keepdims=True) + 1e-12)
    log(f"generated {args.n}x{dim} {np.dtype(dtype).name} "
        f"({time.time()-t0:.0f}s)")

    t0 = time.time()
    gt = cpu_ground_truth(data, queries, args.k, cfg["metric"])
    log(f"cpu ground truth done ({time.time()-t0:.0f}s)")

    os.makedirs(SCRATCH, exist_ok=True)
    suffix = "u8" if dtype == np.uint8 else "f32"
    df = f"{SCRATCH}/refb_{variant}_{args.n}_data.{suffix}"
    qf = f"{SCRATCH}/refb_{variant}_q.{suffix}"
    gf = f"{SCRATCH}/refb_{variant}_gt.i32"
    data.tofile(df)
    queries.tofile(qf)
    gt.astype(np.int32).tofile(gf)
    del data

    dtype_name = "uint8" if dtype == np.uint8 else "float32"
    log(f"running bench_ref (n={args.n}, efc={args.efc}, single core)")
    out = subprocess.run(
        [binary, df, qf, gf, str(args.n), str(args.nq), str(dim),
         str(args.target), str(args.m), str(args.efc), str(args.k),
         dtype_name, cfg["metric"]],
        capture_output=True, text=True, timeout=6 * 3600,
    )
    for fp in (df, qf, gf):
        os.unlink(fp)
    if out.returncode != 0:
        log(f"bench_ref failed rc={out.returncode}: {out.stderr[-500:]}")
        sys.exit(1)
    ref = json.loads(out.stdout.strip().splitlines()[-1])
    log(f"baseline point: {ref}")

    sidecar = results + ".refside.json"
    with open(sidecar, "w") as f:
        json.dump(ref, f, indent=2)

    deadline = time.time() + args.wait_hours * 3600
    while not os.path.exists(results) and time.time() < deadline:
        log(f"waiting for {results} to merge into "
            f"({(deadline - time.time())/60:.0f} min left)")
        time.sleep(120)
    if not os.path.exists(results):
        log(f"results file never appeared; point saved to {sidecar}")
        sys.exit(2)
    with open(results) as f:
        res = json.load(f)
    res["reference_single_core"] = ref
    with open(results, "w") as f:
        json.dump(res, f, indent=2)
    log(f"merged into {results}")
    print(json.dumps(ref))


if __name__ == "__main__":
    main()
