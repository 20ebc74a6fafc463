#!/usr/bin/env python
"""1M-scale benchmark: clustered 1M x 128 fp32 L2 (the SIFT1M-class
workload; real SIFT1M is unreachable here — no network egress — see
flatnav_tpu/bench/synth.py). Builds on the TPU, sweeps ef to the 0.95
recall@10 target, times the operating point, optionally measures the
reference C++ single-core engine on the SAME data, and writes
benchmarks/results_clustered_1m.json.

Usage: PYTHONPATH=/root/repo python benchmarks/run_clustered_1m.py
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax.numpy as jnp  # noqa: E402

from flatnav_tpu.bench.synth import clustered  # noqa: E402
from flatnav_tpu.index import batched_search  # noqa: E402
from flatnav_tpu.index.build import add_batch  # noqa: E402
from flatnav_tpu.index.graph import make_empty_graph  # noqa: E402
from flatnav_tpu.ops import MetricType, brute_force_knn, fast_knn  # noqa: E402

N, D, M, NQ, K, EFC = 1_000_000, 128, 32, 8192, 10, 100
TARGET = 0.95
BATCH = 4096  # scan engines gain ~40% at 4096 vs 2048 (measured)


def log(m):
    print(f"[1m] {m}", file=sys.stderr, flush=True)


def main():
    run_baseline = "--no-baseline" not in sys.argv
    data, queries = clustered(N, D, NQ)
    # cache the built index on disk — iterating on the search sweep
    # shouldn't pay the ~10 min build each run (delete to force rebuild)
    cache = f"/tmp/1m_index_{N}_{D}_{M}_{EFC}.npz"
    if os.path.exists(cache) and "--rebuild" not in sys.argv:
        from flatnav_tpu.index.serialize import load_index

        g, _, meta = load_index(cache)
        build_s = float(meta.get("build_seconds", 0.0))
        log(f"loaded cached index ({cache}); recorded build {build_s:.1f}s")
    else:
        t0 = time.time()
        g = add_batch(
            make_empty_graph(N, D, M), data, np.arange(N),
            ef_construction=EFC, metric=MetricType.L2,
        )
        assert int(g.num_nodes) == N  # host sync before reading the clock
        build_s = time.time() - t0
        log(f"build {build_s:.1f}s")
        from flatnav_tpu.index.serialize import save_index

        save_index(cache, g, MetricType.L2,
                   extra={"build_seconds": round(build_s, 1)})

    gt = np.asarray(
        brute_force_knn(jnp.asarray(data), jnp.asarray(queries), K)[1]
    )
    q_dev = jnp.asarray(queries)

    def run(ef, expand, cw=0):
        outs = []
        for lo in range(0, NQ, BATCH):
            r = batched_search(
                g.vectors, g.links, g.labels, g.num_nodes,
                q_dev[lo : lo + BATCH], k=K, ef=ef,
                metric=MetricType.L2, expand_factor=expand,
                compact_width=cw,
            )
            outs.append(np.asarray(r.labels))
        return np.concatenate(outs, 0)

    def recall(found):
        return float(np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / K
             for a, b in zip(found, gt)]
        ))

    # exact engine (Index.search_exact's tiled MXU scan): the TPU-native
    # fast path at HBM-resident scale — recall 1.0 by construction
    def run_exact():
        outs = []
        for lo in range(0, NQ, BATCH):
            d_, i_ = brute_force_knn(
                g.vectors, q_dev[lo : lo + BATCH], K,
                MetricType.L2, n_valid=g.num_nodes,
            )
            outs.append(np.asarray(i_))
        return np.concatenate(outs, 0)

    exact_recall = recall(run_exact())
    times = []
    for _ in range(3):
        t0 = time.time()
        run_exact()
        times.append(time.time() - t0)
    exact = {"recall": exact_recall, "qps": NQ / min(times)}
    log(f"exact engine: {exact['qps']:.0f} qps @ recall {exact_recall:.4f}")

    # two-phase scan (bf16 + approx_min_k shortlist + exact f32 rerank)
    def run_fast():
        outs = []
        for lo in range(0, NQ, BATCH):
            _, i_ = fast_knn(
                g.vectors, q_dev[lo : lo + BATCH], K,
                MetricType.L2, tile_size=262144, rerank=32,
                n_valid=g.num_nodes,
            )
            outs.append(np.asarray(i_))
        return np.concatenate(outs, 0)

    fast_recall = recall(run_fast())
    times = []
    for _ in range(3):
        t0 = time.time()
        run_fast()
        times.append(time.time() - t0)
    fast = {"recall": fast_recall, "qps": NQ / min(times)}
    log(f"fast engine: {fast['qps']:.0f} qps @ recall {fast_recall:.4f}")

    rows = []
    chosen = None
    # the reference's own 1M grids sweep ef_search up to 3000
    # (experiments/Makefile:365-384) — clustered 1M needs the upper range
    for expand in (16, 64):
        cw = 0
        for ef in (256, 384, 512, 768, 1024, 1536, 2048):
            t0 = time.time()
            r = recall(run(ef, expand, cw))
            log(f"E={expand} ef={ef} cw={cw}: recall={r:.4f} "
                f"({time.time()-t0:.1f}s incl compile)")
            rows.append({"ef": ef, "expand": expand, "cw": cw, "recall": r})
            if r >= TARGET:
                # steady-state timing
                times = []
                for _ in range(3):
                    t0 = time.time()
                    run(ef, expand, cw)
                    times.append(time.time() - t0)
                qps = NQ / min(times)
                rows[-1]["qps"] = qps
                log(f"E={expand} ef={ef}: {qps:.0f} qps")
                if chosen is None or qps > chosen["qps"]:
                    chosen = dict(rows[-1])
                break

    ref = None
    if run_baseline:
        binary = os.path.join(_REPO, "tools/reference_baseline/bench_ref")
        if not os.path.exists(binary):
            build = os.path.join(
                _REPO, "tools/reference_baseline/build_baseline.sh"
            )
            try:
                subprocess.run(
                    ["bash", build], check=True, capture_output=True
                )
            except Exception as e:
                log(f"baseline build failed ({e})")
        if os.path.exists(binary):
            df, qf, gf = "/tmp/1m_data.f32", "/tmp/1m_q.f32", "/tmp/1m_gt.i32"
            nq_ref = 2000
            data.astype(np.float32).tofile(df)
            queries[:nq_ref].astype(np.float32).tofile(qf)
            gt[:nq_ref].astype(np.int32).tofile(gf)
            log("running reference baseline on identical data")
            out = subprocess.run(
                [binary, df, qf, gf, str(N), str(nq_ref), str(D),
                 str(TARGET), str(M), str(EFC), str(K)],
                capture_output=True, text=True, timeout=7200,
            )
            if out.returncode == 0:
                ref = json.loads(out.stdout.strip().splitlines()[-1])
            else:
                log(f"baseline failed: {out.stderr[-300:]}")

    result = {
        "workload": f"clustered {N}x{D} fp32 L2 M={M} efc={EFC} k={K}",
        "note": "SIFT1M-class stand-in; no network egress for real "
                "ann-benchmarks data (see flatnav_tpu/bench/synth.py)",
        "build_seconds": round(build_s, 1),
        "exact_engine": exact,
        "fast_engine": fast,
        "graph_operating_point": chosen,
        "sweep": rows,
        "reference_single_core": ref,
    }
    path = os.path.join(_REPO, "benchmarks/results_clustered_1m.json")
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
