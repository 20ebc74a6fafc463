#!/usr/bin/env python
"""BigANN-class 10M-scale benchmark: clustered 10M x 128 uint8, L2, M=32,
k=10 (the bigann-10M regime — experiments/Makefile:138-152; real BigANN is
unreachable here, no network egress — see flatnav_tpu/bench/synth.py's
uint8 quantization path).

All engines use the EXACT integer distance path: uint8 L2 accumulates in
int32 on the MXU (graph + brute engines), and fast_knn's bf16 phase-1 is
also exact for uint8 at d=128 (values <= 255 are exact in bf16; the f32
accumulator stays under 2^24), so its only approximation is approx_min_k
binning.

Usage: PYTHONPATH=/root/repo python benchmarks/run_bigann_10m.py
       [--no-baseline] [--rebuild]
Writes benchmarks/results_bigann_10m.json.
"""

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
from flatnav_tpu.ops import (  # noqa: E402
    MetricType,
    brute_force_knn,
    fast_knn,
    fused_knn,
)

N, D, M, NQ, K, EFC = 10_000_000, 128, 32, 8192, 10, 100
TARGET = 0.95
BATCH = 4096

SCRATCH = os.environ.get(
    "FLATNAV_SCRATCH",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".scratch"))


def log(m):
    print(f"[10m] {m}", file=sys.stderr, flush=True)


def main():
    global EFC, N, NQ
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=N,
                    help="rows (default 10M; small values for smokes)")
    ap.add_argument("--nq", type=int, default=NQ)
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--pq-only", action="store_true")
    ap.add_argument("--no-pq", action="store_true")
    ap.add_argument("--efc", type=int, default=EFC)
    ap.add_argument("--m-pq", type=int, default=16,
                    help="PQ subquantizers (code bytes/node)")
    ap.add_argument("--m-pq4", type=int, default=16,
                    help="subquantizers for the 4-bit fast-scan point "
                         "(m_pq4/2 code bytes/node)")
    ap.add_argument("--pq-rerank", type=int, default=64)
    ap.add_argument("--centers-per-64k", type=int, default=None,
                    help="calibrated generator density (the c26 setting "
                        "fixed the 1M graph collapse; VERDICT r03 item 3)")
    ap.add_argument("--n-centers", type=int, default=None,
                    help="ABSOLUTE cluster count (real datasets are denser "
                         "samples of a FIXED distribution — scaling "
                         "clusters with n collapses both engines, "
                         "results_ab_uint8.json; 397 matches the "
                         "calibrated 1M workload where the graph reached "
                         "0.9548)")
    ap.add_argument("--pq-graph", action="store_true",
                    help="measure the codes-only PQ GRAPH engine (ADC "
                         "beam search over this build's links + raw "
                         "rerank) — the beyond-HBM graph configuration "
                         "(quantization/pq_index.py) at scale, on chip")
    args, _ = ap.parse_known_args()
    EFC = args.efc
    N, NQ = args.n, args.nq
    gen_kw = {}
    variant = "bigann"
    if args.centers_per_64k is not None:
        gen_kw["centers_per_64k"] = args.centers_per_64k
        variant = f"bigann-c{args.centers_per_64k}"
    if args.n_centers is not None:
        gen_kw["n_centers"] = args.n_centers
        variant = f"bigann-nc{args.n_centers}"
    run_baseline = not args.no_baseline
    os.makedirs(SCRATCH, exist_ok=True)
    data, queries = clustered(N, D, NQ, dtype=np.uint8, **gen_kw)
    # Chunked, checkpointed build: a multi-hour monolithic device loop
    # once wedged the tunnel (host futex-wait, 18 GB buffered transfers) —
    # inserting in 1M chunks with an on-disk checkpoint after each bounds
    # the loss to one chunk and makes the build resumable.
    from flatnav_tpu.index.serialize import load_index, save_index

    cache = f"{SCRATCH}/10m_{variant}_{N}_{D}_{M}_{EFC}.npz"
    chunk = 1_000_000
    if os.path.exists(cache) and "--rebuild" not in sys.argv:
        g, _, meta = load_index(cache)
        build_s = float(meta.get("build_seconds", 0.0))
        done = int(g.num_nodes)
        log(f"resuming from checkpoint: {done} nodes, "
            f"{build_s:.1f}s build so far")
        if g.capacity < N:
            raise SystemExit(f"checkpoint capacity {g.capacity} < {N}")
    else:
        g = make_empty_graph(N, D, M, dtype=jnp.uint8)
        build_s, done = 0.0, 0
    while done < N:
        hi = min(done + chunk, N)
        t0 = time.time()
        g = add_batch(
            g, data[done:hi], np.arange(done, hi),
            ef_construction=EFC, metric=MetricType.L2,
        )
        assert int(g.num_nodes) == hi
        build_s += time.time() - t0
        done = hi
        save_index(cache, g, MetricType.L2,
                   extra={"build_seconds": round(build_s, 1)})
        log(f"built {done}/{N} ({build_s:.1f}s cumulative)")

    q_dev = jnp.asarray(queries)
    gt_path = f"{SCRATCH}/10m_gt_{variant}_{N}_{D}.npy"
    if os.path.exists(gt_path) and not args.rebuild:
        gt = np.load(gt_path)
    else:
        log("computing exact ground truth (int32 MXU scan)")
        gt = np.concatenate([
            np.asarray(brute_force_knn(
                jnp.asarray(data), q_dev[lo : lo + BATCH], K, MetricType.L2,
            )[1])
            for lo in range(0, NQ, BATCH)
        ])
        np.save(gt_path, gt)

    def recall(found):
        return float(np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / K
             for a, b in zip(found, gt)]
        ))

    def time_engine(run_fn, name, scan=True):
        found = run_fn()
        r = recall(found)
        times = []
        for _ in range(3):
            t0 = time.time()
            run_fn()
            times.append(time.time() - t0)
        out = {"recall": r, "qps": round(NQ / min(times), 1)}
        if scan:
            # whole-table scans do 2*N*d useful FLOP per query
            tf = out["qps"] * 2.0 * N * D / 1e12
            out["achieved_tflops"] = round(tf, 2)
            out["mfu"] = round(tf / 197.0, 4)
        log(f"{name}: {out['qps']:.0f} qps @ recall {r:.4f}")
        return out

    def run_exact():
        return np.concatenate([
            np.asarray(brute_force_knn(
                g.vectors, q_dev[lo : lo + BATCH], K, MetricType.L2,
                n_valid=g.num_nodes,
            )[1])
            for lo in range(0, NQ, BATCH)
        ])

    def run_fast():
        return np.concatenate([
            np.asarray(fast_knn(
                g.vectors, q_dev[lo : lo + BATCH], K, MetricType.L2,
                tile_size=262144, rerank=32, n_valid=g.num_nodes,
            )[1])
            for lo in range(0, NQ, BATCH)
        ])

    def run_fused(exact_rerank):
        # BARE call (round 5): fused_knn picks VMEM-safe shapes and
        # chunks the batch internally to bound its [B, N/L] summaries
        # (at this N it derives exactly the L=64/t=8192/qb=128 config
        # round 4 discovered by hand, then splits 8192 queries into
        # in-program chunks) — one dispatch per query set minimizes the
        # ~30 ms tunnel envelope.
        def go():
            return np.concatenate([
                np.asarray(fused_knn(
                    g.vectors, q_dev[lo : lo + NQ], K, MetricType.L2,
                    rerank=32, n_valid=g.num_nodes,
                    exact_rerank=exact_rerank,
                )[1])
                for lo in range(0, NQ, NQ)
            ])
        return go

    exact = fast = fused = fusednr = None
    if "--pq-only" not in sys.argv:
        exact = time_engine(run_exact, "exact engine")
        fast = time_engine(run_fast, "fast engine")
        fused = time_engine(run_fused(True), "fused engine")
        fusednr = time_engine(run_fused(False), "fused-norerank engine")

    # ---- PQ-ADC scan engine (the beyond-HBM-scale configuration, VERDICT
    # r02 item 6): train on a 500k sample, encode all 10M (16 bytes/node
    # vs 128 raw), then the one-hot MXU contraction scan + exact-f32 ADC
    # rerank. Recall here is bounded by PQ quantization error — recorded
    # against the raw-vector ground truth like every other engine.
    pq_point = pq4_point = None
    pq_graph_point = None
    if "--no-pq" not in sys.argv:
        from flatnav_tpu.quantization import ProductQuantizer
        from flatnav_tpu.quantization.pq import pq_scan_knn

        t0 = time.time()
        pq = ProductQuantizer(dim=D, num_subquantizers=args.m_pq).train(
            data[:500_000].astype(np.float32), n_iters=25
        )
        codes_path = f"{SCRATCH}/10m_codes_{variant}_{N}_{D}_{args.m_pq}.npy"
        if os.path.exists(codes_path) and "--rebuild" not in sys.argv:
            codes = np.load(codes_path)
        else:
            codes = np.concatenate([
                np.asarray(pq.encode(data[lo : lo + chunk].astype(
                    np.float32)))
                for lo in range(0, N, chunk)
            ])
            np.save(codes_path, codes)
        pq_prep_s = time.time() - t0
        log(f"PQ train+encode: {pq_prep_s:.1f}s "
            f"({codes.nbytes/1e9:.2f} GB codes vs "
            f"{data.nbytes/1e9:.2f} GB raw)")
        codes_dev = jnp.asarray(codes)

        def run_pq(rr):
            # raw-vector rerank: at 10M the raw uint8 table (2.6 GB)
            # still fits HBM — the SCAN reads 16-byte codes (8x fewer
            # bytes than raw) and only the [B, rerank] shortlist touches
            # raw rows, so recall is shortlist-bounded instead of
            # PQ-bounded
            def go():
                outs = []
                for lo in range(0, NQ, BATCH):
                    tables = pq.adc_tables(
                        queries[lo : lo + BATCH].astype(np.float32)
                    )
                    _, ids = pq_scan_knn(
                        codes_dev, tables, K, metric=MetricType.L2,
                        tile_size=131072, rerank=rr,
                        vectors=g.vectors, queries=q_dev[lo : lo + BATCH],
                    )
                    outs.append(np.asarray(ids))
                return np.concatenate(outs, 0)
            return go

        try:
            # recall is shortlist-bounded (raw rerank restores exact
            # distances): sweep the width toward the 0.95 target — the
            # ADC scan dominates the dispatch so wider rerank is cheap
            best8 = None
            for rr in (args.pq_rerank, 128, 256, 512, 1024):
                pt = time_engine(run_pq(rr), f"pq-scan rerank={rr}",
                                 scan=False)
                pt["rerank"] = rr
                if best8 is None or (pt["recall"], pt["qps"]) > (
                        best8["recall"], best8["qps"]):
                    best8 = pt
                if pt["recall"] >= TARGET:
                    best8 = pt
                    break
            best8["prep_seconds"] = round(pq_prep_s, 1)
            best8["code_bytes_per_node"] = args.m_pq
            # ADC-ceiling attribution (VERDICT r04 item 3): raw-rerank
            # recall at width r IS recall@shortlist-r, so the widest
            # sweep point bounds what ANY rerank can recover; the
            # ADC-only point (no raw rerank) at the same width isolates
            # what the CODEBOOK ranks correctly — the gap between them
            # is quantization error, not engine error.
            try:
                def run_pq_adconly():
                    outs = []
                    for lo in range(0, NQ, BATCH):
                        tables = pq.adc_tables(
                            queries[lo : lo + BATCH].astype(np.float32))
                        _, ids = pq_scan_knn(
                            codes_dev, tables, K, metric=MetricType.L2,
                            tile_size=131072, rerank=best8["rerank"],
                        )
                        outs.append(np.asarray(ids))
                    return np.concatenate(outs, 0)
                best8["adc_only_recall"] = recall(run_pq_adconly())
                log(f"pq ADC-only (codebook-ranked) recall: "
                    f"{best8['adc_only_recall']:.4f}")
            except Exception as e:
                log(f"adc-only attribution FAULTED: {e!r}")
            pq_point = best8
        except Exception as e:
            log(f"pq engine FAULTED: {e!r}")

        # 4-bit fast-scan point: nc=16 cuts the one-hot contraction's
        # FLOPs 16x (the scan is MXU-bound, ~95 TFLOP/s measured, so
        # throughput ~ 1/(S*nc)); nibble-packed codes halve HBM reads.
        # The coarser codes rank worse — the raw rerank width carries
        # recall, swept cheap since the scan dominates.
        from flatnav_tpu.quantization.pq import pack_codes_4bit

        t0 = time.time()
        try:
            pq4 = ProductQuantizer(
                dim=D, num_subquantizers=args.m_pq4, nbits=4).train(
                data[:500_000].astype(np.float32), n_iters=25)
            p4_path = (f"{SCRATCH}/10m_codes4_{variant}_{N}_{D}_"
                       f"{args.m_pq4}.npy")
            if os.path.exists(p4_path) and "--rebuild" not in sys.argv:
                packed4 = np.load(p4_path)
            else:
                packed4 = np.concatenate([
                    np.asarray(pack_codes_4bit(pq4.encode(
                        data[lo : lo + chunk].astype(np.float32))))
                    for lo in range(0, N, chunk)
                ])
                np.save(p4_path, packed4)
            pq4_prep_s = time.time() - t0
            log(f"PQ4 train+encode: {pq4_prep_s:.1f}s "
                f"({packed4.nbytes/1e9:.2f} GB packed codes)")
            packed4_dev = jnp.asarray(packed4)
        except Exception as e:
            log(f"pq4 prep FAULTED: {e!r}")
            packed4_dev = None

        def run_pq4(rr):
            def go():
                outs = []
                for lo in range(0, NQ, BATCH):
                    tables = pq4.adc_tables(
                        queries[lo : lo + BATCH].astype(np.float32))
                    _, ids = pq_scan_knn(
                        packed4_dev, tables, K, metric=MetricType.L2,
                        tile_size=131072, rerank=rr, packed_4bit=True,
                        vectors=g.vectors, queries=q_dev[lo : lo + BATCH],
                    )
                    outs.append(np.asarray(ids))
                return np.concatenate(outs, 0)
            return go

        best4 = None
        for rr in (() if packed4_dev is None
                   else (args.pq_rerank, 128, 256, 512, 1024)):
            try:
                pt = time_engine(run_pq4(rr), f"pq4-scan rerank={rr}",
                                 scan=False)
            except Exception as e:
                log(f"pq4 rerank={rr} FAULTED: {e!r}")
                break
            pt["rerank"] = rr
            if best4 is None or (pt["recall"], pt["qps"]) > (
                    best4["recall"], best4["qps"]):
                best4 = pt
            if pt["recall"] >= TARGET:
                best4 = pt
                break
        if best4 is not None:
            best4["prep_seconds"] = round(pq4_prep_s, 1)
            best4["code_bytes_per_node"] = args.m_pq4 // 2
            best4["nbits"] = 4
            pq4_point = best4
        else:
            pq4_point = None

    # ---- PQ GRAPH engine (VERDICT r04 item 3): the codes-only graph —
    # ADC beam search over this build's links (same topology; the
    # reference's Index<ProductQuantizer> likewise stores codes + links,
    # ProductQuantization.h:91-92) with a raw-vector rerank of the beam.
    # Per-query work ~ hops * E * M code-gathers, N-INDEPENDENT — the one
    # engine whose per-query cost does not scale with table size, i.e.
    # the beyond-HBM configuration measured at scale on chip.
    if args.pq_graph and not args.no_pq and pq_point is not None:
        from flatnav_tpu.ops.distances import query_block_distances
        from flatnav_tpu.quantization.pq import pq_beam_search

        def run_pq_graph(ef, expand, rr):
            outs = []
            for lo in range(0, NQ, BATCH):
                tables = pq.adc_tables(
                    queries[lo : lo + BATCH].astype(np.float32))
                beam = pq_beam_search(
                    codes_dev, g.links, g.num_nodes, tables,
                    ef=ef, metric=MetricType.L2, expand_factor=expand,
                )
                short_i = beam.ids[:, :rr]
                rows = jnp.take(
                    g.vectors, jnp.minimum(short_i, N - 1), axis=0)
                exact = query_block_distances(
                    q_dev[lo : lo + BATCH], rows, MetricType.L2)
                exact = jnp.where(
                    jnp.isinf(beam.dists[:, :rr]), jnp.inf, exact)
                order = jnp.argsort(exact, axis=1, stable=True)[:, :K]
                outs.append(np.asarray(
                    jnp.take_along_axis(short_i, order, axis=1)))
            return np.concatenate(outs, 0)

        best_pqg = None
        for ef, expand in ((128, 16), (256, 16), (512, 16), (1024, 64)):
            rr = min(ef, 128)
            try:
                pt = time_engine(
                    lambda ef=ef, expand=expand, rr=rr: run_pq_graph(
                        ef, expand, rr),
                    f"pq-graph ef={ef} E={expand}", scan=False)
            except Exception as e:
                log(f"pq-graph ef={ef} FAULTED: {e!r}")
                break
            pt.update({"ef": ef, "expand": expand, "rerank": rr})
            if best_pqg is None or (pt["recall"], pt["qps"]) > (
                    best_pqg["recall"], best_pqg["qps"]):
                best_pqg = pt
            if pt["recall"] >= TARGET:
                best_pqg = pt
                break
        if best_pqg is not None:
            best_pqg["code_bytes_per_node"] = args.m_pq
            best_pqg["links_from"] = "raw exact-distance build"
            pq_graph_point = best_pqg

    def run_graph(ef, expand):
        outs = []
        for lo in range(0, NQ, BATCH):
            r = batched_search(
                g.vectors, g.links, g.labels, g.num_nodes,
                q_dev[lo : lo + BATCH], k=K, ef=ef,
                metric=MetricType.L2, expand_factor=expand,
            )
            outs.append(np.asarray(r.labels))
        return np.concatenate(outs, 0)

    rows = []
    chosen = None
    # ef=2048 at this scale reproducibly crashed the TPU worker in round
    # 2; batched_search now estimates the hop working set and chunks the
    # query batch automatically (flatnav_tpu/index/search.py
    # safe_query_batch), so the sweep can include it again — the graph
    # engine is nowhere near the 0.95 target on this workload anyway
    # (see results note / run_ab_uint8.py diagnosis)
    if "--pq-only" in sys.argv:
        ef_grid = ()
    else:
        ef_grid = (256, 512, 1024, 2048)
    for expand in (16, 64):
        if chosen is not None:
            break
        for ef in ef_grid:
            t0 = time.time()
            # huge-ef fresh compiles can kernel-fault the worker
            # (B-independent platform bug, STATUS.md round-3) — keep the
            # engine points already measured and end the sweep
            try:
                r = recall(run_graph(ef, expand))
            except Exception as e:
                log(f"E={expand} ef={ef}: WORKER FAULT "
                    f"({type(e).__name__}) — ending sweep")
                rows.append({"ef": ef, "expand": expand, "fault": True})
                break
            log(f"E={expand} ef={ef}: recall={r:.4f} "
                f"({time.time()-t0:.1f}s incl compile)")
            rows.append({"ef": ef, "expand": expand, "recall": r})
            if r >= TARGET:
                times = []
                for _ in range(3):
                    t0 = time.time()
                    run_graph(ef, expand)
                    times.append(time.time() - t0)
                rows[-1]["qps"] = NQ / min(times)
                chosen = dict(rows[-1])
                break
    # Neither graph engine reaches 0.95 on this workload (the reference
    # single core tops out at 0.8067 @ ef=3072 on the calibrated 10M,
    # refside sidecar) — time the best sub-target point so the
    # head-to-head is a measured pair instead of a null.
    if chosen is None and rows:
        best = max((r for r in rows if "recall" in r),
                   key=lambda r: r["recall"], default=None)
        if best is not None:
            try:
                times = []
                for _ in range(3):
                    t0 = time.time()
                    run_graph(best["ef"], best["expand"])
                    times.append(time.time() - t0)
                best["qps"] = NQ / min(times)
                chosen = dict(best, target_missed=True)
            except Exception as e:
                log(f"best-point retime FAULTED: {e!r}")

    size_tag = "" if N == 10_000_000 else f"_n{N}"
    stem = ("results_bigann_10m" if variant == "bigann"
            else f"results_{variant}_10m")
    path = os.path.join(_REPO, f"benchmarks/{stem}{size_tag}.json")

    ref = None
    sidecar = path + ".refside.json"
    if run_baseline and os.path.exists(sidecar):
        # run_ref_baseline.py already measured the single core on this
        # seed-deterministic workload (a multi-hour CPU run on this
        # 1-vCPU host) — merge its point instead of re-running in-process
        with open(sidecar) as f:
            ref = json.load(f)
        log(f"reference baseline loaded from sidecar {sidecar}")
        run_baseline = False
    if run_baseline:
        binary = os.path.join(_REPO, "tools/reference_baseline/bench_ref")
        if os.path.exists(binary):
            df, qf, gf = (f"{SCRATCH}/10m_data.u8", f"{SCRATCH}/10m_q.u8",
                          f"{SCRATCH}/10m_gt.i32")
            nq_ref = 1000
            data.tofile(df)
            queries[:nq_ref].tofile(qf)
            gt[:nq_ref].astype(np.int32).tofile(gf)
            log("running reference baseline (uint8) on identical data")
            out = subprocess.run(
                [binary, df, qf, gf, str(N), str(nq_ref), str(D),
                 str(TARGET), str(M), str(EFC), str(K), "uint8"],
                capture_output=True, text=True, timeout=4 * 3600,
            )
            if out.returncode == 0:
                ref = json.loads(out.stdout.strip().splitlines()[-1])
            else:
                log(f"baseline failed: {out.stderr[-300:]}")

    result = {}
    if os.path.exists(path):  # merge partial (--pq-only) runs
        with open(path) as f:
            result = json.load(f)
    result.update({
        "workload": f"clustered uint8 {N}x{D} L2 M={M} efc={EFC} k={K}",
        "note": "BigANN-10M-class stand-in (no egress; synthetic clustered "
                "uint8). All engines use exact integer distances. The "
                "graph collapse on this workload is root-caused to the "
                "generator's 39k overlapping clusters, NOT the engine: "
                "the reference C++ engine collapses identically on the "
                "same cluster structure (results_ab_uint8.json arm C: "
                "reference 0.7055 @ ef=3072 vs 0.9395 on the "
                "natural-cluster arm B; dtype effect nil).",
        "build_seconds": round(build_s, 1),
    })
    result["generator"] = dict(gen_kw) or "defaults"
    for key, val in (
        ("exact_engine", exact), ("fast_engine", fast),
        ("fused_engine", fused), ("fusednr_engine", fusednr),
        ("pq_scan_engine", pq_point), ("pq4_scan_engine", pq4_point),
        ("pq_graph_engine", pq_graph_point),
        ("reference_single_core", ref),
    ):
        if val is not None:
            result[key] = val
    if rows:
        result["graph_operating_point"] = chosen
        result["sweep"] = rows
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
