#!/usr/bin/env python
"""North-star 1M benchmark runner: the BASELINE.md configs beyond the
headline clustered-128 workload, on synthetic stand-ins (no network
egress for the real ann-benchmarks datasets):

  clustered — 1M x 128 fp32 L2 (SIFT1M-class; same generator as bench.py)
  angular   — 1M x 100 fp32 IP over L2-normalized rows (GloVe-100-class;
              the reference treats angular as IP over externally
              pre-normalized vectors, experiments/README.md:223)
  gist      — 1M x 960 fp32 L2 (GIST1M-class: the hub-highway /
              large-per-hop-tile regime)

Reference grids mirrored: M=32, ef_construction sweepable to 300
(/root/reference/experiments/Makefile:333-381), ef_search to 3072.
Measures all three engines (graph / exact MXU scan / two-phase fast
scan), optionally the reference C++ single core on identical data, and
writes benchmarks/results_<config>_efc<efc>.json. For config=clustered
with a qualifying (>= target) graph point, also records it into
results_clustered_1m.json's graph_operating_point (VERDICT r02 item 2).

Usage:
  python benchmarks/run_northstar.py --config angular [--efc 100]
      [--n 1000000] [--no-baseline] [--rebuild] [--skip-scan-engines]
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

# Checkpoints/partials live under the repo (persists across driver
# sessions; /tmp is wiped between them, which cost the first GIST run
# its 1M x 960 build). Override with FLATNAV_SCRATCH.
SCRATCH = os.environ.get(
    "FLATNAV_SCRATCH", os.path.join(_REPO, ".scratch"))
os.makedirs(SCRATCH, exist_ok=True)

import jax.numpy as jnp  # noqa: E402

from flatnav_tpu.bench.synth import clustered  # noqa: E402
from flatnav_tpu.index import batched_search  # noqa: E402
from flatnav_tpu.index.build import add_batch  # noqa: E402
from flatnav_tpu.index.graph import make_empty_graph  # noqa: E402
from flatnav_tpu.index.serialize import load_index, save_index  # noqa: E402
from flatnav_tpu.ops import (  # noqa: E402
    MetricType,
    brute_force_knn,
    fast_knn,
    fused_knn,
)

CONFIGS = {
    "clustered": dict(dim=128, metric=MetricType.L2, normalize=False),
    "angular": dict(dim=100, metric=MetricType.IP, normalize=True),
    "gist": dict(dim=960, metric=MetricType.L2, normalize=False),
}

M, NQ, K, BATCH = 32, 8192, 10, 4096
EF_SWEEP = (128, 192, 256, 384, 512, 768, 1024, 1536, 2048, 3072)
E_SWEEP = (16, 64)


def log(m):
    print(f"[northstar] {m}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", choices=sorted(CONFIGS), required=True)
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--efc", type=int, default=100)
    ap.add_argument("--target", type=float, default=0.95)
    ap.add_argument("--no-baseline", action="store_true")
    ap.add_argument("--rebuild", action="store_true")
    ap.add_argument("--skip-scan-engines", action="store_true",
                    help="only sweep the graph engine (e.g. efc A/Bs "
                         "where the scan engines are efc-independent)")
    ap.add_argument("--chunk", type=int, default=None,
                    help="build-checkpoint chunk rows (default: "
                         "dim-scaled, 250k at d=128 down to 62.5k at "
                         "d>=512)")
    ap.add_argument("--build-dtype", choices=["float32", "bfloat16"],
                    default="float32",
                    help="table dtype DURING CONSTRUCTION only. bfloat16 "
                         "halves every table-scaled buffer in the wave "
                         "programs (at d=960/1M the f32 wave program alone "
                         "needs 12.2 GB vs ~15 GB usable, measured via "
                         "XLA memory_analysis round 4); the built links "
                         "are reattached to the full-precision vectors "
                         "for every search/sweep, so served results are "
                         "f32-exact. bf16 rounding (2^-8 relative) is "
                         "noise against the generator's unit cluster "
                         "noise; recall is measured end-to-end as always")
    ap.add_argument("--max-wave", type=int, default=None,
                    help="cap the build wave width (the in-code HBM guard "
                         "models the working set, but the tunnel runtime's "
                         "true usable memory is opaque — d=960 at 1M "
                         "capacity OOMs at the guard's 1024 pick; 512 "
                         "fits, measured round 4)")
    ap.add_argument("--centers-per-64k", type=int, default=None,
                    help="override the generator's cluster-count scaling "
                         "(default: 256 -> cluster count grows with n; "
                         "see the round-3 difficulty-drift diagnosis in "
                         "docs/benchmarking.md)")
    args = ap.parse_args()
    if args.chunk is not None and args.chunk <= 0:
        ap.error("--chunk must be a positive row count")
    cfg = CONFIGS[args.config]
    dim, metric = cfg["dim"], cfg["metric"]

    gen_kw = {}
    variant = args.config
    if args.centers_per_64k is not None:
        gen_kw["centers_per_64k"] = args.centers_per_64k
        variant = f"{args.config}-c{args.centers_per_64k}"
    # The generator is seed-deterministic but a 1M x 960 draw costs
    # minutes of host time on this 1-vCPU box — and the rc=3 fault/OOM
    # relaunch loop pays it on EVERY launch. Cache the (normalized)
    # arrays on disk keyed by the workload.
    dcache = f"{SCRATCH}/ns_{variant}_{args.n}_{dim}_data.npz"
    if os.path.exists(dcache):
        z = np.load(dcache)
        data, queries = z["data"], z["queries"]
        log(f"data loaded from cache {dcache}")
    else:
        data, queries = clustered(args.n, dim, NQ, **gen_kw)
        if cfg["normalize"]:
            data /= np.linalg.norm(data, axis=1, keepdims=True) + 1e-12
            queries /= (
                np.linalg.norm(queries, axis=1, keepdims=True) + 1e-12)
        np.savez(dcache + ".tmp.npz", data=data, queries=queries)
        os.replace(dcache + ".tmp.npz", dcache)

    # Chunked, checkpointed build (same pattern as run_bigann_10m.py):
    # the tunnel's throughput phase is sticky per process, so a slow
    # phase costs at most one chunk before a kill+relaunch redraws it.
    bd_tag = "" if args.build_dtype == "float32" else "_bf16"
    cache = (f"{SCRATCH}/ns_{variant}_{args.n}_{dim}_{M}_{args.efc}"
             f"{bd_tag}.npz")
    # build-chunk size scales inversely with dim so the per-chunk device
    # time (and hence the progress lost to a relaunch/timeout) stays
    # roughly constant; the 62.5k floor dominates for d >= 512
    chunk = (args.chunk if args.chunk is not None
             else max(62_500, 250_000 * 128 // dim))
    if os.path.exists(cache) and not args.rebuild:
        # The checkpoint push itself can OOM while a leaked worker's
        # buffers drain (docs/benchmarking.md "HBM leak on abnormal
        # client exit") — that is a fault-exit for the relaunch loop to
        # sleep through, not a crash.
        try:
            g, _, meta = load_index(cache)
            build_s = float(meta.get("build_seconds", 0.0))
            done = int(g.num_nodes)
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            log("checkpoint resume OOM (leaked HBM still draining?) — "
                "relaunch to retry")
            sys.exit(3)
        log(f"resuming checkpoint ({cache}): {done} nodes, "
            f"{build_s:.1f}s build so far")
    else:
        g = make_empty_graph(
            args.n, dim, M,
            dtype=jnp.bfloat16 if args.build_dtype == "bfloat16"
            else jnp.float32,
        )
        build_s, done = 0.0, 0
    # Adaptive wave cap: the in-code HBM guard models the working set,
    # but this tunnel runtime's true usable memory is opaque (round 4:
    # 1M x 960 OOMs at the guard's 1024-wave pick; 512 fits). On a build
    # OOM the cap is halved, PERSISTED, and the process exits rc=3 so the
    # shell relaunch loop resumes from the checkpoint with the smaller
    # wave — quality is unaffected (wave members get exact intra-wave
    # candidates at any width, flatnav_tpu/index/build.py).
    cap_path = f"{SCRATCH}/ns_{variant}_{args.n}_{dim}_wavecap"
    wave_cap = args.max_wave
    if wave_cap is None and os.path.exists(cap_path):
        with open(cap_path) as f:
            wave_cap = int(f.read().strip())
        log(f"resuming with persisted wave cap {wave_cap}")
    while done < args.n:
        hi = min(done + chunk, args.n)
        t0 = time.time()
        bkw = {} if wave_cap is None else {"max_wave": wave_cap}
        try:
            g = add_batch(
                g, data[done:hi], np.arange(done, hi),
                ef_construction=args.efc, metric=metric, **bkw,
            )
            assert int(g.num_nodes) == hi  # host sync before the clock
        except Exception as e:
            if "RESOURCE_EXHAUSTED" not in str(e):
                raise
            if wave_cap is None:
                # halve from the in-code guard's actual pick, not _MAX_WAVE
                from flatnav_tpu.index.build import (
                    _MAX_WAVE,
                    _safe_wave_size,
                )
                wave_cap = _safe_wave_size(
                    _MAX_WAVE, ef_construction=args.efc, m=M, d=dim,
                    expand_factor=32, intra_candidates=64,
                    capacity=args.n, table_bytes=args.n * dim * 4,
                )
            new_cap = max(128, wave_cap // 2)
            with open(cap_path, "w") as f:
                f.write(str(new_cap))
            log(f"build OOM at wave cap {wave_cap or 'guard-default'}; "
                f"persisted cap {new_cap} — relaunch to resume")
            sys.exit(3)
        build_s += time.time() - t0
        done = hi
        save_index(cache, g, metric,
                   extra={"build_seconds": round(build_s, 1)})
        log(f"built {done}/{args.n} ({build_s:.1f}s cumulative)")

    if args.build_dtype != "float32":
        # serve at full precision: reattach the f32 vectors to the links
        # built on the bf16 table (labels are arange in both)
        from flatnav_tpu.index.graph import graph_from_numpy

        g = graph_from_numpy(
            np.asarray(data), np.asarray(g.links[: args.n]),
            num_nodes=args.n, capacity=args.n,
        )

    gt_path = f"{SCRATCH}/ns_{variant}_{args.n}_gt.npy"
    if os.path.exists(gt_path) and not args.rebuild:
        gt = np.load(gt_path)
    else:
        gt = np.asarray(
            brute_force_knn(
                jnp.asarray(data), jnp.asarray(queries), K, metric)[1]
        )
        np.save(gt_path, gt)
    q_dev = jnp.asarray(queries)

    def recall(found):
        return float(np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / K
             for a, b in zip(found, gt)]
        ))

    def run_graph(ef, expand, cw=0):
        outs = []
        for lo in range(0, NQ, BATCH):
            r = batched_search(
                g.vectors, g.links, g.labels, g.num_nodes,
                q_dev[lo : lo + BATCH], k=K, ef=ef, metric=metric,
                expand_factor=expand, compact_width=cw,
            )
            outs.append(np.asarray(r.labels))
        return np.concatenate(outs, 0)

    exact = fast = fused = fusednr = None
    if not args.skip_scan_engines:
        def run_engine(fn):
            outs = []
            for lo in range(0, NQ, BATCH):
                _, i_ = fn(q_dev[lo : lo + BATCH])
                outs.append(np.asarray(i_))
            return np.concatenate(outs, 0)

        # Large-d tables: the [B, tile] key matrix rides beside the f32
        # table AND fast_knn's bf16 copy — at d=960 the 262144 tile that
        # wins at d=128 is memory-marginal, so scale it down.
        fast_tile = 262144 if dim <= 256 else 65536
        ex = lambda q: brute_force_knn(
            g.vectors, q, K, metric, n_valid=g.num_nodes
        )
        fa = lambda q: fast_knn(
            g.vectors, q, K, metric, tile_size=fast_tile, rerank=32,
            n_valid=g.num_nodes,
        )
        fu = lambda q: fused_knn(
            g.vectors, q, K, metric, rerank=32, n_valid=g.num_nodes,
        )
        # no-gather variant: ranks by the kernel's f32-accumulated keys
        # (skips the DMA-issue-bound [B, rerank] row gather — the fused
        # engine's single largest cost at HBM-resident scale)
        fnr = lambda q: fused_knn(
            g.vectors, q, K, metric, rerank=32, n_valid=g.num_nodes,
            exact_rerank=False,
        )
        # Engine points persist like sweep rows: a worker fault here must
        # not wedge the relaunch loop before the graph sweep, and a
        # relaunch must not re-attempt a faulted (or finished) engine.
        eng_path = f"{SCRATCH}/ns_{variant}_{args.n}_{args.efc}_engines.json"
        eng: dict = {}
        if os.path.exists(eng_path) and not args.rebuild:
            with open(eng_path) as f:
                eng = json.load(f)
        for name, fn in (("exact", ex), ("fast", fa), ("fused", fu),
                         ("fusednr", fnr)):
            if name in eng:
                log(f"{name} engine: resuming recorded point {eng[name]}")
                continue
            try:
                r = recall(run_engine(fn))
                times = []
                for _ in range(3):
                    t0 = time.time()
                    run_engine(fn)
                    times.append(time.time() - t0)
            except Exception as e:  # jax.errors.JaxRuntimeError
                eng[name] = {"fault": True, "error": type(e).__name__}
                with open(eng_path, "w") as f:
                    json.dump(eng, f)
                log(f"{name} engine: WORKER FAULT ({e}) — marked, "
                    f"relaunch to continue")
                sys.exit(3)
            qps = NQ / min(times)
            # scan engines do 2*N*d useful FLOP per query; report
            # achieved FLOP/s and MFU vs bf16 peak (v5e 197 TFLOP/s)
            tf = qps * 2.0 * args.n * dim / 1e12
            eng[name] = {"recall": r, "qps": round(qps, 1),
                         "achieved_tflops": round(tf, 2),
                         "mfu": round(tf / 197.0, 4)}
            with open(eng_path, "w") as f:
                json.dump(eng, f)
            log(f"{name} engine: {eng[name]['qps']:.0f} qps @ recall {r:.4f}")
        exact, fast = eng.get("exact"), eng.get("fast")
        fused, fusednr = eng.get("fused"), eng.get("fusednr")

    # Sweep rows persist after every point (a worker fault mid-sweep
    # loses one point, not the run) and completed points are skipped on
    # resume.
    part_path = f"{SCRATCH}/ns_{variant}_{args.n}_{args.efc}_sweep.json"
    rows, chosen = [], None
    if os.path.exists(part_path) and not args.rebuild:
        with open(part_path) as f:
            rows = json.load(f)
        log(f"resuming sweep: {len(rows)} recorded points")
    done_pts = {(r["ef"], r["expand"]) for r in rows}
    for expand in E_SWEEP:
        arm = [r for r in rows if r["expand"] == expand]
        if any(r.get("recall", 0) >= args.target for r in arm):
            chosen_row = max(
                (r for r in arm if r.get("recall", 0) >= args.target),
                key=lambda r: r.get("qps", 0),
            )
            if chosen_row.get("qps") and (
                chosen is None or chosen_row["qps"] > chosen["qps"]
            ):
                chosen = dict(chosen_row, efc=args.efc)
            continue
        for ef in EF_SWEEP:
            if (ef, expand) in done_pts:
                continue
            t0 = time.time()
            # A worker kill (kernel fault) takes the whole process down
            # on the NEXT device call too — mark the point as faulted so
            # the relaunch skips it, then exit for a clean restart.
            try:
                r = recall(run_graph(ef, expand))
            except Exception as e:  # jax.errors.JaxRuntimeError
                rows.append({"ef": ef, "expand": expand, "fault": True,
                             "error": type(e).__name__})
                with open(part_path, "w") as f:
                    json.dump(rows, f)
                log(f"E={expand} ef={ef}: WORKER FAULT ({e}) — marked, "
                    f"relaunch to continue")
                sys.exit(3)
            log(f"E={expand} ef={ef}: recall={r:.4f} "
                f"({time.time()-t0:.1f}s incl compile)")
            rows.append({"ef": ef, "expand": expand, "recall": r})
            with open(part_path, "w") as f:
                json.dump(rows, f)
            if r >= args.target:
                times = []
                for _ in range(3):
                    t0 = time.time()
                    run_graph(ef, expand)
                    times.append(time.time() - t0)
                qps = round(NQ / min(times), 1)
                rows[-1]["qps"] = qps
                with open(part_path, "w") as f:
                    json.dump(rows, f)
                log(f"E={expand} ef={ef}: {qps:.0f} qps")
                if chosen is None or qps > chosen["qps"]:
                    chosen = dict(rows[-1], efc=args.efc)
                break

    ref = None
    # run_ref_baseline.py runs the same single-core C++ baseline in
    # parallel with the TPU phase (this host has ONE vCPU; serializing
    # the ~1h+ build/sweep after the TPU work doubles wall clock) and
    # persists it to a sidecar — load that instead of re-measuring.
    sidecar = os.path.join(
        _REPO,
        f"benchmarks/results_{variant}_efc{args.efc}.json.refside.json")
    if (not args.no_baseline and args.n == 1_000_000
            and os.path.exists(sidecar)):
        with open(sidecar) as f:
            ref = json.load(f)
        log(f"reference baseline loaded from sidecar {sidecar}")
    if ref is None and not args.no_baseline:
        binary = os.path.join(_REPO, "tools/reference_baseline/bench_ref")
        if not os.path.exists(binary):
            subprocess.run(
                ["bash", os.path.join(
                    _REPO, "tools/reference_baseline/build_baseline.sh")],
                check=False, capture_output=True,
            )
        if os.path.exists(binary):
            df = f"{SCRATCH}/ns_{variant}_data.f32"
            qf, gf = f"{SCRATCH}/ns_q.f32", f"{SCRATCH}/ns_gt.i32"
            nq_ref = 2000
            data.astype(np.float32).tofile(df)
            queries[:nq_ref].astype(np.float32).tofile(qf)
            gt[:nq_ref].astype(np.int32).tofile(gf)
            log("running reference baseline on identical data")
            out = subprocess.run(
                [binary, df, qf, gf, str(args.n), str(nq_ref), str(dim),
                 str(args.target), str(M), str(args.efc), str(K),
                 "float32", metric.value],
                capture_output=True, text=True, timeout=14400,
            )
            if out.returncode == 0:
                ref = json.loads(out.stdout.strip().splitlines()[-1])
            else:
                log(f"baseline failed: {out.stderr[-300:]}")

    result = {
        "workload": (
            f"{variant} {args.n}x{dim} fp32 {metric.value} "
            f"M={M} efc={args.efc} k={K}"
        ),
        "generator": dict(gen_kw) or "defaults",
        "note": "synthetic stand-in (no egress); angular = IP over "
                "L2-normalized rows, reference grid "
                "experiments/Makefile:333-381",
        "build_seconds": round(build_s, 1),
        "build_dtype": args.build_dtype,
        "exact_engine": exact,
        "fast_engine": fast,
        "fused_engine": fused,
        "fusednr_engine": fusednr,
        "graph_operating_point": chosen,
        "sweep": rows,
        "reference_single_core": ref,
    }
    # smoke-size runs must never clobber the committed 1M artifacts:
    # key the results file by n when it isn't the standard scale
    size_tag = "" if args.n == 1_000_000 else f"_n{args.n}"
    path = os.path.join(
        _REPO, f"benchmarks/results_{variant}_efc{args.efc}{size_tag}.json"
    )
    with open(path, "w") as f:
        json.dump(result, f, indent=2)

    # VERDICT r02 item 2: record a qualifying clustered graph point into
    # the headline 1M results file (1M runs only — a smoke-size run's
    # trivially-high qps must not replace the headline operating point)
    main_path = os.path.join(_REPO, "benchmarks/results_clustered_1m.json")
    if (
        args.config == "clustered" and args.n == 1_000_000
        and chosen is not None
        and chosen["recall"] >= args.target and os.path.exists(main_path)
    ):
        with open(main_path) as f:
            main_res = json.load(f)
        prev = main_res.get("graph_operating_point")
        if prev is None or chosen["qps"] > prev.get("qps", 0):
            if gen_kw:
                chosen = dict(chosen, generator=dict(gen_kw))
            main_res["graph_operating_point"] = chosen
            main_res[f"graph_sweep_{variant}_efc{args.efc}"] = rows
            if ref:
                main_res[f"reference_single_core_{variant}_efc{args.efc}"] = (
                    ref
                )
            with open(main_path, "w") as f:
                json.dump(main_res, f, indent=2)
            log(f"updated {main_path} graph_operating_point (efc={args.efc})")

    print(json.dumps(result))


if __name__ == "__main__":
    main()
