#!/usr/bin/env python
"""BigANN-100M-class benchmark: 100M x 128 uint8 on ONE v5e chip.

The reference's flagship scale (bigann-100M, experiments/Makefile:8-23)
runs on a 1 TB / 96-core EPYC host; here the whole table lives RESIDENT
in HBM — 100M x 128 uint8 = 12.8 GB — and three engines are measured
against exact ground truth:

  exact    tiled int32 MXU scan (recall 1.0; the [B, N] key matrix
           round-trips HBM, so it is key-traffic-bound at this N)
  fused    the Pallas matmul+bucket-min kernel on the UNPROMOTED uint8
           table (ops/fused_scan.py native-int path: per-tile bf16 cast
           is exact for 8-bit values, f32 accumulation exact at d=128,
           so phase-1 keys are exact integer rankings); the [B, N] key
           matrix never exists — HBM sees the 12.8 GB rows + a 1/L
           summary. fusednr additionally skips the rerank row gather.
  pq       ProductQuantizer ADC scan (m_pq bytes/node codes) + raw
           rerank from the resident table — the beyond-HBM design point
           (codes stay small when even uint8 rows would not fit, e.g.
           f32/960-d at this N = 384 GB); at THIS workload the raw table
           fits, so the PQ point is recorded as the memory/qps tradeoff
           against the engines above, not as the only option.

No graph engine: a 100M wave build is ~10x the 10M build's 82 device-
minutes — out of budget this round (and the reference needed 96 cores
for the same reason). No reference baseline either: its single-core
100M build is multi-day; BASELINE.md's 10M head-to-head carries the
reference comparison (results_bigann_10m.json).

Dataset: chunk-generated clustered uint8 (no egress; same generator
family as the 10M runner, centers fixed up front, per-chunk child RNG),
memmapped under .scratch (12.8 GB on disk).

Usage: PYTHONPATH=/root/repo python benchmarks/run_bigann_100m.py
         [--n 100000000] [--b 8192] [--m-pq 16]
         [--no-pq] [--skip-exact] [--rebuild]

Round 5: the fused engine is called BARE — no bucket_l/tile/qb pins —
exercising fused_knn's automatic shape selection (VMEM-capped L,
internal query chunking) at the scale that used to require per-runner
folklore; PQ codes ride the lane-packed layout (pack_codes_lanes), so
the 8-bit m_pq=16 code table is 1.6 GB device-side instead of 4x that
from minor-dim padding, and no full-table HLO temp exists.
Writes benchmarks/results_bigann_100m_class.json.
"""

import argparse
import functools
import json
import os
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

from flatnav_tpu.ops import (  # noqa: E402
    MetricType,
    brute_force_knn,
    fused_knn,
)

SCRATCH = os.environ.get(
    "FLATNAV_SCRATCH", os.path.join(_REPO, ".scratch"))

D, NQ, K = 128, 8192, 10  # NQ overridable via --nq
SEED = 0x100E


def log(m):
    print(f"[100m] {m}", file=sys.stderr, flush=True)


def gen_dataset(n: int, centers_per_64k: int = 26, rebuild: bool = False):
    """Chunk-generated clustered uint8 memmap + in-RAM queries.

    Mirrors flatnav_tpu/bench/synth.clustered's structure (Gaussian
    mixture, noise-perturbed dataset points as queries, percentile-scaled
    uint8 quantization) but generates in 2M-row chunks with per-chunk
    child seeds: the monolithic generator would hold two ~51 GB f32
    temporaries at this N.
    """
    os.makedirs(SCRATCH, exist_ok=True)
    # cache key carries the generator variant (advisor r04: a file
    # generated under one centers setting must not be silently reused
    # for another) — the legacy un-suffixed c26 files stay readable
    ctag = "" if centers_per_64k == 26 else f"_c{centers_per_64k}"
    path = f"{SCRATCH}/100m_data_{n}_{D}{ctag}.u8"
    qpath = f"{SCRATCH}/100m_q_{n}_{D}{ctag}.u8"
    if os.path.exists(path) and os.path.exists(qpath) and not rebuild:
        qs = np.fromfile(qpath, np.uint8).reshape(-1, D)
        if len(qs) >= NQ:
            return (np.memmap(path, np.uint8, "r", shape=(n, D)),
                    qs[:NQ])
        log(f"query file has {len(qs)} < NQ={NQ}; regenerating")
    rng = np.random.default_rng(SEED)
    n_centers = max(8, (n * centers_per_64k) // 65536)
    centers = rng.standard_normal((n_centers, D)).astype(np.float32) * 0.7
    # quantization scale from a 1M-row sample (the full-data percentile
    # pass would stream 51 GB; the sample's 0.5/99.5 percentiles match
    # to ~1e-3 at this mixture)
    s_assign = rng.integers(0, n_centers, 1_000_000)
    sample = centers[s_assign] + rng.standard_normal(
        (1_000_000, D)).astype(np.float32)
    lo, hi = np.percentile(sample, [0.5, 99.5])
    scale = 255.0 / (hi - lo)
    q8 = lambda x: np.clip(
        np.round((x - lo) * scale), 0, 255).astype(np.uint8)
    mm = np.memmap(path + ".tmp", np.uint8, "w+", shape=(n, D))
    chunk = 2_000_000
    t0 = time.time()
    for i, start in enumerate(range(0, n, chunk)):
        crng = np.random.default_rng((SEED, 1, i))
        rows = min(chunk, n - start)
        assign = crng.integers(0, n_centers, rows)
        blk = centers[assign] + crng.standard_normal(
            (rows, D)).astype(np.float32)
        mm[start : start + rows] = q8(blk)
        if i % 10 == 0:
            log(f"generated {start + rows}/{n} rows "
                f"({time.time()-t0:.0f}s)")
    mm.flush()
    del mm
    os.replace(path + ".tmp", path)
    qrng = np.random.default_rng((SEED, 2))
    data = np.memmap(path, np.uint8, "r", shape=(n, D))
    qsrc = qrng.choice(n, NQ, replace=False)
    qf = data[np.sort(qsrc)].astype(np.float32)
    # undo quantization to perturb in the original space, then requantize
    qf = qf / scale + lo + qrng.standard_normal((NQ, D)).astype(np.float32)
    queries = q8(qf)
    queries.tofile(qpath)
    log(f"dataset generated in {time.time()-t0:.0f}s "
        f"({os.path.getsize(path)/1e9:.1f} GB)")
    return data, queries


def push_resident(data_mm, n_pad):
    """Stream the memmap into one resident padded device buffer."""
    n = data_mm.shape[0]
    buf = jnp.zeros((n_pad, D), jnp.uint8)

    # donate the table buffer: without aliasing, every chunk update
    # holds TWO table-sized buffers (25.6 GB transient at n=100M — an
    # instant OOM against ~15 GB usable HBM)
    @functools.partial(jax.jit, donate_argnums=(0,))
    def upd(b, chunk, start):
        return jax.lax.dynamic_update_slice(b, chunk, (start, 0))

    chunk = 2_000_000
    t0 = time.time()
    for start in range(0, n, chunk):
        blk = np.ascontiguousarray(data_mm[start : start + chunk])
        buf = upd(buf, jnp.asarray(blk),
                  jnp.asarray(start, jnp.int32))
    buf.block_until_ready()
    log(f"table resident: {n}x{D} uint8 "
        f"({n * D / 1e9:.1f} GB) pushed in {time.time()-t0:.0f}s")
    return buf


def main():
    global NQ
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000_000)
    ap.add_argument("--nq", type=int, default=NQ)
    ap.add_argument("--b", type=int, default=8192,
                    help="query batch per fused dispatch (fused_knn "
                         "chunks internally to bound its summary "
                         "footprint — one big dispatch minimizes the "
                         "tunnel envelope)")
    ap.add_argument("--pq-b", type=int, default=1024,
                    help="query batch per PQ-scan dispatch (pq_scan_knn "
                         "does not chunk internally; its per-dispatch "
                         "state is [B, S*nc] tables + [B, r] carries)")
    ap.add_argument("--rerank", type=int, default=32)
    ap.add_argument("--m-pq", type=int, default=16,
                    help="8-bit subquantizers (16 B/node lane-packed = "
                         "1.6 GB at 100M beside the 12.8 GB table; 32 "
                         "puts the sum at the ~15 GiB usable-HBM edge)")
    ap.add_argument("--m-pq4", type=int, default=32,
                    help="subquantizers for the 4-bit fast-scan point "
                         "(default 32: 16 packed bytes/node — the same "
                         "HBM bytes as an 8-bit m=16 quantizer but 16x "
                         "less MXU work per code, the fast-scan sweet "
                         "spot at d=128)")
    ap.add_argument("--pq-rerank", type=int, default=64)
    ap.add_argument("--pq-tile", type=int, default=32768,
                    help="ADC scan tile: per-tile temps (the bf16 "
                         "one-hot and its compare operands) scale "
                         "linearly with the tile, and at 100M the "
                         "arguments already hold ~14 GB of the 15.75 "
                         "GB HBM — 32768 keeps the scan program under "
                         "~1 GB while the dot stays MXU-sized")
    ap.add_argument("--no-pq", action="store_true")
    ap.add_argument("--pq-only", action="store_true",
                    help="skip the fused/exact stages (their artifact "
                         "entries persist via the incremental flush) — "
                         "for PQ-stage relaunches after a fault fix")
    ap.add_argument("--skip-exact", action="store_true")
    ap.add_argument("--rebuild", action="store_true")
    args = ap.parse_args()
    NQ = args.nq
    n = args.n

    data_mm, queries = gen_dataset(n, rebuild=args.rebuild)
    table = push_resident(data_mm, n)
    nv = jnp.asarray(n, jnp.int32)
    q_dev = jnp.asarray(queries)

    gt_path = f"{SCRATCH}/100m_gt_{n}_{D}.npy"
    if os.path.exists(gt_path) and not args.rebuild:
        gt = np.load(gt_path)
    else:
        log("computing exact ground truth (tiled int32 MXU scan)")
        t0 = time.time()
        gt = np.concatenate([
            np.asarray(brute_force_knn(
                table, q_dev[lo : lo + 2048], K, MetricType.L2,
                n_valid=nv,
            )[1])
            for lo in range(0, NQ, 2048)
        ])
        np.save(gt_path, gt)
        log(f"ground truth done ({time.time()-t0:.0f}s)")

    def recall(found):
        return float(np.mean(
            [len(set(a.tolist()) & set(b.tolist())) / K
             for a, b in zip(found, gt)]
        ))

    def time_engine(run_fn, name, flops_per_q=None):
        found = run_fn()
        r = recall(found)
        times = []
        for _ in range(3):
            t0 = time.time()
            run_fn()
            times.append(time.time() - t0)
        out = {"recall": r, "qps": round(NQ / min(times), 1)}
        if flops_per_q:
            tf = out["qps"] * flops_per_q / 1e12
            out["achieved_tflops"] = round(tf, 2)
            out["mfu"] = round(tf / 197.0, 4)
        log(f"{name}: {out['qps']:.0f} qps @ recall {r:.4f} "
            + (f"({out.get('achieved_tflops')} TFLOP/s, "
               f"mfu {out.get('mfu'):.1%})" if flops_per_q else ""))
        return out

    scan_flops = 2.0 * n * D
    results = {}
    # incremental flush: a late-stage fault (device OOM during PQ, a
    # relaunch mid-run) must not lose the engine points already measured
    size_tag = "" if n >= 50_000_000 else f"_n{n}"
    path = os.path.join(
        _REPO, f"benchmarks/results_bigann_100m_class{size_tag}.json")

    def flush():
        prev = {}
        if os.path.exists(path):
            with open(path) as f:
                prev = json.load(f)
        prev.update(results)
        with open(path, "w") as f:
            json.dump(prev, f, indent=2)
    B = args.b

    def run_fused(exact_rerank):
        def go():
            outs = []
            for lo in range(0, NQ, B):
                # BARE call: no bucket_l/tile/query_block pins — the
                # kernel picks VMEM-safe shapes and chunks the batch
                # internally (VERDICT r04 item 8)
                _, ids = fused_knn(
                    table, q_dev[lo : lo + B], K, MetricType.L2,
                    rerank=args.rerank, n_valid=nv,
                    exact_rerank=exact_rerank,
                )
                outs.append(np.asarray(ids))
            return np.concatenate(outs, 0)
        return go

    if not args.pq_only:
        try:
            results["fused_engine"] = time_engine(
                run_fused(True), "fused engine (native uint8)",
                scan_flops)
            results["fusednr_engine"] = time_engine(
                run_fused(False), "fused-norerank engine", scan_flops)
        except Exception as e:
            log(f"fused engines FAULTED: {e!r}")
            results["fused_fault"] = repr(e)
        flush()

    if not (args.skip_exact or args.pq_only):
        def run_exact():
            outs = []
            for lo in range(0, NQ, 2048):
                _, ids = brute_force_knn(
                    table, q_dev[lo : lo + 2048], K, MetricType.L2,
                    n_valid=nv)
                outs.append(np.asarray(ids))
            return np.concatenate(outs, 0)
        try:
            results["exact_engine"] = time_engine(
                run_exact, "exact engine", scan_flops)
        except Exception as e:
            log(f"exact engine FAULTED: {e!r}")
            results["exact_fault"] = repr(e)
        flush()

    if not args.no_pq:
        from flatnav_tpu.quantization import ProductQuantizer
        from flatnav_tpu.quantization.pq import pack_codes_lanes, pq_scan_knn

        PB = args.pq_b
        PQ_TILE = args.pq_tile

        sample = np.ascontiguousarray(
            data_mm[:: max(1, n // 500_000)][:500_000]).astype(np.float32)

        # The ENTIRE pq8 point — train, encode, the 3.2 GB device push,
        # and the timed runs — is fault-isolated: table 12.8 GB + codes
        # 3.2 GB sits ~100 MB under the ~15 GiB usable HBM, so an OOM
        # here must record pq_fault and fall through to the (smaller,
        # 0.8 GB) pq4 point rather than kill the stage on every
        # relaunch.
        codes_dev = None
        run_pq = None
        try:
            t0 = time.time()
            pq = ProductQuantizer(
                dim=D, num_subquantizers=args.m_pq).train(
                sample, n_iters=25)
            codes_path = f"{SCRATCH}/100m_codes_{n}_{D}_{args.m_pq}.npy"
            if os.path.exists(codes_path) and not args.rebuild:
                codes = np.load(codes_path, mmap_mode="r")
            else:
                log("encoding 100M rows (chunked, cast on device)")
                chunks = []
                for lo in range(0, n, 2_000_000):
                    blk = jnp.asarray(
                        np.ascontiguousarray(data_mm[lo : lo + 2_000_000])
                    ).astype(jnp.float32)
                    chunks.append(np.asarray(pq.encode(blk)))
                codes = np.concatenate(chunks, 0)
                np.save(codes_path, codes)
            prep_s = time.time() - t0
            # lane-packed layout: payload-1:1 HBM residency (a [N, 16]
            # uint8 device array pads 16 -> 128 lanes: 8x waste; with
            # the old in-jit pad temp this stage OOM'd at compile,
            # round-4 pq_fault) — and NO full-table copy in-program
            flat_codes, _ = pack_codes_lanes(np.asarray(codes), PQ_TILE)
            codes_dev = jnp.asarray(flat_codes)
            del flat_codes
            log(f"PQ ready: {codes_dev.nbytes/1e9:.1f} GB lane-packed "
                f"codes ({prep_s:.0f}s prep)")

            def run_pq(rr):
                def go():
                    outs = []
                    for lo in range(0, NQ, PB):
                        tables = pq.adc_tables(
                            queries[lo : lo + PB].astype(np.float32))
                        _, ids = pq_scan_knn(
                            codes_dev, tables, K, metric=MetricType.L2,
                            tile_size=PQ_TILE, rerank=rr,
                            lane_packed=True, n_valid=nv,
                            vectors=table,
                            queries=q_dev[lo : lo + PB],
                        )
                        outs.append(np.asarray(ids))
                    return np.concatenate(outs, 0)
                return go

            # recall is shortlist-bounded (raw rerank): sweep the width
            # until the 0.95 target lands — the ADC scan dominates the
            # dispatch, so wider rerank costs little qps
            best8 = None
            for rr in (args.pq_rerank, 128, 256, 512):
                pt = time_engine(run_pq(rr), f"pq-scan rerank={rr}")
                pt["rerank"] = rr
                if best8 is None or (pt["recall"], pt["qps"]) > (
                        best8["recall"], best8["qps"]):
                    best8 = pt
                if pt["recall"] >= 0.95:
                    best8 = pt
                    break
            best8["prep_seconds"] = round(prep_s, 1)
            best8["code_bytes_per_node"] = args.m_pq
            results["pq_scan_engine"] = best8
        except Exception as e:
            log(f"pq engine FAULTED: {e!r}")
            results["pq_fault"] = repr(e)
        finally:
            # free the 8-bit codes before the pq4 push: table 12.8 +
            # codes8 3.2 + packed4 0.8 GB would exceed usable HBM
            # (run_pq's closure cell holds the last reference)
            codes_dev = None
            run_pq = None
        flush()

        # 4-bit fast-scan point: at nc=16 the one-hot contraction does
        # 16x less MXU work per code than nbits=8 (the scan is
        # MXU-bound) and the nibble-packed codes are 0.8 GB at 100M —
        # this is the engine that stays viable when even uint8 rows
        # would not fit HBM.
        try:
            from flatnav_tpu.quantization.pq import pack_codes_4bit

            t0 = time.time()
            pq4 = ProductQuantizer(
                dim=D, num_subquantizers=args.m_pq4, nbits=4).train(
                sample, n_iters=25)
            p4_path = f"{SCRATCH}/100m_codes4_{n}_{D}_{args.m_pq4}.npy"
            if os.path.exists(p4_path) and not args.rebuild:
                packed4 = np.load(p4_path)
            else:
                log("encoding 100M rows at nbits=4 (chunked)")
                chunks = []
                for lo in range(0, n, 2_000_000):
                    blk = jnp.asarray(np.ascontiguousarray(
                        data_mm[lo : lo + 2_000_000])).astype(jnp.float32)
                    chunks.append(np.asarray(pack_codes_4bit(
                        pq4.encode(blk))))
                packed4 = np.concatenate(chunks, 0)
                np.save(p4_path, packed4)
            prep4_s = time.time() - t0
            flat4, _ = pack_codes_lanes(np.asarray(packed4), PQ_TILE)
            packed4_dev = jnp.asarray(flat4)
            del flat4
            log(f"PQ4 ready: {packed4_dev.nbytes/1e9:.1f} GB lane-packed "
                f"nibble codes ({prep4_s:.0f}s prep)")

            def run_pq4(rr):
                def go():
                    outs = []
                    for lo in range(0, NQ, PB):
                        tables = pq4.adc_tables(
                            queries[lo : lo + PB].astype(np.float32))
                        _, ids = pq_scan_knn(
                            packed4_dev, tables, K, metric=MetricType.L2,
                            tile_size=PQ_TILE, rerank=rr, packed_4bit=True,
                            lane_packed=True, n_valid=nv,
                            vectors=table,
                            queries=q_dev[lo : lo + PB],
                        )
                        outs.append(np.asarray(ids))
                    return np.concatenate(outs, 0)
                return go

            best4 = None
            for rr in (args.pq_rerank, 128, 256, 512, 1024):
                pt4 = time_engine(run_pq4(rr), f"pq4-scan rerank={rr}")
                pt4["rerank"] = rr
                if best4 is None or (pt4["recall"], pt4["qps"]) > (
                        best4["recall"], best4["qps"]):
                    best4 = pt4
                if pt4["recall"] >= 0.95:
                    best4 = pt4
                    break
            best4["prep_seconds"] = round(prep4_s, 1)
            best4["code_bytes_per_node"] = args.m_pq4 // 2
            best4["nbits"] = 4
            results["pq4_scan_engine"] = best4
        except Exception as e:
            log(f"pq4 engine FAULTED: {e!r}")
            results["pq4_fault"] = repr(e)
        flush()

    out = {
        "workload": f"clustered-c26 uint8 {n}x{D} L2 k={K} (one v5e chip)",
        "note": (
            "BigANN-100M-class stand-in (no egress). The 12.8 GB uint8 "
            "table is HBM-RESIDENT; the fused engine scans it UNPROMOTED "
            "(exact integer phase-1 keys, ops/fused_scan.py native-int "
            "path). No graph/baseline at this N: a 100M wave build is "
            "~10x the 10M build's 82 device-minutes and the reference "
            "single-core build is multi-day (its published 100M runs "
            "used 96 cores, experiments/README.md:14) — the 10M "
            "head-to-head carries the reference comparison."
        ),
        "batch": B,
        "fused_autoshaped": True,
        "device": str(jax.devices()[0]),
        **results,
    }
    # smoke-size runs must never clobber the headline artifact
    # (path computed up front for the incremental flush)
    prev = {}
    if os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
    prev.update(out)
    with open(path, "w") as f:
        json.dump(prev, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
