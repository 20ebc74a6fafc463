#!/usr/bin/env python
"""Paper-figure scripts: render the recorded benchmark results as the
reference's figure set.

The reference ships six per-dataset matplotlib scripts
(/root/reference/experiments/plotting/plot_ann_bench_p50.py, _p99.py,
plot_bigann_p50/p99.py, plot_glove.py, lin_zhao_webplotdigitizer.py,
~1,000 LoC) that turn metrics.json files into recall-vs-QPS and
recall-vs-latency-percentile Pareto figures. This is the consolidated
TPU-repo analog: it reads every benchmarks/results_*.json this repo
records (engine operating points + sweeps + the reference single-core
point measured on identical data) plus any harness metrics.json, and
emits one figure per workload and a cross-workload summary grid under
benchmarks/figures/.

Usage: python benchmarks/plot_figures.py [--out benchmarks/figures]
"""

import argparse
import glob
import json
import os
import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flatnav_tpu.bench.plotting import pareto_frontier  # noqa: E402

ENGINE_STYLES = {
    "graph": dict(color="#1f77b4", marker="o",
                  label="flatnav-tpu graph (beam)"),
    "exact": dict(color="#2ca02c", marker="s",
                  label="flatnav-tpu exact MXU scan"),
    "fast": dict(color="#d62728", marker="^",
                 label="flatnav-tpu fast scan (bf16+rerank)"),
    "pq_scan": dict(color="#9467bd", marker="D",
                    label="flatnav-tpu PQ-ADC scan"),
    "reference": dict(color="#7f7f7f", marker="x",
                      label="reference C++ (1 core AVX)"),
}


def _points(res: dict):
    """Extract (engine, recall, qps) points from a results json."""
    pts = []
    for eng in ("exact", "fast", "pq_scan"):
        p = res.get(f"{eng}_engine")
        if p and p.get("qps"):
            pts.append((eng, p["recall"], p["qps"]))
    for row in res.get("sweep", []) + res.get("graph_sweep", []):
        if row.get("qps"):
            pts.append(("graph", row["recall"], row["qps"]))
    op = res.get("graph_operating_point")
    if op and op.get("qps"):
        pts.append(("graph", op["recall"], op["qps"]))
    ref = res.get("reference_single_core")
    if ref and ref.get("qps"):
        pts.append(("reference", ref["recall"], ref["qps"]))
    for key, sub in res.items():
        if key.startswith("reference_single_core_efc") and sub.get("qps"):
            pts.append(("reference", sub["recall"], sub["qps"]))
    return pts


def plot_workload(res: dict, name: str, out_dir: str):
    pts = _points(res)
    if not pts:
        return None
    fig, ax = plt.subplots(figsize=(6.5, 4.5))
    by_engine = {}
    for eng, r, q in pts:
        by_engine.setdefault(eng, []).append((r, q))
    for eng, ep in sorted(by_engine.items()):
        style = ENGINE_STYLES.get(eng, {})
        front = pareto_frontier(ep)
        xs, ys = zip(*sorted(ep))
        ax.scatter(xs, ys, s=28, alpha=0.45, color=style.get("color"))
        fx, fy = zip(*front)
        ax.plot(fx, fy, "-", lw=1.8, **style)
    ax.set_yscale("log")
    ax.set_xlabel("recall@10")
    ax.set_ylabel("QPS (log)")
    ax.set_title(res.get("workload", name))
    ax.grid(alpha=0.3)
    ax.legend(fontsize=8, loc="best")
    fig.tight_layout()
    path = os.path.join(out_dir, f"{name}.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path


def plot_summary(all_results: dict, out_dir: str):
    items = [(n, r) for n, r in all_results.items() if _points(r)]
    if not items:
        return None
    cols = min(3, len(items))
    rows = -(-len(items) // cols)
    fig, axes = plt.subplots(
        rows, cols, figsize=(5.4 * cols, 4.0 * rows), squeeze=False
    )
    for ax in axes.flat[len(items):]:
        ax.axis("off")
    for ax, (name, res) in zip(axes.flat, items):
        by_engine = {}
        for eng, r, q in _points(res):
            by_engine.setdefault(eng, []).append((r, q))
        for eng, ep in sorted(by_engine.items()):
            style = ENGINE_STYLES.get(eng, {})
            fx, fy = zip(*pareto_frontier(ep))
            ax.plot(fx, fy, "-", lw=1.6, marker=style.get("marker"),
                    ms=4, color=style.get("color"),
                    label=style.get("label"))
        ax.set_yscale("log")
        ax.set_title(res.get("workload", name), fontsize=9)
        ax.grid(alpha=0.3)
        ax.tick_params(labelsize=8)
    handles, labels = axes.flat[0].get_legend_handles_labels()
    fig.legend(handles, labels, loc="lower center", fontsize=9,
               ncol=min(4, len(labels)))
    fig.suptitle("flatnav-tpu vs reference C++: recall@10 vs QPS")
    fig.tight_layout(rect=(0, 0.08, 1, 0.96))
    path = os.path.join(out_dir, "summary_grid.png")
    fig.savefig(path, dpi=130)
    plt.close(fig)
    return path


def plot_latency_percentiles(out_dir: str):
    """p50/p99 latency figures from harness metrics.json files (the
    plot_ann_bench_p50/_p99 analog), if any harness runs are recorded."""
    outs = []
    for mpath in glob.glob(os.path.join(_REPO, "**/metrics.json"),
                           recursive=True):
        with open(mpath) as f:
            try:
                rows = json.load(f)
            except json.JSONDecodeError:
                continue
        rows = [r for r in rows if isinstance(r, dict)
                and "recall" in r and "latency_p50" in r]
        if not rows:
            continue
        for pct in ("p50", "p99"):
            key = f"latency_{pct}"
            fig, ax = plt.subplots(figsize=(6.5, 4.5))
            series = {}
            for r in rows:
                series.setdefault(r.get("index_type", "flatnav"), []).append(
                    (r["recall"], r[key])
                )
            for stype, pts in sorted(series.items()):
                xs, ys = zip(*sorted(pts))
                ax.plot(xs, ys, "o-", label=stype)
            ax.set_xlabel("recall")
            ax.set_ylabel(f"{pct} latency (ms)")
            ax.set_yscale("log")
            ax.grid(alpha=0.3)
            ax.legend(fontsize=8)
            fig.tight_layout()
            path = os.path.join(out_dir, f"latency_{pct}.png")
            fig.savefig(path, dpi=130)
            plt.close(fig)
            outs.append(path)
        break
    return outs


def plot_batch_latency(out_dir: str):
    """True per-dispatch latency vs batch size per engine, from
    tools/measure_latency.py's artifact (VERDICT r03 weak 4: real
    p50/p99, not amortized)."""
    path = os.path.join(_REPO, "benchmarks/results_latency.json")
    if not os.path.exists(path):
        return []
    with open(path) as f:
        data = json.load(f)
    outs = []
    for wl, res in data.items():
        rows = res.get("rows", [])
        if not rows:
            continue
        fig, axes = plt.subplots(1, 2, figsize=(11, 4.3))
        series = {}
        for r in rows:
            series.setdefault(r["engine"], []).append(r)
        for eng, pts in sorted(series.items()):
            pts = sorted(pts, key=lambda r: r["batch"])
            bs = [p["batch"] for p in pts]
            axes[0].plot(bs, [p["p50_ms"] for p in pts], "o-",
                         label=f"{eng} p50")
            axes[0].plot(bs, [p["p99_ms"] for p in pts], "--",
                         alpha=0.6, label=f"{eng} p99")
            axes[1].plot(bs, [p["qps_at_batch"] for p in pts], "o-",
                         label=eng)
        for ax, yl in ((axes[0], "dispatch latency (ms)"),
                       (axes[1], "throughput (qps)")):
            ax.set_xlabel("batch size")
            ax.set_ylabel(yl)
            ax.set_xscale("log")
            ax.set_yscale("log")
            ax.grid(alpha=0.3)
            ax.legend(fontsize=7)
        fig.suptitle(res.get("workload", wl), fontsize=9)
        fig.tight_layout()
        p = os.path.join(out_dir, f"batch_latency_{wl}.png")
        fig.savefig(p, dpi=130)
        plt.close(fig)
        outs.append(p)
    return outs


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(_REPO,
                                                  "benchmarks/figures"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)

    made = []
    all_results = {}
    for path in sorted(glob.glob(os.path.join(_REPO,
                                              "benchmarks/results_*.json"))):
        name = os.path.splitext(os.path.basename(path))[0]
        with open(path) as f:
            res = json.load(f)
        if not isinstance(res, dict):
            continue
        all_results[name] = res
        p = plot_workload(res, name, args.out)
        if p:
            made.append(p)
    p = plot_summary(all_results, args.out)
    if p:
        made.append(p)
    made += plot_latency_percentiles(args.out)
    made += plot_batch_latency(args.out)
    for p in made:
        print(p)


if __name__ == "__main__":
    main()
