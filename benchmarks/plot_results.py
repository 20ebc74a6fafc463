#!/usr/bin/env python
"""Paper-figure scripts analog: render recorded benchmark results into the
reference's figure set (recall-vs-QPS and recall-vs-latency Pareto curves,
per dataset, flatnav vs baselines).

The reference keeps ~6 one-off matplotlib scripts under
experiments/plotting/ (plot_ann_bench_p50.py, plot_ann_bench_p99.py,
plot_bigann_p50/p99.py, plot_glove.py); this one script replaces them,
consuming both result formats this repo records:

  * `metrics.json` rows appended by flatnav_tpu/bench/run_benchmark.py
    (the reference run-benchmark.py format: one dict per (M, ef_c, ef_s)
    with recall/qps/latency_p50/...).
  * the headline JSONs written by bench.py sweeps and
    benchmarks/run_clustered_1m.py (sweep rows + reference_single_core).

Usage:
  python benchmarks/plot_results.py metrics.json --out-dir figures/
  python benchmarks/plot_results.py benchmarks/results_clustered_1m.json
"""

from __future__ import annotations

import argparse
import collections
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

from flatnav_tpu.bench.plotting import plot_pareto  # noqa: E402


def _rows_from_metrics_json(doc) -> dict[str, list[dict]]:
    """reference-format metrics.json -> {dataset: [row, ...]}"""
    by_ds = collections.defaultdict(list)
    rows = doc if isinstance(doc, list) else doc.get("runs", [])
    for row in rows:
        by_ds[row.get("dataset", "unknown")].append(row)
    return by_ds


def _rows_from_headline_json(doc) -> dict[str, list[dict]]:
    """bench.py / run_clustered_1m.py result -> {workload: rows}; the
    reference single-core measurement becomes its own series."""
    rows = []
    for r in doc.get("sweep", []):
        if "recall" in r and ("qps" in r or "ef" in r):
            rows.append(
                {
                    "index_type": "flatnav-tpu",
                    "M": doc.get("M", 32),
                    "recall": r["recall"],
                    "qps": r.get("qps", 0.0),
                }
            )
    ref = doc.get("reference_single_core") or {}
    if ref.get("qps"):
        rows.append(
            {
                "index_type": "reference-1core",
                "M": doc.get("M", 32),
                "recall": ref.get("recall", 0.0),
                "qps": ref["qps"],
            }
        )
    name = doc.get("workload", doc.get("metric", "headline"))
    return {str(name).split(" ")[0]: rows}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("results", nargs="+", help="metrics.json / result JSONs")
    ap.add_argument("--out-dir", default=os.path.join(_REPO, "figures"))
    ap.add_argument(
        "--latency-percentiles", nargs="+", default=["p50", "p99"],
        help="latency figures to render when the rows carry latency_p*",
    )
    args = ap.parse_args()
    os.makedirs(args.out_dir, exist_ok=True)

    by_ds: dict[str, list[dict]] = collections.defaultdict(list)
    for path in args.results:
        with open(path) as f:
            doc = json.load(f)
        parsed = (
            _rows_from_headline_json(doc)
            if isinstance(doc, dict) and ("sweep" in doc or "metric" in doc)
            else _rows_from_metrics_json(doc)
        )
        for ds, rows in parsed.items():
            by_ds[ds].extend(rows)

    written = []
    for ds, rows in by_ds.items():
        rows = [r for r in rows if r.get("qps")]
        if not rows:
            continue
        out = os.path.join(args.out_dir, f"{ds}_recall_qps.png")
        plot_pareto(rows, out, title=f"{ds}: recall vs QPS")
        written.append(out)
        for pct in args.latency_percentiles:
            key = f"latency_{pct}"
            lat_rows = [
                {**r, key: r[key]} for r in rows if r.get(key) is not None
            ]
            if lat_rows:
                out = os.path.join(args.out_dir, f"{ds}_recall_{pct}.png")
                plot_pareto(
                    lat_rows, out, y_metric=key,
                    title=f"{ds}: recall vs {pct} latency",
                )
                written.append(out)
    for w in written:
        print(w)
    if not written:
        print("no plottable rows found", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
