"""Benchmark harness + CLI tools end-to-end on tiny synthetic data
(the reference exercises run-benchmark.py only manually; we test it)."""

import json
import subprocess
import sys

import numpy as np
import pytest

from flatnav_tpu.bench.data_loader import get_data_loader
from flatnav_tpu.bench.metrics import MetricContext, metric_manager
from flatnav_tpu.bench.plotting import pareto_frontier


@pytest.fixture(scope="module")
def npy_triplet(tmp_path_factory):
    td = tmp_path_factory.mktemp("data")
    rng = np.random.default_rng(1)
    train = rng.standard_normal((1200, 16)).astype(np.float32)
    queries = rng.standard_normal((40, 16)).astype(np.float32)
    d = ((queries[:, None, :] - train[None]) ** 2).sum(-1)
    gtruth = np.argsort(d, axis=1)[:, :10].astype(np.int32)
    paths = {}
    for name, arr in [("train", train), ("queries", queries), ("gtruth", gtruth)]:
        p = td / f"{name}.npy"
        np.save(p, arr)
        paths[name] = str(p)
    return paths, td


def test_data_loader_npy(npy_triplet):
    paths, _ = npy_triplet
    loader = get_data_loader(paths["train"], paths["queries"], paths["gtruth"])
    train, q, gt = loader.load_data()
    assert train.shape == (1200, 16) and q.shape == (40, 16)
    loader = get_data_loader(
        paths["train"], paths["queries"], paths["gtruth"], limit=100
    )
    train, _, _ = loader.load_data()
    assert train.shape[0] == 100


def test_data_loader_binary_formats(tmp_path, rng):
    # big-ann .u8bin roundtrip
    arr = rng.integers(0, 255, (50, 8)).astype(np.uint8)
    p = tmp_path / "x.u8bin"
    with open(p, "wb") as f:
        f.write(np.asarray([50, 8], np.int32).tobytes())
        f.write(arr.tobytes())
    from flatnav_tpu.bench.data_loader import BinaryDatasetLoader

    loader = BinaryDatasetLoader(str(p), str(p), str(p))
    got = loader._load(str(p))
    np.testing.assert_array_equal(got, arr)
    got = loader._load(str(p), offset=10, limit=5)
    np.testing.assert_array_equal(got, arr[10:15])

    # TexMex .fvecs roundtrip
    from flatnav_tpu.bench.data_loader import _read_vecs

    fv = rng.standard_normal((20, 12)).astype(np.float32)
    p2 = tmp_path / "x.fvecs"
    with open(p2, "wb") as f:
        for row in fv:
            f.write(np.asarray([12], np.int32).tobytes())
            f.write(row.tobytes())
    got = _read_vecs(str(p2), np.float32, 4)
    np.testing.assert_array_equal(got, fv)
    # range reads copy only the requested rows (offset honored even
    # without a limit — pre-fix it was silently ignored)
    got = _read_vecs(str(p2), np.float32, 4, offset=5, limit=8)
    np.testing.assert_array_equal(got, fv[5:13])
    got = _read_vecs(str(p2), np.float32, 4, offset=15)
    np.testing.assert_array_equal(got, fv[15:])

    # .ivecs resolves through the extension factory (the TexMex
    # ground-truth format; pre-fix get_data_loader rejected it)
    iv = rng.integers(0, 100, (6, 4)).astype(np.int32)
    p3 = tmp_path / "gt.ivecs"
    with open(p3, "wb") as f:
        for row in iv:
            f.write(np.asarray([4], np.int32).tobytes())
            f.write(row.tobytes())
    loader = get_data_loader(str(p3), str(p3), str(p3))
    _, _, gt = loader.load_data()
    np.testing.assert_array_equal(gt, iv)


def test_npy_loader_offset_without_limit(npy_triplet):
    paths, _ = npy_triplet
    loader = get_data_loader(
        paths["train"], paths["queries"], paths["gtruth"], offset=1100
    )
    train, _, _ = loader.load_data()
    assert train.shape[0] == 100  # 1200 rows - offset


def test_recall_clamps_both_sides(rng):
    """recall@k against a ground-truth file with fewer than k columns
    must clamp the found side too (pre-fix any superset scored 1.0)."""
    from flatnav_tpu.bench.metrics import recall_at_k

    truth = np.asarray([[1, 2]])
    found_good = np.asarray([[1, 2, 9, 9, 9]])
    found_bad = np.asarray([[9, 9, 9, 1, 2]])
    assert recall_at_k(found_good, truth) == 1.0
    assert recall_at_k(found_bad, truth) == 0.0


def test_run_benchmark_end_to_end(npy_triplet):
    paths, td = npy_triplet
    from flatnav_tpu.bench.run_benchmark import parse_args, run_experiment

    args = parse_args(
        [
            "--dataset", paths["train"],
            "--queries", paths["queries"],
            "--gtruth", paths["gtruth"],
            "--metric", "l2",
            "--num-node-links", "8",
            "--ef-construction", "32",
            "--ef-search", "32", "64",
            "--k", "10",
            "--batch-size", "64",
            "--metrics-file", str(td / "metrics.json"),
            "--no-plot",
        ]
    )
    rows = run_experiment(args)
    assert len(rows) == 2
    for row in rows:
        assert row["recall"] > 0.5
        assert row["qps"] > 0
        assert row["distance_computations"] > 100
        assert row["index_size"] > 0
    with open(td / "metrics.json") as f:
        assert len(json.load(f)) == 2
    # higher ef must not reduce recall
    assert rows[1]["recall"] >= rows[0]["recall"] - 1e-6


def test_run_benchmark_hnsw_baseline(npy_triplet, monkeypatch):
    """--index-type hnsw must drive the adapter end-to-end. The wheel is
    not present in CI, so a faithful fake (knn_query/set_ef surface,
    brute-force answers) stands in; with a real wheel the same adapter
    path runs."""
    import sys as _sys
    import types

    class _FakeHnsw:
        def __init__(self, space, dim):
            self.dim = dim
            self._ef = 10
            self._dc = 0

        def init_index(self, max_elements, ef_construction, M):
            pass

        def set_num_threads(self, n):
            pass

        def add_items(self, data, ids):
            self._data = np.asarray(data)
            self._ids = np.asarray(ids)

        def set_ef(self, ef):
            self._ef = ef

        def knn_query(self, q, k):
            d = ((np.asarray(q)[:, None, :] - self._data[None]) ** 2).sum(-1)
            self._dc += d.size
            idx = np.argsort(d, axis=1)[:, :k]
            return self._ids[idx], np.take_along_axis(d, idx, axis=1)

        def get_distance_computations(self):
            dc, self._dc = self._dc, 0
            return dc

    fake = types.ModuleType("hnswlib")
    fake.Index = _FakeHnsw
    monkeypatch.setitem(_sys.modules, "hnswlib", fake)

    paths, td = npy_triplet
    from flatnav_tpu.bench.run_benchmark import parse_args, run_experiment

    args = parse_args(
        [
            "--dataset", paths["train"],
            "--queries", paths["queries"],
            "--gtruth", paths["gtruth"],
            "--index-type", "hnsw",
            "--num-node-links", "8",
            "--ef-construction", "32",
            "--ef-search", "32",
            "--k", "10",
            "--batch-size", "64",
            "--metrics-file", str(td / "metrics_hnsw.json"),
            "--no-plot",
        ]
    )
    rows = run_experiment(args)
    assert len(rows) == 1
    assert rows[0]["recall"] == 1.0  # fake is exact brute force
    assert rows[0]["distance_computations"] > 0
    assert rows[0]["index_size"] > 0


def test_metric_registry_coverage():
    assert {
        "recall", "qps", "latency_p50", "latency_p90", "latency_p95",
        "latency_p99", "latency_p999", "distance_computations",
        "index_size", "build_time",
    } <= set(metric_manager.available)


def test_pareto_frontier():
    pts = [(0.5, 100), (0.6, 90), (0.55, 120), (0.9, 10), (0.8, 50)]
    front = pareto_frontier(pts)
    assert (0.55, 120) in front and (0.9, 10) in front and (0.8, 50) in front
    assert (0.5, 100) not in front  # dominated by (0.55, 120)


def test_cli_construct_query(npy_triplet):
    paths, td = npy_triplet
    env_script = (
        "import jax; jax.config.update('jax_platforms','cpu');"
        "import sys; sys.argv = %r;"
        "g = {'__file__': %r, '__name__': '__main__'};"
        "exec(open(g['__file__']).read(), g)"
    )
    index_path = str(td / "cli_index.npz")
    code = env_script % (
        ["construct.py", "0", paths["train"], "8", "32", index_path],
        "tools/construct.py",
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "saved index" in r.stdout

    code = env_script % (
        ["query.py", index_path, paths["queries"], paths["gtruth"],
         "--ef-search", "48", "--k", "10", "--batch", "64"],
        "tools/query.py",
    )
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=600,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert "recall@10=" in r.stdout


@pytest.mark.parametrize("index_type", ["flatnav-exact", "flatnav-fast"])
def test_run_benchmark_scan_engines(npy_triplet, index_type):
    """The scan engines run through the full harness: allocate-only build
    (no graph), search_exact under the adapter, recall ~1.0."""
    paths, td = npy_triplet
    from flatnav_tpu.bench.run_benchmark import parse_args, run_experiment

    args = parse_args(
        [
            "--dataset", paths["train"],
            "--queries", paths["queries"],
            "--gtruth", paths["gtruth"],
            "--metric", "l2",
            "--index-type", index_type,
            "--num-node-links", "8",
            "--ef-construction", "32",
            "--ef-search", "32",
            "--k", "10",
            "--batch-size", "64",
            "--metrics-file", str(td / f"metrics_{index_type}.json"),
            "--no-plot",
        ]
    )
    rows = run_experiment(args)
    assert len(rows) == 1
    assert rows[0]["recall"] >= 0.99  # exact / near-exact by construction
    assert rows[0]["qps"] > 0


def test_run_benchmark_pq_scan_engine(npy_triplet):
    """The PQ-ADC scan engine runs through the full harness: PQ
    train+encode as the build, one-hot MXU contraction scan + raw-vector
    rerank under the adapter. Recall is shortlist-bounded (raw rerank),
    so near-exact on this small workload."""
    paths, td = npy_triplet
    from flatnav_tpu.bench.run_benchmark import parse_args, run_experiment

    args = parse_args(
        [
            "--dataset", paths["train"],
            "--queries", paths["queries"],
            "--gtruth", paths["gtruth"],
            "--metric", "l2",
            "--index-type", "flatnav-pq-scan",
            "--num-node-links", "8",
            "--ef-construction", "32",
            "--ef-search", "32",
            "--k", "10",
            "--batch-size", "64",
            "--metrics-file", str(td / "metrics_pq_scan.json"),
            "--no-plot",
        ]
    )
    rows = run_experiment(args)
    assert len(rows) == 1
    assert rows[0]["recall"] >= 0.9
    assert rows[0]["qps"] > 0
