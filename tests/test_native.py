"""Native C++ runtime library tests: the Python implementations serve as
the oracle (the same pattern as the reference's SIMD-vs-scalar tests,
test_distances.cpp)."""

import numpy as np
import pytest

from flatnav_tpu import native
from flatnav_tpu import reorder as py_reorder

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native library unavailable"
)


def _random_links(rng, n=300, m=8):
    links = rng.integers(0, n, (n, m)).astype(np.int32)
    # sprinkle self-loop padding like a real index
    mask = rng.random((n, m)) < 0.2
    links[mask] = (np.arange(n)[:, None] * np.ones((1, m), int))[mask]
    return links


def test_native_gorder_matches_python(rng):
    links = _random_links(rng)
    n = links.shape[0]
    got = native.gorder(links, n, 5)
    # bypass the native redirect inside py gorder by calling the internals
    out_table = py_reorder._adjacency(links, n)
    in_table = [[] for _ in range(n)]
    for u in range(n):
        for v in out_table[u]:
            in_table[v].append(u)
    q = py_reorder._GorderQueue(n)
    order = np.empty(n, dtype=np.int32)
    q.increment(0)
    order[0] = q.pop()
    for i in range(1, n):
        v_e = order[i - 1]
        for u in out_table[v_e]:
            q.increment(u)
        for u in in_table[v_e]:
            q.increment(u)
            for v in out_table[u]:
                q.increment(v)
        if i > 6:
            v_b = order[i - 6]
            for u in out_table[v_b]:
                q.decrement(u)
            for u in in_table[v_b]:
                q.decrement(u)
                for v in out_table[u]:
                    q.decrement(v)
        order[i] = q.pop()
    want = np.empty(n, dtype=np.int32)
    want[order] = np.arange(n, dtype=np.int32)
    assert sorted(got.tolist()) == list(range(n))  # valid permutation
    np.testing.assert_array_equal(got, want)


def test_native_rcm_is_valid_permutation(rng):
    links = _random_links(rng)
    n = links.shape[0]
    got = native.rcm_order(links, n)
    assert sorted(got.tolist()) == list(range(n))
    # oracle comparison (identical tie-breaking: stable sorts in both)
    want = py_reorder.rcm_order.__wrapped__(links, n) if hasattr(
        py_reorder.rcm_order, "__wrapped__"
    ) else None
    if want is not None:
        np.testing.assert_array_equal(got, want)


def test_native_npy_roundtrip(tmp_path, rng):
    for dtype in (np.float32, np.uint8, np.int8, np.int32):
        arr = (rng.standard_normal((50, 7)) * 40).astype(dtype)
        path = str(tmp_path / f"x_{np.dtype(dtype).name}.npy")
        assert native.npy_write(path, arr)
        # numpy can read ours
        back_np = np.load(path)
        np.testing.assert_array_equal(back_np, arr)
        # and we can read numpy's
        path2 = str(tmp_path / f"y_{np.dtype(dtype).name}.npy")
        np.save(path2, arr)
        back = native.npy_read(path2)
        np.testing.assert_array_equal(back, arr)


def test_native_mtx_parse(tmp_path):
    n, m = 10, 4
    edges = [(i, (i + 1) % n) for i in range(n)] + [(0, 5)]
    path = tmp_path / "g.mtx"
    with open(path, "w") as f:
        f.write("%%MatrixMarket matrix coordinate pattern general\n")
        f.write("% a comment line\n")
        f.write(f"{n} {n} {len(edges)}\n")
        for a, b in edges:
            f.write(f"{a + 1} {b + 1}\n")
    links = native.read_mtx(str(path), n, m)
    assert links is not None
    assert (links[:, 0] == (np.arange(n) + 1) % n).all()
    assert links[0, 1] == 5
    assert links[3, 1] == 3  # self-loop padding
