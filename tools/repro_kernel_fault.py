#!/usr/bin/env python
"""Minimal repro for the huge-ef TPU kernel fault (VERDICT r03 weak 6).

Round-3 finding: FRESH compiles of 1M-table beam-search shapes with
ef >= 2048 (E=16) or ef = 3072 (E=64) kill the TPU worker process
regardless of the query sub-batch (tested down to B=32) — a platform
compiler/runtime bug, not HBM exhaustion: the memory guard's working-set
estimate at B=32 is ~0.2 GB (printed below), two orders of magnitude
under the limit, and a PREVIOUSLY CACHED executable of the identical
shape runs fine. The graph content is irrelevant (this repro uses random
links), so the shape alone is the trigger.

This script makes the fence in the sweep runners auditable: it runs the
faulting shape in a SUBPROCESS with the compile cache redirected to an
empty directory (forcing the fresh compile that triggers the bug) and
reports whether the worker survived. Expected on the affected platform:
child killed / JaxRuntimeError, rc != 0. On a fixed platform: rc == 0 and
the fence (benchmarks/run_northstar.py fault-marking) can be removed.

Usage:
  python tools/repro_kernel_fault.py            # run the repro (parent)
  python tools/repro_kernel_fault.py --child    # the faulting payload
  python tools/repro_kernel_fault.py --ef 512   # a control shape (passes)
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def child(args):
    import numpy as np
    import jax.numpy as jnp

    from flatnav_tpu.index import batched_search
    from flatnav_tpu.index.search import _search_temp_bytes
    from flatnav_tpu.ops import MetricType

    n, d, m = args.n, args.d, args.m
    em = max(min(args.e, args.ef), 1) * m
    est = _search_temp_bytes(args.b, args.ef, em, d, 0, n)
    print(f"[repro] shape: N={n} d={d} M={m} ef={args.ef} E={args.e} "
          f"B={args.b}; guard temp estimate {est/1e9:.2f} GB "
          f"(table {n*d*4/1e9:.2f} GB)", flush=True)
    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    links = jnp.asarray(rng.integers(0, n, (n, m)).astype(np.int32))
    labels = jnp.arange(n, dtype=jnp.int32)
    q = jnp.asarray(rng.standard_normal((args.b, d), dtype=np.float32))
    r = batched_search(
        vecs, links, labels, jnp.asarray(n, jnp.int32), q, k=10,
        ef=args.ef, metric=MetricType.L2, expand_factor=args.e,
    )
    import numpy as _np
    _np.asarray(r.labels)
    print("[repro] search completed — no fault at this shape", flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--m", type=int, default=32)
    ap.add_argument("--ef", type=int, default=2048)
    ap.add_argument("--e", type=int, default=16)
    ap.add_argument("--b", type=int, default=32)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    if args.child:
        child(args)
        return

    # force the FRESH-compile path: an empty, throwaway compile cache
    env = dict(os.environ)
    env["FLATNAV_TPU_CACHE"] = tempfile.mkdtemp(prefix="repro_cache_")
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--n", str(args.n), "--d", str(args.d), "--m", str(args.m),
           "--ef", str(args.ef), "--e", str(args.e), "--b", str(args.b)]
    print(f"[repro] launching child with empty compile cache "
          f"({env['FLATNAV_TPU_CACHE']})", flush=True)
    try:
        out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                             timeout=args.timeout)
        rc = out.returncode
        tail = (out.stdout + out.stderr)[-1500:]
    except subprocess.TimeoutExpired as e:
        rc, tail = -9, f"timeout after {args.timeout}s: " + str(
            (e.stdout or b"")[-500:])
    verdict = "FAULT REPRODUCED" if rc != 0 else "no fault"
    print(tail, flush=True)
    print(json.dumps({
        "shape": {"n": args.n, "d": args.d, "m": args.m, "ef": args.ef,
                  "expand": args.e, "b": args.b},
        "child_rc": rc,
        "verdict": verdict,
    }))


if __name__ == "__main__":
    main()
