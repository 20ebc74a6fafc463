#!/usr/bin/env python
"""Stage-level attribution of the fused scan engine's time (VERDICT r03
weak 1: 'the remaining ~7-70x headroom is unattributed').

Times, at a given (N x d, B) shape, each suffix of the fused pipeline:

  phaseA     the Pallas matmul+bucket-min kernel alone (bmin/bids out)
  phaseAB    + approx_min_k shortlist over the [B, N/L] bucket minima
  norerank   fused_knn(exact_rerank=False): phaseAB + key argsort
  full       fused_knn(exact_rerank=True): + HBM row gather + f32 rescore
  gather     the rerank's row gather + rescore in isolation (random ids)
  matmul     bf16 MXU contraction with a jnp.min consumer (speed of light
             for any whole-table scan at this shape; cf.
             tools/profile_scan_bound.py)

Differences between consecutive rows attribute the cost. Also prints
achieved scan FLOP/s and MFU vs the v5e bf16 peak for each stage.

RUN ALONE (one chip, one host core).
"""

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flatnav_tpu.utils import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from flatnav_tpu.ops.distances import (  # noqa: E402
    MetricType,
    query_block_distances,
    squared_norms,
)
from flatnav_tpu.ops.fused_scan import (  # noqa: E402
    _QB,
    _TILE,
    _round_up,
    _scan_kernel,
    fused_knn,
)

PEAK_BF16_TFLOPS = float(os.environ.get("FLATNAV_PEAK_TFLOPS", "197"))


def build_phase_a(n, d, b, L, tile, qb, interpret):
    """The kernel invocation exactly as fused_knn configures it."""
    t = max(128 * L, min(tile, _round_up(n, 128 * L)))
    qb = min(qb, _round_up(b, 8))
    n_pad = _round_up(n, t)
    b_pad = _round_up(b, qb)
    d_pad = _round_up(d, 128)
    s = t // L
    nb = n_pad // L
    grid = (b_pad // qb, n_pad // t)
    kern = functools.partial(_scan_kernel, L=L)

    @jax.jit
    def phase_a(q_bf, ds_bf, pen):
        nlim = jnp.asarray([n], jnp.int32)
        return pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((qb, d_pad), lambda i, j: (i, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((t, d_pad), lambda i, j: (j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, t), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((qb, s), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((qb, s), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((b_pad, nb), jnp.float32),
                jax.ShapeDtypeStruct((b_pad, nb), jnp.int32),
            ],
            interpret=interpret,
        )(nlim, q_bf, ds_bf, pen)

    return phase_a, (n_pad, b_pad, d_pad, nb, grid, t)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--d", type=int, default=128)
    ap.add_argument("--b", type=int, default=4096)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--rerank", type=int, default=32)
    ap.add_argument("--l", type=int, default=16)
    ap.add_argument("--tile", type=int, default=_TILE)
    ap.add_argument("--qb", type=int, default=_QB)
    ap.add_argument("--reps", type=int, default=4)
    args = ap.parse_args()
    n, d, b = args.n, args.d, args.b
    interpret = jax.default_backend() == "cpu"

    rng = np.random.default_rng(0)
    vecs = jnp.asarray(rng.standard_normal((n, d), dtype=np.float32))
    q = jnp.asarray(rng.standard_normal((b, d), dtype=np.float32))

    phase_a, (n_pad, b_pad, d_pad, nb, grid, t) = build_phase_a(
        n, d, b, args.l, args.tile, args.qb, interpret)
    ds_bf = jnp.pad(vecs.astype(jnp.bfloat16),
                    ((0, n_pad - n), (0, d_pad - d)))
    q_bf = jnp.pad(q.astype(jnp.bfloat16),
                   ((0, b_pad - b), (0, d_pad - d)))
    pen = squared_norms(ds_bf.astype(jnp.float32))
    pen = jnp.where(jnp.arange(n_pad) < n, pen, jnp.inf)[None, :]

    flops = 2.0 * b * n * d
    print(f"device={jax.devices()[0]} N={n} d={d} B={b} L={args.l} "
          f"tile={t} qb={args.qb} grid={grid} scan={flops/1e12:.3f} TFLOP "
          f"(peak {PEAK_BF16_TFLOPS:.0f} TFLOP/s)", flush=True)

    def timed(label, fn):
        jax.block_until_ready(fn())  # compile + warm
        ts = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            jax.block_until_ready(fn())
            ts.append(time.perf_counter() - t0)
        dt = min(ts)
        tf = flops / dt / 1e12
        print(f"{label:>9}: {dt*1e3:8.2f} ms  {tf:6.1f} TFLOP/s  "
              f"mfu={tf/PEAK_BF16_TFLOPS:6.1%}  {b/dt:9.0f} qps",
              flush=True)
        return dt

    r = max(args.rerank, args.k)

    @jax.jit
    def phase_ab(q_bf, ds_bf, pen):
        bmin, bids = phase_a(q_bf, ds_bf, pen)
        bmin, bids = bmin[:b], bids[:b]
        ck, pos = jax.lax.approx_min_k(bmin, r)
        return ck, jnp.take_along_axis(bids, pos, axis=1)

    cand = rng.integers(0, n, (b, r)).astype(np.int32)
    cand = jnp.asarray(cand)

    @jax.jit
    def gather_rescore(vecs, q, cand):
        rows = jnp.take(vecs, cand, axis=0)
        ex = query_block_distances(q, rows, MetricType.L2)
        o = jnp.argsort(ex, axis=1, stable=True)[:, : args.k]
        return jnp.take_along_axis(ex, o, axis=1)

    @jax.jit
    def matmul_min(ds_bf, q_bf):
        def body(carry, j):
            rows = jax.lax.dynamic_slice_in_dim(ds_bf, j * t, t, 0)
            s_ = jax.lax.dot_general(
                q_bf, rows, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            return jnp.minimum(carry, jnp.min(s_, axis=1)), None
        init = jnp.full((b_pad,), jnp.inf, jnp.float32)
        out, _ = jax.lax.scan(body, init, jnp.arange(n_pad // t))
        return out

    nv = jnp.asarray(n, jnp.int32)
    timed("matmul", lambda: matmul_min(ds_bf, q_bf))
    timed("phaseA", lambda: phase_a(q_bf, ds_bf, pen))
    timed("phaseAB", lambda: phase_ab(q_bf, ds_bf, pen))
    timed("norerank", lambda: fused_knn(
        vecs, q, args.k, MetricType.L2, rerank=args.rerank,
        bucket_l=args.l, tile_size=args.tile, query_block=args.qb,
        n_valid=nv, exact_rerank=False))
    timed("full", lambda: fused_knn(
        vecs, q, args.k, MetricType.L2, rerank=args.rerank,
        bucket_l=args.l, tile_size=args.tile, query_block=args.qb,
        n_valid=nv))
    timed("gather", lambda: gather_rescore(vecs, q, cand))


if __name__ == "__main__":
    main()
