#!/bin/bash
# Build the reference-engine baseline binary (bench_ref). Run it with
# data/query/gt files produced by bench.py --dump-baseline-files, e.g.:
#   ./bench_ref /tmp/bench_data.f32 /tmp/bench_q.f32 /tmp/bench_gt.i32 \
#       100000 2000 128 0.95 32 100 10 > ../../baseline_ref.json
set -euo pipefail
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
g++ -std=c++17 -O3 -march=native -ffast-math -funroll-loops \
    -I "$REF/include" -I ./stub \
    bench_ref.cpp -o bench_ref -lpthread
echo "built bench_ref" >&2
