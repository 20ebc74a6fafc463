#!/bin/bash
# Build and run the reference-engine baseline; writes baseline_ref.json at
# the repo root for bench.py's vs_baseline field.
set -euo pipefail
cd "$(dirname "$0")"
REF=${REF:-/root/reference}
g++ -std=c++17 -O3 -march=native -ffast-math -funroll-loops \
    -I "$REF/include" -I ./stub \
    bench_ref.cpp -o bench_ref -lpthread
N=${1:-100000}
./bench_ref "$N" | tee ../../baseline_ref.json
