#!/bin/bash
# Build the native runtime shared library (ctypes-loaded; no pybind11 in
# this image). Output: flatnav_tpu/native/libflatnav_native.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -std=c++17 -O3 -march=native -fPIC -shared \
    flatnav_native.cpp -o libflatnav_native.so
echo "built $(pwd)/libflatnav_native.so"
