#!/usr/bin/env bash
# Build the native runtime shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    bvh_builder.cpp -o libmrt_runtime.so
echo "built $(pwd)/libmrt_runtime.so"
