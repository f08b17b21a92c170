#!/bin/sh
# Build the native geometry kernels (ctypes shared library).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libmgb_native.so mgb_native.cpp
echo "built $(pwd)/libmgb_native.so"
