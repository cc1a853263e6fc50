#!/bin/sh
# Build the native runtime components (ctypes shared libraries).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o libbvh_builder.so bvh_builder.cpp
echo "built libbvh_builder.so"
