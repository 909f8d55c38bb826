#!/bin/sh
# Build the native COLMAP IO helper as a shared library (loaded via ctypes).
set -e
cd "$(dirname "$0")"
g++ -O3 -fPIC -shared -std=c++17 -o libcolmap_io.so colmap_io.cpp
echo "built $(pwd)/libcolmap_io.so"
