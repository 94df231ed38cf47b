#!/bin/sh
# Build the native IO library. Idempotent; called lazily from
# reduced_3dgs_tpu/models/native_io.py when the .so is missing.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libreduced3dgs_io.so io.cpp
echo "built $(pwd)/libreduced3dgs_io.so"
