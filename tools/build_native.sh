#!/bin/bash
# Build the native host kernels (focoos_tpu/utils/native.py loads the .so).
set -e
cd "$(dirname "$0")/.."
mkdir -p focoos_tpu/_native
g++ -O3 -march=native -shared -fPIC native/focoos_native.cpp -o focoos_tpu/_native/libfocoos_native.so
echo "built focoos_tpu/_native/libfocoos_native.so"
