#!/bin/bash
# Build the native host-side IO library (optional; the Python pipeline falls
# back to a pure-Python parser when the .so is absent).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC \
    plankton_io.cpp -o libplankton_io.so -ljpeg
echo "built $(pwd)/libplankton_io.so"
