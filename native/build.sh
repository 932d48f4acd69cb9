#!/usr/bin/env bash
# Build the native host data plane: native/libdataplane.so
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC dataplane.cpp \
    -o libdataplane.so -lpng -ljpeg -lz -pthread
echo "built $(pwd)/libdataplane.so"
