#!/bin/sh
# Build the native host-side runtime library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 \
    -o libipcgen_native.so ipcgen_native.cc
echo "built: $(pwd)/libipcgen_native.so"
