#!/bin/sh
# Build the native IO runtime (no cmake needed: one TU + zlib).
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 slamio.cc -o libslamio.so -lz -lpthread
echo "built $(pwd)/libslamio.so"
