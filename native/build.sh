#!/bin/sh
# Build the native CPU solver shared library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -fno-finite-math-only -shared -fPIC \
    -o libspock_cpu.so spock_cpu.cpp
echo "built $(pwd)/libspock_cpu.so"
