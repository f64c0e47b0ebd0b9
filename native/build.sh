#!/bin/sh
# Build the native host-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -ffast-math -shared -fPIC -o libwavio.so wavio.cpp
echo "built $(pwd)/libwavio.so"
