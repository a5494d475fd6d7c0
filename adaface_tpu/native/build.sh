#!/bin/sh
# Build the native host image-pipeline library.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libimgops.so imgops.cpp
echo "built $(pwd)/libimgops.so"
