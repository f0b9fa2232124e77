#!/bin/sh
# Builds the native data-prep library. Output lands next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -pthread slicer.cpp -o libdairslicer.so
echo "built $(pwd)/libdairslicer.so"
