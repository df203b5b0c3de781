#!/usr/bin/env bash
# Build the native data loader shared library.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    avsi_loader.cc avsi_ctc.cc -o libavsi_loader.so
echo "built $(pwd)/libavsi_loader.so"
