#!/bin/sh
# Build the native IO components into the package tree.
set -e
cd "$(dirname "$0")/.."
g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
    csrc/fasta_parser.cpp csrc/lf_walk.cpp csrc/ooc_binner.cpp \
    -o src/debwt_tpu/io/_native.so
echo "built src/debwt_tpu/io/_native.so"
