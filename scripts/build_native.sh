#!/usr/bin/env bash
# Build the native host-preprocessing library → vqa_tpu/native/libvqa_preprocess.so
# Used by vqa_tpu/native/__init__.py (which also auto-builds on first import
# when the .so is missing and a compiler is available).
set -euo pipefail
cd "$(dirname "$0")/.."
g++ -O3 -std=c++17 -shared -fPIC -pthread \
    -o vqa_tpu/native/libvqa_preprocess.so vqa_tpu/native/vqa_preprocess.cc
echo "built vqa_tpu/native/libvqa_preprocess.so"
