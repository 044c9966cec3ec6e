#!/bin/sh
# Build the native runtime into csrc/build/libropes3d.so.
set -e
cd "$(dirname "$0")"
mkdir -p build
cd build
cmake -G Ninja .. >/dev/null
ninja
echo "built: $(pwd)/libropes3d.so"
