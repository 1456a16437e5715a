#!/bin/sh
# Build libvlgae_io.so next to this script. cmake+ninja if present,
# plain g++ otherwise.
set -e
cd "$(dirname "$0")"
if command -v cmake >/dev/null 2>&1 && command -v ninja >/dev/null 2>&1; then
  cmake -B build -G Ninja . >/dev/null
  cmake --build build >/dev/null
  cp build/libvlgae_io.so .
else
  g++ -O3 -fPIC -shared -std=c++17 -o libvlgae_io.so vlgae_io.cpp
fi
echo "built $(pwd)/libvlgae_io.so"
