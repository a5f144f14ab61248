#!/bin/sh
# Build the native marshalling library into native/build/libqmarshal.so.
# Uses cmake+ninja when available, falls back to a direct g++ invocation.
set -e
cd "$(dirname "$0")"
mkdir -p build
if command -v cmake >/dev/null 2>&1 && command -v ninja >/dev/null 2>&1; then
  cmake -S . -B build -G Ninja >/dev/null
  cmake --build build >/dev/null
else
  g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    qmarshal.cc -o build/libqmarshal.so
fi
echo "built: $(ls build/libqmarshal.so)"
