#!/bin/sh
# Build libtpuasr_native.so into native/build (cmake+ninja if present, else g++).
set -e
cd "$(dirname "$0")"
mkdir -p build
if command -v cmake >/dev/null 2>&1; then
  cmake -S . -B build -DCMAKE_BUILD_TYPE=Release >/dev/null
  cmake --build build --config Release -j >/dev/null
else
  g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
      tpuasr_native.cc -o build/libtpuasr_native.so
fi
echo "built: $(ls build/*tpuasr_native*)"
