#!/usr/bin/env bash
# Build libaerial3d_native.so into deep3d_aerial_tpu/_native/.
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build ../deep3d_aerial_tpu/_native
cmake -S . -B build -DCMAKE_BUILD_TYPE=Release >/dev/null
cmake --build build -j"$(nproc)"
echo "built: $(ls ../deep3d_aerial_tpu/_native/)"
