#!/usr/bin/env bash
# Build the native DB writer. The image ships libsqlite3.so.0 without a dev
# package, so we link the soname directly (the API subset we declare is ABI
# stable).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libvc_db_writer.so db_writer.cc \
    -l:libsqlite3.so.0 -L/lib/x86_64-linux-gnu
echo "Built $(pwd)/libvc_db_writer.so"

# Native image decoder (JPEG/PNG -> I420 planes at target size).  Same
# soname-direct linking: the image ships runtime libjpeg/libpng without the
# -dev packages; we declare the stable ABI subset in image_io.cc.
g++ -O3 -shared -fPIC -std=c++17 -o libvc_image_io.so image_io.cc \
    -l:libjpeg.so.62 -l:libpng16.so.16 -L/lib/x86_64-linux-gnu -pthread
echo "Built $(pwd)/libvc_image_io.so"
