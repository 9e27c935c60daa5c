#!/usr/bin/env bash
# Build the native DB writer. The image ships libsqlite3.so.0 without a dev
# package, so we link the soname directly (the API subset we declare is ABI
# stable).
set -euo pipefail
cd "$(dirname "$0")"
g++ -O2 -shared -fPIC -std=c++17 -o libvc_db_writer.so db_writer.cc \
    -l:libsqlite3.so.0 -L/lib/x86_64-linux-gnu
echo "Built $(pwd)/libvc_db_writer.so"
