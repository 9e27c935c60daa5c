#!/usr/bin/env bash
# HPatches sequence run with the (JAX) SIFT extractor.
# Mirrors the reference driver (scripts/run_HPatches_sift.sh): SIMPLE_RADIAL
# cameras, no dense reconstruction guarantees (sequences are planar).
set -euo pipefail

SEQ=${1:?usage: run_HPatches_sift.sh <sequence-dir> [scene-name]}
SCENE=${2:-$(basename "$SEQ")}
ROOT=$(cd "$(dirname "$0")/.." && pwd)
EXTRACTOR=${EXTRACTOR:-colmap_sift}
DATASET=HPatches

WORK="$ROOT/data/intermediate/$DATASET/$SCENE"
IMAGES="$WORK/images"
DB="$WORK/database.db"
OUT="$ROOT/data/outputs/$DATASET/$SCENE/$EXTRACTOR"
RESULTS="$ROOT/data/results"

mkdir -p "$IMAGES" "$OUT"
rm -f "$DB"
find "$IMAGES" -maxdepth 1 -type l -delete

shopt -s nullglob
files=("$SEQ"/*.ppm "$SEQ"/*.png "$SEQ"/*.jpg)
if [ ${#files[@]} -eq 0 ]; then echo "no images in $SEQ"; exit 1; fi
for f in "${files[@]}"; do ln -sf "$(readlink -f "$f")" "$IMAGES/"; done
echo "Linked ${#files[@]} images for $DATASET/$SCENE"

PYTHONPATH="$ROOT" python -m vit_colmap_tpu.pipeline \
  --images "$IMAGES" \
  --output "$OUT" \
  --db "$DB" \
  --extractor "$EXTRACTOR" \
  --camera-model SIMPLE_RADIAL \
  --dataset "$DATASET" \
  --scene "$SCENE" \
  --export-metrics "$RESULTS" \
  "${@:3}"
