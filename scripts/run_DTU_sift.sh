#!/usr/bin/env bash
# DTU reconstruction with the (JAX) SIFT extractor.
# Mirrors the reference driver (scripts/run_DTU_sift.sh): selects the diffuse
# lighting images (*_3_r5000.png, fallback frame_*.png), symlinks them into
# data/intermediate/<dataset>/<scene>/images, clears the stale DB, and runs
# the pipeline with PINHOLE cameras + metric export.
set -euo pipefail

SCAN=${1:?usage: run_DTU_sift.sh <scan-dir> [scene-name]}
SCENE=${2:-$(basename "$SCAN")}
ROOT=$(cd "$(dirname "$0")/.." && pwd)
EXTRACTOR=${EXTRACTOR:-colmap_sift}
DATASET=DTU

WORK="$ROOT/data/intermediate/$DATASET/$SCENE"
IMAGES="$WORK/images"
DB="$WORK/database.db"
OUT="$ROOT/data/outputs/$DATASET/$SCENE/$EXTRACTOR"
RESULTS="$ROOT/data/results"

mkdir -p "$IMAGES" "$OUT"
rm -f "$DB"
find "$IMAGES" -maxdepth 1 -type l -delete

shopt -s nullglob
files=("$SCAN"/*_3_r5000.png)
if [ ${#files[@]} -eq 0 ]; then files=("$SCAN"/frame_*.png); fi
if [ ${#files[@]} -eq 0 ]; then files=("$SCAN"/*.png "$SCAN"/*.jpg); fi
if [ ${#files[@]} -eq 0 ]; then echo "no images in $SCAN"; exit 1; fi
for f in "${files[@]}"; do ln -sf "$(readlink -f "$f")" "$IMAGES/"; done
echo "Linked ${#files[@]} images for $DATASET/$SCENE"

PYTHONPATH="$ROOT" python -m vit_colmap_tpu.pipeline \
  --images "$IMAGES" \
  --output "$OUT" \
  --db "$DB" \
  --extractor "$EXTRACTOR" \
  --camera-model PINHOLE \
  --dataset "$DATASET" \
  --scene "$SCENE" \
  --export-metrics "$RESULTS" \
  "${@:3}"
