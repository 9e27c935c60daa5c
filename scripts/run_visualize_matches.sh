#!/usr/bin/env bash
# Example invocations for scripts/visualize_matches.py (parity with the
# reference's scripts/run_visualize_matches.sh: a cookbook wrapper, not a
# batch driver).  Point DB at any database produced by the pipeline, e.g.
# results of scripts/run_HPatches_sift.sh or quality_bakeoff.py.
set -euo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
DB=${DB:-$ROOT/results/quality/scene/out_sift/db.db}
IMAGES=${IMAGES:-$ROOT/results/quality/scene/images}

### Explore the database first: which images / pairs have matches?
# python "$ROOT/scripts/visualize_matches.py" --database "$DB" --list-images
# python "$ROOT/scripts/visualize_matches.py" --database "$DB" --list-matches

### One pair, inliers green / outliers red, with scores and orientations
python "$ROOT/scripts/visualize_matches.py" \
    --database "$DB" \
    --image-dir "$IMAGES" \
    --image1 1 \
    --image2 2 \
    --max-matches 100 \
    --dpi 300 \
    --show-all-keypoints \
    --show-scores \
    --show-orientation \
    --orientation-scale 15.0 \
    "$@"

### Every matched pair into match_viz/ (extension over the reference)
# python "$ROOT/scripts/visualize_matches.py" --database "$DB" \
#     --image-dir "$IMAGES" --all-pairs --output-dir match_viz
