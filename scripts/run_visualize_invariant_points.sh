#!/usr/bin/env bash
# Example invocations for scripts/visualize_invariant_points.py (parity with
# the reference's scripts/run_visualize_invariant_points.sh): shows how the
# training sampler selects invariant points by warped cosine similarity.
set -euo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
DATA=${DATA:-$ROOT/results/quality/hpatches}

python "$ROOT/scripts/visualize_invariant_points.py" \
    --data-root "$DATA" \
    --sequence v_synth0 \
    --pair-idx 0 \
    --top-k-invariant 1024 \
    --min-similarity 0.9 \
    --no-labels \
    --dpi 300 \
    "$@"

### With per-point similarity labels (slower to render):
# python "$ROOT/scripts/visualize_invariant_points.py" \
#     --data-root "$DATA" --sequence i_synth0 --pair-idx 0 \
#     --max-points 100 --top-k-invariant 1024 --font-size 6 --dpi 300
