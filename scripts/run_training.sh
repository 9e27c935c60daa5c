#!/usr/bin/env bash
# Canonical training launch (reference scripts/run_training.sh hyperparams:
# all_pairs + synthetic aug 0.5 + alpha_orient 0.32; batch size raised from
# the reference's 1 — DP over the device mesh makes small batches wasteful).
set -euo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
DATA=${1:?usage: run_training.sh <hpatches-root> [extra flags...]}

PYTHONPATH="$ROOT" python -m vit_colmap_tpu.training.train \
  --data-dir "$DATA" \
  --pair-mode all_pairs \
  --synthetic-ratio 0.5 \
  --alpha-orient 0.32 \
  --batch-size 4 \
  --epochs 20 \
  --output-dir "$ROOT/checkpoints" \
  "${@:2}"
