#!/usr/bin/env bash
# Resume training from the best checkpoint (reference scripts/resume_training.sh).
set -euo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
DATA=${1:?usage: resume_training.sh <hpatches-root> [extra flags...]}
CKPT=${CKPT:-$ROOT/checkpoints/best_model}

exec "$(dirname "$0")/run_training.sh" "$DATA" --resume "$CKPT" "${@:2}"
