#!/usr/bin/env bash
# Resume training from the latest checkpoint (reference scripts/resume_training.sh
# resumes from latest.pt).  'latest' is the only full-state (resume-capable)
# checkpoint; 'best_model' is params-only for inference loading.
set -euo pipefail
ROOT=$(cd "$(dirname "$0")/.." && pwd)
DATA=${1:?usage: resume_training.sh <hpatches-root> [extra flags...]}
CKPT=${CKPT:-$ROOT/checkpoints/latest}

exec "$(dirname "$0")/run_training.sh" "$DATA" --resume "$CKPT" "${@:2}"
