#!/usr/bin/env bash
# DTU reconstruction with the trained keypoint/descriptor heads.
# Pass VIT_WEIGHTS=<orbax ckpt dir> to load a trained checkpoint.
set -euo pipefail
EXTRA=()
if [ -n "${VIT_WEIGHTS:-}" ]; then EXTRA+=(--vit-weights "$VIT_WEIGHTS"); fi
EXTRACTOR=trainable_vit exec "$(dirname "$0")/run_DTU_sift.sh" "$1" "${2:-}" "${EXTRA[@]}"
