#!/usr/bin/env bash
# HPatches run with the trained keypoint/descriptor heads.
set -euo pipefail
EXTRA=()
if [ -n "${VIT_WEIGHTS:-}" ]; then EXTRA+=(--vit-weights "$VIT_WEIGHTS"); fi
EXTRACTOR=trainable_vit exec "$(dirname "$0")/run_HPatches_sift.sh" "$1" "${2:-}" "${EXTRA[@]}"
