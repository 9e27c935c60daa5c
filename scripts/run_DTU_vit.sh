#!/usr/bin/env bash
# DTU reconstruction with the frozen-DINOv2 ViT extractor.
set -euo pipefail
EXTRACTOR=vit exec "$(dirname "$0")/run_DTU_sift.sh" "$@"
