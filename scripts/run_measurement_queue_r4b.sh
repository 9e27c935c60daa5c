#!/bin/bash
# Round-4 follow-up queue — the fused-attention A/B (run AFTER
# run_measurement_queue_r4.sh drains; one TPU process at a time):
#   1. PROFILE_BACKBONE: ablation profile incl. the new attn_fused variant
#      (packed-qkv head-pair kernel — does killing the head transposes
#      recover the ~46 ms/stack of glue?).
#   2. BENCH_FUSED: headline bench with --attn-impl fixedmax_fused.
#   3. BENCH_BASE: same-epoch control with the shipped fixedmax.
# If fused wins, flip the ViTExtractor/hybrid defaults and re-record
# BENCH_HEADLINE (done by hand, not this script — the flip is a code
# change that needs its own commit).
#
# Usage: bash scripts/run_measurement_queue_r4b.sh [round]
set -u
ROUND="${1:-4}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue_r${ROUND}b.log
cd "$ROOT"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

run_stage() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] stage: $name ===" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name exit=$rc ===" | tee -a "$LOG"
  for i in 1 2 3; do
    git add results/ 2>/dev/null && \
      git commit -q -m "Record ${name} benchmark artifact (queue r4b)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

run_stage PROFILE_BACKBONE "$PY" scripts/record_bench.py --name PROFILE_BACKBONE --round "$ROUND" -- \
  "$PY" scripts/profile_backbone.py

run_stage BENCH_FUSED "$PY" scripts/record_bench.py --name BENCH_FUSED --round "$ROUND" -- \
  "$PY" bench.py --attn-impl fixedmax_fused

run_stage BENCH_BASE "$PY" scripts/record_bench.py --name BENCH_BASE --round "$ROUND" -- \
  "$PY" bench.py --attn-impl fixedmax

echo "=== [$(date +%H:%M:%S)] queue r4b complete ===" | tee -a "$LOG"
