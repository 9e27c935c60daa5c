#!/bin/bash
# Round-5 queue, session d — post-r5c stragglers: the EXTRACT_SWEEP done-bar
# artifact for VERDICT r4 item 7 (device extract >16 img/s at the round-5
# defaults: tanh-GELU + branchless fixedmax_fused attention).
# Run ONLY after run_measurement_queue_r5c.sh drains (one TPU process).
set -u
ROUND="${1:-5}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue_r5.log
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
      git commit -q -m "Record ${name} benchmark artifact (queue r5)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

run_stage EXTRACT_SWEEP "$PY" scripts/record_bench.py --name EXTRACT_SWEEP --round "$ROUND" -- \
  "$PY" scripts/sweep_extraction.py --batches 2,4

echo "=== [$(date +%H:%M:%S)] queue r5d complete ===" | tee -a "$LOG"
