#!/bin/bash
# Round-3 queue 18 — serving mode on the real chip.
#   * EXTRACT_TAX: record the per-program first-dispatch tax probe
#     (the number serve.py's design rests on; measured ~66 s in-session
#     but never persisted as an artifact).
#   * SERVE_DTU50: two full DTU-50 reconstructions through ONE
#     PipelineServer.  Scene 1 = cold (every first-dispatch tax +
#     compile); scene 2 = true warm serving cost.  The warm number also
#     bounds how much of the mapper's ~136 s is per-bucket dispatch tax
#     vs steady-state compute.
#
# Usage: bash scripts/run_measurement_queue18.sh [round]
set -u
ROUND="${1:-3}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue18_r${ROUND}.log
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
      git commit -q -m "Record ${name} benchmark artifact (queue18)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

run_stage EXTRACT_TAX "$PY" scripts/record_bench.py --name EXTRACT_TAX --round "$ROUND" -- \
  "$PY" scripts/probe_first_dispatch_tax.py

run_stage SERVE_DTU50 "$PY" scripts/record_bench.py --name SERVE_DTU50 --round "$ROUND" -- \
  "$PY" scripts/bench_serve.py --scenes 2 --images 50 --work-dir /tmp/bench_serve_r3

echo "=== [$(date +%H:%M:%S)] queue18 complete ===" | tee -a "$LOG"
