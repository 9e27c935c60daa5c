#!/bin/bash
# Round-5 queue, session d — post-r5c stragglers:
#   1. EXTRACT_TAX: per-dispatch times of the EXACT fused-SIFT program the
#      recon pipeline runs (batch 4, uint8).  The r5 recorded RECON spent
#      636 s in extraction (13 dispatches ~49 s each) while the headline
#      bench minutes later was epoch-healthy at 38 pairs/s — this probe
#      says whether steady-state SIFT dispatches are ~1 s (r3:
#      EXTRACT_TAX_r3) or every dispatch now pays an upload-scale tax.
#   2. RECON_NOPREWARM: the same DTU-50 SIFT recon with the background
#      verification-program prewarm DISABLED — A/B for "relay serializes
#      executable uploads with extraction dispatches".
#   3. EXTRACT_SWEEP: the VERDICT item-7 done-bar artifact (device extract
#      >16 img/s at the round-5 defaults).
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

run_stage EXTRACT_TAX "$PY" scripts/record_bench.py --name EXTRACT_TAX --round "$ROUND" -- \
  "$PY" scripts/probe_first_dispatch_tax.py --batch 4 --uint8 --reps 6

run_stage RECON_NOPREWARM "$PY" scripts/record_bench.py --name RECON_NOPREWARM --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --no-prewarm \
    --work-dir /tmp/bench_recon_r5

run_stage EXTRACT_SWEEP "$PY" scripts/record_bench.py --name EXTRACT_SWEEP --round "$ROUND" -- \
  "$PY" scripts/sweep_extraction.py --batches 2,4

echo "=== [$(date +%H:%M:%S)] queue r5d complete ===" | tee -a "$LOG"
