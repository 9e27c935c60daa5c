#!/bin/bash
# Round-3g queue — after the RANSAC lockstep fixes (commit 3e02eca).
#   * Materialized-sync verification + 5pt profilers (block_until_ready
#     phantom-returns on the relay around in-flight compiles; np.asarray
#     is the only trustworthy barrier).
#   * Headline bench with the materialized device-extraction metric.
#   * RECON re-measure: does the DTU-50 verify stage drop from ~315 s
#     with empty-lane exits + H cap + difficulty-sorted batches?
#
# Usage: bash scripts/run_measurement_queue7.sh [round]
set -u
ROUND="${1:-3}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue7_r${ROUND}.log
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
      git commit -q -m "Record ${name} benchmark artifact (queue7)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

DB=/tmp/bench_recon_r3f/db.db
[ -f "$DB" ] || DB=/tmp/bench_recon_r3d_warm/db.db
if [ -f "$DB" ]; then
  run_stage VERIF_PROFILE "$PY" scripts/record_bench.py --name VERIF_PROFILE --round "$ROUND" -- \
    "$PY" scripts/profile_verification.py --db "$DB" --batches 4
fi

run_stage FIVE_POINT_PROFILE "$PY" scripts/record_bench.py --name FIVE_POINT_PROFILE --round "$ROUND" -- \
  "$PY" scripts/profile_five_point.py

run_stage BENCH_HEADLINE "$PY" scripts/record_bench.py --name BENCH_HEADLINE --round "$ROUND" -- \
  "$PY" bench.py

run_stage RECON "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir /tmp/bench_recon_r3g

echo "=== [$(date +%H:%M:%S)] queue7 complete ===" | tee -a "$LOG"
