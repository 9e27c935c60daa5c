#!/bin/bash
# Round-3d serial TPU measurement queue — resumes queue3 from the stage
# it died at (container restart killed it right as SIFT_FIDELITY began;
# LOOP_PROBE / BENCH_MATCH / TRAINSTEP artifacts were banked+committed).
#
# Same discipline as queue3:
#   * ONE TPU process at a time, NO external timeouts (a killed client
#     with in-flight device work wedges the axon relay for 30-70 min).
#   * Continue past stage failures.
#   * COMMIT each artifact as it lands.
#
# Usage: bash scripts/run_measurement_queue4.sh [round]
set -u
ROUND="${1:-3}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue4_r${ROUND}.log
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
      git commit -q -m "Record ${name} benchmark artifact (queue4)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

run_stage SIFT_FIDELITY "$PY" scripts/record_bench.py --name SIFT_FIDELITY --round "$ROUND" -- \
  "$PY" scripts/sift_fidelity_table.py

run_stage BENCH_HEADLINE "$PY" scripts/record_bench.py --name BENCH_HEADLINE --round "$ROUND" -- \
  "$PY" bench.py

# --- DTU-50 reconstruction: cold prime then recorded warm pass --------
run_stage RECON_PRIME "$PY" scripts/bench_reconstruction.py \
  --images 50 --work-dir /tmp/bench_recon_r3d_prime

run_stage RECON_WARM "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir /tmp/bench_recon_r3d_warm

# --- retrain with the structure prior (commit b580f80) ----------------
rm -rf results/quality/checkpoints
run_stage BAKEOFF_RETRAIN "$PY" scripts/quality_bakeoff.py \
  --work-dir results/quality --extractors "" --train

# --- remaining sweeps/profiles ----------------------------------------
run_stage EXTRACT_SWEEP "$PY" scripts/record_bench.py --name EXTRACT_SWEEP --round "$ROUND" -- \
  "$PY" scripts/sweep_extraction.py

run_stage PROFILE_BACKBONE "$PY" scripts/record_bench.py --name PROFILE_BACKBONE --round "$ROUND" -- \
  "$PY" scripts/profile_backbone.py

run_stage RECON_VIT "$PY" scripts/record_bench.py --name RECON_VIT --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --extractor vit --work-dir /tmp/bench_recon_vit_r3d

run_stage RECON_TRAINABLE "$PY" scripts/record_bench.py --name RECON_TRAINABLE --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --extractor trainable_vit --work-dir /tmp/bench_recon_tv_r3d

echo "=== [$(date +%H:%M:%S)] queue4 complete ===" | tee -a "$LOG"
