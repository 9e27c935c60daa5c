#!/bin/bash
# Serial TPU measurement queue (round-3 artifact generation).
#
# TPU benchmarking discipline (docs/PERFORMANCE.md, verify skill): exactly ONE
# TPU process at a time, NO external timeouts (a killed client with in-flight
# device work wedges the axon relay for 30-70 min), continue past stage
# failures so one bad stage doesn't starve the rest of the queue.
#
# Usage: bash scripts/run_measurement_queue.sh [round]
set -u
ROUND="${1:-3}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue_r${ROUND}.log
cd "$ROOT"
# PREPEND to PYTHONPATH: the session env carries the axon TPU plugin's
# site dir (/root/.axon_site) in PYTHONPATH; clobbering it unregisters the
# 'axon' backend and every stage dies with "Backend 'axon' is not in the
# list of known backends".
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

run_stage() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] stage: $name ===" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name exit=$rc ===" | tee -a "$LOG"
}

# 1. DTU-50 reconstruction (sift): measures the r3 mapper work (BA
#    convergence early-exit, batched merge, pipelined verification).
run_stage RECON "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir /tmp/bench_recon_r3

# 2. Quality bake-off: retrain with the fixed anti-collapse losses (old
#    checkpoints removed by the caller), add dummy+hybrid rows, re-measure
#    the trained rows.  Row-resumable: partial progress persists per row.
run_stage BAKEOFF "$PY" scripts/quality_bakeoff.py \
  --work-dir results/quality --extractors dummy,hybrid --train

# 3-5. Small throughput benches.
run_stage BENCH_MATCH "$PY" scripts/record_bench.py --name BENCH_MATCH --round "$ROUND" -- \
  "$PY" scripts/bench_matching.py --images 64 --keypoints 4096
run_stage TRAINSTEP "$PY" scripts/record_bench.py --name TRAINSTEP --round "$ROUND" -- \
  "$PY" scripts/bench_trainstep.py
run_stage EXTRACT_SWEEP "$PY" scripts/record_bench.py --name EXTRACT_SWEEP --round "$ROUND" -- \
  "$PY" scripts/sweep_extraction.py

# 6. SIFT fidelity table (multi-texture/size/scale, incl. DTU-like frame).
run_stage SIFT_FIDELITY "$PY" scripts/record_bench.py --name SIFT_FIDELITY --round "$ROUND" -- \
  "$PY" scripts/sift_fidelity_table.py

# 7-8. DTU-50-scale reconstruction for the ViT-family extractors (VERDICT r2
#      item 5: record them even if random-backbone rows register 0).
run_stage RECON_VIT "$PY" scripts/record_bench.py --name RECON_VIT --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --extractor vit --work-dir /tmp/bench_recon_vit_r3
run_stage RECON_TRAINABLE "$PY" scripts/record_bench.py --name RECON_TRAINABLE --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --extractor trainable_vit --work-dir /tmp/bench_recon_tv_r3

# 9. Backbone component-cost profile (locates the non-matmul glue).
run_stage PROFILE_BACKBONE "$PY" scripts/record_bench.py --name PROFILE_BACKBONE --round "$ROUND" -- \
  "$PY" scripts/profile_backbone.py

echo "=== [$(date +%H:%M:%S)] queue complete ===" | tee -a "$LOG"
