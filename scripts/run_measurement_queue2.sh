#!/bin/bash
# Round-3b serial TPU measurement queue: re-measurements after the r3
# mapper/extraction fixes (CPU-scope glue geometry, fused SIFT program)
# and the structure-prior training change.
#
# Same discipline as run_measurement_queue.sh: ONE TPU process at a time,
# no external timeouts, continue past stage failures.
#
# Usage: bash scripts/run_measurement_queue2.sh [round]
set -u
ROUND="${1:-3}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue2_r${ROUND}.log
cd "$ROOT"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

run_stage() {
  local name="$1"; shift
  echo "=== [$(date +%H:%M:%S)] stage: $name ===" | tee -a "$LOG"
  "$@" >> "$LOG" 2>&1
  local rc=$?
  echo "=== [$(date +%H:%M:%S)] stage $name exit=$rc ===" | tee -a "$LOG"
}

# 0. Loop-overhead probe: quantify per-iteration fori/while_loop cost vs
#    pipelined dispatches (EXTRACT_SWEEP_r3 pathology; informs BA design).
run_stage LOOP_PROBE "$PY" scripts/record_bench.py --name LOOP_PROBE --round "$ROUND" -- \
  "$PY" scripts/probe_loop_overhead.py

# 1. RECON cold pass: compiles + disk-caches the new fused-SIFT program and
#    the mapper programs (not recorded — cache priming only).
run_stage RECON_PRIME "$PY" scripts/bench_reconstruction.py \
  --images 50 --work-dir /tmp/bench_recon_r3b_prime

# 2. RECON warm pass: the recorded number (replaces results/RECON_r3.json).
run_stage RECON_WARM "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir /tmp/bench_recon_r3b_warm

# 3. Retrain the trainable heads WITH the structure prior (commit b580f80)
#    and re-measure the trained bake-off rows.  Checkpoints cleared so
#    train_heads does not resume the pre-prior run.
rm -rf results/quality/checkpoints
run_stage BAKEOFF_RETRAIN "$PY" scripts/quality_bakeoff.py \
  --work-dir results/quality --extractors "" --train

# 3b. SIFT fidelity re-measure: the f32-precision fix (bf16 DoG noise on
#     TPU degraded the 768x1024 case to MMA 0.65 vs 0.92 on CPU).
run_stage SIFT_FIDELITY "$PY" scripts/record_bench.py --name SIFT_FIDELITY --round "$ROUND" -- \
  "$PY" scripts/sift_fidelity_table.py

# 4. Headline bench with the c4 wire format (also run by the driver at
#    round end; this run warms its cache and records our own copy).
run_stage BENCH_HEADLINE "$PY" scripts/record_bench.py --name BENCH_HEADLINE --round "$ROUND" -- \
  "$PY" bench.py

echo "=== [$(date +%H:%M:%S)] queue2 complete ===" | tee -a "$LOG"
