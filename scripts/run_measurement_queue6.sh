#!/bin/bash
# Round-3f queue — follows queue5.
#   * RECON re-run with the verify phase instrumentation (names where the
#     ~315 s warm verification goes on the relay: dispatch vs readback vs
#     DB; the same program's compute is ~19 s by component profile).
#   * PROFILE_BACKBONE retry with params as jit arguments (queue4 run hit
#     the remote-compile service's HTTP 413 upload limit on embedded
#     constants) and the XLA-attention variant at B=1 (was OOM).
#   * RECON_TRAINABLE retry (queue4 run died to a transient axon segfault
#     3 s after start; the same configuration runs clean on CPU).
#
# Usage: bash scripts/run_measurement_queue6.sh [round]
set -u
ROUND="${1:-3}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue6_r${ROUND}.log
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
      git commit -q -m "Record ${name} benchmark artifact (queue6)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

# Wire-format A/B: headline dropped 30.95 (r2, yuv420) -> 27.9 (r3 quiet,
# yuv420c4) despite c4 moving 25% fewer H2D bytes.  Either today's relay
# is slower, or the in-program 4-bit chroma unpack costs more device time
# than the wire it saves.  Same bench, two formats, back to back.
run_stage BENCH_YUV420 "$PY" scripts/record_bench.py --name BENCH_YUV420 --round "$ROUND" -- \
  "$PY" bench.py --transfer-format yuv420

run_stage BENCH_YUV420C4 "$PY" scripts/record_bench.py --name BENCH_YUV420C4 --round "$ROUND" -- \
  "$PY" bench.py --transfer-format yuv420c4

run_stage RECON "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir /tmp/bench_recon_r3f

run_stage PROFILE_BACKBONE "$PY" scripts/record_bench.py --name PROFILE_BACKBONE --round "$ROUND" -- \
  "$PY" scripts/profile_backbone.py

run_stage RECON_TRAINABLE "$PY" scripts/record_bench.py --name RECON_TRAINABLE --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --extractor trainable_vit --work-dir /tmp/bench_recon_tv_r3f

echo "=== [$(date +%H:%M:%S)] queue6 complete ===" | tee -a "$LOG"
