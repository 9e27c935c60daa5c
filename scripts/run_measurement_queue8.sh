#!/bin/bash
# Round-3h queue — post-restart re-measure of the two unmeasured commits
# (8-point-first arbitration b7b8300, uint8 SIFT wire dc91974) plus the
# backbone-fine-tuned bake-off row.
#   1. RECON cold (unrecorded): render scene, pay compile/upload taxes.
#   2. RECON warm (recorded): the round-3 reconstruction number.
#   3. VERIF_PROFILE on the warm DB: does 8pt-first cut the ~72% 5pt share?
#   4. BENCH_HEADLINE: uint8 wire should lift the wire-bound headline.
#   5. Fine-tuned bake-off (trainable_vit_finetuned row, --train-backbone).
#
# Usage: bash scripts/run_measurement_queue8.sh [round]
set -u
ROUND="${1:-3}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue8_r${ROUND}.log
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
      git commit -q -m "Record ${name} benchmark artifact (queue8)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

WORK=/tmp/bench_recon_r3h

echo "=== [$(date +%H:%M:%S)] warmup recon (unrecorded) ===" | tee -a "$LOG"
"$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK" \
  >> "$LOG" 2>&1
echo "=== warmup exit=$? ===" | tee -a "$LOG"

run_stage RECON "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK"

if [ -f "$WORK/db.db" ]; then
  run_stage VERIF_PROFILE "$PY" scripts/record_bench.py --name VERIF_PROFILE --round "$ROUND" -- \
    "$PY" scripts/profile_verification.py --db "$WORK/db.db" --batches 4
fi

run_stage BENCH_HEADLINE "$PY" scripts/record_bench.py --name BENCH_HEADLINE --round "$ROUND" -- \
  "$PY" bench.py

run_stage BAKEOFF_FINETUNE "$PY" scripts/quality_bakeoff.py \
  --extractors "" --train --train-backbone --epochs 24

echo "=== [$(date +%H:%M:%S)] queue8 complete ===" | tee -a "$LOG"
