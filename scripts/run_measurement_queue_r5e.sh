#!/bin/bash
# Round-5 queue, session e — relaunch after the 00:07 relay wedge killed the
# r5c queue at the BAKEOFF_FINETUNE stage (the bakeoff hung in backend init
# for 35 min with zero progress; killing it + ~10 min freed the relay —
# consistent with a lease-handoff race when a stage starts the instant the
# previous process exits, hence the inter-stage settle sleeps here).
#
# Reordered to bank quick checkpoint-independent artifacts first:
#   1. PROFILE_BACKBONE — item-7 re-record at the tanh-GELU default.
#   2. EXTRACT_TAX — per-dispatch times of the exact recon SIFT program.
#   3. RECON_NOPREWARM — prewarm-off A/B vs RECON_r5's 636 s extraction.
#   4. BAKEOFF_FINETUNE (96x48, big held-out train tree) + dependents.
#   5. EXTRACT_SWEEP last.
set -u
ROUND="${1:-5}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue_r5.log
cd "$ROOT"
export PYTHONPATH="$ROOT:${PYTHONPATH:-}"

run_stage() {
  local name="$1"; shift
  sleep 30  # settle: avoid relay lease races between back-to-back clients
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

run_stage PROFILE_BACKBONE "$PY" scripts/record_bench.py --name PROFILE_BACKBONE --round "$ROUND" -- \
  "$PY" scripts/profile_backbone.py

run_stage EXTRACT_TAX "$PY" scripts/record_bench.py --name EXTRACT_TAX --round "$ROUND" -- \
  "$PY" scripts/probe_first_dispatch_tax.py --batch 4 --uint8 --reps 6

run_stage RECON_NOPREWARM "$PY" scripts/record_bench.py --name RECON_NOPREWARM --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --no-prewarm \
    --work-dir /tmp/bench_recon_r5

run_stage BAKEOFF_FINETUNE "$PY" scripts/quality_bakeoff.py \
  --extractors sift,vit,trainable_vit --train --train-backbone \
  --train-tree big --epochs 96 --steps-per-epoch 48

CKPT="$ROOT/results/quality/checkpoints_bb/best_model"
[ -d "$CKPT" ] || CKPT="$ROOT/results/quality/checkpoints_bb/latest"

if [ -f "$ROOT/results/quality/scene/out_vit_finetuned/db.db" ]; then
  run_stage DIAG_SCENE "$PY" scripts/record_bench.py --name DIAG_SCENE --round "$ROUND" -- \
    "$PY" scripts/diag_scene.py --db results/quality/scene/out_vit_finetuned/db.db
fi

if [ -d "$CKPT" ]; then
  run_stage BISECT "$PY" scripts/record_bench.py --name BISECT --round "$ROUND" -- \
    "$PY" scripts/bisect_geometry.py --images 50 --weights "$CKPT" \
      --work-dir /tmp/bench_recon_r5 --variants asis,offsets0,quad,siftloc

  run_stage RECON_VIT "$PY" scripts/record_bench.py --name RECON_VIT --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor vit \
      --weights "$CKPT" --work-dir /tmp/bench_recon_r5

  run_stage RECON_TRAINABLE "$PY" scripts/record_bench.py --name RECON_TRAINABLE --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor trainable_vit \
      --weights "$CKPT" --work-dir /tmp/bench_recon_r5
fi

run_stage EXTRACT_SWEEP "$PY" scripts/record_bench.py --name EXTRACT_SWEEP --round "$ROUND" -- \
  "$PY" scripts/sweep_extraction.py --batches 2,4

echo "=== [$(date +%H:%M:%S)] queue r5e complete ===" | tee -a "$LOG"
