#!/bin/bash
# Round-5 queue RESUME — the original run_measurement_queue_r5.sh completed
# PROFILE_BACKBONE and BENCH_HEADLINE, then died with the session at the
# BENCH_UNFUSED stage.  This picks up exactly there; stage semantics are
# identical to the original queue (see that file's header for the VERDICT
# item mapping).
#
# Usage: bash scripts/run_measurement_queue_r5_resume.sh [round]
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

run_stage BENCH_UNFUSED "$PY" scripts/record_bench.py --name BENCH_UNFUSED --round "$ROUND" -- \
  "$PY" bench.py --attn-impl fixedmax

# ---- scaled fine-tune + bake-off rows (held-out columns, big train tree)
run_stage BAKEOFF_FINETUNE "$PY" scripts/quality_bakeoff.py \
  --extractors sift,vit,trainable_vit --train --train-backbone \
  --train-tree big --epochs 96 --steps-per-epoch 48

CKPT="$ROOT/results/quality/checkpoints_bb/best_model"
[ -d "$CKPT" ] || CKPT="$ROOT/results/quality/checkpoints_bb/latest"

# ---- scene-protocol registration diagnosis (item 4)
if [ -f "$ROOT/results/quality/scene/out_vit_finetuned/db.db" ]; then
  run_stage DIAG_SCENE "$PY" scripts/record_bench.py --name DIAG_SCENE --round "$ROUND" -- \
    "$PY" scripts/diag_scene.py --db results/quality/scene/out_vit_finetuned/db.db
fi

WORK=/tmp/bench_recon_r5

if [ -d "$CKPT" ]; then
  # ---- geometry bisect at DTU-50 (item 3); shares the trio's render cache
  run_stage BISECT "$PY" scripts/record_bench.py --name BISECT --round "$ROUND" -- \
    "$PY" scripts/bisect_geometry.py --images 50 --weights "$CKPT" \
      --work-dir "$WORK" --variants asis,offsets0,quad,siftloc
fi

# ---- same-epoch DTU-50 trio with relay-epoch tags (item 2).
# Warm pass first: the first dispatch pays ~60 s of compile/upload tax.
echo "=== [$(date +%H:%M:%S)] warmup recon (unrecorded) ===" | tee -a "$LOG"
"$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK" \
  >> "$LOG" 2>&1
echo "=== warmup exit=$? ===" | tee -a "$LOG"
run_stage RECON "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK"

if [ -d "$CKPT" ]; then
  run_stage RECON_VIT "$PY" scripts/record_bench.py --name RECON_VIT --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor vit \
      --weights "$CKPT" --work-dir "$WORK"

  run_stage RECON_TRAINABLE "$PY" scripts/record_bench.py --name RECON_TRAINABLE --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor trainable_vit \
      --weights "$CKPT" --work-dir "$WORK"
fi

run_stage BENCH_HEADLINE2 "$PY" scripts/record_bench.py --name BENCH_HEADLINE2 --round "$ROUND" -- \
  "$PY" bench.py

# Re-record the backbone ablation profile with the round-5 defaults
# (tanh-GELU + fused attention); includes the new mlp_erf control so the
# activation premium stays measured.  Overwrites PROFILE_BACKBONE_r5.json —
# the erf-default artifact is preserved in git history (7fb4b63).
run_stage PROFILE_BACKBONE "$PY" scripts/record_bench.py --name PROFILE_BACKBONE --round "$ROUND" -- \
  "$PY" scripts/profile_backbone.py

echo "=== [$(date +%H:%M:%S)] queue r5 complete ===" | tee -a "$LOG"
