#!/bin/bash
# Round-5 queue, session c — the session-b resume queue died after
# BENCH_UNFUSED (85c45e4) when the VM restarted; /tmp (and the recon
# render cache) was wiped.  This picks up at BAKEOFF_FINETUNE but
# REORDERS for value-first under a ~2 h wall clock:
#   1. RECON (SIFT, shipped defaults) — needs no checkpoint; replaces the
#      untrusted 2398.7 s r4 artifact with an epoch-tagged run (item 2).
#   2. BENCH_HEADLINE2 — first headline at the round-5 defaults
#      (tanh-GELU + fused attention landed after the last headline).
#   3. BAKEOFF_FINETUNE — scaled 96x48 backbone fine-tune on the big
#      held-out training tree (items 5+6).
#   4. DIAG_SCENE / BISECT / RECON_VIT / RECON_TRAINABLE — checkpoint-
#      dependent stages (items 3+4+6).
#   5. PROFILE_BACKBONE — re-record the ablation profile at the tanh
#      default (item 7's <110 ms/stack bar).
# Stage semantics identical to run_measurement_queue_r5.sh.
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

WORK=/tmp/bench_recon_r5

# ---- same-epoch DTU-50 SIFT run with relay-epoch tags (item 2).
# Warm pass first: the first dispatch pays ~60 s of compile/upload tax.
echo "=== [$(date +%H:%M:%S)] warmup recon (unrecorded) ===" | tee -a "$LOG"
"$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK" \
  >> "$LOG" 2>&1
echo "=== warmup exit=$? ===" | tee -a "$LOG"
run_stage RECON "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK"

run_stage BENCH_HEADLINE2 "$PY" scripts/record_bench.py --name BENCH_HEADLINE2 --round "$ROUND" -- \
  "$PY" bench.py

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

if [ -d "$CKPT" ]; then
  # ---- geometry bisect at DTU-50 (item 3); shares the trio's render cache
  run_stage BISECT "$PY" scripts/record_bench.py --name BISECT --round "$ROUND" -- \
    "$PY" scripts/bisect_geometry.py --images 50 --weights "$CKPT" \
      --work-dir "$WORK" --variants asis,offsets0,quad,siftloc

  run_stage RECON_VIT "$PY" scripts/record_bench.py --name RECON_VIT --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor vit \
      --weights "$CKPT" --work-dir "$WORK"

  run_stage RECON_TRAINABLE "$PY" scripts/record_bench.py --name RECON_TRAINABLE --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor trainable_vit \
      --weights "$CKPT" --work-dir "$WORK"
fi

# Re-record the backbone ablation profile with the round-5 defaults
# (tanh-GELU + fused attention); includes the mlp_erf control so the
# activation premium stays measured.  Overwrites PROFILE_BACKBONE_r5.json —
# the erf-default artifact is preserved in git history (7fb4b63).
run_stage PROFILE_BACKBONE "$PY" scripts/record_bench.py --name PROFILE_BACKBONE --round "$ROUND" -- \
  "$PY" scripts/profile_backbone.py

echo "=== [$(date +%H:%M:%S)] queue r5c complete ===" | tee -a "$LOG"
