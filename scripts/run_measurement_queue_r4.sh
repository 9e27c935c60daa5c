#!/bin/bash
# Round-4 queue — the VERDICT r3 work items, in value order:
#   1. BAKEOFF_FINETUNE: fine-tune the backbone (--train-backbone, with the
#      new dense raw-token loss) and evaluate BOTH the trainable head and
#      the FROZEN ViTExtractor on it (vit_finetuned rows — the flagship
#      loop closure, VERDICT item 1+3).
#   2. RECON_VIT: DTU-50 reconstruction with the frozen fine-tuned ViT
#      (RECON_VIT_r4.json; done = registered_images > 0).
#   3. RECON_TRAINABLE: DTU-50 with the score-ranked 4096 budget
#      (VERDICT item 5; done = <= 2x SIFT wall, <= 0.6 px).
#   4. RECON: clean shipped-defaults SIFT run (VERDICT item 6).
#   5. BENCH_HEADLINE: bench.py with variance fields (VERDICT item 7).
#
# Usage: bash scripts/run_measurement_queue_r4.sh [round]
set -u
ROUND="${1:-4}"
PY=/opt/venv/bin/python
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
LOG=/tmp/measurement_queue_r${ROUND}.log
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
      git commit -q -m "Record ${name} benchmark artifact (queue r4)" \
        -m "No-Verification-Needed: benchmark artifact only, no source change" \
        2>/dev/null && break
    sleep 3
  done
  git log --oneline -1 | tee -a "$LOG"
}

# ---- 1. fine-tune + bake-off rows (writes results/quality/QUALITY.{json,md})
run_stage BAKEOFF_FINETUNE "$PY" scripts/quality_bakeoff.py \
  --extractors "" --train --train-backbone --epochs 64 --steps-per-epoch 40

CKPT="$ROOT/results/quality/checkpoints_bb/best_model"
[ -d "$CKPT" ] || CKPT="$ROOT/results/quality/checkpoints_bb/latest"

WORK=/tmp/bench_recon_r4

# ---- 2. flagship: frozen fine-tuned ViT at DTU-50
if [ -d "$CKPT" ]; then
  run_stage RECON_VIT "$PY" scripts/record_bench.py --name RECON_VIT --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor vit \
      --weights "$CKPT" --work-dir "$WORK"

  # ---- 3. trainable ViT with the 4096 score-ranked budget
  run_stage RECON_TRAINABLE "$PY" scripts/record_bench.py --name RECON_TRAINABLE --round "$ROUND" -- \
    "$PY" scripts/bench_reconstruction.py --images 50 --extractor trainable_vit \
      --weights "$CKPT" --work-dir "$WORK"
else
  echo "!!! no fine-tune checkpoint at $CKPT; skipping RECON_VIT/TRAINABLE" | tee -a "$LOG"
fi

# ---- 4. shipped defaults, clean end-to-end number (warm pass first:
# the first dispatch pays ~60 s of compile/upload tax — EXTRACT_TAX_r3).
echo "=== [$(date +%H:%M:%S)] warmup recon (unrecorded) ===" | tee -a "$LOG"
"$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK-sift" \
  >> "$LOG" 2>&1
echo "=== warmup exit=$? ===" | tee -a "$LOG"
run_stage RECON "$PY" scripts/record_bench.py --name RECON --round "$ROUND" -- \
  "$PY" scripts/bench_reconstruction.py --images 50 --work-dir "$WORK-sift"

# ---- 5. headline with variance fields
run_stage BENCH_HEADLINE "$PY" scripts/record_bench.py --name BENCH_HEADLINE --round "$ROUND" -- \
  "$PY" bench.py

echo "=== [$(date +%H:%M:%S)] queue r4 complete ===" | tee -a "$LOG"
