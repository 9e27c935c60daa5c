#!/usr/bin/env python
"""Backfill GT pose errors into an existing QUALITY.json from persisted
sparse models.

The bake-off scene cached in ``results/quality/scene`` was rendered before
``render_multiview_scene`` started persisting ``gt_poses.json``, so the
reconstruction-protocol rows were measured without the pose oracle
(``pose_vs_gt`` absent, QUALITY.md shows "—").  The oracle is deterministic
(seed-pinned renderer), so it can be restored after the fact and the pose
errors recomputed offline from the COLMAP text models each row already
wrote — no pipeline re-runs.

Row -> output-dir mapping: ``run_reconstruction`` writes
``out_{extractor}`` or ``out_{extractor}_trained``; the trained dir is
shared between the heads-only and the fine-tuned row (later run wins), so
a candidate dir is only accepted when its model's registered-image and
3D-point counts match the row's recorded metrics.

Usage: python scripts/backfill_pose_oracle.py [--work-dir results/quality]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--work-dir", type=Path, default=Path("results/quality"))
    args = ap.parse_args()

    from scripts.quality_bakeoff import to_markdown
    from vit_colmap_tpu.sfm.align import (
        gt_poses_for_rendered_scene,
        pose_errors_vs_gt,
    )
    from vit_colmap_tpu.sfm.reconstruction import read_text

    work = args.work_dir
    scene = work / "scene"
    gt = gt_poses_for_rendered_scene(scene / "images")
    if gt is None:
        sys.exit(f"no gt_poses.json under {scene / 'images'} — render first")

    qpath = work / "QUALITY.json"
    results = json.loads(qpath.read_text())

    # Candidate dirs per row: exact-name first, then the shared _trained dir.
    row_dirs = {
        "sift": ["out_sift"],
        "vit": ["out_vit"],
        "trainable_vit": ["out_trainable_vit"],
        "dummy": ["out_dummy"],
        "hybrid": ["out_hybrid"],
        "trainable_vit_trained": ["out_trainable_vit_trained"],
        "trainable_vit_finetuned": ["out_trainable_vit_trained"],
        "vit_finetuned": ["out_vit_trained"],
    }

    for row, rec_stats in results.get("reconstruction", {}).items():
        if not isinstance(rec_stats, dict):
            continue
        recon = rec_stats.get("reconstruction") or {}
        want_reg = recon.get("registered_images", 0)
        want_pts = recon.get("total_3d_points", 0)
        if want_reg < 3:
            print(f"[{row}] {want_reg} registered — alignment undefined, skip")
            continue
        # registered_images / total_3d_points in the row are summed across
        # all models of the run (utils/metrics.py), so match on the sums and
        # align the largest model (mirrors best_pose_errors).
        model = None
        for cand in row_dirs.get(row, []):
            sparse = scene / cand / "sparse"
            models = [
                read_text(m) for m in sorted(sparse.glob("[0-9]*"))
                if (m / "images.txt").exists()
            ]
            if not models:
                continue
            got_reg = sum(len(r.images) for r in models)
            got_pts = sum(len(r.points3D) for r in models)
            if got_reg == want_reg and got_pts == want_pts:
                model = max(models, key=lambda r: len(r.images))
                break
            print(f"[{row}] {cand}: {got_reg} imgs/"
                  f"{got_pts} pts != recorded {want_reg}/{want_pts}"
                  " — overwritten by a later run, skip")
        if model is None:
            continue
        pose = pose_errors_vs_gt(model, gt)
        if not pose:
            print(f"[{row}] alignment failed")
            continue
        pose.pop("per_image", None)
        rec_stats["pose_vs_gt"] = pose
        print(f"[{row}] rot_err={pose['pose_rot_err_deg_mean']:.3f}deg "
              f"ctr_err={100 * pose['pose_center_err_rel_mean']:.2f}%")

    qpath.write_text(json.dumps(results, indent=2))
    (work / "QUALITY.md").write_text(to_markdown(results))
    print(f"updated {qpath} and QUALITY.md")


if __name__ == "__main__":
    main()
