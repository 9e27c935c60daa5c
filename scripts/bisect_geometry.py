#!/usr/bin/env python
"""Bisect trainable-ViT reconstruction geometry error (VERDICT r4 item 3).

RECON_TRAINABLE_r4: 5.86 deg mean rot err / 24.9% center err / 1.47 px
reproj at DTU-50 vs SIFT's 0.038 deg / 0.13% / 0.385 px.  Two orthogonal
error sources are possible: keypoint LOCALIZATION (quarter-res cells +
a trained offset head bounded at +-2 px, vs SIFT's ~0.1 px sub-pixel
refinement) and descriptor MATCHING (wrong/imprecise correspondences).
This driver runs controlled hybrids through the SAME match/verify/mapper
stages so the two are separated:

  asis          trainable keypoints + trainable descriptors (baseline)
  offsets0      trainable keypoints SNAPPED to cell centers (offset head
                zeroed) + trainable descriptors -> measures what the
                offset head adds/destroys
  quad          training-free quadratic peak refinement on the score map
                instead of the learned offset head
                (ops/detect.quadratic_refine)
  siftloc       SIFT keypoint locations + trainable-head descriptors
                bilinearly sampled at those locations -> localization
                error removed; residual error is the descriptors'
  sift          pure SIFT control (same scene, same mapper)

If siftloc reconstructs well, trainable's problem is localization; if it
stays bad, the descriptors are the problem.  Also dumps the spatial
dispersion of each variant's keypoints (a score head that stacks its
budget on one texture region starves the pose solver of leverage).

Usage:
  python scripts/bisect_geometry.py --images 50 --weights <ckpt> \
      [--work-dir /tmp/bisect_r5] [--variants asis,offsets0,siftloc,sift]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def spatial_stats(kpts: np.ndarray, w: int, h: int, grid: int = 8) -> dict:
    """Keypoint spatial dispersion: occupancy + entropy over a grid."""
    if len(kpts) == 0:
        return {"n": 0, "cells_occupied": 0, "entropy_norm": 0.0}
    gx = np.clip((kpts[:, 0] / w * grid).astype(int), 0, grid - 1)
    gy = np.clip((kpts[:, 1] / h * grid).astype(int), 0, grid - 1)
    counts = np.bincount(gy * grid + gx, minlength=grid * grid)
    p = counts / counts.sum()
    nz = p[p > 0]
    ent = float(-(nz * np.log(nz)).sum() / np.log(grid * grid))
    return {
        "n": int(len(kpts)),
        "cells_occupied": int((counts > 0).sum()),
        "cells_total": grid * grid,
        "entropy_norm": round(ent, 4),
    }


def build_db_trainable(scene_dir, db_path, cam_params, args, subpixel):
    from vit_colmap_tpu.features.trainable_vit_extractor import (
        TrainableViTExtractor,
    )

    ex = TrainableViTExtractor(
        weights_path=args.weights,
        backbone=args.backbone,
        num_keypoints=args.budget,
        nms_radius=1,
        detection_threshold=0.4,
        subpixel=subpixel,
    )
    ex.extract(scene_dir, db_path, "PINHOLE", cam_params)
    return ex


def build_db_sift(scene_dir, db_path, cam_params, args):
    from vit_colmap_tpu.features.sift_extractor import SiftExtractor

    ex = SiftExtractor(max_keypoints=args.max_keypoints)
    ex.extract(scene_dir, db_path, "PINHOLE", cam_params)
    return ex


def replace_desc_with_trainable(scene_dir, db_path, args):
    """Overwrite every image's descriptors with trainable-head descriptors
    bilinearly sampled at the DB's (SIFT) keypoint locations."""
    import cv2
    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.database import ColmapDatabase
    from vit_colmap_tpu.features.trainable_vit_extractor import (
        TrainableViTExtractor,
    )
    from vit_colmap_tpu.models.dinov2 import patch_grid_size, preprocess
    from vit_colmap_tpu.ops.interpolate import bilinear_sample

    ex = TrainableViTExtractor(
        weights_path=args.weights, backbone=args.backbone,
    )  # only for model+params

    @jax.jit
    def dense_desc(params, img_u8):
        out = ex.model.apply(params, preprocess(img_u8))
        return out["descriptors"][0]  # (H4, W4, D)

    @jax.jit
    def sample(fmap, xy):
        d = bilinear_sample(fmap.astype(jnp.float32), xy)
        # Re-normalize after interpolation (the head emits unit-L2 cells;
        # interpolated vectors land inside the sphere), then quantize with
        # the trainable extractor's signed rule.
        d = d / jnp.maximum(jnp.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
        return jnp.clip((d + 1.0) * 127.5, 0, 255).astype(jnp.uint8)

    db = ColmapDatabase(db_path)
    images = db.read_images()
    for image_id, meta in images.items():
        kpts = db.read_keypoints(image_id)
        if kpts is None or len(kpts) == 0:
            continue
        f = Path(scene_dir) / meta["name"]
        bgr = cv2.imread(str(f))
        rgb = cv2.cvtColor(bgr, cv2.COLOR_BGR2RGB)
        oh, ow = rgb.shape[:2]
        th, tw = patch_grid_size(oh, ow)
        if (oh, ow) != (th, tw):
            rgb = cv2.resize(rgb, (tw, th), interpolation=cv2.INTER_AREA)
        fmap = dense_desc(ex.params, jnp.asarray(rgb[None]))
        # Original px -> resized px -> quarter-res grid coords (inverse of
        # the trainable extractor's (cell + 0.5) * 4 * rx mapping).
        rx, ry = ow / tw, oh / th
        gx = kpts[:, 0] / rx / 4.0 - 0.5
        gy = kpts[:, 1] / ry / 4.0 - 0.5
        xy = jnp.asarray(np.stack([gx, gy], axis=1), jnp.float32)
        desc = np.asarray(sample(fmap, xy))
        db.conn.execute(
            "DELETE FROM descriptors WHERE image_id = ?", (image_id,)
        )
        db.add_descriptors(image_id, desc)
    db.commit()
    db.close()


def run_stages(scene_dir, db_path, out_dir, cam_params, signed_desc):
    """match+verify+incremental SfM on a prepared DB; returns metrics."""
    from vit_colmap_tpu.pipeline.match import match_exhaustive
    from vit_colmap_tpu.sfm.align import (
        best_pose_errors,
        gt_poses_for_rendered_scene,
    )
    from vit_colmap_tpu.sfm.incremental import incremental_mapping
    from vit_colmap_tpu.utils.config import Config

    config = Config()
    if signed_desc:
        config.matching.descriptor_encoding = "signed"
    t0 = time.perf_counter()
    match_exhaustive(db_path, config.matching)
    t_match = time.perf_counter() - t0
    t0 = time.perf_counter()
    recs = incremental_mapping(
        db_path, scene_dir, Path(out_dir) / "sparse",
        config.reconstruction,
    )
    t_recon = time.perf_counter() - t0
    row = {"match_s": round(t_match, 1), "recon_s": round(t_recon, 1)}
    if recs:
        big = max(recs.values(), key=lambda r: len(r.images))
        row.update(
            registered=sum(len(r.images) for r in recs.values()),
            points3d=sum(len(r.points3D) for r in recs.values()),
            reproj_px=round(big.mean_reprojection_error(), 3),
        )
        pose = best_pose_errors(recs, gt_poses_for_rendered_scene(scene_dir))
        if pose:
            row.update(
                rot_err_deg=round(pose["pose_rot_err_deg_mean"], 4),
                rot_err_deg_max=round(pose["pose_rot_err_deg_max"], 4),
                center_err_rel=round(pose["pose_center_err_rel_mean"], 5),
                aligned_cameras=pose["aligned_cameras"],
            )
    else:
        row.update(registered=0, points3d=0)
    return row


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=50)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--backbone", default="vitb14")
    ap.add_argument("--weights", default=None)
    ap.add_argument("--budget", type=int, default=4096,
                    help="trainable keypoint budget (pipeline SfM default)")
    ap.add_argument("--max-keypoints", type=int, default=2048,
                    help="SIFT budget (pipeline default)")
    ap.add_argument("--work-dir", type=Path, default=Path("/tmp/bisect_r5"))
    ap.add_argument("--variants", default="asis,offsets0,quad,siftloc,sift")
    ap.add_argument("--tiny", action="store_true")
    args = ap.parse_args()
    if args.tiny:
        args.images, args.height, args.width = 6, 126, 168
        args.max_keypoints, args.budget = 256, 512
        args.backbone = "vits14"

    from vit_colmap_tpu.database import ColmapDatabase
    from vit_colmap_tpu.dataloader.synthetic_benchmark import (
        render_multiview_scene,
    )
    from vit_colmap_tpu.utils.profiling import relay_epoch_probe

    work = args.work_dir
    image_dir = work / "images"
    if not image_dir.exists():
        _, K = render_multiview_scene(
            image_dir, n_cams=args.images, size=(args.height, args.width),
            focal=float(max(args.height, args.width)) * 0.94, seed=7,
        )
        (work / "camera.json").write_text(json.dumps(
            {"params": [K[0, 0], K[1, 1], K[0, 2], K[1, 2]]}
        ))
    cam_params = [
        float(p)
        for p in json.loads((work / "camera.json").read_text())["params"]
    ]

    rows = {}
    for variant in [v for v in args.variants.split(",") if v]:
        print(f"=== variant: {variant} ===", flush=True)
        vdir = work / variant
        vdir.mkdir(parents=True, exist_ok=True)
        db_path = vdir / "db.db"
        if db_path.exists():
            db_path.unlink()
        rt0 = relay_epoch_probe()
        t0 = time.perf_counter()
        if variant == "asis":
            build_db_trainable(image_dir, db_path, cam_params, args, "head")
            signed = True
        elif variant == "offsets0":
            build_db_trainable(image_dir, db_path, cam_params, args, "none")
            signed = True
        elif variant == "quad":
            build_db_trainable(image_dir, db_path, cam_params, args, "quad")
            signed = True
        elif variant == "sift":
            build_db_sift(image_dir, db_path, cam_params, args)
            signed = False
        elif variant == "siftloc":
            build_db_sift(image_dir, db_path, cam_params, args)
            replace_desc_with_trainable(image_dir, db_path, args)
            signed = True
        else:
            raise SystemExit(f"unknown variant {variant}")
        t_extract = time.perf_counter() - t0

        # Spatial dispersion of the first image's keypoints.
        with ColmapDatabase.open_database(db_path) as db:
            first_id = sorted(db.read_images())[0]
            kp = db.read_keypoints(first_id)
        stats = spatial_stats(
            kp if kp is not None else np.zeros((0, 2)),
            args.width, args.height,
        )

        row = run_stages(image_dir, db_path, vdir, cam_params, signed)
        row["extract_s"] = round(t_extract, 1)
        row["keypoint_dispersion"] = stats
        row["dispatch_rt_ms"] = round(relay_epoch_probe(), 2)
        row["dispatch_rt_ms_before"] = round(rt0, 2)
        rows[variant] = row
        print(json.dumps({variant: row}), flush=True)

    print(json.dumps({
        "metric": "bisect_rot_err_deg_asis",
        "value": rows.get("asis", {}).get("rot_err_deg"),
        "unit": "deg",
        "images": args.images,
        "weights": args.weights,
        "variants": rows,
    }))


if __name__ == "__main__":
    main()
