#!/usr/bin/env python
"""HPatches matching evaluation: MMA + homography accuracy per extractor.

BASELINE.json config 3 surface: "DINOv2 ViT extractor on HPatches: dense
descriptors + mutual-NN matching + homography eval".  Works with any
extractor family; per-pair extraction/matching runs on device.  The
extractor is constructed ONCE and features are cached per unique image, so
device programs compile once and shared reference images aren't re-extracted
per pair.

Usage:
  python scripts/eval_hpatches.py --data-dir /path/to/hpatches \
    --extractor sift --split viewpoint --max-pairs 100
"""

from __future__ import annotations

import argparse
import hashlib
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_extract_fn(extractor_name, backbone="vitb14", weights=None,
                    max_kp=2048, contrast_thresh=0.02, pca_path=None):
    """Build a single-image feature closure: (H, W, 3) uint8 RGB ->
    (kpts Nx2 float32, desc NxD uint8, encoding str)."""
    import cv2

    if extractor_name in ("sift", "colmap_sift"):
        from vit_colmap_tpu.ops.sift import extract_sift

        def fn(img):
            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255
            kp, dc = extract_sift(
                gray[None], max_keypoints=max_kp, contrast_thresh=contrast_thresh
            )
            return kp[0][:, :2], dc[0], "unsigned"

        return fn

    if extractor_name == "vit":
        from vit_colmap_tpu.features.vit_extractor import ViTExtractor
        from vit_colmap_tpu.models.dinov2 import patch_grid_size

        ex = ViTExtractor(
            weights_path=weights, backbone=backbone, max_keypoints=max_kp,
            image_batch=1, pca_path=pca_path,
        )

        def fn(img):
            oh, ow = img.shape[:2]
            th, tw = patch_grid_size(oh, ow)
            batch = cv2.resize(img, (tw, th))[None]
            xy, sc, valid, desc = ex.extract_batch(batch)
            v = valid[0]
            kp = ex._map_coords(xy[0][v], (tw, th), (ow, oh))
            return kp, desc[0][v], "signed"

        return fn

    if extractor_name == "trainable_vit":
        from vit_colmap_tpu.features.trainable_vit_extractor import (
            TrainableViTExtractor,
        )
        from vit_colmap_tpu.models.dinov2 import patch_grid_size

        ex = TrainableViTExtractor(
            weights_path=weights, backbone=backbone, num_keypoints=max_kp,
            image_batch=1,
        )

        def fn(img):
            oh, ow = img.shape[:2]
            th, tw = patch_grid_size(oh, ow)
            batch = cv2.resize(img, (tw, th))[None]
            x, y, orient, score, valid, desc = ex.extract_batch(batch)
            v = valid[0]
            kp = np.stack(
                [x[0][v] * ow / tw, y[0][v] * oh / th], axis=1
            ).astype(np.float32)
            return kp, desc[0][v], "signed"

        return fn

    if extractor_name == "dummy":
        from vit_colmap_tpu.features.dummy_extractor import dummy_features

        def fn(img):
            h, w = img.shape[:2]
            kp, dc = dummy_features(42, h, w)
            return np.asarray(kp), np.asarray(dc), "unsigned"

        return fn

    if extractor_name == "hybrid":
        from vit_colmap_tpu.features.hybrid_extractor import HybridExtractor
        from vit_colmap_tpu.models.dinov2 import PATCH_SIZE, patch_grid_size

        ex = HybridExtractor(
            weights_path=weights, backbone=backbone, max_keypoints=max_kp,
            image_batch=1, pca_path=pca_path,
        )
        detector = ex._make_detector()

        def fn(img):
            oh, ow = img.shape[:2]
            th, tw = patch_grid_size(oh, ow)
            gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
            kps = detector.detect(gray, None)
            kps = sorted(kps, key=lambda k: -k.response)[:max_kp]
            pts = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
            if len(pts) == 0:
                return pts, np.zeros((0, ex.descriptor_dim), np.uint8), "signed"
            batch = cv2.resize(img, (tw, th))[None]
            fmap = ex._dense_features(batch)
            gx = pts[:, 0] * (tw / ow) / PATCH_SIZE - 0.5
            gy = pts[:, 1] * (th / oh) / PATCH_SIZE - 0.5
            grid = np.stack([gx, gy], 1)[None]
            desc = ex.describe(fmap, grid)[0]
            return pts, desc, "signed"

        return fn

    raise ValueError(f"Unknown extractor {extractor_name!r}")


def mutual_match(f1, f2):
    import jax.numpy as jnp

    from vit_colmap_tpu.ops.matching import (
        compact_matches,
        match_pair,
        normalize_descriptors,
    )

    (k1, d1, enc), (k2, d2, _) = f1, f2
    if len(k1) == 0 or len(k2) == 0:
        return np.zeros((0, 2), np.int64)
    n = max(len(d1), len(d2))

    def prep(d, k_count):
        x = d.astype(np.float32)
        if enc == "signed":
            x = x / 127.5 - 1.0
        dp = np.zeros((n, x.shape[1]), np.float32)
        dp[: len(x)] = x
        v = np.zeros(n, bool)
        v[:k_count] = True
        return np.asarray(normalize_descriptors(jnp.asarray(dp))), v

    d1p, v1 = prep(d1, len(d1))
    d2p, v2 = prep(d2, len(d2))
    idx = np.asarray(match_pair(d1p, d2p, v1, v2))
    return compact_matches(idx, len(d1)).astype(np.int64)


def evaluate_dataset(ds, extract_fn, max_pairs=None, thresholds=(1.0, 3.0, 5.0)):
    """Run the eval protocol over an HPatchesDataset with feature caching."""
    from vit_colmap_tpu.utils.homography_eval import evaluate_pairs

    n = len(ds) if max_pairs is None else min(len(ds), max_pairs)
    cache: dict[str, tuple] = {}

    def features(img):
        key = hashlib.sha1(img.tobytes()).hexdigest()
        if key not in cache:
            cache[key] = extract_fn(img)
        return cache[key]

    t0 = time.perf_counter()
    pair_data = []
    for i in range(n):
        item = ds[i]
        f1 = features(item["image1"])
        f2 = features(item["image2"])
        matches = mutual_match(f1, f2)
        h, w = item["image1"].shape[:2]
        pair_data.append(
            {
                "kpts1": f1[0],
                "kpts2": f2[0],
                "matches": matches,
                "H": item["H"],
                "image_wh": (w, h),
            }
        )
    result = evaluate_pairs(pair_data, thresholds)
    dt = time.perf_counter() - t0
    return result, n / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--data-dir", type=Path, required=True)
    ap.add_argument("--extractor", default="sift",
                    choices=["sift", "colmap_sift", "vit", "trainable_vit",
                             "hybrid"])
    ap.add_argument("--backbone", default="vitb14")
    ap.add_argument("--weights", type=Path, default=None)
    ap.add_argument("--pca-path", type=Path, default=None)
    ap.add_argument("--split", default="all")
    ap.add_argument("--pair-mode", default="reference_only")
    ap.add_argument("--max-pairs", type=int, default=None)
    ap.add_argument("--max-keypoints", type=int, default=2048)
    ap.add_argument("--contrast-thresh", type=float, default=0.02)
    ap.add_argument("--target-height", type=int, default=480)
    ap.add_argument("--target-width", type=int, default=640)
    ap.add_argument("--output", type=Path, default=None)
    args = ap.parse_args()

    from vit_colmap_tpu.dataloader.hpatches_dataset import HPatchesDataset

    ds = HPatchesDataset(
        args.data_dir, split=args.split, pair_mode=args.pair_mode,
        target_height=args.target_height, target_width=args.target_width,
    )
    extract_fn = make_extract_fn(
        args.extractor, args.backbone,
        str(args.weights) if args.weights else None,
        args.max_keypoints, args.contrast_thresh,
        str(args.pca_path) if args.pca_path else None,
    )
    n = len(ds) if args.max_pairs is None else min(len(ds), args.max_pairs)
    print(f"Evaluating {args.extractor} on {n} pairs...")
    result, pairs_per_sec = evaluate_dataset(ds, extract_fn, args.max_pairs)
    print(result.summary())
    print(f"throughput: {pairs_per_sec:.2f} pairs/s (extract+match+eval)")

    if args.output:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        with open(args.output, "w") as f:
            json.dump(
                {
                    "extractor": args.extractor,
                    "pairs": len(result.pairs),
                    "avg_matches": result.avg_matches,
                    "mma": {str(k): v for k, v in result.mma.items()},
                    "homography_accuracy": {
                        str(k): v for k, v in result.homography_accuracy.items()
                    },
                    "pairs_per_sec": pairs_per_sec,
                },
                f,
                indent=2,
            )
        print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
