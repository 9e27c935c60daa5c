#!/usr/bin/env python
"""Quick one-image visual sanity check (not collected by pytest).

Parity with the reference ``tests/quick_visualization.py``: generates a
synthetic image if none given, runs the ViT extractor, and writes a single
keypoint-overlay PNG.
"""

from __future__ import annotations

import argparse
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=Path, default=None)
    ap.add_argument("--output", type=Path, default=Path("quick_viz.png"))
    args = ap.parse_args()

    import cv2

    from vit_colmap_tpu.features.vit_extractor import ViTExtractor
    from vit_colmap_tpu.models.dinov2 import patch_grid_size

    if args.image is None:
        rng = np.random.default_rng(0)
        img = rng.integers(0, 255, (240, 320, 3), dtype=np.uint8)
        img = cv2.GaussianBlur(img, (0, 0), 2)
        path = Path(tempfile.mkdtemp()) / "synthetic.png"
        cv2.imwrite(str(path), img)
        args.image = path
        print(f"Generated synthetic image at {path}")

    img = cv2.imread(str(args.image))
    rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    oh, ow = rgb.shape[:2]
    th, tw = patch_grid_size(oh, ow)
    ex = ViTExtractor(backbone="vits14", max_keypoints=256, image_batch=1)
    xy, sc, valid, desc = ex.extract_batch(cv2.resize(rgb, (tw, th))[None])
    kpts = ex._map_coords(xy[0][valid[0]], (tw, th), (ow, oh))
    for x, y in kpts.astype(int):
        cv2.circle(img, (x, y), 3, (0, 255, 0), -1)
    cv2.imwrite(str(args.output), img)
    print(f"Wrote {args.output} with {len(kpts)} keypoints")


if __name__ == "__main__":
    main()
