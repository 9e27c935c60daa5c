#!/usr/bin/env python
"""Manual visual-verification suite (not collected by pytest).

Parity with the reference ``tests/visualize_features.py``: keypoint overlays,
detection-density maps, PCA feature maps, SIFT-vs-ViT side-by-side, and
descriptor-quality statistics — human-in-the-loop checks (SURVEY.md §4
"visualization as verification").

Usage: python tests/visualize_features.py --image <path> [--out-dir viz/]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image", type=Path, required=True)
    ap.add_argument("--backbone", default="vits14")
    ap.add_argument("--weights", type=Path, default=None)
    ap.add_argument("--out-dir", type=Path, default=Path("viz"))
    args = ap.parse_args()
    args.out_dir.mkdir(parents=True, exist_ok=True)

    import cv2
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vit_colmap_tpu.features.sift_extractor import SiftExtractor
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor
    from vit_colmap_tpu.models.dinov2 import patch_grid_size
    from vit_colmap_tpu.ops.sift import extract_sift

    img = cv2.imread(str(args.image))
    rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    gray = cv2.cvtColor(img, cv2.COLOR_BGR2GRAY).astype(np.float32) / 255.0
    oh, ow = rgb.shape[:2]
    th, tw = patch_grid_size(oh, ow)

    # --- ViT keypoints + density + PCA feature map
    ex = ViTExtractor(
        weights_path=str(args.weights) if args.weights else None,
        backbone=args.backbone, max_keypoints=1024, image_batch=1,
    )
    batch = cv2.resize(rgb, (tw, th))[None]
    xy, sc, valid, desc = ex.extract_batch(batch)
    kpts = ex._map_coords(xy[0][valid[0]], (tw, th), (ow, oh))

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    axes[0].imshow(rgb)
    axes[0].scatter(kpts[:, 0], kpts[:, 1], s=6, c="lime")
    axes[0].set_title(f"ViT keypoints ({len(kpts)})")
    hm, _, _ = np.histogram2d(
        kpts[:, 1], kpts[:, 0], bins=(24, 32), range=[[0, oh], [0, ow]]
    )
    axes[1].imshow(hm, cmap="hot")
    axes[1].set_title("detection density")
    # PCA-RGB of dense features
    import jax.numpy as jnp

    dense_features = ex._forward[0]
    fmap = np.asarray(dense_features(ex.params, jnp.asarray(batch)))[0]
    x = fmap.reshape(-1, fmap.shape[-1]).astype(np.float64)
    x -= x.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    pr = (x @ vt[:3].T)
    pr = (pr - pr.min(0)) / np.maximum(pr.max(0) - pr.min(0), 1e-8)
    axes[2].imshow(pr.reshape(*fmap.shape[:2], 3))
    axes[2].set_title("dense features (PCA-RGB)")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out_dir / "vit_features.png", dpi=120)
    print(f"Wrote {args.out_dir}/vit_features.png")

    # --- SIFT vs ViT side by side
    kp_sift, desc_sift = extract_sift(gray[None], max_keypoints=1024)
    fig, axes = plt.subplots(1, 2, figsize=(12, 5))
    axes[0].imshow(rgb)
    axes[0].scatter(kp_sift[0][:, 0], kp_sift[0][:, 1], s=6, c="red")
    axes[0].set_title(f"SIFT ({len(kp_sift[0])})")
    axes[1].imshow(rgb)
    axes[1].scatter(kpts[:, 0], kpts[:, 1], s=6, c="lime")
    axes[1].set_title(f"ViT ({len(kpts)})")
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    fig.savefig(args.out_dir / "sift_vs_vit.png", dpi=120)
    print(f"Wrote {args.out_dir}/sift_vs_vit.png")

    # --- descriptor-quality stats
    d = desc[0][valid[0]].astype(np.float32) / 127.5 - 1.0
    d /= np.maximum(np.linalg.norm(d, axis=-1, keepdims=True), 1e-8)
    sim = d @ d.T
    np.fill_diagonal(sim, np.nan)
    print(
        f"descriptor stats: dim={d.shape[1]}, "
        f"mean off-diag cos={np.nanmean(sim):.3f}, "
        f"p95={np.nanpercentile(sim, 95):.3f}"
    )


if __name__ == "__main__":
    main()
