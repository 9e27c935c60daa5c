#!/usr/bin/env python
"""Visualize homography warping of ViT patch tokens (PCA-RGB panels).

Parity with the reference ``scripts/visualize_hpatches_warping.py``: warps
image-1 patch tokens into image-2's frame, projects both to PCA-RGB, and
shows alignment quality side by side.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def pca_rgb(fmap: np.ndarray) -> np.ndarray:
    """(gh, gw, C) -> (gh, gw, 3) PCA-colored in [0, 1]."""
    gh, gw, c = fmap.shape
    x = fmap.reshape(-1, c)
    x = x - x.mean(0)
    _, _, vt = np.linalg.svd(x, full_matrices=False)
    proj = x @ vt[:3].T
    lo, hi = proj.min(0), proj.max(0)
    return ((proj - lo) / np.maximum(hi - lo, 1e-8)).reshape(gh, gw, 3)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image1", type=Path, required=True)
    ap.add_argument("--image2", type=Path, default=None)
    ap.add_argument("--homography", type=Path, default=None)
    ap.add_argument("--backbone", default="vits14")
    ap.add_argument("--weights", type=Path, default=None)
    ap.add_argument("--output", type=Path, default=Path("warping_viz.png"))
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vit_colmap_tpu.dataloader.homography_utils import (
        feature_similarity_map,
        warp_patch_tokens,
    )
    from vit_colmap_tpu.dataloader.hpatches_dataset import patch_aligned
    from vit_colmap_tpu.dataloader.synthetic_homography import create_synthetic_pair
    from vit_colmap_tpu.models.dinov2 import make_backbone, preprocess

    img1 = cv2.cvtColor(cv2.imread(str(args.image1)), cv2.COLOR_BGR2RGB)
    if args.image2 is not None:
        img2 = cv2.cvtColor(cv2.imread(str(args.image2)), cv2.COLOR_BGR2RGB)
        H = np.loadtxt(args.homography).reshape(3, 3) if args.homography else np.eye(3)
    else:
        img2, H = create_synthetic_pair(img1)
    th, tw = patch_aligned(img1.shape[0]), patch_aligned(img1.shape[1])
    img1r, img2r = cv2.resize(img1, (tw, th)), cv2.resize(img2, (tw, th))

    model, cfg = make_backbone(args.backbone)
    if args.weights:
        from vit_colmap_tpu.models.convert import load_torch_checkpoint

        params = load_torch_checkpoint(str(args.weights), cfg)
    else:
        params = model.init(jax.random.key(0), jnp.zeros((1, th, tw, 3)))

    def feats(img):
        out = model.apply(params, preprocess(jnp.asarray(img[None])))
        gh, gw = out["grid"]
        return out["x_norm_patchtokens"].reshape(1, gh, gw, -1).astype(jnp.float32)

    f1, f2 = feats(img1r), feats(img2r)
    Hj = jnp.asarray(H, jnp.float32)[None]
    warped, valid = warp_patch_tokens(f1, Hj)
    sim, _ = feature_similarity_map(f1, f2, Hj)

    fig, axes = plt.subplots(2, 4, figsize=(19, 8))
    axes[0, 0].imshow(img1r); axes[0, 0].set_title("image 1")
    axes[0, 1].imshow(img2r); axes[0, 1].set_title("image 2")
    sim_np = np.asarray(sim)[0]
    valid_np = np.asarray(valid)[0]
    im = axes[0, 2].imshow(np.where(valid_np, sim_np, np.nan),
                           cmap="RdYlGn", vmin=-1, vmax=1)
    fig.colorbar(im, ax=axes[0, 2], fraction=0.046)
    axes[0, 2].set_title("warped cosine similarity (overlap)")
    axes[0, 3].hist(sim_np[valid_np].ravel(), bins=40, color="seagreen")
    axes[0, 3].set_title("similarity histogram")
    axes[0, 3].axis("on")
    rgb1 = pca_rgb(np.asarray(f1)[0])
    rgbw = pca_rgb(np.asarray(warped)[0])
    rgb2 = pca_rgb(np.asarray(f2)[0])
    axes[1, 0].imshow(rgb1); axes[1, 0].set_title("feats 1 (PCA)")
    axes[1, 1].imshow(rgbw); axes[1, 1].set_title("feats 1 warped->2")
    axes[1, 2].imshow(rgb2); axes[1, 2].set_title("feats 2 (PCA)")
    blend = np.clip(0.5 * rgbw + 0.5 * rgb2, 0, 1)
    axes[1, 3].imshow(blend)
    axes[1, 3].set_title("warped/target blend (misalignment ghosting)")
    for k, ax in enumerate(axes.ravel()):
        if k != 3:
            ax.axis("off")
    fig.tight_layout()
    args.output.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.output, dpi=120)
    print(f"Wrote {args.output}; mean in-overlap similarity "
          f"{float(np.asarray(sim)[0][np.asarray(valid)[0]].mean()):.3f}")


if __name__ == "__main__":
    main()
