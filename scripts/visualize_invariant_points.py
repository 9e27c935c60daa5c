#!/usr/bin/env python
"""Visualize invariant-point selection on an image pair.

Parity with the reference ``scripts/visualize_invariant_points.py``: runs the
backbone on two homography-related images, selects invariant points via the
warped cosine-similarity map, and overlays them with similarity labels.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--image1", type=Path, required=True)
    ap.add_argument("--image2", type=Path, default=None,
                    help="second image (default: synthetic warp of image1)")
    ap.add_argument("--homography", type=Path, default=None,
                    help="3x3 H text file mapping image1 -> image2 pixels")
    ap.add_argument("--backbone", default="vits14")
    ap.add_argument("--weights", type=Path, default=None)
    ap.add_argument("--top-k", type=int, default=64)
    ap.add_argument("--output", type=Path, default=Path("invariant_points.png"))
    args = ap.parse_args()

    import cv2
    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.dataloader.hpatches_dataset import patch_aligned
    from vit_colmap_tpu.dataloader.synthetic_homography import create_synthetic_pair
    from vit_colmap_tpu.dataloader.training_sampler import select_invariant_points
    from vit_colmap_tpu.models.dinov2 import make_backbone, preprocess

    img1 = cv2.cvtColor(cv2.imread(str(args.image1)), cv2.COLOR_BGR2RGB)
    if args.image2 is not None:
        img2 = cv2.cvtColor(cv2.imread(str(args.image2)), cv2.COLOR_BGR2RGB)
        H = np.loadtxt(args.homography).reshape(3, 3) if args.homography else np.eye(3)
    else:
        img2, H = create_synthetic_pair(img1)

    th, tw = patch_aligned(img1.shape[0]), patch_aligned(img1.shape[1])
    img1r = cv2.resize(img1, (tw, th))
    img2r = cv2.resize(img2, (tw, th))

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
    inv = select_invariant_points(f1, f2, jnp.asarray(H, jnp.float32)[None],
                                  top_k=args.top_k)
    c2 = np.asarray(inv.coords2_grid)[0]
    sim = np.asarray(inv.similarity)[0]
    valid = np.asarray(inv.valid)[0]

    vis = cv2.cvtColor(img2r, cv2.COLOR_RGB2BGR).copy()
    for (x, y), s, ok in zip(c2, sim, valid):
        if not ok:
            continue
        px, py = int((x + 0.5) * 14), int((y + 0.5) * 14)
        cv2.circle(vis, (px, py), 4, (0, 220, 0), -1)
        cv2.putText(vis, f"{s:.2f}", (px + 5, py - 5),
                    cv2.FONT_HERSHEY_SIMPLEX, 0.35, (0, 255, 255), 1)
    args.output.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(args.output), vis)
    print(f"Wrote {args.output} ({int(valid.sum())} invariant points)")


if __name__ == "__main__":
    main()
