#!/usr/bin/env python
"""Visualize the end-to-end training sampling pipeline.

Parity with the reference ``scripts/visualize_training_sampling.py`` (811
lines: comprehensive panels for invariant points, correspondences, and each
negative family): renders a 2x3 figure — the image pair with invariant
points, correspondence lines, in-image negatives around sample anchors,
hard-negative locations with similarity labels, and cross-image negative
placement — for an HPatches pair or a synthetic warp of any image.

Usage:
  python scripts/visualize_training_sampling.py --image photo.png
  python scripts/visualize_training_sampling.py --data-root hpatches \
      --sequence v_adam --pair-idx 2 --top-k 64
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args():
    ap = argparse.ArgumentParser()
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--image", type=Path, help="single image; pair is a "
                     "synthetic warp")
    src.add_argument("--data-root", type=Path, help="HPatches root")
    ap.add_argument("--sequence", default=None)
    ap.add_argument("--pair-idx", type=int, default=0)
    ap.add_argument("--backbone", default="vits14")
    ap.add_argument("--weights", type=Path, default=None)
    ap.add_argument("--top-k", type=int, default=32)
    ap.add_argument("--num-anchors", type=int, default=5,
                    help="anchors whose negatives get drawn")
    ap.add_argument("--num-in-image-neg", type=int, default=6)
    ap.add_argument("--num-hard-neg", type=int, default=4)
    ap.add_argument("--synthetic-preset", default="moderate")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--point-size", type=float, default=14)
    ap.add_argument("--line-width", type=float, default=0.5)
    ap.add_argument("--font-size", type=int, default=6)
    ap.add_argument("--dpi", type=int, default=130)
    ap.add_argument("--output", type=Path, default=Path("sampling_viz.png"))
    return ap.parse_args()


def load_pair(args):
    import cv2

    from vit_colmap_tpu.dataloader.hpatches_dataset import patch_aligned

    if args.image is not None:
        from vit_colmap_tpu.dataloader.synthetic_homography import (
            SyntheticHomographyConfig,
            create_synthetic_pair,
        )

        img1 = cv2.cvtColor(cv2.imread(str(args.image)), cv2.COLOR_BGR2RGB)
        cfg = getattr(SyntheticHomographyConfig, args.synthetic_preset)()
        img2, H = create_synthetic_pair(
            img1, cfg, np.random.default_rng(args.seed)
        )
    else:
        from vit_colmap_tpu.dataloader.hpatches_dataset import HPatchesDataset

        ds = HPatchesDataset(args.data_root, split="all",
                             pair_mode="reference_only")
        idx = 0
        if args.sequence:
            cands = [i for i, s in enumerate(ds.samples)
                     if Path(s["seq"]).name == args.sequence]
            if not cands:
                raise SystemExit(f"sequence {args.sequence!r} not found")
            idx = cands[min(args.pair_idx, len(cands) - 1)]
        item = ds[idx]
        return item["image1"], item["image2"], item["H"]
    th, tw = patch_aligned(img1.shape[0]), patch_aligned(img1.shape[1])
    s = np.diag([tw / img1.shape[1], th / img1.shape[0], 1.0])
    H = s @ H @ np.linalg.inv(s)
    return (cv2.resize(img1, (tw, th)), cv2.resize(img2, (tw, th)), H)


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vit_colmap_tpu.dataloader.training_sampler import (
        hard_negative_coords,
        sample_features_at,
        select_invariant_points,
    )
    from vit_colmap_tpu.models.dinov2 import make_backbone, preprocess

    img1, img2, H = load_pair(args)
    th, tw = img1.shape[:2]

    model, cfg = make_backbone(args.backbone)
    if args.weights:
        from vit_colmap_tpu.models.convert import load_torch_checkpoint

        params = load_torch_checkpoint(str(args.weights), cfg)
    else:
        params = model.init(jax.random.key(0), jnp.zeros((1, th, tw, 3)))

    def feats(img):
        out = model.apply(params, preprocess(jnp.asarray(img[None])))
        gh, gw = out["grid"]
        return out["x_norm_patchtokens"].reshape(1, gh, gw, -1).astype(
            jnp.float32
        )

    f1, f2 = feats(img1), feats(img2)
    Hj = jnp.asarray(H, jnp.float32)[None]
    inv = select_invariant_points(f1, f2, Hj, top_k=args.top_k)

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    f2n = norm(f2)
    anchor = norm(sample_features_at(f2n, inv.coords2_grid))
    hard_xy, hard_sim = hard_negative_coords(
        f2n, inv.coords2_grid, anchor, top_n=args.num_hard_neg
    )

    rng = np.random.default_rng(args.seed)
    gh, gw = f2.shape[1], f2.shape[2]

    def to_px(c):
        return (np.asarray(c, np.float64) + 0.5) * 14

    v = np.asarray(inv.valid)[0]
    p1 = to_px(inv.coords1_grid[0])[v]
    p2 = to_px(inv.coords2_grid[0])[v]
    sims = np.asarray(inv.similarity)[0][v]
    hard_px = to_px(hard_xy[0])[v]
    hard_s = np.asarray(hard_sim)[0][v]

    fig, axes = plt.subplots(2, 3, figsize=(20, 10))

    # (0,0)/(0,1): the pair with invariant points + similarity labels.
    for ax, img, pts, title in (
        (axes[0, 0], img1, p1, "image 1 — invariant points (warped back)"),
        (axes[0, 1], img2, p2, "image 2 — invariant points"),
    ):
        ax.imshow(img)
        ax.scatter(pts[:, 0], pts[:, 1], c=sims, cmap="viridis",
                   s=args.point_size, vmin=sims.min(), vmax=1.0)
        for (x, y), s_ in zip(pts, sims):
            ax.annotate(f"{s_:.2f}", (x, y), fontsize=args.font_size,
                        color="yellow", xytext=(2, 2),
                        textcoords="offset points")
        ax.set_title(title)

    # (0,2): side-by-side correspondences.
    canvas = np.concatenate([img1, img2], axis=1)
    axes[0, 2].imshow(canvas)
    for (x1, y1), (x2, y2) in zip(p1, p2):
        axes[0, 2].plot([x1, x2 + tw], [y1, y2], color="lime",
                        linewidth=args.line_width, alpha=0.8)
    axes[0, 2].scatter(p1[:, 0], p1[:, 1], c="lime", s=4)
    axes[0, 2].scatter(p2[:, 0] + tw, p2[:, 1], c="lime", s=4)
    axes[0, 2].set_title(f"correspondences ({len(p1)} invariant pairs)")

    # (1,0): in-image negatives around a few anchors (random, >= min_dist).
    sel = rng.choice(len(p2), min(args.num_anchors, len(p2)), replace=False)
    axes[1, 0].imshow(img2)
    colors = plt.cm.tab10(np.linspace(0, 1, len(sel)))
    for color, k in zip(colors, sel):
        ax_, ay_ = p2[k]
        axes[1, 0].scatter([ax_], [ay_], c=[color], marker="*", s=140,
                           edgecolors="white", linewidths=0.5)
        negs = np.stack([
            rng.uniform(0, gw - 1, args.num_in_image_neg),
            rng.uniform(0, gh - 1, args.num_in_image_neg),
        ], axis=1)
        keep = np.linalg.norm(negs - np.asarray(inv.coords2_grid)[0][v][k],
                              axis=1) >= 16.0 / 14.0
        npx = to_px(negs[keep])
        axes[1, 0].scatter(npx[:, 0], npx[:, 1], c=[color], marker="x", s=30)
    axes[1, 0].set_title("in-image negatives (x) around anchors (*)")

    # (1,1): hard negatives with similarity labels.
    axes[1, 1].imshow(img2)
    for color, k in zip(colors, sel):
        ax_, ay_ = p2[k]
        axes[1, 1].scatter([ax_], [ay_], c=[color], marker="*", s=140,
                           edgecolors="white", linewidths=0.5)
        for (x, y), s_ in zip(hard_px[k], hard_s[k]):
            axes[1, 1].plot([ax_, x], [ay_, y], color=color,
                            linewidth=args.line_width, alpha=0.7)
            axes[1, 1].scatter([x], [y], c=[color], marker="s", s=26)
            axes[1, 1].annotate(f"{s_:.2f}", (x, y), fontsize=args.font_size,
                                color="red", xytext=(2, 2),
                                textcoords="offset points")
    axes[1, 1].set_title("hard negatives (most similar, geometrically far)")

    # (1,2): cross-image negatives come from the NEXT batch item (roll by 1);
    # with one pair the roll maps to this image — show placement density.
    axes[1, 2].imshow(img2, alpha=0.6)
    xn = rng.uniform(0, gw - 1, 200)
    yn = rng.uniform(0, gh - 1, 200)
    axes[1, 2].scatter((xn + 0.5) * 14, (yn + 0.5) * 14, c="orange", s=6,
                       alpha=0.6)
    axes[1, 2].set_title("cross-image negative placement (uniform cells of "
                         "the rolled batch item)")

    for ax in axes.ravel():
        ax.axis("off")
    fig.tight_layout()
    args.output.parent.mkdir(parents=True, exist_ok=True)
    fig.savefig(args.output, dpi=args.dpi, bbox_inches="tight")
    print(f"Wrote {args.output}")


if __name__ == "__main__":
    main()
