#!/usr/bin/env python
"""Visualize invariant-point selection on an image pair.

Parity with the reference ``scripts/visualize_invariant_points.py`` (568
lines): runs the backbone on two homography-related images (an HPatches
sequence pair, two explicit images + H, or a synthetic warp), selects
invariant points via the warped cosine-similarity map, and renders a
side-by-side panel with correspondence lines, similarity-colored markers,
and optional score labels.  Filters: ``--max-points``, ``--min-similarity``;
styling: ``--point-size/--line-width/--font-size/--dpi``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def parse_args():
    ap = argparse.ArgumentParser(
        description="Visualize selected invariant points on image pairs"
    )
    src = ap.add_mutually_exclusive_group(required=True)
    src.add_argument("--image1", type=Path)
    src.add_argument("--data-root", type=Path, help="HPatches root")
    ap.add_argument("--image2", type=Path, default=None,
                    help="second image (default: synthetic warp of image1)")
    ap.add_argument("--homography", type=Path, default=None,
                    help="3x3 H text file mapping image1 -> image2 pixels")
    ap.add_argument("--sequence", default=None)
    ap.add_argument("--pair-idx", type=int, default=0)
    ap.add_argument("--backbone", default="vits14")
    ap.add_argument("--weights", type=Path, default=None)
    ap.add_argument("--top-k-invariant", "--top-k", dest="top_k", type=int,
                    default=128)
    ap.add_argument("--max-points", type=int, default=None,
                    help="display at most this many (highest similarity)")
    ap.add_argument("--min-similarity", type=float, default=None)
    ap.add_argument("--no-labels", action="store_true")
    ap.add_argument("--show-all-labels", action="store_true")
    ap.add_argument("--point-size", type=float, default=12)
    ap.add_argument("--line-width", type=float, default=0.3)
    ap.add_argument("--font-size", type=int, default=6)
    ap.add_argument("--dpi", type=int, default=150)
    ap.add_argument("--output", type=Path, default=None,
                    help="save path (default: display interactively)")
    return ap.parse_args()


def load_pair(args):
    import cv2

    from vit_colmap_tpu.dataloader.hpatches_dataset import patch_aligned

    if args.data_root is not None:
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
        return item["image1"], item["image2"], item["H"], item["seq_name"]

    img1 = cv2.cvtColor(cv2.imread(str(args.image1)), cv2.COLOR_BGR2RGB)
    if args.image2 is not None:
        img2 = cv2.cvtColor(cv2.imread(str(args.image2)), cv2.COLOR_BGR2RGB)
        H = (np.loadtxt(args.homography).reshape(3, 3)
             if args.homography else np.eye(3))
    else:
        from vit_colmap_tpu.dataloader.synthetic_homography import (
            create_synthetic_pair,
        )

        img2, H = create_synthetic_pair(img1)
    th, tw = patch_aligned(img1.shape[0]), patch_aligned(img1.shape[1])
    s = np.diag([tw / img1.shape[1], th / img1.shape[0], 1.0])
    H = s @ H @ np.linalg.inv(s)
    return (cv2.resize(img1, (tw, th)), cv2.resize(img2, (tw, th)), H,
            args.image1.stem)


def main() -> None:
    args = parse_args()
    import jax
    import jax.numpy as jnp
    import matplotlib

    if args.output is not None:
        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from vit_colmap_tpu.dataloader.training_sampler import (
        select_invariant_points,
    )
    from vit_colmap_tpu.models.dinov2 import make_backbone, preprocess

    img1, img2, H, name = load_pair(args)
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
    inv = select_invariant_points(
        f1, f2, jnp.asarray(H, jnp.float32)[None], top_k=args.top_k
    )
    valid = np.asarray(inv.valid)[0]
    c1 = (np.asarray(inv.coords1_grid)[0][valid] + 0.5) * 14
    c2 = (np.asarray(inv.coords2_grid)[0][valid] + 0.5) * 14
    sim = np.asarray(inv.similarity)[0][valid]

    if args.min_similarity is not None:
        keep = sim >= args.min_similarity
        c1, c2, sim = c1[keep], c2[keep], sim[keep]
    order = np.argsort(-sim)
    if args.max_points is not None:
        order = order[: args.max_points]
    c1, c2, sim = c1[order], c2[order], sim[order]

    canvas = np.concatenate([img1, img2], axis=1)
    fig, ax = plt.subplots(figsize=(16, 8))
    ax.imshow(canvas)
    ax.set_axis_off()
    for (x1, y1), (x2, y2) in zip(c1, c2):
        ax.plot([x1, x2 + tw], [y1, y2], color="lime",
                linewidth=args.line_width, alpha=0.7)
    sc = ax.scatter(np.concatenate([c1[:, 0], c2[:, 0] + tw]),
                    np.concatenate([c1[:, 1], c2[:, 1]]),
                    c=np.concatenate([sim, sim]), cmap="viridis",
                    s=args.point_size, vmax=1.0)
    fig.colorbar(sc, ax=ax, fraction=0.02, label="cosine similarity")
    if not args.no_labels:
        n_lab = len(sim) if args.show_all_labels else min(len(sim), 40)
        for (x, y), s_ in zip(c2[:n_lab], sim[:n_lab]):
            ax.annotate(f"{s_:.2f}", (x + tw, y), fontsize=args.font_size,
                        color="yellow", xytext=(2, 2),
                        textcoords="offset points")
    ax.set_title(
        f"{name}: {len(sim)} invariant points "
        f"(similarity {sim.min():.2f}..{sim.max():.2f}, "
        f"mean {sim.mean():.2f})"
    )
    fig.tight_layout()
    if args.output is not None:
        args.output.parent.mkdir(parents=True, exist_ok=True)
        fig.savefig(args.output, dpi=args.dpi, bbox_inches="tight")
        print(f"Wrote {args.output} ({len(sim)} points)")
    else:
        plt.show()


if __name__ == "__main__":
    main()
