#!/usr/bin/env python
"""Visualize matches stored in a COLMAP database.

Parity with the reference ``scripts/visualize_matches.py``: reads keypoints,
raw matches and two-view inliers from the DB, classifies inlier (green) vs
outlier (red) match lines, draws keypoints with optional orientation arrows,
and offers a ``--list-matches`` explorer for pair statistics.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def list_matches(db) -> None:
    images = db.read_images()
    print(f"{'pair':<30}{'raw':>8}{'inliers':>10}{'config':>8}")
    for (i, j), m in sorted(db.read_all_matches().items()):
        g = db.read_two_view_geometry(i, j)
        n_inl = len(g["inlier_matches"]) if g else 0
        cfg = g["config"] if g else "-"
        name = f"{images[i]['name']} - {images[j]['name']}"
        print(f"{name:<30}{len(m):>8}{n_inl:>10}{cfg!s:>8}")


def draw_pair(db, image_dir: Path, id1: int, id2: int, out_path: Path,
              max_lines: int = 200, draw_orientations: bool = False) -> None:
    import cv2

    images = db.read_images()
    img1 = cv2.imread(str(image_dir / images[id1]["name"]))
    img2 = cv2.imread(str(image_dir / images[id2]["name"]))
    if img1 is None or img2 is None:
        print("Could not read images from", image_dir)
        return
    k1 = db.read_keypoints(id1)
    k2 = db.read_keypoints(id2)
    matches = db.read_matches(id1, id2)
    if matches is None:
        print("No matches for this pair")
        return
    g = db.read_two_view_geometry(id1, id2)
    inlier_set = (
        {tuple(r) for r in g["inlier_matches"]} if g is not None else set()
    )

    h = max(img1.shape[0], img2.shape[0])
    canvas = np.zeros((h, img1.shape[1] + img2.shape[1], 3), np.uint8)
    canvas[: img1.shape[0], : img1.shape[1]] = img1
    canvas[: img2.shape[0], img1.shape[1]:] = img2
    off = img1.shape[1]

    for kp, img_off in ((k1, 0), (k2, off)):
        for row in kp:
            x, y = int(row[0]) + img_off, int(row[1])
            cv2.circle(canvas, (x, y), 2, (255, 200, 0), -1)
            if draw_orientations and kp.shape[1] >= 4:
                ang = float(row[3])
                cv2.line(
                    canvas, (x, y),
                    (int(x + 10 * np.cos(ang)), int(y + 10 * np.sin(ang))),
                    (255, 200, 0), 1,
                )

    step = max(len(matches) // max_lines, 1)
    n_in = n_out = 0
    for a, b in matches[::step]:
        p1 = (int(k1[a, 0]), int(k1[a, 1]))
        p2 = (int(k2[b, 0]) + off, int(k2[b, 1]))
        if (a, b) in inlier_set:
            color, n_in = (0, 200, 0), n_in + 1
        else:
            color, n_out = (0, 0, 220), n_out + 1
        cv2.line(canvas, p1, p2, color, 1, cv2.LINE_AA)
    cv2.putText(
        canvas,
        f"raw {len(matches)}  inliers {len(inlier_set)} (drawn {n_in}g/{n_out}r)",
        (10, 24), cv2.FONT_HERSHEY_SIMPLEX, 0.7, (255, 255, 255), 2,
    )
    out_path.parent.mkdir(parents=True, exist_ok=True)
    cv2.imwrite(str(out_path), canvas)
    print(f"Wrote {out_path}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", type=Path, required=True)
    ap.add_argument("--images", type=Path, default=None)
    ap.add_argument("--list-matches", action="store_true")
    ap.add_argument("--pair", nargs=2, type=int, default=None,
                    help="image ids to visualize")
    ap.add_argument("--output", type=Path, default=Path("match_viz.png"))
    ap.add_argument("--orientations", action="store_true")
    args = ap.parse_args()

    from vit_colmap_tpu.database import ColmapDatabase

    db = ColmapDatabase(args.db)
    if args.list_matches or args.pair is None:
        list_matches(db)
    if args.pair is not None:
        if args.images is None:
            print("--images required to draw a pair")
        else:
            draw_pair(db, args.images, args.pair[0], args.pair[1],
                      args.output, draw_orientations=args.orientations)
    db.close()


if __name__ == "__main__":
    main()
