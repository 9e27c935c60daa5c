#!/usr/bin/env python
"""Side-by-side extractor comparison with %diff and per-metric winner.

Parity with the reference ``scripts/compare_metrics.py:20-303``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

METRICS = [
    ("features.avg_keypoints_per_image", "Avg keypoints/image", True),
    ("matching.total_raw_matches", "Raw matches", True),
    ("matching.total_inlier_matches", "Inlier matches", True),
    ("matching.inlier_ratio", "Inlier ratio", True),
    ("matching.verification_rate", "Verification rate %", True),
    ("reconstruction.registered_images", "Registered images", True),
    ("reconstruction.total_3d_points", "3D points", True),
    ("reconstruction.avg_track_length", "Avg track length", True),
    ("reconstruction.avg_reprojection_error", "Reproj error px", False),
]


def _get(result, dotted):
    obj = result
    for part in dotted.split("."):
        if obj is None:
            return None
        obj = getattr(obj, part, None)
    return obj


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", type=Path, default=Path("data/results"))
    ap.add_argument("--dataset", required=True)
    ap.add_argument("--scene", required=True)
    ap.add_argument(
        "--extractors", nargs="+", default=["colmap_sift", "vit"],
        help="Extractors to compare (first is the baseline)",
    )
    args = ap.parse_args()

    from vit_colmap_tpu.utils.export import MetricsExporter

    exp = MetricsExporter(args.results_dir)
    results = {
        e: exp.load_metrics(args.dataset, args.scene, e) for e in args.extractors
    }
    missing = [e for e, r in results.items() if r is None]
    if missing:
        print(f"Missing metrics for: {missing}")
    present = [e for e in args.extractors if results[e] is not None]
    if len(present) < 2:
        print("Need at least two extractors with results to compare")
        return

    base = present[0]
    header = f"{'Metric':<26}" + "".join(f"{e:>16}" for e in present) + f"{'%diff':>10}{'winner':>14}"
    print(f"\n=== {args.dataset}/{args.scene} ===")
    print(header)
    print("-" * len(header))
    for key, label, higher_better in METRICS:
        vals = [_get(results[e], key) for e in present]
        if all(v is None for v in vals):
            continue
        vals = [float(v) if v is not None else float("nan") for v in vals]
        base_v = vals[0]
        other = vals[1]
        pct = (other - base_v) / base_v * 100 if base_v else float("inf")
        pick = max if higher_better else min
        winner = present[vals.index(pick(vals))]
        row = f"{label:<26}" + "".join(f"{v:>16.4g}" for v in vals)
        print(row + f"{pct:>+10.1f}{winner:>14}")


if __name__ == "__main__":
    main()
