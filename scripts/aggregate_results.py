#!/usr/bin/env python
"""Aggregate exported metrics into comparison tables + a markdown report.

Parity with the reference ``scripts/aggregate_results.py:26-293``: loads all
metrics JSONs, builds a pandas comparison DataFrame, per-dataset pivots, and
writes ``comparison_report.md``.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def build_dataframe(results):
    import pandas as pd

    rows = []
    for r in results:
        rows.append(
            {
                "dataset": r.dataset,
                "scene": r.scene,
                "extractor": r.extractor_type,
                "images": r.features.total_images,
                "keypoints_avg": round(r.features.avg_keypoints_per_image, 1),
                "matched_pairs": r.matching.matched_pairs,
                "verified_pairs": r.matching.verified_pairs,
                "raw_matches": r.matching.total_raw_matches,
                "inlier_matches": r.matching.total_inlier_matches,
                "inlier_ratio": round(r.matching.inlier_ratio, 4),
                "registered": r.reconstruction.registered_images
                if r.reconstruction else 0,
                "points3d": r.reconstruction.total_3d_points
                if r.reconstruction else 0,
                "track_len": round(r.reconstruction.avg_track_length, 2)
                if r.reconstruction else 0,
                "reproj_err": round(r.reconstruction.avg_reprojection_error, 3)
                if r.reconstruction else 0,
            }
        )
    return pd.DataFrame(rows)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", type=Path, default=Path("data/results"))
    ap.add_argument("--output", type=Path, default=None,
                    help="Markdown report path (default <results>/comparison_report.md)")
    args = ap.parse_args()

    from vit_colmap_tpu.utils.export import MetricsExporter

    results = MetricsExporter(args.results_dir).load_all_metrics()
    if not results:
        print(f"No metrics found under {args.results_dir}")
        return
    df = build_dataframe(results)
    print(df.to_string(index=False))

    out = args.output or args.results_dir / "comparison_report.md"
    lines = ["# Metrics comparison report", ""]
    for dataset, group in df.groupby("dataset"):
        lines.append(f"## {dataset}")
        lines.append("")
        pivot = group.pivot_table(
            index="scene",
            columns="extractor",
            values=["inlier_ratio", "points3d", "registered"],
            aggfunc="first",
        )
        lines.append(pivot.to_markdown())
        lines.append("")
        lines.append(group.to_markdown(index=False))
        lines.append("")
    out.write_text("\n".join(lines))
    print(f"\nWrote {out}")


if __name__ == "__main__":
    main()
