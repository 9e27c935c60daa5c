#!/usr/bin/env python
"""Aggregate exported metrics into comparison tables + a markdown report.

Parity with the reference ``scripts/aggregate_results.py:26-293``: loads all
metrics JSONs, builds a pandas comparison DataFrame, writes per-dataset
reports with per-scene pivot tables, relative-performance sections (each
extractor vs the SIFT baseline), cross-scene summary statistics
(mean ± std per extractor), and per-metric winner counts.
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

PIVOT_METRICS = [
    "keypoints_avg", "matched_pairs", "avg_inliers", "inlier_ratio",
    "registered", "registration_rate", "points3d", "track_len", "reproj_err",
]
RELATIVE_METRICS = [
    ("keypoints_avg", "Avg Keypoints/Image", True),
    ("matched_pairs", "Matched Pairs", True),
    ("avg_inliers", "Avg Inliers", True),
    ("inlier_ratio", "Inlier Ratio", True),
    ("registered", "Registered Images", True),
    ("registration_rate", "Registration Rate (%)", True),
    ("points3d", "Total 3D Points", True),
    ("track_len", "Avg Track Length", True),
    ("reproj_err", "Reprojection Error (px)", False),
]


def build_dataframe(results):
    import pandas as pd

    rows = []
    for r in results:
        rows.append(
            {
                "dataset": r.dataset,
                "scene": r.scene,
                "extractor": r.extractor_type,
                "timestamp": r.timestamp,
                "images": r.features.total_images,
                "keypoints_total": r.features.total_keypoints,
                "keypoints_avg": round(r.features.avg_keypoints_per_image, 1),
                "matched_pairs": r.matching.matched_pairs,
                "match_rate": round(r.matching.match_rate, 2),
                "verified_pairs": r.matching.verified_pairs,
                "raw_matches": r.matching.total_raw_matches,
                "avg_raw_matches": round(r.matching.avg_raw_matches, 1),
                "inlier_matches": r.matching.total_inlier_matches,
                "avg_inliers": round(r.matching.avg_inlier_matches, 1),
                "inlier_ratio": round(r.matching.inlier_ratio, 4),
                "num_recons": r.reconstruction.num_reconstructions
                if r.reconstruction else 0,
                "registered": r.reconstruction.registered_images
                if r.reconstruction else 0,
                "registration_rate": round(r.reconstruction.registration_rate, 2)
                if r.reconstruction else 0.0,
                "points3d": r.reconstruction.total_3d_points
                if r.reconstruction else 0,
                "track_len": round(r.reconstruction.avg_track_length, 2)
                if r.reconstruction else 0.0,
                "reproj_err": round(r.reconstruction.avg_reprojection_error, 3)
                if r.reconstruction else 0.0,
            }
        )
    return pd.DataFrame(rows)


def relative_section(lines, scene_df, baseline: str):
    """Per-extractor %delta vs the baseline (reference's 'Relative
    Performance (ViT vs SIFT)' section, generalized to N extractors)."""
    by_ex = scene_df.set_index("extractor")
    if baseline not in by_ex.index:
        return
    base = by_ex.loc[baseline]
    others = [e for e in by_ex.index if e != baseline]
    if not others:
        return
    lines.append(f"### Relative performance vs `{baseline}`")
    lines.append("")
    for ex in others:
        row = by_ex.loc[ex]
        lines.append(f"**{ex}**:")
        for key, label, _hi in RELATIVE_METRICS:
            b, v = float(base.get(key, 0) or 0), float(row.get(key, 0) or 0)
            if b == 0:
                continue
            pct = (v / b - 1) * 100
            lines.append(
                f"- {label}: {pct:+.1f}% ({ex}: {v:.2f}, {baseline}: {b:.2f})"
            )
        lines.append("")


def winner_counts(df, metrics=RELATIVE_METRICS):
    """Per-metric winner tally across (dataset, scene) groups."""
    counts: dict[str, int] = {}
    for (_, _), g in df.groupby(["dataset", "scene"]):
        by_ex = g.set_index("extractor")
        if len(by_ex) < 2:
            continue
        for key, _label, hi in metrics:
            vals = by_ex[key].astype(float)
            if vals.isna().all() or (vals == 0).all():
                continue
            winner = vals.idxmax() if hi else vals.idxmin()
            counts[winner] = counts.get(winner, 0) + 1
    return counts


def generate_report(df, out: Path, baseline: str) -> None:
    lines = ["# Metrics comparison report", ""]
    for dataset, dgroup in df.groupby("dataset"):
        lines.append(f"## Dataset: {dataset}")
        lines.append("")
        for scene, sgroup in dgroup.groupby("scene"):
            lines.append(f"### Scene: {scene}")
            lines.append("")
            pivot = sgroup.pivot_table(
                index="extractor",
                values=[m for m in PIVOT_METRICS if m in sgroup],
                aggfunc="first",
            )
            lines.append("```")
            lines.append(pivot.to_string())
            lines.append("```")
            lines.append("")
            relative_section(lines, sgroup, baseline)
        lines.append("#### Summary statistics across scenes")
        lines.append("")
        summary = dgroup.groupby("extractor").agg(
            {
                "keypoints_total": ["mean", "std"],
                "avg_inliers": ["mean", "std"],
                "inlier_ratio": ["mean", "std"],
                "registered": ["mean", "std"],
                "registration_rate": ["mean", "std"],
                "points3d": ["mean", "std"],
            }
        )
        lines.append("```")
        lines.append(summary.to_string())
        lines.append("```")
        lines.append("")
    counts = winner_counts(df)
    if counts:
        lines.append("## Per-metric winner counts (all datasets/scenes)")
        lines.append("")
        for ex, n in sorted(counts.items(), key=lambda kv: -kv[1]):
            lines.append(f"- **{ex}**: {n}")
        lines.append("")
    out.write_text("\n".join(lines))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--results-dir", type=Path, default=Path("data/results"))
    ap.add_argument("--dataset", default=None, help="Filter to one dataset")
    ap.add_argument("--baseline", default="colmap_sift",
                    help="Baseline extractor for relative sections "
                         "(falls back to 'sift' if absent)")
    ap.add_argument("--output", type=Path, default=None,
                    help="Markdown report path "
                         "(default <results>/comparison_report.md)")
    ap.add_argument("--csv", type=Path, default=None,
                    help="Also dump the full DataFrame as CSV")
    args = ap.parse_args()

    from vit_colmap_tpu.utils.export import MetricsExporter

    results = MetricsExporter(args.results_dir).load_all_metrics()
    if args.dataset:
        results = [r for r in results if r.dataset == args.dataset]
    if not results:
        print(f"No metrics found under {args.results_dir}")
        return
    df = build_dataframe(results)
    baseline = args.baseline
    if baseline not in set(df["extractor"]):
        baseline = "sift" if "sift" in set(df["extractor"]) else baseline
    print(df.drop(columns=["timestamp"]).to_string(index=False))

    out = args.output or args.results_dir / "comparison_report.md"
    generate_report(df, out, baseline)
    print(f"\nWrote {out}")
    if args.csv:
        df.to_csv(args.csv, index=False)
        print(f"Wrote {args.csv}")


if __name__ == "__main__":
    main()
