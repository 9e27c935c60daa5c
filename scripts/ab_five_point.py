#!/usr/bin/env python
"""A/B: 5-point vs 8-point essential solver inside two-view verification.

VERDICT r2 item 6: the Nister-style 5-point solver (``sfm/five_point.py``)
is wired as the default calibrated solver but its end-to-end value was never
measured.  This harness runs the FULL verification program
(``ops/ransac.py::estimate_two_view_batched`` — E+F+H RANSAC and the COLMAP
config arbitration, the same program the pipeline runs per pair batch) on
synthetic calibrated two-view problems at descending inlier ratios and
compares, per solver:

* inlier recall (recovered inliers / ground-truth inliers),
* verified-pair rate (num_inliers >= min_num_inliers),
* CALIBRATED-config rate (the E estimate beat F in arbitration),
* median rotation error of the recovered relative pose.

The stated motivation is sample-success probability w^5 vs w^8 at low
inlier ratio w; this makes that difference a recorded number.  (The
reference consumes the resulting config enums downstream at
``/root/reference/vit_colmap/utils/metrics.py:120-132``.)

Prints ONE JSON line (record_bench-compatible) and a markdown table.

Usage: python scripts/ab_five_point.py [--trials 24] [--points 512]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_problem(rng, n_points, inlier_ratio, noise_px, w, h, focal):
    """Calibrated two-view pair: n_points pixel correspondences of which
    round(n*ratio) are projections of a rigid scene (+noise) and the rest
    are uniform-random outliers.  Returns (pts1, pts2, R_gt, inlier_mask)."""
    aa = rng.standard_normal(3) * 0.25
    th = float(np.linalg.norm(aa))
    k = aa / max(th, 1e-9)
    K_ = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * K_ + (1 - np.cos(th)) * K_ @ K_
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)

    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1.0]])
    n_inl = int(round(n_points * inlier_ratio))
    # Sample 3D points whose projections land in both images.
    pts1 = np.zeros((n_points, 2), np.float32)
    pts2 = np.zeros((n_points, 2), np.float32)
    got = 0
    while got < n_inl:
        X = np.stack([
            rng.uniform(-2, 2, 4 * n_inl),
            rng.uniform(-1.5, 1.5, 4 * n_inl),
            rng.uniform(3, 9, 4 * n_inl),
        ], axis=1)
        p1 = (K @ (X.T / X[:, 2])).T[:, :2]
        Xc = (R @ X.T).T + t
        ok_z = Xc[:, 2] > 0.1
        p2 = (K @ (Xc.T / np.maximum(Xc[:, 2], 1e-6))).T[:, :2]
        ok = (
            ok_z
            & (p1[:, 0] >= 0) & (p1[:, 0] < w) & (p1[:, 1] >= 0) & (p1[:, 1] < h)
            & (p2[:, 0] >= 0) & (p2[:, 0] < w) & (p2[:, 1] >= 0) & (p2[:, 1] < h)
        )
        take = min(n_inl - got, int(ok.sum()))
        pts1[got : got + take] = p1[ok][:take]
        pts2[got : got + take] = p2[ok][:take]
        got += take
    pts1[:n_inl] += rng.standard_normal((n_inl, 2)) * noise_px
    pts2[:n_inl] += rng.standard_normal((n_inl, 2)) * noise_px
    # Outliers: uniform in both frames.
    n_out = n_points - n_inl
    pts1[n_inl:] = np.stack(
        [rng.uniform(0, w, n_out), rng.uniform(0, h, n_out)], axis=1
    )
    pts2[n_inl:] = np.stack(
        [rng.uniform(0, w, n_out), rng.uniform(0, h, n_out)], axis=1
    )
    # Shuffle so the solver can't exploit ordering.
    perm = rng.permutation(n_points)
    inl_mask = np.zeros(n_points, bool)
    inl_mask[:n_inl] = True
    return pts1[perm], pts2[perm], R.astype(np.float32), inl_mask[perm], K


def rot_err_deg(R_gt, qvec):
    """Angle between GT rotation and the recovered qvec's rotation."""
    w_, x, y, z = qvec
    R_est = np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w_ * z), 2 * (x * z + w_ * y)],
        [2 * (x * y + w_ * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w_ * x)],
        [2 * (x * z - w_ * y), 2 * (y * z + w_ * x), 1 - 2 * (x * x + y * y)],
    ])
    c = (np.trace(R_gt.T @ R_est) - 1.0) / 2.0
    return float(np.degrees(np.arccos(np.clip(c, -1.0, 1.0))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--trials", type=int, default=24)
    ap.add_argument("--points", type=int, default=512)
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--noise-px", type=float, default=0.6)
    ap.add_argument("--ratios", default="0.9,0.7,0.5,0.3,0.2")
    ap.add_argument("--min-inliers", type=int, default=15)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.database.colmap_db import TWO_VIEW_CONFIG
    from vit_colmap_tpu.ops.ransac import estimate_two_view_batched
    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    w, h, focal = 640, 480, 600.0
    ratios = [float(r) for r in args.ratios.split(",")]
    rng = np.random.default_rng(0)

    rows = []
    for ratio in ratios:
        probs = [
            make_problem(rng, args.points, ratio, args.noise_px, w, h, focal)
            for _ in range(args.trials)
        ]
        p1 = jnp.asarray(np.stack([p[0] for p in probs]))
        p2 = jnp.asarray(np.stack([p[1] for p in probs]))
        mask = jnp.ones((args.trials, args.points), bool)
        K = jnp.asarray(np.stack([p[4] for p in probs]).astype(np.float32))
        calib = jnp.ones((args.trials,), bool)
        keys = jax.random.split(jax.random.PRNGKey(7), args.trials)

        for five_point in (False, True):
            t0 = time.perf_counter()
            res = estimate_two_view_batched(
                p1, p2, mask, K, K, calib, keys,
                iters=args.iters, max_error_px=4.0,
                min_num_inliers=args.min_inliers, five_point=five_point,
            )
            cfg = np.asarray(res.config)
            n_inl = np.asarray(res.num_inliers)
            inl_mask = np.asarray(res.inlier_mask)
            qv = np.asarray(res.qvec)
            wall = time.perf_counter() - t0

            gt_cnt = np.array([p[3].sum() for p in probs], np.float32)
            # Recall: recovered TRUE inliers (intersection with GT mask).
            true_rec = np.array([
                (inl_mask[i] & probs[i][3]).sum() for i in range(args.trials)
            ], np.float32)
            verified = n_inl >= args.min_inliers
            calibrated = cfg == TWO_VIEW_CONFIG["CALIBRATED"]
            rot = np.array([
                rot_err_deg(probs[i][2], qv[i]) for i in range(args.trials)
            ])
            rows.append({
                "inlier_ratio": ratio,
                "solver": "5pt" if five_point else "8pt",
                "inlier_recall": round(float((true_rec / gt_cnt).mean()), 4),
                "verified_rate": round(float(verified.mean()), 3),
                "calibrated_rate": round(float(calibrated.mean()), 3),
                "rot_err_med_deg": round(float(np.median(rot[verified])), 3)
                if verified.any() else None,
                "wall_s": round(wall, 2),
            })
            print(f"ratio={ratio} solver={rows[-1]['solver']}: {rows[-1]}")

    md = [
        "| inlier ratio | solver | inlier recall | verified | CALIBRATED | "
        "rot err (med) |",
        "|---|---|---|---|---|---|",
    ]
    for r in rows:
        md.append(
            f"| {r['inlier_ratio']} | {r['solver']} | {r['inlier_recall']:.3f} | "
            f"{r['verified_rate']:.2f} | {r['calibrated_rate']:.2f} | "
            f"{r['rot_err_med_deg']}° |"
        )
    print("\n".join(md))

    # Headline scalar: inlier-recall advantage of 5pt at the lowest ratio.
    low = ratios[-1]
    r5 = next(r for r in rows if r["inlier_ratio"] == low and r["solver"] == "5pt")
    r8 = next(r for r in rows if r["inlier_ratio"] == low and r["solver"] == "8pt")
    print(json.dumps({
        "metric": "five_point_recall_advantage_at_low_ratio",
        "value": round(r5["inlier_recall"] - r8["inlier_recall"], 4),
        "unit": f"recall delta @ w={low}",
        "vs_baseline": None,
        "trials": args.trials,
        "points": args.points,
        "iters": args.iters,
        "noise_px": args.noise_px,
        "table": rows,
    }))


if __name__ == "__main__":
    main()
