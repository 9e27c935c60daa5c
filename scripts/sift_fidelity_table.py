#!/usr/bin/env python
"""JAX-SIFT vs cv2.SIFT fidelity table across textures, sizes and scales.

VERDICT r2 item 7: the fidelity gate lived on ONE 240x320 texture with a
soft (>= 0.5x cv2) match-volume bar.  This harness measures the same
protocol as tests/test_sift_fidelity.py on a grid of frame sizes (up to a
DTU-like 1200x1600), random textures and pinned zoom factors, and prints a
markdown table plus one JSON line for scripts/record_bench.py.

The quality bake-off leans on JAX-SIFT as its baseline extractor
(replaces /root/reference/vit_colmap/features/colmap_sift_extractor.py:38-43),
so its match volume and MMA must track the cv2 reference closely.

Run on TPU as a measurement-queue stage (one TPU process at a time).
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import cv2  # noqa: E402

from tests.test_sift_fidelity import (  # noqa: E402  (shared protocol)
    _cv2_features,
    _jax_features,
    _mma,
    _mutual_nn,
    _warp_pair,
)

# (label, (h, w), seed, pinned scale or None, max keypoints)
CASES = [
    ("240x320/t0", (240, 320), 0, None, 1024),
    ("240x320/t1", (240, 320), 1, None, 1024),
    ("240x320/t2", (240, 320), 2, None, 1024),
    ("480x640/t3", (480, 640), 3, None, 2048),
    ("480x640/zoom0.7", (480, 640), 4, 0.7, 2048),
    ("480x640/zoom1.4", (480, 640), 5, 1.4, 2048),
    ("768x1024/t6", (768, 1024), 6, None, 4096),
    ("1200x1600/DTU-like", (1200, 1600), 7, None, 4096),
]


def run_case(label, size, seed, scale, n):
    img1, img2, H = _warp_pair(seed=seed, size=size, scale=scale)
    row = {"case": label, "h": size[0], "w": size[1], "n_feats": n}
    for name, feats in (("cv2", _cv2_features), ("jax", _jax_features)):
        t0 = time.perf_counter()
        k1, d1 = feats(img1, n=n)
        k2, d2 = feats(img2, n=n)
        dt = time.perf_counter() - t0
        m = _mutual_nn(d1, d2)
        row[f"{name}_kpts"] = int((len(k1) + len(k2)) / 2)
        row[f"{name}_matches"] = int(len(m))
        row[f"{name}_mma3"] = round(_mma(k1, k2, m, H, t=3.0), 4)
        row[f"{name}_wall_s"] = round(dt, 2)
    row["match_ratio"] = round(
        row["jax_matches"] / max(row["cv2_matches"], 1), 3
    )
    row["mma_ratio"] = round(
        row["jax_mma3"] / max(row["cv2_mma3"], 1e-9), 3
    )
    return row


def main() -> None:
    rows = [run_case(*case) for case in CASES]

    hdr = ("| case | cv2 kpts | jax kpts | cv2 matches | jax matches | "
           "vol ratio | cv2 MMA@3 | jax MMA@3 | MMA ratio |")
    print(hdr)
    print("|" + "---|" * 9)
    for r in rows:
        print(
            f"| {r['case']} | {r['cv2_kpts']} | {r['jax_kpts']} | "
            f"{r['cv2_matches']} | {r['jax_matches']} | {r['match_ratio']} | "
            f"{r['cv2_mma3']:.3f} | {r['jax_mma3']:.3f} | {r['mma_ratio']} |"
        )

    vol = float(np.mean([r["match_ratio"] for r in rows]))
    mma = float(np.mean([r["mma_ratio"] for r in rows]))
    print(json.dumps({
        "metric": "sift_fidelity_match_volume_ratio",
        "value": round(vol, 4),
        "unit": "jax/cv2 mutual-NN matches (mean over cases)",
        "vs_baseline": round(mma, 4),
        "mma_ratio_mean": round(mma, 4),
        "rows": rows,
        "cv2_version": cv2.__version__,
    }))


if __name__ == "__main__":
    main()
