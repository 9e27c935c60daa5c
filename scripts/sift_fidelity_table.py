#!/usr/bin/env python
"""JAX-SIFT vs cv2.SIFT fidelity table (VERDICT r2 item 7).

Measures mutual-NN match volume and MMA@3 on structured synthetic textures
warped by known homographies, across image sizes (incl. a DTU-like
1200x1600 frame) and pinned zoom factors.  The JAX SIFT
(``ops/sift.py``) is the framework's quality baseline — replacing the
reference's C++ SIFT at ``features/colmap_sift_extractor.py:38-43`` — so
its match volume relative to cv2 bounds every downstream comparison.

Prints ONE JSON line + a markdown table for docs/PERFORMANCE.md.

Usage: python scripts/sift_fidelity_table.py [--max-kp 1024]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from tests.test_sift_fidelity import (  # noqa: E402
    _cv2_features,
    _jax_features,
    _mma,
    _mutual_nn,
    _warp_pair,
)


def measure(size, seeds, scale=None, n=1024):
    rows = []
    for seed in seeds:
        img1, img2, H = _warp_pair(seed=seed, size=size, scale=scale)
        kc1, dc1 = _cv2_features(img1, n)
        kc2, dc2 = _cv2_features(img2, n)
        mc = _mutual_nn(dc1, dc2)
        kj1, dj1 = _jax_features(img1, n)
        kj2, dj2 = _jax_features(img2, n)
        mj = _mutual_nn(dj1, dj2)
        rows.append({
            "cv2_matches": len(mc),
            "jax_matches": len(mj),
            "cv2_mma3": _mma(kc1, kc2, mc, H),
            "jax_mma3": _mma(kj1, kj2, mj, H),
            "cv2_kp": len(kc1),
            "jax_kp": len(kj1),
        })
    agg = {k: float(np.mean([r[k] for r in rows])) for k in rows[0]}
    agg["volume_ratio"] = agg["jax_matches"] / max(agg["cv2_matches"], 1e-9)
    agg["mma_ratio"] = agg["jax_mma3"] / max(agg["cv2_mma3"], 1e-9)
    return agg


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--max-kp", type=int, default=1024)
    ap.add_argument("--seeds", default="0,1,2")
    args = ap.parse_args()
    seeds = [int(s) for s in args.seeds.split(",")]

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    cases = [
        ("240x320 moderate warp", (240, 320), None),
        ("480x640 moderate warp", (480, 640), None),
        ("1200x1600 DTU-like", (1200, 1600), None),
        ("240x320 zoom 0.8x", (240, 320), 0.8),
        ("240x320 zoom 1.25x", (240, 320), 1.25),
    ]
    results = []
    for name, size, scale in cases:
        t0 = time.perf_counter()
        agg = measure(size, seeds, scale=scale, n=args.max_kp)
        agg["case"] = name
        agg["wall_s"] = round(time.perf_counter() - t0, 1)
        results.append(agg)
        print(f"[{name}] vol {agg['volume_ratio']:.2f}x  "
              f"mma {agg['jax_mma3']:.3f} vs {agg['cv2_mma3']:.3f}  "
              f"matches {agg['jax_matches']:.0f} vs {agg['cv2_matches']:.0f}")

    md = [
        "| case | cv2 matches | jax matches | volume ratio | cv2 MMA@3 | "
        "jax MMA@3 |",
        "|---|---|---|---|---|---|",
    ]
    for r in results:
        md.append(
            f"| {r['case']} | {r['cv2_matches']:.0f} | {r['jax_matches']:.0f} "
            f"| {r['volume_ratio']:.2f}x | {r['cv2_mma3']:.3f} | "
            f"{r['jax_mma3']:.3f} |"
        )
    print("\n".join(md))

    worst_vol = min(r["volume_ratio"] for r in results)
    print(json.dumps({
        "metric": "jax_sift_min_match_volume_vs_cv2",
        "value": round(worst_vol, 3),
        "unit": "ratio (worst case)",
        "vs_baseline": None,
        "seeds": seeds,
        "max_kp": args.max_kp,
        "table": [{k: (round(v, 3) if isinstance(v, float) else v)
                   for k, v in r.items()} for r in results],
    }))


if __name__ == "__main__":
    main()
