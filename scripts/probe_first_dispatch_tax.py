#!/usr/bin/env python
"""Quantify the per-program first-dispatch tax on the relay.

Dispatches the fused SIFT extraction program 4 times (distinct inputs,
D2H-materialized sync) and reports first vs steady-state wall time.
Round-3 finding: 65.7 s first dispatch vs 1.0 s steady-state at
(2, 480, 640) with a persistent-cache COMPILE hit — the tax is the
relay/service-side program load, not compilation, and a cold single-scene
process pays it once per program (extraction, verification, each mapper
bucket).  Verification hides it behind extraction via prewarm-execute;
extraction itself is stage 1 and has nothing to hide behind — the fix is
process reuse across scenes (serving mode).

Usage: python scripts/probe_first_dispatch_tax.py
Prints one JSON line (record_bench-compatible).
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--reps", type=int, default=4)
    ap.add_argument("--uint8", action="store_true",
                    help="uint8 wire inputs — the EXACT program "
                         "SiftExtractor dispatches in the recon pipeline "
                         "(float32 is a different executable)")
    args = ap.parse_args()

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    from vit_colmap_tpu.ops.sift import extract_sift

    rng = np.random.default_rng(0)
    times = []
    for i in range(args.reps):
        gray = rng.random((args.batch, 480, 640), np.float32) * (0.5 + 0.1 * i)
        if args.uint8:
            gray = (gray * 255).astype(np.uint8)
        t0 = time.perf_counter()
        kp, _ = extract_sift(
            gray, max_keypoints=2048, num_octaves=4,
            contrast_thresh=0.02 / 3, num_orientations=2,
        )
        for k in kp:
            np.asarray(k)
        times.append(round(time.perf_counter() - t0, 2))
        print(f"dispatch {i}: {times[-1]:.2f}s", file=sys.stderr)

    print(json.dumps({
        "metric": "first_dispatch_tax_s",
        "value": round(times[0] - min(times[1:]), 2),
        "unit": "s",
        "dispatch_times_s": times,
        "dispatch_steady_s": round(min(times[1:]), 2),
        "program": f"fused SIFT extraction ({args.batch}, 480, 640) "
                   f"{'uint8' if args.uint8 else 'f32'}",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
