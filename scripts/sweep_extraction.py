#!/usr/bin/env python
"""Device-resident extraction throughput sweep (VERDICT r2 item 4).

Sweeps image_batch (and optionally the int8 MXU path) for the fused
vitb14 extraction program at the reference's HPatches resolution
(1190x1596, ``/root/reference/vit_colmap/features/vit_extractor.py:729-762``
hot loop), measured as ONE dispatched ``fori_loop`` on device
(``ViTExtractor.device_extract_looped``) so relay launch latency and the
host wire are excluded.  Goal: find the honest device ceiling and the best
batch size (r2 shipped batch 2 because the HOST wire pipelines best there;
the device-only optimum may differ).

Prints one JSON line per config + a final summary JSON line (best config),
so record_bench.py captures the summary.

Usage:
  python scripts/sweep_extraction.py [--batches 2,4,8] [--int8]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def measure(backbone, h, w, batch, quantize, reps, max_kp, attn="fixedmax"):
    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.features.vit_extractor import ViTExtractor
    from vit_colmap_tpu.ops.transfer import pack_batch_yuv420

    ex = ViTExtractor(
        backbone=backbone,
        max_keypoints=max_kp,
        image_batch=batch,
        transfer_format="yuv420",
        quantize=quantize,
        attn_impl=attn,
    )
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 256, (batch, h, w, 3), dtype=np.uint8)
    # One host extract to fit PCA + compile the fused program.
    ex.extract_batch(imgs)
    staged = jnp.asarray(pack_batch_yuv420(imgs))
    # Pipelined back-to-back dispatches (production dispatch pattern); the
    # earlier fori_loop variant measured ~15x below the same body as
    # standalone dispatches (XLA while-loop pessimization, EXTRACT_SWEEP_r3
    # first record) and under-reported the device ceiling.
    t = min(ex.device_extract_pipelined(staged, reps) for _ in range(3))
    del ex
    jax.clear_caches()
    return reps * batch / t


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="vitb14")
    ap.add_argument("--height", type=int, default=1190)
    ap.add_argument("--width", type=int, default=1596)
    ap.add_argument("--batches", default="2,4,8")
    ap.add_argument("--reps", type=int, default=12)
    ap.add_argument("--max-keypoints", type=int, default=4096)
    ap.add_argument("--int8", action="store_true",
                    help="also sweep the int8 QKVO/MLP path")
    ap.add_argument("--attns", default="fixedmax",
                    help="comma list of attention impls to A/B (fixedmax,xla,flash)")
    args = ap.parse_args()

    import jax

    rows = []
    for batch in [int(b) for b in args.batches.split(",")]:
      for attn in args.attns.split(","):
        for quantize in (["none", "int8"] if args.int8 else ["none"]):
            try:
                ips = measure(
                    args.backbone, args.height, args.width, batch,
                    quantize, max(args.reps // batch, 3), args.max_keypoints,
                    attn=attn,
                )
            except Exception as e:
                print(json.dumps({
                    "batch": batch, "quantize": quantize, "attn": attn,
                    "error": f"{type(e).__name__}: {e}",
                }))
                continue
            row = {"batch": batch, "quantize": quantize, "attn": attn,
                   "images_per_sec_device": round(ips, 3)}
            rows.append(row)
            print(json.dumps(row), flush=True)

    if not rows:
        raise SystemExit("no config succeeded")
    best = max(rows, key=lambda r: r["images_per_sec_device"])
    print(json.dumps({
        "metric": "images_per_sec_extract_device_best",
        "value": best["images_per_sec_device"],
        "unit": "img/s",
        "best_batch": best["batch"],
        "best_quantize": best["quantize"],
        "best_attn": best.get("attn", "fixedmax"),
        "rows": rows,
        "backbone": args.backbone,
        "resolution": f"{args.height}x{args.width}",
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
