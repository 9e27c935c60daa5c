#!/usr/bin/env python
"""Decompose the headline extraction wall into host-pack / H2D / compute.

bench.py r3: extraction wall 0.83 s for 8 images vs 0.57 s device-resident
(14.05 img/s) — ~0.26 s is lost to the host side.  This probe times each
stage of the SAME loop separately to show where:

  pack     — RGB -> yuv420c4 on host (cv2 + numpy nibble pack)
  h2d      — jnp.asarray of the packed wire bytes (async dispatch; the
             timed section includes only the call, the copy itself rides
             the relay concurrently)
  dispatch — fused-program dispatch call overhead
  e2e      — the bench.py-style pipelined loop (same as the headline)
  e2e_prepacked — the loop with pack hoisted out (isolates pack's
             serial contribution to the pipeline)

Usage: python scripts/probe_extract_wall.py [--images 8]
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
    ap.add_argument("--images", type=int, default=8)
    ap.add_argument("--height", type=int, default=1190)
    ap.add_argument("--width", type=int, default=1596)
    ap.add_argument("--image-batch", type=int, default=2)
    args = ap.parse_args()

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.features.vit_extractor import ViTExtractor
    from vit_colmap_tpu.ops.transfer import pack_batch_yuv420_c4

    rng = np.random.default_rng(0)
    base = rng.integers(
        0, 255, (args.height // 8, args.width // 8, 3), dtype=np.uint8
    )
    imgs = np.zeros((args.images, args.height, args.width, 3), np.uint8)
    for i in range(args.images):
        shifted = np.roll(base, i * 2, axis=1)
        imgs[i] = np.asarray(
            jax.image.resize(
                jnp.asarray(shifted, jnp.float32),
                (args.height, args.width, 3), "bilinear",
            )
        ).astype(np.uint8)

    B = args.image_batch
    ex = ViTExtractor(
        backbone="vitb14", max_keypoints=4096, image_batch=B,
        transfer_format="yuv420c4",
    )
    # Warm both programs (PCA-fit + fused).
    _ = ex.extract_batch(imgs[:B])
    _ = [np.asarray(a) for a in ex.extract_batch_async(imgs[:B])]

    out = {}

    # --- pack cost (pure host)
    t0 = time.perf_counter()
    packed = [
        pack_batch_yuv420_c4(imgs[s : s + B])
        for s in range(0, args.images, B)
    ]
    out["pack_s"] = time.perf_counter() - t0

    # --- H2D call overhead for the packed batches (async: timing the call,
    # not the copy; the final materialization shows total wire+compute).
    t0 = time.perf_counter()
    staged = [jnp.asarray(p) for p in packed]
    out["h2d_call_s"] = time.perf_counter() - t0
    t0 = time.perf_counter()
    for s in staged:
        np.asarray(s)  # D2H round-trip forces the upload to have finished
    out["h2d_drain_roundtrip_s"] = time.perf_counter() - t0

    def run_e2e(prepacked: bool) -> float:
        t0 = time.perf_counter()
        pend = []
        for k, s in enumerate(range(0, args.images, B)):
            src = packed[k] if prepacked else imgs[s : s + B]
            pend.append(ex.extract_batch_async(src, packed=prepacked))
        for outs in pend:
            for a in outs:
                if hasattr(a, "copy_to_host_async"):
                    a.copy_to_host_async()
        # Materialize the last descriptor array = full drain.
        for outs in pend:
            np.asarray(outs[3])
        return time.perf_counter() - t0

    # NOTE: prepacked path passes the c4 wire format with packed=True —
    # extract_batch_async skips host packing (it treats input as packed
    # I420 only for yuv420; for c4 the packed flag short-circuits the same
    # branch since the array is already wire-shaped).
    out["e2e_s"] = min(run_e2e(False) for _ in range(3))
    out["e2e_prepacked_s"] = min(run_e2e(True) for _ in range(3))
    out["img_per_s_e2e"] = args.images / out["e2e_s"]
    out["img_per_s_prepacked"] = args.images / out["e2e_prepacked_s"]

    # --- device-resident reference
    staged0 = jnp.asarray(packed[0])
    reps = 3 * max(args.images // B, 1)
    t_dev = min(ex.device_extract_pipelined(staged0, reps) for _ in range(3))
    out["img_per_s_device"] = reps * B / t_dev

    wire_bytes = sum(p.nbytes for p in packed)
    out["wire_mb"] = wire_bytes / 1e6
    # NOTE: the drain materializes the arrays back to host, so this is an
    # up+down ROUND TRIP over the wire bytes — a lower bound on each
    # direction's bandwidth, not the H2D rate itself.
    out["wire_mbps_roundtrip"] = 2 * wire_bytes / 1e6 / max(
        out["h2d_drain_roundtrip_s"], 1e-9
    )
    print(json.dumps({
        "metric": "extract_wall_decomposition",
        "value": round(out["img_per_s_e2e"], 3),
        "unit": "img/s",
        "vs_baseline": None,
        **{k: (round(v, 4) if isinstance(v, float) else v)
           for k, v in out.items()},
        "num_images": args.images,
        "image_batch": B,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
