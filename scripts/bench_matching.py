#!/usr/bin/env python
"""Standalone exhaustive-matching benchmark (DTU-scale pair counts).

Measures the device matcher in isolation (BASELINE config 2/5 matching
surface): N images x K keypoints, all N(N-1)/2 pairs, Pallas kernel on TPU.

  python scripts/bench_matching.py --images 64 --keypoints 4096
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
    ap.add_argument("--images", type=int, default=64)
    ap.add_argument("--keypoints", type=int, default=4096)
    ap.add_argument("--dim", type=int, default=128)
    ap.add_argument("--pair-batch", type=int, default=16)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    from vit_colmap_tpu.ops.matching import get_pair_matcher, normalize_descriptors

    match_pairs = get_pair_matcher()
    rng = np.random.default_rng(0)
    desc = np.asarray(
        normalize_descriptors(
            rng.standard_normal(
                (args.images, args.keypoints, args.dim)
            ).astype(np.float32)
        )
    )
    v = np.ones((args.images, args.keypoints), bool)
    d_dev, v_dev = jnp.asarray(desc), jnp.asarray(v)
    pairs = [
        (i, j) for i in range(args.images) for j in range(i + 1, args.images)
    ]
    P = args.pair_batch
    idx0 = jnp.zeros((P,), jnp.int32)
    match_pairs(
        jnp.take(d_dev, idx0, 0), jnp.take(d_dev, idx0, 0),
        jnp.take(v_dev, idx0, 0), jnp.take(v_dev, idx0, 0),
    ).block_until_ready()

    t0 = time.perf_counter()
    outs = []
    for s in range(0, len(pairs), P):
        chunk = pairs[s : s + P]
        chunk = chunk + [(0, 0)] * (P - len(chunk))
        ii = jnp.asarray([c[0] for c in chunk], jnp.int32)
        jj = jnp.asarray([c[1] for c in chunk], jnp.int32)
        outs.append(
            match_pairs(
                jnp.take(d_dev, ii, 0), jnp.take(d_dev, jj, 0),
                jnp.take(v_dev, ii, 0), jnp.take(v_dev, jj, 0),
            )
        )
    for o in outs:
        o.block_until_ready()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "metric": "exhaustive_match_pairs_per_sec",
                "value": round(len(pairs) / dt, 1),
                "unit": "pairs/s",
                "num_pairs": len(pairs),
                "keypoints": args.keypoints,
                "seconds": round(dt, 3),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
