#!/usr/bin/env python
"""Training-step throughput benchmark (VERDICT r2 item 8: TRAINSTEP artifact).

Times the jitted DP train step (frozen vitb14 backbone + trainable heads,
``training/train_step.py``) on synthetic batches, the same step the
reference's single-GPU AMP loop performs at
``scripts/train_vit_features.py:154-177``.  Prints ONE JSON line with
steps/s and images/s (compile time excluded; data pipeline excluded — this
isolates the device step).

Usage:
  python scripts/bench_trainstep.py [--batch-size 2] [--steps 20]
  python scripts/record_bench.py --name TRAINSTEP --round 3 -- \
      python scripts/bench_trainstep.py
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
    ap.add_argument("--backbone", default="vitb14")
    ap.add_argument("--batch-size", type=int, default=2)
    ap.add_argument("--height", type=int, default=476)
    ap.add_argument("--width", type=int, default=644)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--top-k", type=int, default=256)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.models.dinov2 import make_backbone
    from vit_colmap_tpu.models.feature_model import (
        FeatureHeads,
        FeatureModelConfig,
    )
    from vit_colmap_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    backbone, bcfg = make_backbone(args.backbone)
    key = jax.random.key(0)
    bparams = backbone.init(key, jnp.zeros((1, 224, 224, 3)))
    heads = FeatureHeads(FeatureModelConfig(backbone=args.backbone))
    hparams = heads.init(key, jnp.zeros((1, 16, 16, bcfg.embed_dim)))
    optimizer = make_optimizer(3e-4, total_steps=1000)
    state = init_train_state(hparams, optimizer)
    step_fn, _ = make_train_step(
        backbone.apply, heads.apply, optimizer,
        batch_kwargs=dict(top_k=args.top_k),
    )

    rng = np.random.default_rng(0)
    B, H, W = args.batch_size, args.height, args.width
    batch = {
        "image1": jnp.asarray(
            rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
        ),
        "image2": jnp.asarray(
            rng.integers(0, 256, (B, H, W, 3), dtype=np.uint8)
        ),
        "H": jnp.asarray(
            np.broadcast_to(np.eye(3, dtype=np.float32), (B, 3, 3)).copy()
        ),
    }

    # Compile + warmup (2 steps so optimizer-state donation paths settle).
    t0 = time.perf_counter()
    state, m = step_fn(state, bparams, batch, jax.random.key(1))
    jax.block_until_ready(m["total_loss"])
    compile_s = time.perf_counter() - t0
    state, m = step_fn(state, bparams, batch, jax.random.key(2))
    jax.block_until_ready(m["total_loss"])

    t0 = time.perf_counter()
    for i in range(args.steps):
        state, m = step_fn(state, bparams, batch, jax.random.key(3 + i))
    jax.block_until_ready(m["total_loss"])
    dt = time.perf_counter() - t0

    steps_per_sec = args.steps / dt
    print(
        json.dumps(
            {
                "metric": "train_steps_per_sec",
                "value": round(steps_per_sec, 4),
                "unit": "steps/s",
                "s_per_step": round(dt / args.steps, 4),
                "images_per_sec": round(steps_per_sec * 2 * B, 3),
                "batch_size": B,
                "image_size": [H, W],
                "backbone": args.backbone,
                "compile_s": round(compile_s, 1),
                "final_loss": float(m["total_loss"]),
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
