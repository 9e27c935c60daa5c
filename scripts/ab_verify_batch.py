#!/usr/bin/env python
"""Single-process A/B of the verification batch size (epoch-free).

The relay's bandwidth swings ~1.5x between runs minutes apart, so
cross-run comparisons of the verification wall-clock confound batch-size
effects with relay weather.  This alternates VB=16 and VB=64 sweeps over
the SAME pairs in one process (interleaved, 2 rounds each), reproducing
pipeline/match.py's dispatch loop exactly (host assembly + H2D + async
dispatch + D2H readback), and reports seconds per full 1225-pair pass.

Usage: python scripts/ab_verify_batch.py [--db /tmp/bench_recon_r3i/db.db]
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

from scripts.profile_verification import load_batches  # noqa: E402


def run_pass(pairs_np, vb, k_max, iters, chunk):
    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.ops.ransac import estimate_two_view_batched

    key = jax.random.key(0)
    t0 = time.perf_counter()
    pending = []
    n = len(pairs_np[0])
    for start in range(0, n, vb):
        end = min(start + vb, n)
        bsz = end - start
        pts1 = np.zeros((vb, k_max, 2), np.float32)
        pts2 = np.zeros((vb, k_max, 2), np.float32)
        mask = np.zeros((vb, k_max), bool)
        K1 = np.tile(np.eye(3, dtype=np.float32), (vb, 1, 1))
        K2 = K1.copy()
        calib = np.ones(vb, bool)
        pts1[:bsz] = pairs_np[0][start:end]
        pts2[:bsz] = pairs_np[1][start:end]
        mask[:bsz] = pairs_np[2][start:end]
        K1[:bsz] = pairs_np[3][start:end]
        K2[:bsz] = pairs_np[4][start:end]
        calib[:bsz] = pairs_np[5][start:end]
        keys = jax.random.split(jax.random.fold_in(key, start), vb)
        res = estimate_two_view_batched(
            jnp.asarray(pts1), jnp.asarray(pts2), jnp.asarray(mask),
            jnp.asarray(K1), jnp.asarray(K2), jnp.asarray(calib), keys,
            iters=iters, max_error_px=4.0, min_num_inliers=15,
            confidence=0.999, five_point=True, five_point_chunk=chunk,
        )
        for a in res:
            if hasattr(a, "copy_to_host_async"):
                a.copy_to_host_async()
        pending.append(res)
    total_inl = 0
    for res in pending:
        total_inl += int(np.asarray(res.num_inliers).sum())
    return time.perf_counter() - t0, total_inl


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/tmp/bench_recon_r3i/db.db")
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--chunk", type=int, default=16)
    ap.add_argument("--rounds", type=int, default=2)
    args = ap.parse_args()

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    import jax

    # All pairs, pipeline order (sorted by match count like match.py).
    batches, k_max = load_batches(args.db, 1, 10**6, hard=True)
    stacked = [
        np.concatenate([b[i] for b in batches], axis=0) for i in range(6)
    ]
    n = len(stacked[0])
    print(f"{n} pairs, k_max={k_max}, device={jax.devices()[0]}",
          file=sys.stderr)

    results = {16: [], 64: []}
    inl = {}
    for r in range(args.rounds):
        for vb in (16, 64):
            s, total_inl = run_pass(stacked, vb, k_max, args.iters, args.chunk)
            results[vb].append(round(s, 2))
            inl[vb] = total_inl
            print(f"round {r} VB={vb}: {s:.2f}s  inliers={total_inl}",
                  file=sys.stderr)

    print(json.dumps({
        "metric": "verify_pass_seconds_vb64",
        "value": min(results[64]),
        "unit": "s",
        "vb16_s": results[16],
        "vb64_s": results[64],
        "inliers": inl,
        "pairs": n,
        "k_max": k_max,
        "chunk": args.chunk,
        "device": str(jax.devices()[0]),
    }))


if __name__ == "__main__":
    main()
