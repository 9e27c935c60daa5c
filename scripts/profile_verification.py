#!/usr/bin/env python
"""Decompose two-view verification wall-clock on the current backend.

Round-3 finding: DTU-50 warm verification costs ~315 s on the v5e relay
(~4.1 s per 16-pair batch) while the SAME program at the SAME shapes runs
~110 ms/batch on a 1-core CPU — a ~40x TPU-specific execution
pessimization, not compile time (persistent-cache hits confirmed) and not
early-exit failure (all lanes sit at inlier ratio ~0.95).

This script pins down WHERE: it loads real pairs from a reconstruction
DB, then times (warm, best-of-3):

  1. full ``estimate_two_view_batched`` with five_point=True (the prod path)
  2. full with five_point=False
  3. F-RANSAC alone      (8-point, single-model chunks)
  4. H-RANSAC alone      (4-point, single-model chunks)
  5. E-RANSAC 8pt alone
  6. E-RANSAC 5pt alone  (multi-candidate chunks, Nister resultant body)

Usage: python scripts/profile_verification.py \
          [--db /tmp/bench_recon_r3d_warm/db.db] [--batches 4] [--vb 16]
Prints one JSON line (record_bench-compatible).
"""

from __future__ import annotations

import argparse
import json
import sqlite3
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def load_batches(db_path: str, vb: int, n_batches: int, hard: bool = False):
    con = sqlite3.connect(db_path)
    kp = {}
    for iid, rows, cols, data in con.execute(
        "SELECT image_id, rows, cols, data FROM keypoints"
    ):
        a = np.frombuffer(data, np.float32).reshape(rows, cols)
        kp[iid] = a[:, :2].copy()
    cams = {}
    for cid, model, w, h, params, prior in con.execute(
        "SELECT camera_id, model, width, height, params, prior_focal_length"
        " FROM cameras"
    ):
        p = np.frombuffer(params, np.float64)
        cams[cid] = (p, bool(prior))
    img_cam = dict(con.execute("SELECT image_id, camera_id FROM images"))

    def Kmat(cid):
        p, _ = cams[cid]
        if len(p) == 3:
            return np.array(
                [[p[0], 0, p[1]], [0, p[0], p[2]], [0, 0, 1]], np.float32
            )
        return np.array(
            [[p[0], 0, p[2]], [0, p[1], p[3]], [0, 0, 1]], np.float32
        )

    pairs = []
    for pid, rows, data in con.execute(
        "SELECT pair_id, rows, data FROM matches"
    ):
        if rows < 8:
            continue
        m = np.frombuffer(data, np.uint32).reshape(rows, 2).astype(np.int64)
        pairs.append((int(pid // 2147483647), int(pid % 2147483647), m))
    if hard:
        # Hardest pairs first (fewest raw matches — the pipeline's own
        # difficulty proxy).  Without this the profiler sees only the
        # easy image-1-adjacent pairs and misses the lockstep-dominated
        # batches that set the verification wall-clock.
        pairs.sort(key=lambda t: len(t[2]))
    k_max = 1 << int(np.ceil(np.log2(max(len(m) for *_, m in pairs))))
    batches = []
    for start in range(0, min(len(pairs), vb * n_batches), vb):
        chunk = pairs[start : start + vb]
        pts1 = np.zeros((vb, k_max, 2), np.float32)
        pts2 = np.zeros((vb, k_max, 2), np.float32)
        mask = np.zeros((vb, k_max), bool)
        K1 = np.tile(np.eye(3, dtype=np.float32), (vb, 1, 1))
        K2 = K1.copy()
        calib = np.zeros(vb, bool)
        for b, (i, j, m) in enumerate(chunk):
            pts1[b, : len(m)] = kp[i][m[:, 0]]
            pts2[b, : len(m)] = kp[j][m[:, 1]]
            mask[b, : len(m)] = True
            K1[b] = Kmat(img_cam[i])
            K2[b] = Kmat(img_cam[j])
            calib[b] = cams[img_cam[i]][1] and cams[img_cam[j]][1]
        batches.append((pts1, pts2, mask, K1, K2, calib))
    return batches, k_max


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--db", default="/tmp/bench_recon_r3d_warm/db.db")
    ap.add_argument("--vb", type=int, default=16)
    ap.add_argument("--batches", type=int, default=4)
    ap.add_argument("--iters", type=int, default=1024)
    ap.add_argument("--hard", action="store_true",
                    help="profile the hardest (fewest-match) pairs")
    args = ap.parse_args()

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp
    from functools import partial

    from vit_colmap_tpu.ops import ransac as R
    from vit_colmap_tpu.sfm import geometry as geom
    from vit_colmap_tpu.sfm.five_point import fit_essential_5pt

    batches, k_max = load_batches(args.db, args.vb, args.batches, args.hard)
    print(
        f"{len(batches)} batches of {args.vb} pairs, k_max={k_max}, "
        f"device={jax.devices()[0]}",
        file=sys.stderr,
    )
    key = jax.random.key(0)
    dev_batches = [tuple(jnp.asarray(x) for x in b) for b in batches]
    _ctr = [0]

    def fresh_keys():
        # Distinct keys per timed dispatch (as the pipeline uses): repeated
        # identical-input dispatches were observed to under-report by ~1000x
        # on CPU (0.1 ms/batch for a program that costs ~100 ms fresh).
        _ctr[0] += 1
        return jax.random.split(jax.random.fold_in(key, _ctr[0]), args.vb)

    def sync(out):
        # The ONLY trustworthy synchronization on the axon relay is D2H
        # materialization: jax.block_until_ready has been observed to
        # return immediately (phantom 0.1-0.6 ms "timings" for programs
        # that demonstrably cost 100+ ms) — apparently racy around
        # in-flight remote compiles/executions.  np.asarray forces the
        # device to finish and ship the bytes.
        return np.asarray(out).sum()

    def timed(label, per_batch_fn):
        sync(per_batch_fn(dev_batches[0], fresh_keys()))
        ts = []
        for sweep in range(3):
            t0 = time.perf_counter()
            per_call = []
            for b in dev_batches:
                # Sync per dispatch: per-batch cost, not pipelined cost.
                c0 = time.perf_counter()
                sync(per_batch_fn(b, fresh_keys()))
                per_call.append((time.perf_counter() - c0) * 1e3)
            ts.append((time.perf_counter() - t0) / len(dev_batches))
            if sweep == 0:
                print(
                    f"  [{label}] sweep0 per-call ms: "
                    + " ".join(f"{c:.1f}" for c in per_call),
                    file=sys.stderr,
                )
        ms = min(ts) * 1e3
        print(f"{label:28s} {ms:9.1f} ms/batch", file=sys.stderr)
        return ms

    rows = {}

    def full(b, ks, fp, fpc=32):
        p1, p2, m, k1, k2, cal = b
        return R.estimate_two_view_batched(
            p1, p2, m, k1, k2, cal, ks,
            iters=args.iters, max_error_px=4.0, min_num_inliers=15,
            confidence=0.999, five_point=fp, five_point_chunk=fpc,
        ).num_inliers

    rows["full_5pt"] = timed(
        "full (5pt essential)", lambda b, ks: full(b, ks, True)
    )
    rows["full_5pt_c16"] = timed(
        "full (5pt, chunk 16)", lambda b, ks: full(b, ks, True, 16)
    )
    rows["full_5pt_c8"] = timed(
        "full (5pt, chunk 8)", lambda b, ks: full(b, ks, True, 8)
    )
    rows["full_8pt"] = timed(
        "full (8pt essential)", lambda b, ks: full(b, ks, False)
    )

    # Component RANSACs at identical shapes (vmapped like the full program).
    thresh_sq = jnp.float32(16.0)

    @jax.jit
    def f_only(p1, p2, m, ks):
        return jax.vmap(
            lambda a, b, c, k: R._ransac_model(
                geom.fit_fundamental, geom.sampson_error, a, b, c, k,
                args.iters, 8, thresh_sq, 0.999,
            )[2]
        )(p1, p2, m, ks)

    @jax.jit
    def h_only(p1, p2, m, ks):
        return jax.vmap(
            lambda a, b, c, k: R._ransac_model(
                geom.fit_homography, geom.homography_error, a, b, c, k,
                args.iters, 4, thresh_sq, 0.999,
            )[2]
        )(p1, p2, m, ks)

    def norm_all(K, pts):
        f = jnp.stack([K[:, 0, 0], K[:, 1, 1]], -1)[:, None, :]
        c = jnp.stack([K[:, 0, 2], K[:, 1, 2]], -1)[:, None, :]
        return (pts - c) / f

    tn = thresh_sq / jnp.float32(600.0**2)

    @jax.jit
    def e8_only(p1, p2, m, ks):
        return jax.vmap(
            lambda a, b, c, k: R._ransac_model(
                geom.fit_essential, geom.sampson_error, a, b, c, k,
                args.iters, 8, tn, 0.999,
            )[2]
        )(p1, p2, m, ks)

    @jax.jit
    def e5_only(p1, p2, m, ks):
        return jax.vmap(
            lambda a, b, c, k: R._ransac_model_multi(
                fit_essential_5pt, geom.fit_essential, geom.sampson_error,
                a, b, c, k, args.iters, 5, tn, 0.999,
            )[2]
        )(p1, p2, m, ks)

    def pix(fn):
        return lambda b, ks: fn(b[0], b[1], b[2], ks)

    def normed(fn):
        def run(b, ks):
            p1, p2, m, k1, k2, _ = b
            return fn(norm_all(k1, p1), norm_all(k2, p2), m, ks)

        return run

    rows["F_8pt"] = timed("F-RANSAC (8pt)", pix(f_only))
    rows["H_4pt"] = timed("H-RANSAC (4pt)", pix(h_only))
    rows["E_8pt"] = timed("E-RANSAC (8pt)", normed(e8_only))
    rows["E_5pt"] = timed("E-RANSAC (5pt)", normed(e5_only))

    print(
        json.dumps(
            {
                "metric": "verification_ms_per_batch16",
                "value": round(rows["full_5pt"], 1),
                "unit": "ms",
                "rows": {k: round(v, 1) for k, v in rows.items()},
                "k_max": k_max,
                "vb": args.vb,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
