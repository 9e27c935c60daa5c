#!/usr/bin/env python
"""A/B: bundle-adjustment LM linear solver — matrix-free CG vs Schur.

Times warm ``bundle_adjust_packed`` calls at the mapper's common bucket
shapes (local BA and DTU-50-scale global BA) for both solvers.  The CG
path runs ~cg_iters sequential tiny-kernel iterations per LM step; the
Schur path eliminates points with batched 3x3 inversions and solves the
dense reduced camera system in one factorization (sfm/bundle.py::
_schur_step).  Prints ONE JSON line for record_bench.py.

Relay measurement rules (docs/PERFORMANCE.md): single process, warm-up
call excluded, block_until_ready, best-of-N.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def make_problem(seed, n_img, n_cam, n_pts, n_obs, n_img_real, n_pts_real,
                 n_obs_real, noise=0.02):
    """Synthetic look-at scene packed to the given padded bucket shapes."""
    import jax.numpy as jnp

    from vit_colmap_tpu.sfm.bundle import (
        axis_angle_to_matrix,
        pack_ba_problem,
    )

    rng = np.random.default_rng(seed)
    X = rng.uniform([-1, -1, 3], [1, 1, 5], (n_pts_real, 3))
    K1 = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]], np.float32)
    cams = np.zeros((n_img, 6), np.float32)
    for i in range(n_img_real):
        ang = (i - n_img_real / 2) * 0.08
        cams[i, :3] = (0, ang, 0)
        cams[i, 3] = 2.0 * np.sin(ang)
        cams[i, 5] = 4.0 - 4.0 * np.cos(ang)
    obs_cam = rng.integers(0, n_img_real, n_obs_real).astype(np.int32)
    obs_pt = rng.integers(0, n_pts_real, n_obs_real).astype(np.int32)
    import jax

    R = np.asarray(axis_angle_to_matrix(jnp.asarray(cams[:n_img_real, :3])))
    Xc = np.einsum("nij,nj->ni", R[obs_cam], X[obs_pt]) + cams[obs_cam, 3:6]
    uv = Xc[:, :2] / Xc[:, 2:] * 500.0 + np.array([320.0, 240.0])
    uv += rng.normal(0, 0.3, uv.shape)

    cam_n = cams.copy()
    cam_n[1:n_img_real] += rng.normal(0, 0.005, (n_img_real - 1, 6)).astype(
        np.float32
    )
    pts = np.zeros((n_pts, 3), np.float32)
    pts[:n_pts_real] = X + rng.normal(0, noise, X.shape)
    obs_cam_p = np.zeros(n_obs, np.int32)
    obs_pt_p = np.zeros(n_obs, np.int32)
    obs_xy_p = np.zeros((n_obs, 2), np.float32)
    valid = np.zeros(n_obs, bool)
    obs_cam_p[:n_obs_real] = obs_cam
    obs_pt_p[:n_obs_real] = obs_pt
    obs_xy_p[:n_obs_real] = uv
    valid[:n_obs_real] = True
    fixed = np.ones(n_img, bool)
    fixed[1:n_img_real] = False
    fixed[0] = True
    Ks = np.tile(K1, (n_img, 1, 1))
    return pack_ba_problem(
        cam_n, np.zeros(n_cam, np.float32), np.zeros((n_cam, 2), np.float32),
        pts, obs_cam_p, obs_pt_p, obs_xy_p, valid, Ks,
        np.zeros(n_img, np.int32), fixed,
        np.ones(n_cam, bool), np.zeros((n_cam, 2), bool),
    )


def main() -> None:
    import jax

    from vit_colmap_tpu.sfm.bundle import bundle_adjust_packed
    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()
    dev = jax.devices()[0]
    shapes = {
        # (n_img, n_cam, n_pts, n_obs, real_img, real_pts, real_obs, iters, cg)
        "local": (16, 1, 1024, 8192, 7, 900, 7000, 12, 20),
        "global50": (64, 1, 1024, 16384, 50, 1000, 15000, 25, 50),
    }
    rows: dict = {}
    for name, (ni, nc, np_, no, ri, rp, ro, iters, cg) in shapes.items():
        fbuf, ibuf, bbuf = make_problem(3, ni, nc, np_, no, ri, rp, ro)
        for solver in ("cg", "schur"):
            def call():
                return bundle_adjust_packed(
                    fbuf, ibuf, bbuf, n_img=ni, n_cam=nc, n_pts=np_,
                    n_obs=no, iters=iters, cg_iters=cg, solver=solver,
                )

            # D2H materialization is the only trustworthy sync on the axon
            # relay (block_until_ready can return with work in flight —
            # docs/PERFORMANCE.md relay measurement rules).
            t0 = time.perf_counter()
            msr = float(np.asarray(call())[-1])
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                msr = float(np.asarray(call())[-1])
                times.append(time.perf_counter() - t0)
            rows[f"{name}_{solver}"] = {
                "warm_best_s": round(min(times), 4),
                "warm_med_s": round(sorted(times)[len(times) // 2], 4),
                "compile_plus_first_s": round(compile_s, 2),
                "final_msr": round(msr, 6),
            }
            print(name, solver, rows[f"{name}_{solver}"], flush=True)
    speedup = (
        rows["local_cg"]["warm_best_s"] / rows["local_schur"]["warm_best_s"]
    )
    print(json.dumps({
        "metric": "ba_local_schur_speedup_vs_cg",
        "value": round(speedup, 2),
        "unit": "x",
        "rows": rows,
        "device": str(dev.device_kind if hasattr(dev, "device_kind") else dev),
    }))


if __name__ == "__main__":
    main()
