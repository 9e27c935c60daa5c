#!/usr/bin/env python
"""Sub-stage timings of the 5-point essential solver on the current backend.

Round-3 context: DTU-50 verification spends ~4 s per 16-pair batch in the
vmapped RANSAC program; the E-5pt component is the heaviest sub-RANSAC
(~177 ms/batch profiled in isolation, and multiplied by lane-lockstep
chunk counts in production).  This names which stage of the solver the
time goes to, at the production chunk shape (16 lanes x 32 samples).

Stages timed (all jitted standalone, sync per call, best of 3):
  nullspace  — _nullspace_basis_4 on (C, 5, 9): cholesky + 8x(2 triangular
               solves + modified Gram-Schmidt)
  constraint — _constraint_tensor + row normalize -> (C, 10, 10, 4)
  detpoly    — _det10 at 16 Chebyshev nodes + Vandermonde pinv -> (C, 11)
  roots      — 512-point tan-grid sweep + 40 fixed bisection steps
  eigvec     — _smallest_eigvec_sym on (C, 10, 10, 10) (per-root nullvector)
  project    — project_to_essential on (C, 20, 3, 3)
  fit_full   — fit_essential_5pt end to end
  chunk      — one _ransac_model_multi-equivalent chunk: fit + score 20C
               candidates against K=512 correspondences

Usage: python scripts/profile_five_point.py [--samples 512] [--k 512]
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
    ap.add_argument("--samples", type=int, default=512,
                    help="batched minimal samples C (prod: 16 lanes x 32)")
    ap.add_argument("--k", type=int, default=512,
                    help="correspondences scored per candidate")
    args = ap.parse_args()

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    import jax
    import jax.numpy as jnp

    from vit_colmap_tpu.sfm import five_point as fp
    from vit_colmap_tpu.sfm import geometry as geom

    C, K = args.samples, args.k
    rng = np.random.default_rng(0)

    # Realistic normalized correspondences: random 3D points, two poses.
    pts3 = rng.uniform(-1, 1, (C, 5, 3)).astype(np.float32)
    pts3[..., 2] += 4.0
    t = np.array([0.3, 0.05, 0.02], np.float32)
    p1 = pts3[..., :2] / pts3[..., 2:]
    q = pts3 + t
    p2 = q[..., :2] / q[..., 2:]
    p1 += rng.normal(0, 1e-3, p1.shape).astype(np.float32)
    p2 += rng.normal(0, 1e-3, p2.shape).astype(np.float32)
    p1d, p2d = jnp.asarray(p1), jnp.asarray(p2)

    allp1 = jnp.asarray(rng.uniform(-0.5, 0.5, (1, K, 2)).astype(np.float32))
    allp2 = jnp.asarray(rng.uniform(-0.5, 0.5, (1, K, 2)).astype(np.float32))

    def sync(out):
        # D2H materialization is the only trustworthy sync on the axon
        # relay (block_until_ready can phantom-return; see
        # profile_verification.py).
        for leaf in jax.tree_util.tree_leaves(out):
            np.asarray(leaf)
        return out

    def timed(label, fn, *a):
        out = sync(fn(*a))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            sync(fn(*a))
            ts.append(time.perf_counter() - t0)
        ms = min(ts) * 1e3
        print(f"{label:12s} {ms:9.2f} ms", file=sys.stderr)
        return ms, out

    rows = {}

    # Stage inputs built by running the earlier stages once.
    one = jnp.ones_like(p1d[..., 0])
    x1, y1 = p1d[..., 0], p1d[..., 1]
    x2, y2 = p2d[..., 0], p2d[..., 1]
    Q = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, one], axis=-1
    )

    rows["nullspace"], V = timed(
        "nullspace", jax.jit(fp._nullspace_basis_4), Q
    )
    basis = jnp.swapaxes(V, -1, -2).reshape(V.shape[:-2] + (4, 3, 3))
    X, Y, Z, W = (basis[..., k, :, :] for k in range(4))

    @jax.jit
    def constraint(X, Y, Z, W):
        Ct = fp._constraint_tensor(X, Y, Z, W)
        rn = jnp.sqrt(jnp.sum(Ct * Ct, axis=(-2, -1), keepdims=True))
        return Ct / jnp.maximum(rn, 1e-30)

    rows["constraint"], Ct = timed("constraint", constraint, X, Y, Z, W)
    rows["detpoly"], coeffs = timed(
        "detpoly", jax.jit(fp._det_poly_coeffs), Ct
    )
    rows["roots"], (roots, _valid) = timed(
        "roots", jax.jit(fp._real_roots), coeffs
    )

    @jax.jit
    def eigstage(Ct, roots):
        zpow = jnp.stack([roots**k for k in range(fp._ZD)], axis=-1)
        Mr = jnp.einsum("...eqk,...rk->...req", Ct, zpow)
        return fp._smallest_eigvec_sym(jnp.einsum("...ne,...nq->...eq", Mr, Mr))

    rows["eigvec"], _ = timed("eigvec", eigstage, Ct, roots)

    Ecand = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (C, 20, 3, 3))
    Ecand = Ecand + 0.01 * jnp.asarray(
        rng.normal(0, 1, (C, 20, 3, 3)).astype(np.float32)
    )
    rows["project"], _ = timed(
        "project", jax.jit(fp.project_to_essential), Ecand
    )

    rows["fit_full"], (Es, valid) = timed(
        "fit_full", jax.jit(fp.fit_essential_5pt), p1d, p2d
    )

    @jax.jit
    def chunk(p1s, p2s, ap1, ap2):
        models, mvalid = fp.fit_essential_5pt(p1s, p2s)
        flat = models.reshape((-1, 3, 3))
        errs = geom.sampson_error(flat, ap1, ap2)  # (C*20, K)
        inl = errs <= 1e-4
        counts = jnp.sum(inl, axis=-1) * mvalid.reshape(-1).astype(jnp.int32)
        b = jnp.argmax(counts)
        return flat[b], counts[b]

    rows["chunk"], _ = timed("chunk", chunk, p1d, p2d, allp1, allp2)

    print(
        json.dumps(
            {
                "metric": "five_point_chunk_ms",
                "value": round(rows["chunk"], 2),
                "unit": "ms",
                "rows": {k: round(v, 2) for k, v in rows.items()},
                "samples": C,
                "k": K,
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
