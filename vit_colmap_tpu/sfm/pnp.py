"""Absolute pose (PnP) estimation — batched DLT + vectorized RANSAC.

Used by the incremental mapper for image registration (the role COLMAP's
C++ P3P/EPnP RANSAC plays inside ``pycolmap.incremental_mapping``,
SURVEY.md §2.3).  The minimal solver is the 6-point DLT on K-normalized
coordinates with SVD re-orthogonalization — hypothesis fitting, inlier
counting and the final refit are all fixed-shape batched programs like
:mod:`vit_colmap_tpu.ops.ransac`.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vit_colmap_tpu.sfm import geometry as geom


def fit_pose_dlt(
    pts2d: jax.Array,  # (..., n, 2) K-normalized image coords
    pts3d: jax.Array,  # (..., n, 3)
    weights: jax.Array | None = None,
):
    """DLT absolute pose: x ~ [R|t] X.  Returns (R (..., 3, 3), t (..., 3)).

    The linear P is projected onto SE(3): R via SVD orthogonalization, the
    translation rescaled by the mean singular value, and the sign fixed by
    majority positive depth.
    """
    w = weights if weights is not None else jnp.ones(pts2d.shape[:-1])
    X, Y, Z = pts3d[..., 0], pts3d[..., 1], pts3d[..., 2]
    x, y = pts2d[..., 0], pts2d[..., 1]
    ones = jnp.ones_like(X)
    zeros = jnp.zeros_like(X)
    r1 = jnp.stack(
        [X, Y, Z, ones, zeros, zeros, zeros, zeros, -x * X, -x * Y, -x * Z, -x],
        axis=-1,
    )
    r2 = jnp.stack(
        [zeros, zeros, zeros, zeros, X, Y, Z, ones, -y * X, -y * Y, -y * Z, -y],
        axis=-1,
    )
    A = jnp.concatenate([r1, r2], axis=-2)  # (..., 2n, 12)
    # Row-normalize for conditioning, then weights; nullspace via inverse
    # iteration (batched tiny SVDs are pathologically slow on TPU).
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    A = A * jnp.concatenate([w, w], axis=-1)[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    p = geom._smallest_eigvec_sym(AtA, iters=8)
    P = p.reshape(*p.shape[:-1], 3, 4)

    # The nullspace is defined up to sign; resolve with cheirality BEFORE
    # orthogonalization (closest_rotation always returns a proper rotation,
    # so sign information must come from the projective P itself).
    Rm = P[..., :3]
    tm = P[..., 3]
    depth = jnp.einsum("...ij,...nj->...ni", Rm, pts3d)[..., 2] + tm[..., None, 2]
    pos = jnp.sum((depth > 0) * w, axis=-1)
    neg = jnp.sum((depth < 0) * w, axis=-1)
    sgn = jnp.where(neg > pos, -1.0, 1.0)
    Rm = Rm * sgn[..., None, None]
    tm = tm * sgn[..., None]

    R = geom.closest_rotation(Rm)
    # Scale: sum of singular values of Rm equals tr(RᵀRm) at the optimum.
    scale = jnp.einsum("...ij,...ij->...", R, Rm) / 3.0
    t = tm / jnp.maximum(scale[..., None], 1e-12)
    return R, t


def reprojection_error_px(R, t, pts3d, pts2d_px, K):
    """Squared pixel reprojection error -> (..., n)."""
    Xc = jnp.einsum("...ij,...nj->...ni", R, pts3d) + t[..., None, :]
    z = jnp.where(jnp.abs(Xc[..., 2:]) > 1e-8, Xc[..., 2:], 1e-8)
    xn = Xc[..., :2] / z
    fx, fy = K[..., 0, 0], K[..., 1, 1]
    cx, cy = K[..., 0, 2], K[..., 1, 2]
    u = xn[..., 0] * fx[..., None] + cx[..., None]
    v = xn[..., 1] * fy[..., None] + cy[..., None]
    err = (u - pts2d_px[..., 0]) ** 2 + (v - pts2d_px[..., 1]) ** 2
    # Points behind the camera can't be inliers.
    return jnp.where(Xc[..., 2] > 1e-6, err, jnp.inf)


class PnPResult(NamedTuple):
    R: jax.Array
    t: jax.Array
    inlier_mask: jax.Array
    num_inliers: jax.Array


@partial(jax.jit, static_argnames=("iters", "max_error_px"))
def pnp_ransac(
    pts2d_px: jax.Array,  # (N, 2) pixel coords, valid compacted to front
    pts3d: jax.Array,  # (N, 3)
    mask: jax.Array,  # (N,)
    K: jax.Array,  # (3, 3)
    key: jax.Array,
    iters: int = 512,
    max_error_px: float = 8.0,
) -> PnPResult:
    n_max = pts2d_px.shape[0]
    num_valid = jnp.sum(mask)
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    pts2d_n = (pts2d_px - jnp.stack([cx, cy])) / jnp.stack([fx, fy])

    u = jax.random.uniform(key, (iters, 6))
    idx = jnp.clip(
        jnp.floor(u * jnp.maximum(num_valid, 1).astype(jnp.float32)).astype(jnp.int32),
        0,
        n_max - 1,
    )
    R, t = fit_pose_dlt(pts2d_n[idx], pts3d[idx])  # (S, 3, 3), (S, 3)
    errs = reprojection_error_px(R, t, pts3d[None], pts2d_px[None], K[None])
    inl = (errs <= max_error_px**2) & mask[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    w = inl[best].astype(jnp.float32)
    enough = jnp.sum(w) >= 6
    R_ref, t_ref = fit_pose_dlt(pts2d_n[None], pts3d[None], w[None])
    R_f = jnp.where(enough, R_ref[0], R[best])
    t_f = jnp.where(enough, t_ref[0], t[best])
    err_f = reprojection_error_px(R_f[None], t_f[None], pts3d[None], pts2d_px[None], K[None])[0]
    inl_f = (err_f <= max_error_px**2) & mask
    better = jnp.sum(inl_f) >= counts[best]
    R_out = jnp.where(better, R_f, R[best])
    t_out = jnp.where(better, t_f, t[best])
    inl_out = jnp.where(better, inl_f, inl[best])
    return PnPResult(R_out, t_out, inl_out, jnp.sum(inl_out).astype(jnp.int32))


@partial(jax.jit, static_argnames=("n", "iters", "max_error_px"))
def pnp_ransac_packed(
    fbuf: jax.Array,  # [xy (n*2) | X (n*3) | K (9)] float32
    mask: jax.Array,  # (n,) bool
    key: jax.Array,
    *,
    n: int,
    iters: int = 512,
    max_error_px: float = 8.0,
) -> jax.Array:
    """``pnp_ransac`` over one packed float buffer, one packed result.

    Relay-transfer shape: the mapper registers ~N images with one PnP call
    each; the unpacked call moves 5 arrays up and 4 down (each a full
    round trip on the remote-relay device).  Packed: 3 up, 1 down.
    Returns [R (9) | t (3) | num_inliers (1) | inlier_mask (n)] float32.
    """
    xy = fbuf[: n * 2].reshape(n, 2)
    X = fbuf[n * 2 : n * 5].reshape(n, 3)
    K = fbuf[n * 5 : n * 5 + 9].reshape(3, 3)
    res = pnp_ransac(xy, X, mask, K, key, iters=iters,
                     max_error_px=max_error_px)
    return jnp.concatenate([
        res.R.ravel(),
        res.t,
        res.num_inliers.astype(jnp.float32)[None],
        res.inlier_mask.astype(jnp.float32),
    ])
