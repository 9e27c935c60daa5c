"""Vectorized on-device RANSAC for two-view geometric verification.

The reference gets geometric verification for free inside COLMAP's C++
``match_exhaustive`` (SURVEY.md §2.3: batched E/F/H estimation + inlier
classification feeding the ``two_view_geometries`` table).  Here RANSAC is a
single fused XLA program per pair batch:

* all ``S`` minimal samples are drawn up-front with a counter-based PRNG,
* all hypotheses are fitted in one batched eigh (``S`` 9x9 problems),
* inlier counting is one broadcasted error evaluation (``S x K`` residuals),
* the best model is refit once on its inliers (weighted least squares).

No data-dependent control flow: padded correspondences carry a validity
mask; everything is fixed-shape so the program compiles once per
(K_max, iters) bucket and vmaps/shards over pairs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vit_colmap_tpu.database.colmap_db import TWO_VIEW_CONFIG
from vit_colmap_tpu.sfm import geometry as geom


class TwoViewResult(NamedTuple):
    """Fixed-shape result of two-view estimation for one (or a batch of) pairs."""

    config: jax.Array  # int32 — TWO_VIEW_CONFIG enum
    inlier_mask: jax.Array  # (K,) bool — inliers of the winning model
    num_inliers: jax.Array  # int32
    F: jax.Array  # (3, 3)
    E: jax.Array  # (3, 3)
    H: jax.Array  # (3, 3)
    qvec: jax.Array  # (4,) relative pose (if calibrated)
    tvec: jax.Array  # (3,)


def _sample_minimal(key: jax.Array, iters: int, sample_size: int, num_valid: jax.Array, k_max: int):
    """(iters, sample_size) random indices in [0, num_valid)."""
    u = jax.random.uniform(key, (iters, sample_size))
    idx = jnp.floor(u * jnp.maximum(num_valid, 1).astype(jnp.float32)).astype(jnp.int32)
    return jnp.clip(idx, 0, k_max - 1)


def _ransac_model(fit_fn, err_fn, pts1, pts2, mask, key, iters, sample_size, thresh_sq):
    """Generic vectorized RANSAC. Returns (model, inlier_mask, num_inliers)."""
    k_max = pts1.shape[0]
    num_valid = jnp.sum(mask)
    samples = _sample_minimal(key, iters, sample_size, num_valid, k_max)
    # NOTE: padded points are compacted to the front by the caller, so index
    # [0, num_valid) addresses valid correspondences only.
    sp1 = pts1[samples]  # (S, m, 2)
    sp2 = pts2[samples]
    models = fit_fn(sp1, sp2)  # (S, 3, 3)
    errs = err_fn(models, pts1[None], pts2[None])  # (S, K)
    inl = (errs <= thresh_sq) & mask[None]
    counts = jnp.sum(inl, axis=-1)
    best = jnp.argmax(counts)
    best_inl = inl[best]
    # One weighted refit on the inlier set (local optimization step).
    w = best_inl.astype(jnp.float32)
    enough = jnp.sum(w) >= sample_size
    refit = fit_fn(pts1[None], pts2[None], w[None])[0]
    model = jnp.where(enough, refit, models[best])
    final_err = err_fn(model[None], pts1[None], pts2[None])[0]
    final_inl = (final_err <= thresh_sq) & mask
    # Keep the better of {refit, best hypothesis}.
    use_refit = jnp.sum(final_inl) >= counts[best]
    model = jnp.where(use_refit, model, models[best])
    final_inl = jnp.where(use_refit, final_inl, best_inl)
    return model, final_inl, jnp.sum(final_inl).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=("iters", "max_error_px", "min_num_inliers", "max_h_ratio"),
)
def estimate_two_view(
    pts1: jax.Array,  # (K, 2) pixel coords, valid entries compacted to front
    pts2: jax.Array,  # (K, 2)
    mask: jax.Array,  # (K,) bool
    K1: jax.Array,  # (3, 3) intrinsics of image 1
    K2: jax.Array,  # (3, 3)
    calibrated: jax.Array,  # bool scalar — both cameras have prior focal
    key: jax.Array,
    iters: int = 1024,
    max_error_px: float = 4.0,
    min_num_inliers: int = 15,
    max_h_ratio: float = 0.8,
) -> TwoViewResult:
    """COLMAP-style two-view geometry: estimate F and H, classify the
    configuration (CALIBRATED / UNCALIBRATED / PLANAR_OR_PANORAMIC /
    DEGENERATE), and return the winning inlier set.

    Mirrors the behavior the reference reads back from COLMAP's
    ``two_view_geometries.config`` (``utils/metrics.py:120-132``).
    """
    thresh_sq = jnp.float32(max_error_px**2)
    kf, kh = jax.random.split(key)

    F, f_inl, f_cnt = _ransac_model(
        geom.fit_fundamental, geom.sampson_error, pts1, pts2, mask, kf, iters, 8, thresh_sq
    )
    H, h_inl, h_cnt = _ransac_model(
        geom.fit_homography, geom.homography_error, pts1, pts2, mask, kh, iters, 4, thresh_sq
    )

    planar = h_cnt.astype(jnp.float32) >= max_h_ratio * f_cnt.astype(jnp.float32)
    use_h = planar & (h_cnt > f_cnt)
    inlier_mask = jnp.where(use_h, h_inl, f_inl)
    num_inliers = jnp.where(use_h, h_cnt, f_cnt)

    config = jnp.where(
        num_inliers < min_num_inliers,
        TWO_VIEW_CONFIG["DEGENERATE"],
        jnp.where(
            planar,
            TWO_VIEW_CONFIG["PLANAR_OR_PANORAMIC"],
            jnp.where(
                calibrated,
                TWO_VIEW_CONFIG["CALIBRATED"],
                TWO_VIEW_CONFIG["UNCALIBRATED"],
            ),
        ),
    ).astype(jnp.int32)

    # Essential matrix + relative pose from calibrated coordinates.
    E = jnp.swapaxes(K2, -1, -2) @ F @ K1
    E = E / jnp.maximum(jnp.linalg.norm(E), 1e-12)

    def norm_pts(K, pts):
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        return (pts - jnp.stack([cx, cy])) / jnp.stack([fx, fy])

    p1n = norm_pts(K1, pts1)
    p2n = norm_pts(K2, pts2)
    R, t = geom.recover_pose_from_E(E, p1n, p2n, inlier_mask)
    qvec = geom.rotmat_to_qvec(R)

    return TwoViewResult(
        config=config,
        inlier_mask=inlier_mask,
        num_inliers=num_inliers,
        F=F,
        E=E,
        H=H,
        qvec=qvec,
        tvec=t,
    )


def estimate_two_view_batched(
    pts1, pts2, mask, K1, K2, calibrated, keys, **kwargs
) -> TwoViewResult:
    """vmap of :func:`estimate_two_view` over a pair batch (leading axis P)."""
    fn = partial(estimate_two_view, **kwargs)
    return jax.vmap(fn)(pts1, pts2, mask, K1, K2, calibrated, keys)
