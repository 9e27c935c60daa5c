"""Vectorized on-device RANSAC for two-view geometric verification.

The reference gets geometric verification for free inside COLMAP's C++
``match_exhaustive`` (SURVEY.md §2.3: batched E/F/H estimation + inlier
classification feeding the ``two_view_geometries`` table).  Here RANSAC is a
fused XLA program per pair batch:

* minimal samples are drawn **without replacement** (vectorized Floyd
  shifting — duplicate rows would silently waste hypotheses on
  rank-deficient systems),
* hypotheses run in chunks inside a ``lax.while_loop`` with a
  **confidence-based early exit** (COLMAP-style adaptive iteration count:
  stop once 1-(1-w^m)^N >= confidence),
* each chunk fits all its hypotheses in one batched inverse-iteration
  nullspace solve and counts inliers as one broadcasted error evaluation,
* the best model is refit once on its inliers (weighted least squares),
* for calibrated pairs an **essential-matrix RANSAC** runs on normalized
  coordinates (threshold scaled by mean focal length) alongside F and H,
  and the config enum follows COLMAP's E/F/H arbitration
  (min_E_F_inlier_ratio, max_H_inlier_ratio).

No data-dependent shapes: padded correspondences carry a validity mask;
everything compiles once per (K_max, iters) bucket and vmaps/shards over
pairs.
"""

from __future__ import annotations

import math
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vit_colmap_tpu.database.colmap_db import TWO_VIEW_CONFIG
from vit_colmap_tpu.sfm import geometry as geom

# COLMAP TwoViewGeometryOptions defaults (two_view_geometry.h).
MIN_E_F_INLIER_RATIO = 0.95
MAX_H_INLIER_RATIO = 0.8
RANSAC_CHUNK = 128


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


def _sample_minimal(
    key: jax.Array, iters: int, sample_size: int, num_valid: jax.Array, k_max: int
):
    """(iters, sample_size) random index sets in [0, num_valid), sampled
    WITHOUT replacement (Floyd shifting: draw from the remaining range, then
    shift past previously chosen values in ascending order)."""
    n = jnp.maximum(num_valid, sample_size).astype(jnp.int32)
    u = jax.random.uniform(key, (iters, sample_size))
    idx = jnp.zeros((iters, sample_size), jnp.int32)
    for t in range(sample_size):
        r = jnp.floor(u[:, t] * jnp.maximum(n - t, 1).astype(jnp.float32)).astype(
            jnp.int32
        )
        r = jnp.minimum(r, n - t - 1)
        if t > 0:
            prev = jnp.sort(idx[:, :t], axis=1)
            for s in range(t):
                r = r + (r >= prev[:, s]).astype(jnp.int32)
        idx = idx.at[:, t].set(r)
    return jnp.clip(idx, 0, k_max - 1)


def _ransac_model(
    fit_fn,
    err_fn,
    pts1,
    pts2,
    mask,
    key,
    iters,
    sample_size,
    thresh_sq,
    confidence: float = 0.999,
):
    """Generic vectorized RANSAC with adaptive early exit.

    Returns (model, inlier_mask, num_inliers).  ``iters`` is the hypothesis
    budget ceiling; the loop stops early once the best inlier ratio w makes
    1-(1-w^m)^N >= confidence (N = hypotheses done).
    """
    k_max = pts1.shape[0]
    num_valid = jnp.sum(mask)
    chunk = min(RANSAC_CHUNK, iters)
    log1mc = math.log(max(1e-12, 1.0 - confidence))

    def run_chunk(ck):
        samples = _sample_minimal(ck, chunk, sample_size, num_valid, k_max)
        models = fit_fn(pts1[samples], pts2[samples])  # (C, 3, 3)
        errs = err_fn(models, pts1[None], pts2[None])  # (C, K)
        inl = (errs <= thresh_sq) & mask[None]
        counts = jnp.sum(inl, axis=-1)
        b = jnp.argmax(counts)
        return models[b], counts[b].astype(jnp.int32)

    def cond(state):
        it_done, best_cnt, _ = state
        ratio = best_cnt.astype(jnp.float32) / jnp.maximum(num_valid, 1).astype(
            jnp.float32
        )
        p_good = jnp.clip(ratio**sample_size, 1e-9, 1.0 - 1e-9)
        required = log1mc / jnp.log1p(-p_good)
        # Lanes without enough correspondences exit IMMEDIATELY.  Without
        # this, an all-padding lane (num_valid=0 -> ratio 0 -> required
        # ~1e10) runs the FULL budget — and, vmapped under lane lockstep,
        # drags its whole pair batch through every chunk with it.
        return (
            (it_done < iters)
            & (it_done.astype(jnp.float32) < required)
            & (num_valid >= sample_size)
        )

    def body(state):
        it_done, best_cnt, best_model = state
        m, c = run_chunk(jax.random.fold_in(key, it_done))
        better = c > best_cnt
        return (
            it_done + chunk,
            jnp.maximum(c, best_cnt),
            jnp.where(better, m, best_model),
        )

    init = (jnp.int32(0), jnp.int32(0), jnp.eye(3, dtype=pts1.dtype))
    _, best_cnt, best_model = jax.lax.while_loop(cond, body, init)

    best_err = err_fn(best_model[None], pts1[None], pts2[None])[0]
    best_inl = (best_err <= thresh_sq) & mask
    # One weighted refit on the inlier set (local optimization step).
    w = best_inl.astype(jnp.float32)
    enough = jnp.sum(w) >= sample_size
    refit = fit_fn(pts1[None], pts2[None], w[None])[0]
    model = jnp.where(enough, refit, best_model)
    final_err = err_fn(model[None], pts1[None], pts2[None])[0]
    final_inl = (final_err <= thresh_sq) & mask
    # Keep the better of {refit, best hypothesis}.
    use_refit = jnp.sum(final_inl) >= jnp.sum(best_inl)
    model = jnp.where(use_refit, model, best_model)
    final_inl = jnp.where(use_refit, final_inl, best_inl)
    return model, final_inl, jnp.sum(final_inl).astype(jnp.int32)


def _ransac_model_multi(
    fit_multi_fn,
    refit_fn,
    err_fn,
    pts1,
    pts2,
    mask,
    key,
    iters,
    sample_size,
    thresh_sq,
    confidence: float = 0.999,
    chunk_size: int = 32,
    init_model=None,
    init_cnt=None,
):
    """RANSAC for *minimal* solvers that return several candidate models per
    sample (e.g. the 5-point essential solver's up-to-20 roots).

    ``fit_multi_fn(p1s, p2s) -> (models (C, S, 3, 3), valid (C, S))``;
    every candidate is scored like an independent hypothesis.  The final
    refit uses ``refit_fn`` (a single-model weighted fit, e.g. 8-point +
    manifold projection) on the winner's inliers.

    ``init_model``/``init_cnt`` optionally seed the adaptive loop with a
    model found by a CHEAPER solver: when the seed already satisfies the
    confidence criterion (easy pair, high inlier ratio), the while_loop
    cond is false at entry and ZERO multi-solver chunks run — under vmap
    lane lockstep this lets whole easy batches skip the expensive solve
    while hard pairs still get the minimal-sample w^m advantage.
    """
    k_max = pts1.shape[0]
    num_valid = jnp.sum(mask)
    chunk = min(chunk_size, iters)
    log1mc = math.log(max(1e-12, 1.0 - confidence))

    def run_chunk(ck):
        samples = _sample_minimal(ck, chunk, sample_size, num_valid, k_max)
        models, mvalid = fit_multi_fn(pts1[samples], pts2[samples])
        flat = models.reshape((-1, 3, 3))
        errs = err_fn(flat, pts1[None], pts2[None])  # (C*S, K)
        inl = (errs <= thresh_sq) & mask[None]
        counts = jnp.sum(inl, axis=-1) * mvalid.reshape(-1).astype(jnp.int32)
        b = jnp.argmax(counts)
        return flat[b], counts[b].astype(jnp.int32)

    def cond(state):
        it_done, best_cnt, _ = state
        ratio = best_cnt.astype(jnp.float32) / jnp.maximum(
            num_valid, 1
        ).astype(jnp.float32)
        p_good = jnp.clip(ratio**sample_size, 1e-9, 1.0 - 1e-9)
        required = log1mc / jnp.log1p(-p_good)
        # See _ransac_model.cond: insufficient lanes must exit immediately
        # or they run the full budget in lane lockstep under vmap — with
        # THIS solver's ~13-candidate chunks, the most expensive place to
        # do nothing.
        return (
            (it_done < iters)
            & (it_done.astype(jnp.float32) < required)
            & (num_valid >= sample_size)
        )

    def body(state):
        it_done, best_cnt, best_model = state
        m, c = run_chunk(jax.random.fold_in(key, it_done))
        better = c > best_cnt
        return (
            it_done + chunk,
            jnp.maximum(c, best_cnt),
            jnp.where(better, m, best_model),
        )

    if init_model is not None:
        # The seed counts as one hypothesis done: it was already certified
        # by the seeding solver's own (stricter, m=8) adaptive criterion,
        # so a high-ratio seed makes cond false at entry.
        init = (jnp.int32(1), init_cnt.astype(jnp.int32), init_model)
    else:
        init = (jnp.int32(0), jnp.int32(0), jnp.eye(3, dtype=pts1.dtype))
    _, best_cnt, best_model = jax.lax.while_loop(cond, body, init)

    best_err = err_fn(best_model[None], pts1[None], pts2[None])[0]
    best_inl = (best_err <= thresh_sq) & mask
    w = best_inl.astype(jnp.float32)
    enough = jnp.sum(w) >= sample_size
    refit = refit_fn(pts1[None], pts2[None], w[None])[0]
    model = jnp.where(enough, refit, best_model)
    final_err = err_fn(model[None], pts1[None], pts2[None])[0]
    final_inl = (final_err <= thresh_sq) & mask
    use_refit = jnp.sum(final_inl) >= jnp.sum(best_inl)
    model = jnp.where(use_refit, model, best_model)
    final_inl = jnp.where(use_refit, final_inl, best_inl)
    return model, final_inl, jnp.sum(final_inl).astype(jnp.int32)


@partial(
    jax.jit,
    static_argnames=(
        "iters",
        "max_error_px",
        "min_num_inliers",
        "max_h_ratio",
        "confidence",
        "five_point",
        "h_iters",
        "five_point_chunk",
    ),
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
    max_h_ratio: float = MAX_H_INLIER_RATIO,
    confidence: float = 0.999,
    five_point: bool = True,
    h_iters: int = 256,
    five_point_chunk: int = 16,
) -> TwoViewResult:
    """COLMAP-style two-view geometry: estimate E (calibrated), F and H,
    arbitrate the configuration (CALIBRATED / UNCALIBRATED /
    PLANAR_OR_PANORAMIC / DEGENERATE), and return the winning inlier set.

    Mirrors the behavior the reference reads back from COLMAP's
    ``two_view_geometries.config`` (``utils/metrics.py:120-132``):
    calibrated pairs that verify with E get CALIBRATED; pairs whose focal
    priors are absent/bad verify through F as UNCALIBRATED; dominant
    homographies are PLANAR_OR_PANORAMIC.
    """
    thresh_sq = jnp.float32(max_error_px**2)
    kf, kh, ke = jax.random.split(key, 3)

    F, f_inl, f_cnt = _ransac_model(
        geom.fit_fundamental, geom.sampson_error, pts1, pts2, mask, kf,
        iters, 8, thresh_sq, confidence,
    )
    # H gets a smaller budget than F/E: it only arbitrates
    # PLANAR_OR_PANORAMIC.  Genuinely planar pairs have high H-inlier
    # ratios and converge in « h_iters samples; on non-planar pairs the
    # adaptive criterion never converges (w_H is structurally low) and,
    # vmapped, every batch containing ONE such pair used to run H to the
    # full budget in lane lockstep — a large share of the measured DTU-50
    # verification wall-clock for zero arbitration benefit.
    H, h_inl, h_cnt = _ransac_model(
        geom.fit_homography, geom.homography_error, pts1, pts2, mask, kh,
        min(iters, h_iters), 4, thresh_sq, confidence,
    )

    # Essential RANSAC on normalized coordinates; pixel threshold mapped by
    # the mean focal length (COLMAP does the same for E estimation).
    def norm_pts(K, pts):
        fx, fy = K[0, 0], K[1, 1]
        cx, cy = K[0, 2], K[1, 2]
        return (pts - jnp.stack([cx, cy])) / jnp.stack([fx, fy])

    p1n = norm_pts(K1, pts1)
    p2n = norm_pts(K2, pts2)
    focal_mean = (K1[0, 0] + K1[1, 1] + K2[0, 0] + K2[1, 1]) / 4.0
    thresh_sq_n = thresh_sq / jnp.maximum(focal_mean**2, 1e-12)
    if five_point:
        # Minimal 5-sample solver (sfm/five_point.py): per-sample success
        # w^5 instead of w^8 — COLMAP's solver choice for calibrated pairs.
        from vit_colmap_tpu.sfm.five_point import fit_essential_5pt

        # 8-point-first arbitration: the resultant solve is ~72% of the
        # batched verification's device time (VERIF_PROFILE), yet its w^5
        # advantage only matters on LOW-inlier-ratio pairs.  Run the cheap
        # 8-point E RANSAC first and seed the 5-point loop with its result:
        # easy pairs (the common case) satisfy the adaptive criterion at
        # entry and skip the resultant entirely — in vmap lane lockstep,
        # whole easy batches skip it; hard pairs still run the full 5-point
        # budget and keep its low-ratio robustness.
        ke8, ke5 = jax.random.split(ke)
        E_seed, _, e_seed_cnt = _ransac_model(
            geom.fit_essential, geom.sampson_error, p1n, p2n, mask, ke8,
            iters, 8, thresh_sq_n, confidence,
        )
        E_direct, e_inl, e_cnt = _ransac_model_multi(
            fit_essential_5pt, geom.fit_essential, geom.sampson_error,
            p1n, p2n, mask, ke5, iters, 5, thresh_sq_n, confidence,
            chunk_size=five_point_chunk,
            init_model=E_seed, init_cnt=e_seed_cnt,
        )
    else:
        E_direct, e_inl, e_cnt = _ransac_model(
            geom.fit_essential, geom.sampson_error, p1n, p2n, mask, ke,
            iters, 8, thresh_sq_n, confidence,
        )

    # --- COLMAP config arbitration ------------------------------------
    e_wins = (
        calibrated
        & (e_cnt >= min_num_inliers)
        & (e_cnt.astype(jnp.float32) >= MIN_E_F_INLIER_RATIO * f_cnt.astype(jnp.float32))
    )
    epi_inl = jnp.where(e_wins, e_inl, f_inl)
    epi_cnt = jnp.where(e_wins, e_cnt, f_cnt)

    planar = h_cnt.astype(jnp.float32) >= max_h_ratio * epi_cnt.astype(jnp.float32)
    use_h = planar & (h_cnt > epi_cnt)
    inlier_mask = jnp.where(use_h, h_inl, epi_inl)
    num_inliers = jnp.where(use_h, h_cnt, epi_cnt)

    config = jnp.where(
        num_inliers < min_num_inliers,
        TWO_VIEW_CONFIG["DEGENERATE"],
        jnp.where(
            planar,
            TWO_VIEW_CONFIG["PLANAR_OR_PANORAMIC"],
            jnp.where(
                e_wins,
                TWO_VIEW_CONFIG["CALIBRATED"],
                TWO_VIEW_CONFIG["UNCALIBRATED"],
            ),
        ),
    ).astype(jnp.int32)

    # Essential matrix + relative pose. Calibrated pairs use the directly
    # estimated E; uncalibrated fall back to E = K2ᵀ F K1 projected onto the
    # essential manifold.
    E_from_F = geom.project_to_essential(jnp.swapaxes(K2, -1, -2) @ F @ K1)
    E = jnp.where(e_wins, E_direct, E_from_F)
    E = E / jnp.maximum(jnp.linalg.norm(E), 1e-12)
    # Report F consistently with the winning model.
    K2invT = jnp.linalg.inv(jnp.swapaxes(K2, -1, -2))
    F_from_E = K2invT @ E_direct @ jnp.linalg.inv(K1)
    F_out = jnp.where(e_wins, F_from_E, F)
    F_out = F_out / jnp.maximum(jnp.linalg.norm(F_out), 1e-12)

    R, t = geom.recover_pose_from_E(E, p1n, p2n, inlier_mask)
    qvec = geom.rotmat_to_qvec(R)

    return TwoViewResult(
        config=config,
        inlier_mask=inlier_mask,
        num_inliers=num_inliers,
        F=F_out,
        E=E,
        H=H,
        qvec=qvec,
        tvec=t,
    )


@partial(
    jax.jit,
    static_argnames=(
        "iters",
        "max_error_px",
        "min_num_inliers",
        "max_h_ratio",
        "confidence",
        "five_point",
        "h_iters",
        "five_point_chunk",
    ),
)
def estimate_two_view_batched(
    pts1, pts2, mask, K1, K2, calibrated, keys, **kwargs
) -> TwoViewResult:
    """vmap of :func:`estimate_two_view` over a pair batch (leading axis P).

    Jitted at the batch level so the whole verification program is ONE
    XLA computation (and AOT-compilable, see
    :func:`prewarm_two_view_program`)."""
    fn = partial(estimate_two_view, **kwargs)
    return jax.vmap(fn)(pts1, pts2, mask, K1, K2, calibrated, keys)


@partial(
    jax.jit,
    static_argnames=(
        "n_pairs",
        "k_max",
        "iters",
        "max_error_px",
        "min_num_inliers",
        "max_h_ratio",
        "confidence",
        "five_point",
        "h_iters",
        "five_point_chunk",
    ),
)
def estimate_two_view_batched_packed(
    flat1, flat2, dest, K1, K2, calibrated, keys, *, n_pairs, k_max, **kwargs
) -> TwoViewResult:
    """Packed-transfer form of :func:`estimate_two_view_batched`.

    The batched verifier's natural inputs are (P, k_max, 2) correspondence
    buffers padded to the scene's largest pair — at DTU-50 shapes
    (64, 1024) with ~200 valid matches/pair, ~80% of the H2D bytes are
    padding, and the wire is the pipeline's binding constraint (the device
    holds 14 img/s while wire-inclusive throughput swings 2x with relay
    epochs).  Here the host sends ONLY the valid correspondences as flat
    ``(L, 2)`` buffers plus a flat destination index, and the scatter into
    the padded (P, k_max) layout happens on device inside the same XLA
    program (one fused pass; padding rows never cross the wire).

    ``dest[i] = lane * k_max + position``; entries padding the flat buffer
    use ``dest >= n_pairs * k_max`` and are dropped by the scatter.  The
    correspondence mask is derived from the same scatter, so results are
    bit-identical to the unpacked call (equality pinned in
    tests/test_matching.py).
    """
    shape = (n_pairs * k_max, 2)
    pts1 = (
        jnp.zeros(shape, flat1.dtype)
        .at[dest]
        .set(flat1, mode="drop")
        .reshape(n_pairs, k_max, 2)
    )
    pts2 = (
        jnp.zeros(shape, flat2.dtype)
        .at[dest]
        .set(flat2, mode="drop")
        .reshape(n_pairs, k_max, 2)
    )
    mask = (
        jnp.zeros((n_pairs * k_max,), bool)
        .at[dest]
        .set(True, mode="drop")
        .reshape(n_pairs, k_max)
    )
    fn = partial(estimate_two_view, **kwargs)
    return jax.vmap(fn)(pts1, pts2, mask, K1, K2, calibrated, keys)


def prewarm_two_view_program(
    pair_batch: int, k_max, **kwargs
) -> "threading.Thread":
    """AOT-compile the batched verification program(s) for shape
    ``(pair_batch, k)`` for each k in ``k_max`` (int or iterable) in ONE
    background thread, smallest k first — the smallest bucket is the most
    likely real bucket, and warming sequentially lets it finish within the
    extraction window instead of contending with a larger sibling.

    Verification programs compile per (pair_batch, K-bucket) shape; on the
    remote-compile TPU service a cold compile costs tens of seconds that
    otherwise lands between matching and verification.  Launching this
    while extraction/matching still runs hides it (compilation is
    host/service-side; no device time is consumed).  Returns the thread;
    join() is optional — results land in jit's compile cache keyed by
    shape, so the later real call picks them up automatically.

    After compiling, the program is also EXECUTED once on zero inputs and
    a small output is materialized: the first dispatch of a program pays a
    large one-time tax on the relay (executable upload + dispatch-path
    setup — measured 76-105 s for the DTU-50 verification program, vs ~5 s
    for every subsequent full 1225-pair pass; results/VERIFY_VB_AB_r3.json).
    A pipeline runs verification once per scene, so without this it always
    pays that tax inside the verification stage; executing here moves it
    under extraction where the device is busy but the dispatch path is idle.
    """
    import threading

    import numpy as np

    buckets = sorted({k_max} if isinstance(k_max, (int, tuple)) else set(k_max))

    def _build():
        for k in buckets:
            try:
                if isinstance(k, tuple):
                    # (k_max, flat_L) bucket -> packed-transfer program
                    # (the form the pipeline actually dispatches).
                    k_b, l_b = k
                    args = (
                        jnp.zeros((l_b, 2), jnp.float32),
                        jnp.zeros((l_b, 2), jnp.float32),
                        # All-padding scatter: out-of-range dests drop.
                        jnp.full(
                            (l_b,), pair_batch * k_b, jnp.int32
                        ),
                        jnp.zeros((pair_batch, 3, 3), jnp.float32),
                        jnp.zeros((pair_batch, 3, 3), jnp.float32),
                        jnp.zeros(pair_batch, bool),
                        jax.random.split(jax.random.key(0), pair_batch),
                    )
                    kw = dict(kwargs, n_pairs=pair_batch, k_max=k_b)
                    estimate_two_view_batched_packed.lower(
                        *args, **kw
                    ).compile()
                    np.asarray(
                        estimate_two_view_batched_packed(
                            *args, **kw
                        ).num_inliers
                    )
                    continue
                args = (
                    jnp.zeros((pair_batch, k, 2), jnp.float32),
                    jnp.zeros((pair_batch, k, 2), jnp.float32),
                    jnp.zeros((pair_batch, k), bool),
                    jnp.zeros((pair_batch, 3, 3), jnp.float32),
                    jnp.zeros((pair_batch, 3, 3), jnp.float32),
                    jnp.zeros(pair_batch, bool),
                    jax.random.split(jax.random.key(0), pair_batch),
                )
                estimate_two_view_batched.lower(*args, **kwargs).compile()
                # First-dispatch warm-up (all-padding batch: the
                # while_loops exit immediately, so device time is
                # negligible).  Goes through the normal jit path so the
                # warm dispatch state is exactly what the real call will
                # use.
                np.asarray(
                    estimate_two_view_batched(*args, **kwargs).num_inliers
                )
            except Exception:  # pragma: no cover - best effort
                import logging

                logging.getLogger(__name__).debug(
                    "verification prewarm failed", exc_info=True
                )

    t = threading.Thread(target=_build, daemon=True, name="verif-prewarm")
    t.start()
    return t
