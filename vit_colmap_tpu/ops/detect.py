"""Keypoint selection on dense score maps — fully vectorized.

Replaces the reference's host-driven Python loops (spatial binning at
``features/vit_extractor.py:434-469`` — a double loop launching tiny kernels
per bin — and the O(N^2) greedy NMS at ``:528-538``, its two known slow
spots) with fixed-shape device programs:

* ``nms_maxpool`` — local-maximum suppression via max-pool equality, the
  standard accelerator-friendly NMS (the reference's trainable path uses the
  same trick, ``trainable_vit_extractor.py:114-138``),
* ``select_topk_binned`` — one reshape + per-bin ``top_k`` + global ``top_k``
  that guarantees spatial spread without any host loop,
* fixed ``k`` output with validity mask (ragged counts stay device-friendly).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("radius",))
def nms_maxpool(scores: jax.Array, radius: int = 1) -> jax.Array:
    """(B, H, W) -> scores with non-local-maxima zeroed (window 2r+1)."""
    if radius <= 0:
        return scores
    w = 2 * radius + 1
    pooled = jax.lax.reduce_window(
        scores,
        -jnp.inf,
        jax.lax.max,
        window_dimensions=(1, w, w),
        window_strides=(1, 1, 1),
        padding=((0, 0), (radius, radius), (radius, radius)),
    )
    return jnp.where(scores >= pooled, scores, 0.0)


@partial(jax.jit, static_argnames=("bin_size", "k_per_bin", "k_total"))
def select_topk_binned(
    scores: jax.Array,  # (B, H, W), higher is better; <=0 = suppressed
    bin_size: int = 2,
    k_per_bin: int = 4,
    k_total: int = 1024,
):
    """Spatially-binned top-k selection.

    Splits the map into bin_size x bin_size cells, keeps the k_per_bin best
    per cell, then the k_total best overall.  Returns (xy, score, valid):
    xy (B, k_total, 2) float32 in *map* coordinates (x, y), valid where
    score > 0.
    """
    B, H, W = scores.shape
    pad_h = (-H) % bin_size
    pad_w = (-W) % bin_size
    s = jnp.pad(scores, [(0, 0), (0, pad_h), (0, pad_w)], constant_values=0.0)
    Hp, Wp = H + pad_h, W + pad_w
    nh, nw = Hp // bin_size, Wp // bin_size

    cells = s.reshape(B, nh, bin_size, nw, bin_size).transpose(0, 1, 3, 2, 4)
    cells = cells.reshape(B, nh * nw, bin_size * bin_size)
    kpb = min(k_per_bin, bin_size * bin_size)
    cell_top, cell_idx = jax.lax.top_k(cells, kpb)  # (B, nbins, kpb)

    # Recover absolute coordinates of each candidate.
    bin_ids = jnp.arange(nh * nw)
    by = (bin_ids // nw)[None, :, None]
    bx = (bin_ids % nw)[None, :, None]
    iy = cell_idx // bin_size
    ix = cell_idx % bin_size
    ys = by * bin_size + iy
    xs = bx * bin_size + ix

    flat_scores = cell_top.reshape(B, -1)
    flat_x = xs.reshape(B, -1)
    flat_y = ys.reshape(B, -1)

    k_total = min(k_total, flat_scores.shape[1])
    top_scores, top_i = jax.lax.top_k(flat_scores, k_total)
    gx = jnp.take_along_axis(flat_x, top_i, axis=1)
    gy = jnp.take_along_axis(flat_y, top_i, axis=1)
    # Out-of-original-bounds padding cells carry score 0 -> invalid.
    in_bounds = (gx < W) & (gy < H)
    valid = (top_scores > 0.0) & in_bounds
    xy = jnp.stack([gx, gy], axis=-1).astype(jnp.float32)
    return xy, top_scores, valid


@jax.jit
def quadratic_refine(scores: jax.Array, xy: jax.Array) -> jax.Array:
    """Training-free sub-pixel peak refinement on a dense score map.

    Fits a separable 1D quadratic through each peak's 3-neighborhood (the
    classic detector refinement — SIFT's sub-pixel step
    [ops/sift.py] does the same in scale-space; here on the trainable
    head's score map as an alternative to the LEARNED offset head, whose
    from-random training leaves up to ±2 px of localization noise —
    VERDICT r4 item 3 / scripts/bisect_geometry.py).

    scores: (B, H, W) RAW (pre-NMS) scores; xy: (B, K, 2) integer map
    coordinates (x, y).  Returns (B, K, 2) offsets in [-0.5, 0.5] cells.
    """
    B, H, W = scores.shape
    flat = scores.reshape(B, -1)
    x = xy[..., 0].astype(jnp.int32)
    y = xy[..., 1].astype(jnp.int32)

    def at(dy, dx):
        yy = jnp.clip(y + dy, 0, H - 1)
        xx = jnp.clip(x + dx, 0, W - 1)
        return jnp.take_along_axis(flat, yy * W + xx, axis=1)

    sc = at(0, 0)
    sl, sr = at(0, -1), at(0, 1)
    su, sd = at(-1, 0), at(1, 0)

    def off(m, c, p):
        denom = m - 2.0 * c + p
        d = jnp.where(jnp.abs(denom) > 1e-6, 0.5 * (m - p) / denom, 0.0)
        return jnp.clip(d, -0.5, 0.5)

    return jnp.stack([off(sl, sc, sr), off(su, sc, sd)], axis=-1)


@partial(
    jax.jit,
    static_argnames=(
        "nms_radius", "bin_size", "k_per_bin", "k_total", "nms_mode",
    ),
)
def detect_keypoints(
    scores: jax.Array,
    nms_radius: int = 1,
    bin_size: int = 2,
    k_per_bin: int = 4,
    k_total: int = 1024,
    score_threshold: float = 0.0,
    nms_mode: str = "hard",
):
    """NMS + binned top-k in one program. See :func:`select_topk_binned`.

    nms_mode:
      * ``"hard"`` — only strict local maxima survive (classic NMS).  On a
        coarse ViT token grid this caps the yield structurally: a 34x45
        map (480x640 / patch 14) has ~100-150 local maxima, which starved
        the frozen extractor below COLMAP's 30-inlier initialization floor
        on wide-baseline scenes (VERDICT r4 item 4: 0/8 registered with
        911 total keypoints over 8 images).
      * ``"soft"`` — every local maximum still ranks above every
        non-maximum (scores of maxima are lifted by +1; saliency maps are
        normalized to [0, 1] so the lift is a strict separator), but
        non-maxima stay eligible as budget fill.  The binned top-k then
        spreads the fill spatially.  When maxima are plentiful the
        selection is identical to hard NMS; when they are scarce the
        budget fills instead of starving.
    """
    peaks = nms_maxpool(scores, nms_radius)
    if nms_mode == "soft":
        s = jnp.where(peaks > score_threshold, scores + 1.0, scores)
    elif nms_mode == "hard":
        s = peaks
    else:
        raise ValueError(f"unknown nms_mode {nms_mode!r}")
    s = jnp.where(s > score_threshold, s, 0.0)
    return select_topk_binned(s, bin_size, k_per_bin, k_total)
