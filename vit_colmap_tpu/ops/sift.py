"""SIFT (DoG keypoints + gradient-histogram descriptors) in pure JAX.

The reference gets SIFT for free from COLMAP's C++/CUDA implementation
(``features/colmap_sift_extractor.py:9-43``); this environment links no
native COLMAP, so the framework ships its own accelerator-friendly SIFT:

* Gaussian scale-space + difference-of-Gaussians per octave, built from
  separable convolutions,
* extrema: 3x3x3 neighborhood max/min via ``reduce_window`` + contrast and
  Hessian edge-ratio tests — all dense map ops, no candidate loops,
* **sub-pixel/sub-scale refinement**: one quadratic (3D Hessian) step at the
  selected extrema with a refined-contrast re-test (Lowe §4; solved by
  Cramer's rule, batched over keypoints),
* fixed-k selection per octave (top-k by |DoG|) with validity masks,
* dominant orientation from a Gaussian-weighted 36-bin histogram on the
  keypoint's **own gaussian level** with scale-proportional window,
  6x circular smoothing and quadratic peak interpolation (COLMAP/VLFeat
  conventions),
* 4x4x8 descriptor on an orientation-rotated, scale-proportional grid with
  **trilinear** (soft x/y/orientation) binning, L2-normalize, clip 0.2,
  renormalize, x512 uint8 (COLMAP convention).

Every stage is batched over images and keypoints, and the whole multi-
octave pipeline (including the final cross-octave top-k selection) fuses
into ONE jitted program per (B, H, W) shape — one device dispatch per image
batch, one disk-cacheable compile.  Per-keypoint gradient levels ride a
level-stacked feature map + per-band coordinate clamping, so no gather
crosses scale levels and shapes stay static.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.ops.interpolate import bilinear_sample
from vit_colmap_tpu.ops.scoring import gaussian_blur

SIGMA0 = 1.6
ORI_SIGMA_FACTOR = 1.5  # orientation window sigma = 1.5 * keypoint sigma
ORI_WINDOW_FACTOR = 3.0  # sample radius = 3 * window sigma
DESC_BIN_SIGMA = 3.0  # descriptor spatial bin size = 3 * keypoint sigma


def _blur(x: jax.Array, sigma: float) -> jax.Array:
    return gaussian_blur(x, float(sigma)) if sigma > 0 else x


@partial(jax.jit, static_argnames=("num_scales", "sigma0", "input_sigma"))
def build_octave(
    gray: jax.Array,
    num_scales: int = 3,
    sigma0: float = SIGMA0,
    input_sigma: float = 0.5,
):
    """One octave of scale space: (B, H, W) -> gauss (B, S+3, H, W),
    dog (B, S+2, H, W).

    ``input_sigma`` is the blur the input already carries (camera blur 0.5
    for raw images, 1.0 after 2x upsampling, sigma0 for downsampled octave
    chaining) — the first level only adds the increment to reach sigma0,
    instead of re-blurring by the full amount (which loses fine extrema).
    """
    k = 2.0 ** (1.0 / num_scales)
    sigmas = [sigma0 * (k**i) for i in range(num_scales + 3)]
    inc0 = float(np.sqrt(max(sigmas[0] ** 2 - input_sigma**2, 0.0)))
    levels = [_blur(gray, inc0)]
    for i in range(1, num_scales + 3):
        inc = float(np.sqrt(max(sigmas[i] ** 2 - sigmas[i - 1] ** 2, 1e-6)))
        levels.append(_blur(levels[-1], inc))
    gauss = jnp.stack(levels, axis=1)
    dog = gauss[:, 1:] - gauss[:, :-1]
    return gauss, dog


@partial(jax.jit, static_argnames=("k_per_octave", "contrast_thresh", "edge_thresh"))
def find_extrema(
    dog: jax.Array,  # (B, S+2, H, W)
    k_per_octave: int = 512,
    contrast_thresh: float = 0.02,
    edge_thresh: float = 10.0,
):
    """3D local extrema of |DoG| with contrast + edge tests.

    Returns (xy (B, K, 2) in octave pixels, scale_idx (B, K), score (B, K),
    valid (B, K)).
    """
    B, S, H, W = dog.shape

    def window_max(x, sign):
        return jax.lax.reduce_window(
            x * sign,
            -jnp.inf,
            jax.lax.max,
            window_dimensions=(1, 3, 3, 3),
            window_strides=(1, 1, 1, 1),
            padding=((0, 0), (1, 1), (1, 1), (1, 1)),
        )

    is_max = dog >= window_max(dog, 1.0)
    is_min = -dog >= window_max(dog, -1.0)
    # Relaxed pre-test at half threshold (cv2 convention); the full-strength
    # contrast test runs on the refined value in refine_extrema.
    extremum = (is_max | is_min) & (jnp.abs(dog) > 0.5 * contrast_thresh)

    # Edge rejection: 2D Hessian trace/det ratio on each scale slice.
    d = dog
    dxx = jnp.roll(d, -1, 3) + jnp.roll(d, 1, 3) - 2 * d
    dyy = jnp.roll(d, -1, 2) + jnp.roll(d, 1, 2) - 2 * d
    dxy = (
        jnp.roll(jnp.roll(d, -1, 2), -1, 3)
        - jnp.roll(jnp.roll(d, -1, 2), 1, 3)
        - jnp.roll(jnp.roll(d, 1, 2), -1, 3)
        + jnp.roll(jnp.roll(d, 1, 2), 1, 3)
    ) / 4.0
    tr = dxx + dyy
    det = dxx * dyy - dxy * dxy
    r = edge_thresh
    edge_ok = (det > 0) & (tr * tr * r < (r + 1.0) ** 2 * det)

    # Only interior scales (1..S-2) are true 3D extrema candidates.
    scale_ok = jnp.zeros((1, S, 1, 1), bool).at[:, 1 : S - 1].set(True)
    border = 8
    spatial_ok = jnp.zeros((1, 1, H, W), bool)
    if H > 2 * border and W > 2 * border:
        spatial_ok = spatial_ok.at[:, :, border:-border, border:-border].set(True)
    keep = extremum & edge_ok & scale_ok & spatial_ok

    score = jnp.where(keep, jnp.abs(dog), 0.0).reshape(B, -1)
    k = min(k_per_octave, score.shape[1])
    top, idx = jax.lax.top_k(score, k)
    s_idx = idx // (H * W)
    rem = idx % (H * W)
    ys = (rem // W).astype(jnp.float32)
    xs = (rem % W).astype(jnp.float32)
    valid = top > 0
    return jnp.stack([xs, ys], axis=-1), s_idx, top, valid


@partial(jax.jit, static_argnames=("contrast_thresh",))
def refine_extrema(
    dog: jax.Array,  # (B, S+2, H, W)
    xy: jax.Array,  # (B, K, 2) integer positions as floats
    s_idx: jax.Array,  # (B, K) int32
    valid: jax.Array,  # (B, K)
    contrast_thresh: float = 0.02,
):
    """One quadratic sub-pixel/sub-scale refinement step (Lowe §4).

    Fits D(x) ~ D + gᵀdx + 0.5 dxᵀ H dx on the 3x3x3 neighborhood and steps
    to the stationary point (clamped to ±0.6 per axis; a single step, as in
    SiftGPU).  Re-tests the interpolated contrast |D̂| = |D + 0.5 gᵀdx|.
    Returns (xy_refined, s_refined (float), valid_refined).
    """
    B, S, H, W = dog.shape
    xi = jnp.clip(xy[..., 0].astype(jnp.int32), 1, W - 2)
    yi = jnp.clip(xy[..., 1].astype(jnp.int32), 1, H - 2)
    si = jnp.clip(s_idx, 1, S - 2)

    def gather(b_dog, sc, yc, xc):
        # (S,H,W), scalars -> 3x3x3 neighborhood (3,3,3)
        off = jnp.arange(-1, 2)
        return b_dog[
            sc + off[:, None, None], yc + off[None, :, None], xc + off[None, None, :]
        ]

    nb = jax.vmap(jax.vmap(gather, in_axes=(None, 0, 0, 0)))(dog, si, yi, xi)
    # Derivatives (central differences on the cube). Axis order: (s, y, x).
    d = nb[..., 1, 1, 1]
    gs = (nb[..., 2, 1, 1] - nb[..., 0, 1, 1]) / 2
    gy = (nb[..., 1, 2, 1] - nb[..., 1, 0, 1]) / 2
    gx = (nb[..., 1, 1, 2] - nb[..., 1, 1, 0]) / 2
    hss = nb[..., 2, 1, 1] + nb[..., 0, 1, 1] - 2 * d
    hyy = nb[..., 1, 2, 1] + nb[..., 1, 0, 1] - 2 * d
    hxx = nb[..., 1, 1, 2] + nb[..., 1, 1, 0] - 2 * d
    hsy = (nb[..., 2, 2, 1] - nb[..., 2, 0, 1] - nb[..., 0, 2, 1] + nb[..., 0, 0, 1]) / 4
    hsx = (nb[..., 2, 1, 2] - nb[..., 2, 1, 0] - nb[..., 0, 1, 2] + nb[..., 0, 1, 0]) / 4
    hyx = (nb[..., 1, 2, 2] - nb[..., 1, 2, 0] - nb[..., 1, 0, 2] + nb[..., 1, 0, 0]) / 4

    # Solve H dx = -g by Cramer's rule (batched scalars — no linalg calls).
    det = (
        hss * (hyy * hxx - hyx * hyx)
        - hsy * (hsy * hxx - hyx * hsx)
        + hsx * (hsy * hyx - hyy * hsx)
    )
    safe = jnp.abs(det) > 1e-12
    det = jnp.where(safe, det, 1.0)
    b1, b2, b3 = -gs, -gy, -gx
    ds = (
        b1 * (hyy * hxx - hyx * hyx)
        - hsy * (b2 * hxx - hyx * b3)
        + hsx * (b2 * hyx - hyy * b3)
    ) / det
    dy = (
        hss * (b2 * hxx - b3 * hyx)
        - b1 * (hsy * hxx - hyx * hsx)
        + hsx * (hsy * b3 - b2 * hsx)
    ) / det
    dx = (
        hss * (hyy * b3 - b2 * hyx)
        - hsy * (hsy * b3 - b2 * hsx)
        + b1 * (hsy * hyx - hyy * hsx)
    ) / det
    lim = 0.6
    ds = jnp.clip(jnp.where(safe, ds, 0.0), -lim, lim)
    dy = jnp.clip(jnp.where(safe, dy, 0.0), -lim, lim)
    dx = jnp.clip(jnp.where(safe, dx, 0.0), -lim, lim)

    d_hat = d + 0.5 * (gs * ds + gy * dy + gx * dx)
    valid = valid & (jnp.abs(d_hat) >= contrast_thresh)
    xy_ref = jnp.stack(
        [xi.astype(jnp.float32) + dx, yi.astype(jnp.float32) + dy], axis=-1
    )
    s_ref = si.astype(jnp.float32) + ds
    return xy_ref, s_ref, valid


def _gradient_fm(levels: jax.Array) -> jax.Array:
    """(B, L, H, W) gaussian levels -> (B, L, H, W, 2) [magnitude, angle]."""
    xp = jnp.pad(levels, [(0, 0), (0, 0), (1, 1), (1, 1)], "edge")
    gx = (xp[:, :, 1:-1, 2:] - xp[:, :, 1:-1, :-2]) / 2.0
    gy = (xp[:, :, 2:, 1:-1] - xp[:, :, :-2, 1:-1]) / 2.0
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # (-pi, pi]
    return jnp.stack([mag, ang], axis=-1)


def _sample_level_stacked(
    fm_stacked: jax.Array,  # (B, L*H, W, 2) levels concatenated along y
    pts: jax.Array,  # (B, K, P, 2) octave pixel coords
    level: jax.Array,  # (B, K) int32 gradient level per keypoint
    H: int,
    W: int,
):
    """Bilinear-sample (mag, ang) at pts from each keypoint's own level.

    Coordinates clamp to the level band BEFORE the band offset is added, so
    no sample bleeds into a neighboring scale level (static shapes, single
    gather program)."""
    B, K, P, _ = pts.shape
    x = jnp.clip(pts[..., 0], 0.0, W - 1.0)
    y = jnp.clip(pts[..., 1], 0.0, H - 1.0)
    y = y + (level[..., None].astype(jnp.float32) * H)
    flat = jnp.stack([x, y], axis=-1).reshape(B, K * P, 2)
    return jax.vmap(bilinear_sample)(fm_stacked, flat).reshape(B, K, P, 2)


def _quad_interp_bins(hist: jax.Array, p: jax.Array) -> jax.Array:
    """Quadratic interpolation of circular-histogram bins ``p`` (int,
    same leading shape as hist minus last axis, trailing axis = #peaks)
    -> angles in (-pi, pi]."""
    nb = hist.shape[-1]
    c = jnp.take_along_axis(hist, p, -1)
    left = jnp.take_along_axis(hist, (p - 1) % nb, -1)
    right = jnp.take_along_axis(hist, (p + 1) % nb, -1)
    denom = left - 2 * c + right
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (left - right) / denom, 0.0)
    off = jnp.clip(off, -0.5, 0.5)
    return (p.astype(jnp.float32) + 0.5 + off) / nb * 2 * jnp.pi - jnp.pi


def _interp_peak(hist: jax.Array) -> jax.Array:
    """Quadratic interpolation of the circular-histogram peak -> angle in
    (-pi, pi].  hist: (..., nb)."""
    p = jnp.argmax(hist, axis=-1)
    return _quad_interp_bins(hist, p[..., None])[..., 0]


def _peaks_from_hist(hist: jax.Array, max_peaks: int, peak_ratio: float):
    """Top ``max_peaks`` local maxima of a smoothed circular histogram, the
    COLMAP/VLFeat multi-orientation rule: every local max >= peak_ratio *
    global max yields a keypoint copy (COLMAP SiftExtractionOptions
    peak_threshold 0.8, max_num_orientations 2).  Returns (angles
    (..., max_peaks), valid (..., max_peaks)); slot 0 is always the global
    max."""
    nb = hist.shape[-1]
    left = jnp.roll(hist, 1, -1)
    right = jnp.roll(hist, -1, -1)
    gmax = jnp.max(hist, -1, keepdims=True)
    qualified = (
        (hist > left) & (hist >= right) & (hist >= peak_ratio * gmax)
    ) | (hist >= gmax)
    vals = jnp.where(qualified & (hist > 0), hist, -jnp.inf)
    top_v, top_i = jax.lax.top_k(vals, max_peaks)
    valid = jnp.isfinite(top_v)
    ang = _quad_interp_bins(hist, top_i)
    return ang, valid


def _orientation_hist(m, a, w, num_bins):
    """(B, K, P) magnitude/angle/weight -> smoothed 36-bin circular
    histogram (6x smoothing, COLMAP convention)."""
    bins = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * num_bins).astype(jnp.int32)
    bins = jnp.clip(bins, 0, num_bins - 1)
    onehot = jax.nn.one_hot(bins, num_bins)  # (B, K, P, nb)
    hist = jnp.einsum("bkp,bkpn->bkn", m * w, onehot)
    for _ in range(6):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    return hist


def _orientation_from_samples(m, a, w, num_bins):
    """(B, K, P) magnitude/angle/weight -> dominant angle."""
    return _interp_peak(_orientation_hist(m, a, w, num_bins))


@partial(jax.jit, static_argnames=("num_bins", "radius"))
def dominant_orientation(
    gauss: jax.Array,  # (B, H, W) single gradient source level
    xy: jax.Array,  # (B, K, 2)
    num_bins: int = 36,
    radius: int = 8,
):
    """Single-level dominant orientation (kept for
    :mod:`vit_colmap_tpu.utils.orientation`): fixed pixel window, Gaussian
    sigma = radius/2, 6x smoothing + quadratic peak interpolation."""
    B, H, W = gauss.shape
    fm = _gradient_fm(gauss[:, None])[:, 0]  # (B, H, W, 2)
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (P, 2)
    pts = xy[:, :, None, :] + grid[None, None]
    K = xy.shape[1]
    samp = jax.vmap(bilinear_sample)(
        fm, pts.reshape(B, K * grid.shape[0], 2)
    ).reshape(B, K, grid.shape[0], 2)
    w = jnp.exp(-(ox.ravel() ** 2 + oy.ravel() ** 2) / (2.0 * (radius / 2.0) ** 2))
    return _orientation_from_samples(samp[..., 0], samp[..., 1], w[None, None], num_bins)


@partial(jax.jit, static_argnames=("num_bins", "grid_radius"))
def dominant_orientation_multilevel(
    fm_stacked: jax.Array,  # (B, L*H, W, 2)
    xy: jax.Array,  # (B, K, 2)
    level: jax.Array,  # (B, K) int32
    sigma_kp: jax.Array,  # (B, K) keypoint sigma in octave pixels
    H: int,
    W: int,
    num_bins: int = 36,
    grid_radius: int = 8,
):
    """Scale-adaptive orientation on the keypoint's own gaussian level:
    window radius 3 * (1.5 sigma), Gaussian weight sigma 1.5 sigma (Lowe /
    COLMAP), sampled on a fixed (2r+1)^2 grid scaled per keypoint."""
    offs = jnp.arange(-grid_radius, grid_radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (P, 2) unit steps
    win_sigma = ORI_SIGMA_FACTOR * sigma_kp  # (B, K)
    step = (ORI_WINDOW_FACTOR * win_sigma / grid_radius)[..., None, None]
    pts = xy[:, :, None, :] + grid[None, None] * step
    samp = _sample_level_stacked(fm_stacked, pts, level, H, W)
    r2 = (grid[:, 0] ** 2 + grid[:, 1] ** 2)[None, None] * step[..., 0] ** 2
    w = jnp.exp(-r2 / (2.0 * win_sigma[..., None] ** 2))
    return _orientation_from_samples(samp[..., 0], samp[..., 1], w, num_bins)


@partial(jax.jit, static_argnames=("num_bins", "grid_radius", "max_peaks"))
def orientation_peaks_multilevel(
    fm_stacked: jax.Array,  # (B, L*H, W, 2)
    xy: jax.Array,  # (B, K, 2)
    level: jax.Array,  # (B, K) int32
    sigma_kp: jax.Array,  # (B, K)
    H: int,
    W: int,
    num_bins: int = 36,
    grid_radius: int = 8,
    max_peaks: int = 2,
    peak_ratio: float = 0.8,
):
    """Multi-orientation variant of :func:`dominant_orientation_multilevel`:
    returns (angles (B, K, max_peaks), valid (B, K, max_peaks)).  COLMAP
    emits one keypoint copy per qualifying orientation peak (VLFeat
    convention, reference native surface
    ``features/colmap_sift_extractor.py:38-43``)."""
    offs = jnp.arange(-grid_radius, grid_radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)
    win_sigma = ORI_SIGMA_FACTOR * sigma_kp
    step = (ORI_WINDOW_FACTOR * win_sigma / grid_radius)[..., None, None]
    pts = xy[:, :, None, :] + grid[None, None] * step
    samp = _sample_level_stacked(fm_stacked, pts, level, H, W)
    r2 = (grid[:, 0] ** 2 + grid[:, 1] ** 2)[None, None] * step[..., 0] ** 2
    w = jnp.exp(-r2 / (2.0 * win_sigma[..., None] ** 2))
    hist = _orientation_hist(samp[..., 0], samp[..., 1], w, num_bins)
    return _peaks_from_hist(hist, max_peaks, peak_ratio)


def _descriptor_core(m, a_rel, rel_np, window):
    """Trilinear 4x4x8 binning.

    m: (B, K, P) Gaussian-weighted magnitudes; a_rel: (B, K, P) angles in the
    keypoint frame; rel_np: (P, 2) static numpy grid coords in [-0.5, 0.5).
    Spatial bin coords are static (the sample grid is fixed), so the x/y
    soft-assign weights fold into four static (P, 16) matrices; only the
    orientation bins are dynamic.
    """
    B, K, P = m.shape
    c = (rel_np + 0.5) * 4.0 - 0.5  # bin coords in [-0.5, 3.5]
    c0 = np.floor(c).astype(np.int32)
    fr = (c - c0).astype(np.float32)

    sp_mats = []
    for sy_ in (0, 1):
        for sx_ in (0, 1):
            ix = c0[:, 0] + sx_
            iy = c0[:, 1] + sy_
            wxy = (fr[:, 0] if sx_ else 1 - fr[:, 0]) * (
                fr[:, 1] if sy_ else 1 - fr[:, 1]
            )
            ok = (ix >= 0) & (ix <= 3) & (iy >= 0) & (iy <= 3)
            sp_idx = np.clip(iy, 0, 3) * 4 + np.clip(ix, 0, 3)
            onehot = np.zeros((P, 16), np.float32)
            onehot[np.arange(P), sp_idx] = wxy * ok
            sp_mats.append(jnp.asarray(onehot))

    a = jnp.mod(a_rel, 2 * jnp.pi)  # [0, 2pi)
    ob = a / (2 * jnp.pi) * 8.0 - 0.5
    o0 = jnp.floor(ob)
    frac = ob - o0
    o0 = jnp.mod(o0.astype(jnp.int32), 8)

    desc = jnp.zeros((B, K, 16, 8), m.dtype)
    for so in (0, 1):
        io = jnp.mod(o0 + so, 8)
        wo = frac if so else 1 - frac
        ob_onehot = jax.nn.one_hot(io, 8) * wo[..., None]
        for sp_onehot in sp_mats:
            desc = desc + jnp.einsum(
                "bkp,pn,bkpo->bkno", m, sp_onehot, ob_onehot
            )
    desc = desc.reshape(B, K, 128)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = jnp.clip(desc / norm, 0.0, 0.2)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = desc / norm
    return jnp.clip(desc * 512.0, 0.0, 255.0).astype(jnp.uint8)


@partial(jax.jit, static_argnames=("window",))
def sift_descriptors(
    gauss: jax.Array,  # (B, H, W) single gradient source level
    xy: jax.Array,  # (B, K, 2)
    orientation: jax.Array,  # (B, K)
    scale_px: jax.Array,  # (B, K) descriptor window size in pixels
    window: int = 16,
):
    """Single-level descriptor (compat surface; extract_sift uses the
    multilevel variant)."""
    B, H, W = gauss.shape
    fm = _gradient_fm(gauss[:, None]).reshape(B, H, W, 2)
    u_np = (np.arange(window, dtype=np.float32) + 0.5) / window - 0.5
    uy_np, ux_np = np.meshgrid(u_np, u_np, indexing="ij")
    rel_np = np.stack([ux_np.ravel(), uy_np.ravel()], axis=-1)
    rel = jnp.asarray(rel_np)
    P = rel.shape[0]
    K = xy.shape[1]
    cos = jnp.cos(orientation)[..., None]
    sin = jnp.sin(orientation)[..., None]
    rx = rel[None, None, :, 0] * cos - rel[None, None, :, 1] * sin
    ry = rel[None, None, :, 0] * sin + rel[None, None, :, 1] * cos
    size = scale_px[..., None]
    pts = jnp.stack([xy[..., 0:1] + rx * size, xy[..., 1:2] + ry * size], -1)
    samp = jax.vmap(bilinear_sample)(fm, pts.reshape(B, K * P, 2)).reshape(
        B, K, P, 2
    )
    gw = jnp.exp(-(rel[:, 0] ** 2 + rel[:, 1] ** 2) * 2.0)  # sigma=0.5 window
    m = samp[..., 0] * gw[None, None]
    a_rel = samp[..., 1] - orientation[..., None]
    return _descriptor_core(m, a_rel, rel_np, window)


@partial(jax.jit, static_argnames=("window",))
def sift_descriptors_multilevel(
    fm_stacked: jax.Array,  # (B, L*H, W, 2)
    xy: jax.Array,  # (B, K, 2)
    level: jax.Array,  # (B, K)
    orientation: jax.Array,  # (B, K)
    scale_px: jax.Array,  # (B, K) window size in pixels
    H: int,
    W: int,
    window: int = 16,
):
    """Descriptor sampled from each keypoint's own gaussian level."""
    B = fm_stacked.shape[0]
    K = xy.shape[1]
    u_np = (np.arange(window, dtype=np.float32) + 0.5) / window - 0.5
    uy_np, ux_np = np.meshgrid(u_np, u_np, indexing="ij")
    rel_np = np.stack([ux_np.ravel(), uy_np.ravel()], axis=-1)
    rel = jnp.asarray(rel_np)
    P = rel.shape[0]
    cos = jnp.cos(orientation)[..., None]
    sin = jnp.sin(orientation)[..., None]
    rx = rel[None, None, :, 0] * cos - rel[None, None, :, 1] * sin
    ry = rel[None, None, :, 0] * sin + rel[None, None, :, 1] * cos
    size = scale_px[..., None]
    pts = jnp.stack([xy[..., 0:1] + rx * size, xy[..., 1:2] + ry * size], -1)
    samp = _sample_level_stacked(fm_stacked, pts, level, H, W)
    gw = jnp.exp(-(rel[:, 0] ** 2 + rel[:, 1] ** 2) * 2.0)  # sigma=0.5 window
    m = samp[..., 0] * gw[None, None]
    a_rel = samp[..., 1] - orientation[..., None]
    return _descriptor_core(m, a_rel, rel_np, window)


@partial(
    jax.jit,
    static_argnames=(
        "max_keypoints",
        "num_octaves",
        "num_scales",
        "contrast_thresh",
        "first_octave",
        "num_orientations",
        "per_oct",
    ),
)
def _sift_program(
    gray: jax.Array,  # (B, H, W) float32 in [0, 1]
    *,
    max_keypoints: int,
    num_octaves: int,
    num_scales: int,
    contrast_thresh: float,
    first_octave: int,
    num_orientations: int,
    per_oct: int,
):
    """The ENTIRE multi-octave SIFT as one XLA program.

    One dispatch per image batch (the per-octave-stage version cost ~30
    relay round trips per batch plus 30+ small compiles that fall under the
    persistent-cache threshold — this single program is cached on disk and
    replays warm).  Final top-``max_keypoints`` selection happens on device,
    so only the selected keypoints transfer back.

    Returns (kpts (B, K, 4) [x, y, scale, orientation] in image pixel
    coordinates, desc (B, K, 128) uint8, valid (B, K)).
    """
    # TPU matmuls/convs default to bf16 multiply precision; the DoG is a
    # difference of blurs whose values sit near the contrast threshold
    # (0.0133), so bf16 noise creates/destroys extrema and degrades
    # descriptors (SIFT_FIDELITY_r3: 768x1024 case MMA 0.65 on TPU vs 0.92
    # for the same code on CPU f32).  SIFT is a trivial fraction of
    # pipeline compute — run all of it at f32 precision.
    with jax.default_matmul_precision("float32"):
        return _sift_program_body(
            gray,
            max_keypoints=max_keypoints,
            num_octaves=num_octaves,
            num_scales=num_scales,
            contrast_thresh=contrast_thresh,
            first_octave=first_octave,
            num_orientations=num_orientations,
            per_oct=per_oct,
        )


def _sift_program_body(
    gray: jax.Array,
    *,
    max_keypoints: int,
    num_octaves: int,
    num_scales: int,
    contrast_thresh: float,
    first_octave: int,
    num_orientations: int,
    per_oct: int,
):
    B = gray.shape[0]
    # uint8 wire format: callers send raw 8-bit gray (4x fewer H2D bytes —
    # the wire, not the device, bounds extraction on the relay) and the
    # [0, 1] normalization happens here inside the fused program.
    if gray.dtype == jnp.uint8:
        gray = gray.astype(jnp.float32) / 255.0
    img = gray
    base_factor = 1.0
    input_sigma = 0.5  # assumed camera blur of the raw image (Lowe)
    if first_octave < 0:
        H, W = gray.shape[1], gray.shape[2]
        img = jax.image.resize(img, (B, H * 2, W * 2), "linear")
        base_factor = 0.5
        input_sigma = 1.0  # doubled image carries doubled blur
    k = 2.0 ** (1.0 / num_scales)
    outs = []  # per-octave (xy_img, orient, scale_img, valid, desc, score)
    for o in range(num_octaves):
        if min(img.shape[1], img.shape[2]) < 32:
            break
        gauss, dog = build_octave(
            img, num_scales=num_scales, input_sigma=input_sigma
        )
        input_sigma = SIGMA0  # downsampled next input already carries sigma0
        Ho, Wo = gauss.shape[2], gauss.shape[3]
        xy, s_idx, score, valid = find_extrema(
            dog, k_per_octave=per_oct, contrast_thresh=contrast_thresh
        )
        xy, s_ref, valid = refine_extrema(
            dog, xy, s_idx, valid, contrast_thresh=contrast_thresh
        )
        # Gradients come from each keypoint's own gaussian level: DoG index s
        # (difference of gauss s+1 and s) peaks at sigma(gauss level s).
        level = jnp.clip(jnp.round(s_ref).astype(jnp.int32), 0, num_scales + 2)
        sigma_kp = SIGMA0 * jnp.power(k, s_ref)  # octave pixels
        L = num_scales + 3
        fm = _gradient_fm(gauss).reshape(B, L * Ho, Wo, 2)
        if num_orientations > 1:
            # (B, K, Pk) orientation peaks -> one keypoint copy per peak
            # (fixed-shape expansion to K*Pk, masked by peak validity).
            orient_pk, peak_ok = orientation_peaks_multilevel(
                fm, xy, level, sigma_kp, Ho, Wo, max_peaks=num_orientations
            )
            Pk = num_orientations
            K = xy.shape[1]
            xy = jnp.repeat(xy, Pk, axis=1)
            level = jnp.repeat(level, Pk, axis=1)
            sigma_kp = jnp.repeat(sigma_kp, Pk, axis=1)
            orient = orient_pk.reshape(B, K * Pk)
            valid = (valid[:, :, None] & peak_ok).reshape(B, K * Pk)
            # Secondary copies sort just after their primary on score ties.
            score = (
                score[:, :, None] - jnp.arange(Pk, dtype=score.dtype) * 1e-6
            ).reshape(B, K * Pk)
        else:
            orient = dominant_orientation_multilevel(
                fm, xy, level, sigma_kp, Ho, Wo
            )
        # 4 spatial bins x 3*sigma per bin = full window width 12*sigma.
        win_px = DESC_BIN_SIGMA * 4.0 * sigma_kp
        desc = sift_descriptors_multilevel(
            fm, xy, level, orient, win_px, Ho, Wo
        )
        factor = base_factor * 2**o
        outs.append(
            (xy * factor, orient, sigma_kp * factor, valid, desc, score)
        )
        # Downsample for the next octave.
        img = gauss[:, num_scales][:, ::2, ::2]

    xy = jnp.concatenate([t[0] for t in outs], axis=1)  # (B, N, 2)
    orient = jnp.concatenate([t[1] for t in outs], axis=1)
    scale = jnp.concatenate([t[2] for t in outs], axis=1)
    valid = jnp.concatenate([t[3] for t in outs], axis=1)
    desc = jnp.concatenate([t[4] for t in outs], axis=1)
    score = jnp.concatenate([t[5] for t in outs], axis=1)

    # Device-side selection: top max_keypoints by score over all octaves
    # (invalid slots sink to -inf; ties break toward lower index, i.e.
    # octave order, matching the host concatenation order they replaced).
    ranked = jnp.where(valid, score, -jnp.inf)
    k_out = min(max_keypoints, ranked.shape[1])
    top, idx = jax.lax.top_k(ranked, k_out)
    kp = jnp.stack(
        [
            jnp.take_along_axis(xy[..., 0], idx, axis=1),
            jnp.take_along_axis(xy[..., 1], idx, axis=1),
            jnp.take_along_axis(scale, idx, axis=1),
            jnp.take_along_axis(orient, idx, axis=1),
        ],
        axis=-1,
    ).astype(jnp.float32)
    desc_sel = jnp.take_along_axis(desc, idx[..., None], axis=1)
    return kp, desc_sel, jnp.isfinite(top)


def extract_sift(
    gray: np.ndarray,  # (B, H, W) float32 in [0, 1]
    max_keypoints: int = 4096,
    num_octaves: int = 4,
    num_scales: int = 3,
    contrast_thresh: float = 0.0133,
    first_octave: int = -1,
    num_orientations: int = 2,
):
    """Full multi-octave SIFT (one fused XLA program, `_sift_program`);
    returns (kpts (N, 4) [x, y, scale, orientation] per image as a list,
    desc list) in image pixel coordinates.

    ``first_octave=-1`` starts from a 2x-upsampled image (COLMAP/cv2
    default — doubles small-scale keypoint recall); 0 starts at native
    resolution.  ``contrast_thresh`` default matches cv2's effective
    per-layer threshold (0.04 / nlayers) on [0, 1] images.
    ``num_orientations`` emits one keypoint copy per orientation-histogram
    peak >= 0.8x max (COLMAP SiftExtractionOptions.max_num_orientations=2);
    1 restores single-orientation keypoints.
    """
    B = gray.shape[0]
    kp, desc, valid = _sift_program(
        jnp.asarray(gray),
        max_keypoints=max_keypoints,
        num_octaves=num_octaves,
        num_scales=num_scales,
        contrast_thresh=contrast_thresh,
        first_octave=first_octave,
        num_orientations=num_orientations,
        per_oct=max(max_keypoints // num_octaves, 64),
    )
    kp_np = np.asarray(kp)
    desc_np = np.asarray(desc)
    valid_np = np.asarray(valid)

    kpts_out, desc_out = [], []
    for b in range(B):
        v = valid_np[b]
        if v.any():
            kpts_out.append(kp_np[b][v])
            desc_out.append(desc_np[b][v])
        else:
            kpts_out.append(np.zeros((0, 4), np.float32))
            desc_out.append(np.zeros((0, 128), np.uint8))
    return kpts_out, desc_out
