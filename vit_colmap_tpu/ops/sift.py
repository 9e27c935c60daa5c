"""SIFT (DoG keypoints + gradient-histogram descriptors) in pure JAX.

The reference gets SIFT for free from COLMAP's C++/CUDA implementation
(``features/colmap_sift_extractor.py:9-43``); this environment links no
native COLMAP, so the framework ships its own accelerator-friendly SIFT:

* Gaussian scale-space + difference-of-Gaussians per octave, built from
  separable convolutions,
* extrema: 3x3x3 neighborhood max/min via ``reduce_window`` + contrast and
  Hessian edge-ratio tests — all dense map ops, no candidate loops,
* fixed-k selection per octave (top-k by |DoG|) with validity masks,
* dominant orientation from a Gaussian-weighted 36-bin histogram computed
  with a one-hot einsum over a gathered patch,
* 4x4x8 descriptor sampled on an orientation-rotated grid, trilinearly
  binned, L2-normalized, clipped at 0.2, x512 uint8 (COLMAP convention).

Every stage is batched over images and keypoints; octaves are separate
jitted programs (static shapes halve per octave).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.ops.interpolate import bilinear_sample
from vit_colmap_tpu.ops.scoring import gaussian_blur


def _blur(x: jax.Array, sigma: float) -> jax.Array:
    return gaussian_blur(x, float(sigma)) if sigma > 0 else x


@partial(jax.jit, static_argnames=("num_scales", "sigma0"))
def build_octave(gray: jax.Array, num_scales: int = 3, sigma0: float = 1.6):
    """One octave of scale space: (B, H, W) -> gauss (B, S+3, H, W),
    dog (B, S+2, H, W)."""
    k = 2.0 ** (1.0 / num_scales)
    sigmas = [sigma0 * (k**i) for i in range(num_scales + 3)]
    levels = [_blur(gray, sigmas[0])]
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
    extremum = (is_max | is_min) & (jnp.abs(dog) > contrast_thresh)

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


@partial(jax.jit, static_argnames=("num_bins", "radius"))
def dominant_orientation(
    gauss: jax.Array,  # (B, H, W) the keypoint's gaussian level (approx)
    xy: jax.Array,  # (B, K, 2)
    num_bins: int = 36,
    radius: int = 8,
):
    """Gaussian-weighted gradient-orientation histogram -> dominant angle."""
    B, H, W = gauss.shape
    xp = jnp.pad(gauss, [(0, 0), (1, 1), (1, 1)], "edge")
    gx = (xp[:, 1:-1, 2:] - xp[:, 1:-1, :-2]) / 2.0
    gy = (xp[:, 2:, 1:-1] - xp[:, :-2, 1:-1]) / 2.0
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)  # (-pi, pi]

    # Sample a (2r+1)^2 patch of mag/angle around each keypoint.
    offs = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    oy, ox = jnp.meshgrid(offs, offs, indexing="ij")
    grid = jnp.stack([ox.ravel(), oy.ravel()], axis=-1)  # (P, 2)
    P = grid.shape[0]
    pts = xy[:, :, None, :] + grid[None, None]  # (B, K, P, 2)
    K = xy.shape[1]
    flat_pts = pts.reshape(B, K * P, 2)
    fm = jnp.stack([mag, ang], axis=-1)  # (B, H, W, 2)
    samp = jax.vmap(bilinear_sample)(fm, flat_pts).reshape(B, K, P, 2)
    m, a = samp[..., 0], samp[..., 1]

    w = jnp.exp(-(ox.ravel() ** 2 + oy.ravel() ** 2) / (2.0 * (radius / 2.0) ** 2))
    bins = jnp.floor((a + jnp.pi) / (2 * jnp.pi) * num_bins).astype(jnp.int32)
    bins = jnp.clip(bins, 0, num_bins - 1)
    onehot = jax.nn.one_hot(bins, num_bins)  # (B, K, P, nb)
    hist = jnp.einsum("bkp,bkpn->bkn", m * w[None, None], onehot)
    # Circular smoothing x2.
    for _ in range(2):
        hist = (jnp.roll(hist, 1, -1) + hist + jnp.roll(hist, -1, -1)) / 3.0
    peak = jnp.argmax(hist, axis=-1)
    return (peak.astype(jnp.float32) + 0.5) / num_bins * 2 * jnp.pi - jnp.pi


@partial(jax.jit, static_argnames=("window",))
def sift_descriptors(
    gauss: jax.Array,  # (B, H, W)
    xy: jax.Array,  # (B, K, 2)
    orientation: jax.Array,  # (B, K)
    scale_px: jax.Array,  # (B, K) descriptor window scale in pixels
    window: int = 16,
):
    """4x4 spatial x 8 orientation SIFT descriptor on a rotated grid ->
    (B, K, 128) uint8 (L2-normalize, clip 0.2, renormalize, x512)."""
    B, H, W = gauss.shape
    K = xy.shape[1]
    xp = jnp.pad(gauss, [(0, 0), (1, 1), (1, 1)], "edge")
    gx = (xp[:, 1:-1, 2:] - xp[:, 1:-1, :-2]) / 2.0
    gy = (xp[:, 2:, 1:-1] - xp[:, :-2, 1:-1]) / 2.0
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    fm = jnp.stack([mag, ang], axis=-1)

    # window x window sample grid in keypoint-relative units [-0.5, 0.5).
    u = (jnp.arange(window, dtype=jnp.float32) + 0.5) / window - 0.5
    uy, ux = jnp.meshgrid(u, u, indexing="ij")
    rel = jnp.stack([ux.ravel(), uy.ravel()], axis=-1)  # (P, 2)
    P = rel.shape[0]

    cos = jnp.cos(orientation)[..., None]
    sin = jnp.sin(orientation)[..., None]
    rx = rel[None, None, :, 0] * cos - rel[None, None, :, 1] * sin
    ry = rel[None, None, :, 0] * sin + rel[None, None, :, 1] * cos
    size = scale_px[..., None]  # (B, K, 1)
    pts = jnp.stack(
        [xy[..., 0:1] + rx * size, xy[..., 1:2] + ry * size], axis=-1
    )  # (B, K, P, 2)
    samp = jax.vmap(bilinear_sample)(fm, pts.reshape(B, K * P, 2)).reshape(
        B, K, P, 2
    )
    m = samp[..., 0]
    a = samp[..., 1] - orientation[..., None]  # rotate to kp frame

    # Spatial bin of each sample (4x4), orientation bin (8), trilinear-ish
    # soft assignment via one-hots on nearest bins.
    cell = jnp.clip((rel + 0.5) * 4.0, 0.0, 3.999)  # (P, 2)
    cx = jnp.floor(cell[:, 0]).astype(jnp.int32)
    cy = jnp.floor(cell[:, 1]).astype(jnp.int32)
    spatial_bin = cy * 4 + cx  # (P,)
    sp_onehot = jax.nn.one_hot(spatial_bin, 16)  # (P, 16)

    a = jnp.mod(a + jnp.pi, 2 * jnp.pi)  # [0, 2pi)
    ob = jnp.clip(jnp.floor(a / (2 * jnp.pi) * 8.0), 0, 7).astype(jnp.int32)
    ob_onehot = jax.nn.one_hot(ob, 8)  # (B, K, P, 8)

    gw = jnp.exp(-(rel[:, 0] ** 2 + rel[:, 1] ** 2) / (2 * 0.25**2 * 4))
    weighted = m * gw[None, None]  # (B, K, P)
    desc = jnp.einsum("bkp,pn,bkpo->bkno", weighted, sp_onehot, ob_onehot)
    desc = desc.reshape(B, K, 128)

    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = jnp.clip(desc / norm, 0.0, 0.2)
    norm = jnp.maximum(jnp.linalg.norm(desc, axis=-1, keepdims=True), 1e-8)
    desc = desc / norm
    return jnp.clip(desc * 512.0, 0.0, 255.0).astype(jnp.uint8)


def extract_sift(
    gray: np.ndarray,  # (B, H, W) float32 in [0, 1]
    max_keypoints: int = 4096,
    num_octaves: int = 4,
    num_scales: int = 3,
    contrast_thresh: float = 0.02,
):
    """Full multi-octave SIFT. Host orchestration over per-octave jitted
    programs; returns (kpts (N, 4) [x, y, scale, orientation] per image as a
    list, desc list) in image pixel coordinates.
    """
    B, H, W = gray.shape
    per_oct = max(max_keypoints // num_octaves, 64)
    results = [[] for _ in range(B)]

    img = jnp.asarray(gray)
    for o in range(num_octaves):
        if min(img.shape[1], img.shape[2]) < 32:
            break
        gauss, dog = build_octave(img, num_scales=num_scales)
        xy, s_idx, score, valid = find_extrema(
            dog, k_per_octave=per_oct, contrast_thresh=contrast_thresh
        )
        # Use the middle gaussian level for gradients (approximation: one
        # level per octave keeps programs static-shaped).
        level = gauss[:, num_scales // 2 + 1]
        orient = dominant_orientation(level, xy)
        sigma0 = 1.6
        k = 2.0 ** (1.0 / num_scales)
        scale_px = (sigma0 * (k ** s_idx.astype(jnp.float32))) * 8.0
        desc = sift_descriptors(level, xy, orient, scale_px)

        xy_np = np.asarray(xy)
        orient_np = np.asarray(orient)
        scale_np = np.asarray(scale_px) / 8.0 * (2**o)
        valid_np = np.asarray(valid)
        desc_np = np.asarray(desc)
        score_np = np.asarray(score)
        factor = 2**o
        for b in range(B):
            v = valid_np[b]
            if v.any():
                kp = np.stack(
                    [
                        xy_np[b, v, 0] * factor,
                        xy_np[b, v, 1] * factor,
                        scale_np[b, v],
                        orient_np[b, v],
                    ],
                    axis=1,
                ).astype(np.float32)
                results[b].append((kp, desc_np[b, v], score_np[b, v]))
        # Downsample for the next octave.
        img = gauss[:, num_scales][:, ::2, ::2]

    kpts_out, desc_out = [], []
    for b in range(B):
        if results[b]:
            kp = np.concatenate([r[0] for r in results[b]])
            dc = np.concatenate([r[1] for r in results[b]])
            sc = np.concatenate([r[2] for r in results[b]])
            order = np.argsort(-sc)[:max_keypoints]
            kpts_out.append(kp[order])
            desc_out.append(dc[order])
        else:
            kpts_out.append(np.zeros((0, 4), np.float32))
            desc_out.append(np.zeros((0, 128), np.uint8))
    return kpts_out, desc_out
