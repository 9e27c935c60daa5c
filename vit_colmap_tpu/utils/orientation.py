"""Keypoint orientation from image gradients — vectorized.

The reference keeps two implementations (``utils/orientation.py:12-364``): a
SIFT-style 36-bin histogram with Python loops (reference-only) and the
``compute_keypoint_orientations_simple`` gradient-direction variant actually
used in training (chosen for ~100x speedup, ``docs/SIMPLIFIED_ORIENTATION.md``).
Only the simple variant is implemented here — it is already a pure gather +
atan2 and is the training ground truth.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vit_colmap_tpu.ops.interpolate import bilinear_sample


def rgb_to_gray(images: jax.Array) -> jax.Array:
    """(B, H, W, 3) in [0,1] or uint8 -> (B, H, W) luminance."""
    x = images.astype(jnp.float32)
    return 0.299 * x[..., 0] + 0.587 * x[..., 1] + 0.114 * x[..., 2]


def compute_image_gradients(gray: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central differences with edge replication on (B, H, W)."""
    xp = jnp.pad(gray, [(0, 0), (1, 1), (1, 1)], "edge")
    gx = (xp[:, 1:-1, 2:] - xp[:, 1:-1, :-2]) / 2.0
    gy = (xp[:, 2:, 1:-1] - xp[:, :-2, 1:-1]) / 2.0
    return gx, gy


def compute_keypoint_orientations_histogram(
    gray: jax.Array,  # (B, H, W)
    kpts: jax.Array,  # (B, K, 2) pixel coords
    num_bins: int = 36,
    radius: int = 8,
) -> jax.Array:
    """SIFT-style 36-bin Gaussian-weighted orientation histogram.

    The reference keeps an O(B*K) Python-loop version of this for reference
    (``utils/orientation.py:70-209``); here it is the same vectorized
    one-hot-einsum histogram the SIFT descriptor pipeline uses
    (:func:`vit_colmap_tpu.ops.sift.dominant_orientation`).
    Returns (B, K) angles.
    """
    from vit_colmap_tpu.ops.sift import dominant_orientation

    return dominant_orientation(gray, kpts, num_bins=num_bins, radius=radius)


def compute_keypoint_orientations_simple(
    gray: jax.Array,  # (B, H, W)
    kpts: jax.Array,  # (B, K, 2) pixel coords (x, y)
    smooth_sigma: float = 1.0,
) -> jax.Array:
    """Gradient direction at keypoints (reference ``orientation.py:212-300``).

    Gradients are softly averaged by sampling a lightly-blurred gradient
    field (stand-in for the reference's optional 5x5 window average).
    Returns (B, K) angles in (-pi, pi]; NaNs mapped to 0.
    """
    from vit_colmap_tpu.ops.scoring import gaussian_blur

    gx, gy = compute_image_gradients(gray)
    if smooth_sigma > 0:
        gx = gaussian_blur(gx, smooth_sigma)
        gy = gaussian_blur(gy, smooth_sigma)
    gxy = jnp.stack([gx, gy], axis=-1)  # (B, H, W, 2)
    g = jax.vmap(bilinear_sample)(gxy, kpts)  # (B, K, 2)
    ang = jnp.arctan2(g[..., 1], g[..., 0])
    return jnp.nan_to_num(ang)
