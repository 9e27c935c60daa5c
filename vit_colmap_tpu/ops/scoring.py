"""Saliency scoring on dense ViT feature maps.

Reimplements the reference's feature-space detectors
(``features/vit_extractor.py:254-394``): Harris corner response on the
structure tensor of channel-mean gradients (k=0.04, blended
0.7*corner + 0.3*edge), difference-of-Gaussians (sigma 1.0/1.6), and their
combination — but as batched, jit-friendly convolutions on (B, H, W) maps
(the reference loops per image on torch tensors).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def _gaussian_kernel1d(sigma: float, radius: int) -> jax.Array:
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / jnp.sum(k)


def gaussian_blur(x: jax.Array, sigma: float) -> jax.Array:
    """Separable Gaussian blur on (B, H, W)."""
    radius = max(1, int(3.0 * sigma + 0.5))
    k = _gaussian_kernel1d(sigma, radius)
    pad = [(0, 0), (radius, radius), (0, 0)]
    xp = jnp.pad(x[..., None], [(0, 0), (radius, radius), (0, 0), (0, 0)], "edge")
    xh = jax.lax.conv_general_dilated(
        xp,
        k.reshape(2 * radius + 1, 1, 1, 1),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    xp = jnp.pad(xh, [(0, 0), (0, 0), (radius, radius), (0, 0)], "edge")
    xv = jax.lax.conv_general_dilated(
        xp,
        k.reshape(1, 2 * radius + 1, 1, 1),
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return xv[..., 0]


def _gradients(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Central-difference gradients on (B, H, W) with edge replication."""
    xp = jnp.pad(x, [(0, 0), (1, 1), (1, 1)], "edge")
    gy = (xp[:, 2:, 1:-1] - xp[:, :-2, 1:-1]) / 2.0
    gx = (xp[:, 1:-1, 2:] - xp[:, 1:-1, :-2]) / 2.0
    return gx, gy


@partial(jax.jit, static_argnames=("k", "corner_weight"))
def harris_response(
    fmap_mean: jax.Array, k: float = 0.04, corner_weight: float = 0.7
) -> jax.Array:
    """Harris response on channel-mean feature map (B, H, W).

    Structure tensor entries smoothed with sigma=1; blended
    corner_weight * corner + (1 - corner_weight) * edge response, matching
    the reference's 0.7/0.3 split (``vit_extractor.py:281-348``).
    """
    gx, gy = _gradients(fmap_mean)
    ixx = gaussian_blur(gx * gx, 1.0)
    iyy = gaussian_blur(gy * gy, 1.0)
    ixy = gaussian_blur(gx * gy, 1.0)
    det = ixx * iyy - ixy * ixy
    tr = ixx + iyy
    corner = det - k * tr * tr
    edge = jnp.sqrt(gx * gx + gy * gy)

    def norm01(v):
        lo = jnp.min(v, axis=(-2, -1), keepdims=True)
        hi = jnp.max(v, axis=(-2, -1), keepdims=True)
        return (v - lo) / jnp.maximum(hi - lo, 1e-8)

    return corner_weight * norm01(corner) + (1.0 - corner_weight) * norm01(edge)


@partial(jax.jit, static_argnames=("sigma1", "sigma2"))
def dog_response(
    fmap_mean: jax.Array, sigma1: float = 1.0, sigma2: float = 1.6
) -> jax.Array:
    """|DoG| response on channel-mean map (reference ``vit_extractor.py:350-394``)."""
    d = gaussian_blur(fmap_mean, sigma1) - gaussian_blur(fmap_mean, sigma2)
    d = jnp.abs(d)
    lo = jnp.min(d, axis=(-2, -1), keepdims=True)
    hi = jnp.max(d, axis=(-2, -1), keepdims=True)
    return (d - lo) / jnp.maximum(hi - lo, 1e-8)


def compute_saliency(
    fmap: jax.Array, method: str = "combined"
) -> jax.Array:
    """fmap: (B, H, W, C) patch features -> (B, H, W) saliency in [0, 1]."""
    mean_map = jnp.mean(fmap, axis=-1)
    if method == "harris":
        return harris_response(mean_map)
    if method == "dog":
        return dog_response(mean_map)
    if method == "combined":
        return 0.5 * harris_response(mean_map) + 0.5 * dog_response(mean_map)
    raise ValueError(f"Unknown saliency method: {method}")
