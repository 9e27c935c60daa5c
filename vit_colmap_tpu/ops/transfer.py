"""Host->device transfer compression for image batches.

The axon-relay link measures ~45 MB/s with ~50 ms latency, so raw RGB
transfer (5.7 MB at 1190x1596) floors extraction at ~8 img/s regardless of
compute.  YUV420 (I420) packing sends 1.5 bytes/pixel instead of 3 — the
standard video-pipeline trick — and the chroma upsample + color-space
rotation run on device inside the jitted program (analogous to GPU-side
JPEG decode in production data loaders).

Chroma is subsampled 2x2, so this is lossy for chroma detail; extraction
quality impact is measured in tests/test_transfer.py (match parity with the
RGB path).  Opt-in via ``ViTExtractor(transfer_format="yuv420")``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def pack_yuv420(rgb_u8: np.ndarray) -> np.ndarray:
    """(H, W, 3) uint8 RGB -> (H*3/2, W) uint8 I420 (host, cv2)."""
    import cv2

    h, w = rgb_u8.shape[:2]
    assert h % 2 == 0 and w % 2 == 0, "I420 needs even dims (patch-aligned ok)"
    return cv2.cvtColor(rgb_u8, cv2.COLOR_RGB2YUV_I420)


def unpack_yuv420(packed: jax.Array) -> jax.Array:
    """(B, H*3/2, W) uint8 I420 -> (B, H, W, 3) float32 RGB in [0, 255].

    Bilinear chroma upsample + BT.601 full-range inverse (cv2's I420
    convention).  Pure XLA; fuses into the backbone program.
    """
    B, h15, w = packed.shape
    h = (h15 * 2) // 3
    # Planes are contiguous but not row-aligned for h % 4 != 0: slice flat.
    flat = packed.reshape(B, -1)
    n_y, n_c = h * w, (h // 2) * (w // 2)
    y = flat[:, :n_y].reshape(B, h, w).astype(jnp.float32)
    u = flat[:, n_y : n_y + n_c].reshape(B, h // 2, w // 2).astype(jnp.float32)
    v = flat[:, n_y + n_c :].reshape(B, h // 2, w // 2).astype(jnp.float32)
    u = jax.image.resize(u, (B, h, w), "bilinear") - 128.0
    v = jax.image.resize(v, (B, h, w), "bilinear") - 128.0
    # Studio-range BT.601 inverse (cv2's I420 convention: Y in [16, 235]).
    yc = 1.164383 * (y - 16.0)
    r = yc + 1.596027 * v
    g = yc - 0.391762 * u - 0.812968 * v
    b = yc + 2.017232 * u
    return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)


def pack_batch_yuv420(rgb_batch_u8: np.ndarray) -> np.ndarray:
    """(B, H, W, 3) -> (B, H*3/2, W) uint8."""
    return np.stack([pack_yuv420(im) for im in rgb_batch_u8])
