"""Homography warping of ViT patch-token grids — batched JAX.

Functional parity with the reference (``dataloader/homography_utils.py:
10-305``): backward-warp patch tokens through H^-1 at patch centers
((i + 0.5) * 14), correspondence maps, valid-bounds masks, and warped
cosine-similarity maps — but as vmapped fixed-shape programs instead of
per-image torch ``grid_sample`` calls.

Coordinate conventions: homographies act on *image* pixel coordinates
(x, y); feature-grid cell (i, j) has image-space center
((j + 0.5) * patch, (i + 0.5) * patch).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from vit_colmap_tpu.models.dinov2 import PATCH_SIZE
from vit_colmap_tpu.ops.interpolate import bilinear_sample


def apply_homography(H: jax.Array, pts: jax.Array) -> jax.Array:
    """H (..., 3, 3) applied to pts (..., N, 2) -> (..., N, 2)."""
    ph = jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)
    out = jnp.einsum("...ij,...nj->...ni", H, ph)
    return out[..., :2] / jnp.where(
        jnp.abs(out[..., 2:]) > 1e-8, out[..., 2:], 1e-8
    )


def grid_centers(gh: int, gw: int, patch: int = PATCH_SIZE) -> jax.Array:
    """(gh*gw, 2) image-space centers of the feature grid cells."""
    ys = (jnp.arange(gh, dtype=jnp.float32) + 0.5) * patch
    xs = (jnp.arange(gw, dtype=jnp.float32) + 0.5) * patch
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    return jnp.stack([xx.ravel(), yy.ravel()], axis=-1)


def image_to_grid(pts_img: jax.Array, patch: int = PATCH_SIZE) -> jax.Array:
    """Image pixels -> continuous feature-grid coords (x_g, y_g)
    (the reference's +0.5 patch-center convention,
    ``training_sampler.py:213-264``)."""
    return pts_img / patch - 0.5


def grid_to_image(pts_grid: jax.Array, patch: int = PATCH_SIZE) -> jax.Array:
    return (pts_grid + 0.5) * patch


@partial(jax.jit, static_argnames=("patch",))
def warp_patch_tokens(
    feats1: jax.Array,  # (B, gh, gw, C) tokens of image 1
    H12: jax.Array,  # (B, 3, 3) homography mapping image-1 pixels -> image-2
    patch: int = PATCH_SIZE,
):
    """Backward-warp image-1 tokens into image-2's frame.

    Output cell (i, j) = feats1 sampled at H12^-1(center2(i, j)).
    Returns (warped (B, gh, gw, C), valid (B, gh, gw)).
    """
    B, gh, gw, C = feats1.shape
    centers2 = grid_centers(gh, gw, patch)  # (gh*gw, 2) image-2 pixels
    Hinv = jnp.linalg.inv(H12)
    pts1_img = apply_homography(Hinv, jnp.broadcast_to(centers2, (B, gh * gw, 2)))
    pts1_grid = image_to_grid(pts1_img, patch)

    eps = 1e-3  # float tolerance at the exact border
    valid = (
        (pts1_grid[..., 0] >= -eps)
        & (pts1_grid[..., 0] <= gw - 1 + eps)
        & (pts1_grid[..., 1] >= -eps)
        & (pts1_grid[..., 1] <= gh - 1 + eps)
    )
    warped = jax.vmap(bilinear_sample)(feats1, pts1_grid)  # (B, gh*gw, C)
    return warped.reshape(B, gh, gw, C), valid.reshape(B, gh, gw)


@partial(jax.jit, static_argnames=("patch",))
def feature_similarity_map(
    feats1: jax.Array, feats2: jax.Array, H12: jax.Array, patch: int = PATCH_SIZE
):
    """Cosine similarity between warped feats1 and feats2, per cell.

    Returns (sim (B, gh, gw) in [-1, 1], valid (B, gh, gw)).
    Invalid (out-of-overlap) cells get sim = -1.
    """
    warped, valid = warp_patch_tokens(feats1, H12, patch)

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    sim = jnp.sum(norm(warped) * norm(feats2), axis=-1)
    return jnp.where(valid, sim, -1.0), valid


def compose_homographies(H_1i: jax.Array, H_1j: jax.Array) -> jax.Array:
    """H_i_j = H_1_j @ inv(H_1_i) (reference ``hpatches_dataset.py:328-345``)."""
    return H_1j @ jnp.linalg.inv(H_1i)


def adjust_homography_for_resize(
    H: jax.Array, scale_x1: float, scale_y1: float, scale_x2: float, scale_y2: float
) -> jax.Array:
    """Rescale a homography when both images are resized:
    H' = S2 @ H @ S1^-1 (reference ``synthetic_homography.py:240-263``)."""
    S1 = jnp.diag(jnp.array([scale_x1, scale_y1, 1.0]))
    S2 = jnp.diag(jnp.array([scale_x2, scale_y2, 1.0]))
    return S2 @ H @ jnp.linalg.inv(S1)


def homography_rotation_angle(H: jax.Array) -> jax.Array:
    """In-plane rotation angle atan2(H10, H00) (reference
    ``training_batch.py:38-54``)."""
    return jnp.arctan2(H[..., 1, 0], H[..., 0, 0])
