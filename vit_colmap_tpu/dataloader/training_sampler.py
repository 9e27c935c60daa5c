"""Invariant-point selection and negative mining — single vmapped programs.

Replaces the reference ``TrainingSampler`` (``dataloader/training_sampler.py:
11-569``), whose in-image / cross-image / hard negative mining runs Python
loops per (batch, keypoint) (``:316-386, :388-450, :452-532`` — SURVEY.md §7
step 6 calls these out).  Here every stage is one fixed-shape einsum / top_k:

* invariant points: warped cosine-similarity map -> top_k cells,
* positive pairs: H^-1 coordinate transfer (grid <-> image with the +0.5
  patch offset),
* in-image negatives: uniformly sampled cells, with any candidate closer
  than ``min_dist`` to its anchor *replaced by the anchor's antipode*
  (descriptor = -anchor ⇒ never the hardest negative ⇒ masked out of the
  triplet min without control flow),
* cross-image negatives: random cells of the batch-rolled neighbor image,
* hard negatives: full K x (gh*gw) cosine against image-2's descriptor map,
  geometrically-near cells pushed to -inf, top_n most-similar kept.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from vit_colmap_tpu.dataloader.homography_utils import (
    apply_homography,
    feature_similarity_map,
    grid_to_image,
    image_to_grid,
)
from vit_colmap_tpu.ops.interpolate import bilinear_sample


class InvariantPoints(NamedTuple):
    coords2_grid: jax.Array  # (B, K, 2) feature-grid coords in image 2
    coords1_grid: jax.Array  # (B, K, 2) transferred coords in image 1
    similarity: jax.Array  # (B, K)
    valid: jax.Array  # (B, K)


@partial(jax.jit, static_argnames=("top_k", "patch", "structure_alpha"))
def select_invariant_points(
    feats1: jax.Array,  # (B, gh, gw, C)
    feats2: jax.Array,
    H12: jax.Array,  # (B, 3, 3) image-1 -> image-2 pixels
    top_k: int = 512,
    threshold: float = 0.0,
    patch: int = 14,
    structure2: jax.Array | None = None,  # (B, gh, gw) in [0, 1]
    structure_alpha: float = 1.0,
) -> InvariantPoints:
    """Top-k cells where warped image-1 features agree with image-2 features
    (reference ``training_sampler.py:56-179``, top_k strategy).

    ``structure2`` optionally blends a per-cell image-structure (cornerness)
    prior into the selection score: ``sim + alpha * structure``.  The
    reference selects purely by feature similarity, which is meaningful
    with a pretrained backbone; with a randomly initialized one the
    similarity map is mostly noise and the detector/descriptor supervision
    anchors to noise (QUALITY r3: trained < untrained).  The structure term
    keeps selected points on repeatable image content in either regime —
    with strong pretrained features the similarity term still dominates
    ranking among corners.
    """
    B, gh, gw, _ = feats1.shape
    sim, valid = feature_similarity_map(feats1, feats2, H12, patch)
    sel = sim
    if structure2 is not None and structure_alpha > 0.0:
        # Out-of-overlap cells must stay below every valid cell: sim there
        # is -1 and a strong corner would otherwise lift them above flat
        # valid regions.
        sel = jnp.where(valid, sim + structure_alpha * structure2, -2.0)
    flat = sel.reshape(B, -1)
    top_sim, idx = jax.lax.top_k(flat, top_k)
    ys = (idx // gw).astype(jnp.float32)
    xs = (idx % gw).astype(jnp.float32)
    coords2 = jnp.stack([xs, ys], axis=-1)  # grid coords in image 2

    pts2_img = grid_to_image(coords2, patch)
    Hinv = jnp.linalg.inv(H12)
    pts1_img = apply_homography(Hinv, pts2_img)
    coords1 = image_to_grid(pts1_img, patch)

    eps = 1e-3
    ok = (
        (top_sim > threshold)
        & (coords1[..., 0] >= -eps)
        & (coords1[..., 0] <= gw - 1 + eps)
        & (coords1[..., 1] >= -eps)
        & (coords1[..., 1] <= gh - 1 + eps)
    )
    return InvariantPoints(coords2, coords1, top_sim, ok)


def sample_features_at(fmap: jax.Array, coords_grid: jax.Array) -> jax.Array:
    """Bilinear feature sampling at grid coords, batched:
    (B, H, W, C), (B, K, 2) -> (B, K, C)."""
    return jax.vmap(bilinear_sample)(fmap, coords_grid)


def _normalize(x):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)


@partial(jax.jit, static_argnames=("num_neg",))
def in_image_negatives(
    desc_map2: jax.Array,  # (B, H, W, D) L2-normalized descriptor map
    anchor_coords2: jax.Array,  # (B, K, 2) grid coords of the true matches
    anchor_desc: jax.Array,  # (B, K, D)
    key: jax.Array,
    num_neg: int = 8,
    min_dist: float = 16.0 / 14.0,
):
    """Random same-image negatives at least ``min_dist`` cells away."""
    B, H, W, D = desc_map2.shape
    K = anchor_coords2.shape[1]
    kx, ky = jax.random.split(key)
    xs = jax.random.uniform(kx, (B, K, num_neg)) * (W - 1)
    ys = jax.random.uniform(ky, (B, K, num_neg)) * (H - 1)
    cand = jnp.stack([xs, ys], axis=-1)  # (B, K, N, 2)
    d = jnp.linalg.norm(cand - anchor_coords2[:, :, None, :], axis=-1)
    far = d >= min_dist  # (B, K, N)
    desc = jax.vmap(bilinear_sample)(
        desc_map2, cand.reshape(B, K * num_neg, 2)
    ).reshape(B, K, num_neg, D)
    # Near candidates -> antipode of anchor (similarity -1, never hardest).
    desc = jnp.where(far[..., None], desc, -anchor_desc[:, :, None, :])
    return _normalize(desc)


@partial(jax.jit, static_argnames=("num_neg", "K"))
def cross_image_negatives(
    desc_map2: jax.Array, key: jax.Array, K: int, num_neg: int = 4
):
    """Random cells of the *next* image in the batch (roll by 1) — the
    reference's cross-image negatives (``training_sampler.py:388-450``)."""
    B, H, W, D = desc_map2.shape
    rolled = jnp.roll(desc_map2, shift=1, axis=0)
    kx, ky = jax.random.split(key)
    xs = jax.random.uniform(kx, (B, K, num_neg)) * (W - 1)
    ys = jax.random.uniform(ky, (B, K, num_neg)) * (H - 1)
    cand = jnp.stack([xs, ys], axis=-1)
    desc = jax.vmap(bilinear_sample)(
        rolled, cand.reshape(B, K * num_neg, 2)
    ).reshape(B, K, num_neg, D)
    return _normalize(desc)


@partial(jax.jit, static_argnames=("top_n",))
def _hard_negative_topk(
    desc_map2: jax.Array,  # (B, H, W, D)
    anchor_coords2: jax.Array,  # (B, K, 2)
    anchor_desc: jax.Array,  # (B, K, D)
    top_n: int = 4,
    min_dist: float = 16.0 / 14.0,
):
    """(similarities, flat cell indices) of the most-similar-but-far cells."""
    B, H, W, D = desc_map2.shape
    flat = desc_map2.reshape(B, H * W, D)
    sim = jnp.einsum("bkd,bnd->bkn", anchor_desc, flat)  # (B, K, HW)
    ys = (jnp.arange(H * W) // W).astype(jnp.float32)
    xs = (jnp.arange(H * W) % W).astype(jnp.float32)
    cells = jnp.stack([xs, ys], axis=-1)  # (HW, 2)
    d = jnp.linalg.norm(
        cells[None, None] - anchor_coords2[:, :, None, :], axis=-1
    )
    sim = jnp.where(d >= min_dist, sim, -jnp.inf)
    return jax.lax.top_k(sim, top_n)  # (B, K, top_n) x2


def hard_negatives(
    desc_map2: jax.Array,  # (B, H, W, D)
    anchor_coords2: jax.Array,  # (B, K, 2)
    anchor_desc: jax.Array,  # (B, K, D)
    top_n: int = 4,
    min_dist: float = 16.0 / 14.0,
):
    """Most-similar-but-geometrically-far cells (reference
    ``training_sampler.py:452-532``) as one einsum + top_k."""
    B, H, W, D = desc_map2.shape
    flat = desc_map2.reshape(B, H * W, D)
    _, idx = _hard_negative_topk(
        desc_map2, anchor_coords2, anchor_desc, top_n, min_dist
    )
    hard = jnp.take_along_axis(
        flat[:, None].repeat(anchor_desc.shape[1], 1), idx[..., None], axis=2
    )
    return _normalize(hard)


def hard_negative_coords(
    desc_map2, anchor_coords2, anchor_desc, top_n: int = 4,
    min_dist: float = 16.0 / 14.0,
):
    """(coords (B, K, top_n, 2) grid xy, similarity (B, K, top_n)) of the
    hard negatives — for analysis/visualization tooling."""
    W = desc_map2.shape[2]
    sim, idx = _hard_negative_topk(
        desc_map2, anchor_coords2, anchor_desc, top_n, min_dist
    )
    xy = jnp.stack(
        [(idx % W).astype(jnp.float32), (idx // W).astype(jnp.float32)],
        axis=-1,
    )
    return xy, sim


def generate_all_negatives(
    desc_map2, anchor_coords2, anchor_desc, key,
    num_in_image: int = 8, num_cross: int = 4, num_hard: int = 4,
):
    """Concatenate in-image + cross-image + hard negatives
    (reference ``training_sampler.py:534-569``) -> (B, K, N_total, D)."""
    k1, k2 = jax.random.split(key)
    K = anchor_coords2.shape[1]
    negs = [
        in_image_negatives(desc_map2, anchor_coords2, anchor_desc, k1, num_in_image),
        cross_image_negatives(desc_map2, k2, int(anchor_coords2.shape[1]), num_cross),
        hard_negatives(desc_map2, anchor_coords2, anchor_desc, num_hard),
    ]
    return jnp.concatenate(negs, axis=2)
