"""Per-batch training pipeline — one fused device program.

Replaces the reference ``TrainingBatchProcessor`` (``dataloader/
training_batch.py:18-381``): backbone features once, invariant-point
selection, positive-pair transfer, negative mining, trainable-head forward,
coordinate rescale feature(1/14)->head(1/4) space (x3.5), gradient-based
orientation ground truth, homography rotation offset, and the vectorized
Gaussian score heatmap.

Fix-by-design vs the reference (SURVEY.md §7 step 6): positives/negatives
run through the *real descriptor head* — the reference silently fell back to
a cached random projection (``training_batch.py:79-128``).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from vit_colmap_tpu.dataloader.homography_utils import (
    apply_homography,
    grid_to_image,
    homography_rotation_angle,
    image_to_grid,
)
from vit_colmap_tpu.dataloader.training_sampler import (
    generate_all_negatives,
    sample_features_at,
    select_invariant_points,
)
from vit_colmap_tpu.models.dinov2 import PATCH_SIZE, preprocess
from vit_colmap_tpu.utils.orientation import (
    compute_keypoint_orientations_simple,
    rgb_to_gray,
)

# Feature-grid (1/14) -> head-output (1/4) coordinate scale.
GRID_TO_HEAD = PATCH_SIZE / 4.0  # 3.5 (reference training_batch.py:276-289)


def gaussian_heatmap(
    coords: jax.Array,  # (B, K, 2) in heatmap coords
    valid: jax.Array,  # (B, K)
    height: int,
    width: int,
    sigma: float = 1.0,
) -> jax.Array:
    """max-over-keypoints Gaussian GT heatmap (reference
    ``training_batch.py:130-174``), vectorized."""
    ys = jnp.arange(height, dtype=jnp.float32)
    xs = jnp.arange(width, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")  # (H, W)
    dx = xx[None, None] - coords[..., 0][:, :, None, None]  # (B, K, H, W)
    dy = yy[None, None] - coords[..., 1][:, :, None, None]
    g = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma * sigma))
    g = jnp.where(valid[:, :, None, None], g, 0.0)
    return jnp.max(g, axis=1)


def image_structure_grid(
    img: jax.Array,  # (B, H, W, 3) uint8
    gh: int,
    gw: int,
    patch: int = 14,
) -> jax.Array:
    """Per-feature-cell image cornerness in [0, 1] (max-pooled Harris).

    Supervision prior for invariant-point selection: anchors training
    targets to repeatable image structure regardless of backbone quality
    (see :func:`select_invariant_points`).
    """
    from vit_colmap_tpu.ops.scoring import harris_response

    gray = rgb_to_gray(img) / 255.0
    resp = jnp.maximum(harris_response(gray), 0.0)
    resp = resp[:, : gh * patch, : gw * patch]
    resp = resp.reshape(resp.shape[0], gh, patch, gw, patch).max(axis=(2, 4))
    mx = jnp.max(resp.reshape(resp.shape[0], -1), axis=-1)
    return resp / jnp.maximum(mx[:, None, None], 1e-12)


def dense_token_loss(
    feats1: jax.Array,  # (B, gh, gw, C) raw backbone patch tokens
    feats2: jax.Array,
    H12: jax.Array,  # (B, 3, 3) image-1 -> image-2 pixels
    key: jax.Array,
    num_cells: int = 256,
    temperature: float = 0.1,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Symmetric InfoNCE on RAW backbone tokens at GT correspondences.

    Fine-tuning objective for the frozen-ViT extraction path (VERDICT r3
    item 1): ``ViTExtractor`` matches PCA-projected raw patch tokens, so the
    backbone itself — not just the trainable heads — must place mutually
    nearest tokens at corresponding locations.  The head-descriptor losses
    reach the backbone only through two conv stacks; this term supervises
    the tokens the frozen path actually consumes.

    Cells are sampled uniformly at random in image 2 (NOT
    similarity-selected — selecting by feature agreement would train on the
    points where random features already agree, a circular target) and
    mapped through H^-1; tokens are read bilinearly in both images.
    """
    B, gh, gw, _ = feats1.shape
    k1, k2 = jax.random.split(key)
    xs = jax.random.uniform(k1, (B, num_cells), minval=0.0, maxval=gw - 1.0)
    ys = jax.random.uniform(k2, (B, num_cells), minval=0.0, maxval=gh - 1.0)
    coords2 = jnp.stack([xs, ys], axis=-1)  # (B, K, 2) grid coords, img 2
    pts2_img = grid_to_image(coords2)
    pts1 = apply_homography(jnp.linalg.inv(H12), pts2_img)
    coords1 = image_to_grid(pts1)
    eps = 1e-3
    ok = (
        (coords1[..., 0] >= -eps)
        & (coords1[..., 0] <= gw - 1 + eps)
        & (coords1[..., 1] >= -eps)
        & (coords1[..., 1] <= gh - 1 + eps)
    )  # (B, K)

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    t1 = norm(sample_features_at(feats1, coords1))  # (B, K, C)
    t2 = norm(sample_features_at(feats2, coords2))
    logits = jnp.einsum("bkd,bld->bkl", t1, t2) / temperature  # (B, K, K)
    diag = jnp.einsum("bkk->bk", logits)
    big = 1e9
    w = ok.astype(jnp.float32)
    denom = jnp.maximum(jnp.sum(w, axis=-1), 1.0)
    # t1 -> t2: every t2 column is in-bounds; anchor rows need ok.
    nce12 = jax.nn.logsumexp(logits, axis=-1) - diag  # (B, K)
    # t2 -> t1: out-of-bounds t1 columns carry clipped/garbage tokens —
    # exclude them from the candidate set (except nothing: the diagonal of
    # an invalid pair is excluded with its row anyway).
    col_mask = jnp.where(ok[:, None, :], 0.0, -big)  # (B, 1, K) over t1 cols
    nce21 = jax.nn.logsumexp(logits + col_mask, axis=-2) - diag
    loss = 0.5 * jnp.mean(
        jnp.sum((nce12 + nce21) * w, axis=-1) / denom
    )
    pos_sim = jnp.sum(
        jnp.sum(t1 * t2, axis=-1) * w, axis=-1
    ) / denom
    return loss, {
        "token_loss": loss,
        "token_pos_sim": jax.lax.stop_gradient(jnp.mean(pos_sim)),
    }


def process_batch(
    backbone_apply,
    backbone_params,
    heads_apply,
    heads_params,
    batch: dict[str, jax.Array],
    key: jax.Array,
    top_k: int = 512,
    num_in_image: int = 8,
    num_cross: int = 4,
    num_hard: int = 4,
    structure_alpha: float = 1.0,
    train_backbone: bool = False,
) -> tuple[dict[str, jax.Array], dict[str, jax.Array]]:
    """images1/images2 (B, H, W, 3) uint8 + H12 (B, 3, 3) ->
    (outputs, targets) for :func:`vit_colmap_tpu.losses.total_loss`."""
    img1, img2, H12 = batch["image1"], batch["image2"], batch["H"]
    B = img1.shape[0]

    # Frozen backbone, evaluated once per image (reference
    # ``training_batch.py:234-239`` uses inference_mode similarly).  With
    # ``train_backbone`` the stop_gradient is dropped so fine-tuning can
    # reach the backbone — an intentional extension over the reference's
    # always-frozen contract (``model/vit_feature_model.py:63-66``): with no
    # pretrained DINOv2 weights available, a frozen RANDOM backbone bounds
    # descriptor semantics, so learning has to reach it to help.
    def backbone_feats(img):
        out = backbone_apply(backbone_params, preprocess(img))
        gh, gw = out["grid"]
        toks = out["x_norm_patchtokens"].reshape(B, gh, gw, -1)
        if not train_backbone:
            toks = jax.lax.stop_gradient(toks)
        return toks

    feats1 = backbone_feats(img1)
    feats2 = backbone_feats(img2)

    structure2 = None
    if structure_alpha > 0.0:
        gh2, gw2 = feats2.shape[1], feats2.shape[2]
        structure2 = image_structure_grid(img2, gh2, gw2)
    inv = select_invariant_points(
        feats1, feats2, H12, top_k=top_k,
        structure2=structure2, structure_alpha=structure_alpha,
    )

    out1 = heads_apply(heads_params, feats1)
    out2 = heads_apply(heads_params, feats2)

    # Feature-grid coords -> head (quarter-res) coords.
    c1_head = inv.coords1_grid * GRID_TO_HEAD
    c2_head = inv.coords2_grid * GRID_TO_HEAD

    desc1 = sample_features_at(out1["descriptors"], c1_head)
    desc2 = sample_features_at(out2["descriptors"], c2_head)

    def norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-8)

    desc1, desc2 = norm(desc1), norm(desc2)
    negatives = generate_all_negatives(
        out2["descriptors"],
        c2_head,
        desc1,
        key,
        num_in_image=num_in_image,
        num_cross=num_cross,
        num_hard=num_hard,
    )

    # Orientation GT: gradient direction of image 1 at the keypoints, rotated
    # by the homography's in-plane angle for image 2's prediction
    # (reference ``training_batch.py:306-320``).
    gray1 = rgb_to_gray(img1) / 255.0
    kpts1_img = grid_to_image(inv.coords1_grid)
    orient1_gt = compute_keypoint_orientations_simple(gray1, kpts1_img)
    angle = homography_rotation_angle(H12)
    orient2_target = orient1_gt + angle[:, None]

    orient2_pred = sample_features_at(
        out2["orientation"][..., None], c2_head
    )[..., 0]
    score_at_kp = sample_features_at(
        out2["score_logits"][..., None], c2_head
    )[..., 0]

    h4, w4 = out2["score_logits"].shape[1:3]
    score_target = gaussian_heatmap(c2_head, inv.valid, h4, w4, sigma=1.0)

    outputs = {
        "score_logits": out2["score_logits"],
        "orient_pred": orient2_pred,
        "desc1": desc1,
        "desc2": desc2,
        "negatives": negatives,
        "score_at_kp": score_at_kp,
    }
    if train_backbone:
        # Raw-token correspondence objective — only meaningful when the
        # gradient can reach the backbone.
        tkey = jax.random.fold_in(key, 7)
        _, token_aux = dense_token_loss(feats1, feats2, H12, tkey)
        outputs.update(token_aux)
    targets = {
        "score_target": score_target,
        "orient_target": orient2_target,
        "kp_mask": inv.valid.astype(jnp.float32),
    }
    return outputs, targets
