"""Training losses for the keypoint/descriptor heads — pure jit-friendly fns.

Functional parity with the reference (``losses/feature_losses.py:11-365``):

* :func:`detector_loss` — BCE-with-logits on the dense score heatmap plus a
  circular L2 orientation loss (atan2 of sin/cos difference) at sampled
  keypoints, weighted by ``alpha_orient``,
* :func:`descriptor_loss` — positive cosine loss ``1 - <z1, z2>`` plus a
  triplet loss against the hardest negative (min distance over the negative
  set), margin 0.5, with optional per-point weights,
* :func:`total_loss` — ``lambda_det * det + lambda_desc * desc`` where the
  descriptor term is weighted by ``sigmoid(score_logits)`` sampled at the
  invariant coordinates.

Everything is a pure function over arrays (no modules/state), so the whole
loss graph fuses into the jitted train step.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp


def bce_with_logits(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Numerically-stable elementwise binary cross-entropy with logits."""
    return jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )


def circular_l2(pred: jax.Array, target: jax.Array) -> jax.Array:
    """Squared angular difference via atan2(sin, cos) — wrap-safe."""
    d = jnp.arctan2(jnp.sin(pred - target), jnp.cos(pred - target))
    return d * d


def detector_loss(
    score_logits: jax.Array,  # (B, H, W)
    score_target: jax.Array,  # (B, H, W) in [0, 1]
    orient_pred: jax.Array,  # (B, K) sampled at keypoints
    orient_target: jax.Array,  # (B, K)
    kp_mask: Optional[jax.Array] = None,  # (B, K)
    alpha_orient: float = 0.32,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    score_l = jnp.mean(bce_with_logits(score_logits, score_target))
    o = circular_l2(orient_pred, orient_target)
    if kp_mask is not None:
        m = kp_mask.astype(o.dtype)
        orient_l = jnp.sum(o * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        orient_l = jnp.mean(o)
    total = score_l + alpha_orient * orient_l
    return total, {"score_loss": score_l, "orient_loss": orient_l}


def descriptor_loss(
    desc1: jax.Array,  # (B, K, D) L2-normalized anchors
    desc2: jax.Array,  # (B, K, D) positives
    negatives: jax.Array,  # (B, K, N, D) per-anchor negative sets
    weights: Optional[jax.Array] = None,  # (B, K)
    margin: float = 0.5,
    hardest: bool = True,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    pos_sim = jnp.sum(desc1 * desc2, axis=-1)  # (B, K)
    pos_loss = 1.0 - pos_sim

    neg_sim = jnp.einsum("bkd,bknd->bkn", desc1, negatives)  # (B, K, N)
    pos_dist = 1.0 - pos_sim
    neg_dist = 1.0 - neg_sim
    if hardest:
        neg_dist = jnp.min(neg_dist, axis=-1)  # hardest negative
    else:
        neg_dist = jnp.mean(neg_dist, axis=-1)
    triplet = jnp.maximum(pos_dist - neg_dist + margin, 0.0)

    per_point = pos_loss + triplet
    if weights is not None:
        w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-8)
        total = jnp.mean(jnp.sum(per_point * w, axis=-1))
        pos_total = jnp.mean(jnp.sum(pos_loss * w, axis=-1))
        trip_total = jnp.mean(jnp.sum(triplet * w, axis=-1))
    else:
        total = jnp.mean(per_point)
        pos_total = jnp.mean(pos_loss)
        trip_total = jnp.mean(triplet)
    return total, {"positive_loss": pos_total, "triplet_loss": trip_total}


class LossOutput(NamedTuple):
    total: jax.Array
    components: dict[str, jax.Array]


def total_loss(
    outputs: dict[str, jax.Array],
    targets: dict[str, jax.Array],
    lambda_det: float = 1.0,
    lambda_desc: float = 1.0,
    alpha_orient: float = 0.32,
    margin: float = 0.5,
) -> LossOutput:
    """Combined loss (reference ``TotalLoss``, ``feature_losses.py:191-294``).

    outputs: score_logits (B,H,W), orient_pred (B,K), desc1/desc2 (B,K,D),
             negatives (B,K,N,D), score_at_kp (B,K) logits at invariant pts.
    targets: score_target (B,H,W), orient_target (B,K), kp_mask (B,K).
    """
    det, det_parts = detector_loss(
        outputs["score_logits"],
        targets["score_target"],
        outputs["orient_pred"],
        targets["orient_target"],
        targets.get("kp_mask"),
        alpha_orient,
    )
    # Descriptor terms weighted by detection confidence at the points
    # (sigmoid of sampled logits), masked by validity.
    conf = jax.nn.sigmoid(outputs["score_at_kp"])
    kp_mask = targets.get("kp_mask")
    if kp_mask is not None:
        conf = conf * kp_mask
    desc, desc_parts = descriptor_loss(
        outputs["desc1"],
        outputs["desc2"],
        outputs["negatives"],
        weights=conf,
        margin=margin,
    )
    total = lambda_det * det + lambda_desc * desc
    return LossOutput(
        total,
        {
            "detector_loss": det,
            "descriptor_loss": desc,
            **det_parts,
            **desc_parts,
        },
    )
