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
    pos_weight: Optional[float] = None,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """BCE on the score heatmap + circular orientation L2.

    Unlike the reference's unweighted mean (``feature_losses.py:48``), the
    BCE is **positive-class balanced**: a Gaussian-keypoint target covers a
    few hundred of ~10k-100k heatmap cells, and an unweighted mean makes
    all-background a near-optimum the detector head demonstrably collapsed
    into (round-2 bake-off: scores under sigmoid^-1(1e-6), zero keypoints at
    inference).  ``pos_weight=None`` balances dynamically per batch
    (neg_mass / pos_mass, clipped to [1, 100]) with torch
    ``BCEWithLogitsLoss(pos_weight=...)`` semantics, normalized by total
    cell weight so the loss scale stays comparable.
    """
    t, x = score_target, score_logits
    if pos_weight is None:
        pos_mass = jnp.sum(t)
        neg_mass = jnp.sum(1.0 - t)
        pw = jnp.clip(neg_mass / jnp.maximum(pos_mass, 1.0), 1.0, 100.0)
    else:
        pw = jnp.asarray(pos_weight, x.dtype)
    per_cell = pw * t * jax.nn.softplus(-x) + (1.0 - t) * jax.nn.softplus(x)
    cell_w = pw * t + (1.0 - t)
    score_l = jnp.sum(per_cell) / jnp.maximum(jnp.sum(cell_w), 1.0)
    o = circular_l2(orient_pred, orient_target)
    if kp_mask is not None:
        m = kp_mask.astype(o.dtype)
        orient_l = jnp.sum(o * m) / jnp.maximum(jnp.sum(m), 1.0)
    else:
        orient_l = jnp.mean(o)
    total = score_l + alpha_orient * orient_l
    # Collapse telemetry: the per-image peak detection probability.  If this
    # sits below the inference threshold (0.4 default) the extractor will
    # emit zero keypoints — visible in scalars.jsonl, not just at bake-off.
    score_peak = jnp.mean(jnp.max(jax.nn.sigmoid(x), axis=(1, 2)))
    return total, {
        "score_loss": score_l,
        "orient_loss": orient_l,
        "score_peak": jax.lax.stop_gradient(score_peak),
    }


def descriptor_loss(
    desc1: jax.Array,  # (B, K, D) L2-normalized anchors
    desc2: jax.Array,  # (B, K, D) positives
    negatives: jax.Array,  # (B, K, N, D) per-anchor negative sets
    weights: Optional[jax.Array] = None,  # (B, K)
    margin: float = 0.5,
    hardest: bool = True,
    temperature: float = 0.1,
    lambda_nce: float = 1.0,
    lambda_var: float = 1.0,
) -> tuple[jax.Array, dict[str, jax.Array]]:
    """Positive-cosine + hardest-negative triplet (reference parity,
    ``feature_losses.py:88-188``) **plus two anti-collapse terms**.

    The reference triplet alone has a stable degenerate fixed point: a head
    that outputs one constant descriptor gives pos_dist == neg_dist, so the
    triplet pins at exactly ``margin`` with ~zero gradient (the round-2
    trained head landed there: triplet_loss == 0.5000 for the whole run).
    Two additions break it:

    * **InfoNCE** over {positive} ∪ negatives — at a collapsed point the
      logits are uniform, which is NOT a stationary point of the softmax
      cross-entropy whenever any negative responds differently to the
      parameters than the positive does (the in-image antipode negatives
      guarantee this), and near-uniform logits carry O(1/temperature)
      gradients toward discrimination.
    * **Variance hinge** (VICReg-style) on each descriptor dimension's std
      across the batch's anchors: directly penalizes constant output with a
      gradient that exists everywhere below the target spread.  For
      unit-norm D-dim vectors the isotropic per-dim std is 1/sqrt(D); the
      hinge is normalized by that so its scale is O(1).
    """
    pos_sim = jnp.sum(desc1 * desc2, axis=-1)  # (B, K)
    pos_loss = 1.0 - pos_sim

    neg_sim = jnp.einsum("bkd,bknd->bkn", desc1, negatives)  # (B, K, N)
    pos_dist = 1.0 - pos_sim
    neg_dist = 1.0 - neg_sim
    if hardest:
        neg_dist_r = jnp.min(neg_dist, axis=-1)  # hardest negative
    else:
        neg_dist_r = jnp.mean(neg_dist, axis=-1)
    triplet = jnp.maximum(pos_dist - neg_dist_r + margin, 0.0)

    # InfoNCE: softmax cross-entropy of the positive against the negatives.
    logits = (
        jnp.concatenate([pos_sim[..., None], neg_sim], axis=-1) / temperature
    )  # (B, K, 1+N)
    nce = jax.nn.logsumexp(logits, axis=-1) - logits[..., 0]  # (B, K)

    per_point = pos_loss + triplet + lambda_nce * nce
    if weights is not None:
        w = weights / jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-8)

        def wmean(v):
            return jnp.mean(jnp.sum(v * w, axis=-1))
    else:

        def wmean(v):
            return jnp.mean(v)

    total = wmean(per_point)
    pos_total = wmean(pos_loss)
    trip_total = wmean(triplet)
    nce_total = wmean(nce)

    def var_hinge(d):
        flat = d.reshape(-1, d.shape[-1])  # (B*K, D)
        std = jnp.sqrt(jnp.var(flat, axis=0) + 1e-6)
        gamma = 1.0 / jnp.sqrt(jnp.asarray(d.shape[-1], d.dtype))
        return jnp.mean(jax.nn.relu(1.0 - std / gamma)), jnp.mean(std)

    v1, std1 = var_hinge(desc1)
    v2, std2 = var_hinge(desc2)
    var_total = 0.5 * (v1 + v2)
    total = total + lambda_var * var_total
    return total, {
        "positive_loss": pos_total,
        "triplet_loss": trip_total,
        "nce_loss": nce_total,
        "variance_loss": var_total,
        # Collapse telemetry: mean per-dim std (healthy ≈ 1/sqrt(D)).
        "desc_std": jax.lax.stop_gradient(0.5 * (std1 + std2)),
    }


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
    temperature: float = 0.1,
    lambda_nce: float = 1.0,
    lambda_var: float = 1.0,
    pos_weight: Optional[float] = None,
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
        pos_weight=pos_weight,
    )
    # Descriptor terms weighted by detection confidence at the points
    # (sigmoid of sampled logits), masked by validity.  The confidence is
    # stop-gradiented: letting the descriptor loss backprop into the score
    # head rewards *lowering* scores at hard points (mute-the-loss), one leg
    # of the round-2 collapse; detection quality is the detector loss's job.
    conf = jax.nn.sigmoid(jax.lax.stop_gradient(outputs["score_at_kp"]))
    kp_mask = targets.get("kp_mask")
    if kp_mask is not None:
        conf = conf * kp_mask
    desc, desc_parts = descriptor_loss(
        outputs["desc1"],
        outputs["desc2"],
        outputs["negatives"],
        weights=conf,
        margin=margin,
        temperature=temperature,
        lambda_nce=lambda_nce,
        lambda_var=lambda_var,
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
