"""Unit tests for losses and orientation utilities (coverage the reference
lacks, SURVEY.md §4)."""

import numpy as np
import pytest

from vit_colmap_tpu.losses.feature_losses import (
    bce_with_logits,
    circular_l2,
    descriptor_loss,
    detector_loss,
    total_loss,
)
from vit_colmap_tpu.utils.orientation import (
    compute_image_gradients,
    compute_keypoint_orientations_simple,
)


def test_bce_matches_definition():
    logits = np.array([-3.0, 0.0, 2.0], np.float32)
    targets = np.array([0.0, 1.0, 1.0], np.float32)
    out = np.asarray(bce_with_logits(logits, targets))
    p = 1 / (1 + np.exp(-logits))
    ref = -(targets * np.log(p) + (1 - targets) * np.log(1 - p))
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_circular_l2_wraps():
    a = np.array([np.pi - 0.1], np.float32)
    b = np.array([-np.pi + 0.1], np.float32)
    out = float(circular_l2(a, b)[0])
    assert out == pytest.approx(0.04, abs=1e-4)  # 0.2 rad apart, squared


def test_detector_loss_components():
    rng = np.random.default_rng(0)
    logits = rng.standard_normal((2, 8, 8)).astype(np.float32)
    target = (rng.random((2, 8, 8)) > 0.9).astype(np.float32)
    orient_p = rng.uniform(-np.pi, np.pi, (2, 5)).astype(np.float32)
    orient_t = orient_p.copy()
    total, parts = detector_loss(logits, target, orient_p, orient_t)
    assert float(parts["orient_loss"]) == pytest.approx(0.0, abs=1e-6)
    assert float(parts["score_loss"]) > 0
    # Perfect score prediction drives score loss toward 0.
    perfect = np.where(target > 0, 20.0, -20.0).astype(np.float32)
    total2, parts2 = detector_loss(perfect, target, orient_p, orient_t)
    assert float(parts2["score_loss"]) < 1e-3


def test_descriptor_loss_prefers_matching_pairs():
    rng = np.random.default_rng(1)
    d = rng.standard_normal((1, 16, 32)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    negs = rng.standard_normal((1, 16, 6, 32)).astype(np.float32)
    negs /= np.linalg.norm(negs, axis=-1, keepdims=True)
    # Matching anchors/positives -> low loss.
    good, _ = descriptor_loss(d, d, negs)
    # Random positives -> higher loss.
    d2 = rng.standard_normal((1, 16, 32)).astype(np.float32)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    bad, _ = descriptor_loss(d, d2, negs)
    assert float(good) < float(bad)


def test_total_loss_runs_and_weights_by_confidence():
    rng = np.random.default_rng(2)
    B, K, N, D, H, W = 2, 8, 4, 16, 10, 12
    outputs = {
        "score_logits": rng.standard_normal((B, H, W)).astype(np.float32),
        "orient_pred": rng.standard_normal((B, K)).astype(np.float32),
        "desc1": rng.standard_normal((B, K, D)).astype(np.float32),
        "desc2": rng.standard_normal((B, K, D)).astype(np.float32),
        "negatives": rng.standard_normal((B, K, N, D)).astype(np.float32),
        "score_at_kp": rng.standard_normal((B, K)).astype(np.float32),
    }
    targets = {
        "score_target": (rng.random((B, H, W)) > 0.9).astype(np.float32),
        "orient_target": rng.standard_normal((B, K)).astype(np.float32),
        "kp_mask": np.ones((B, K), np.float32),
    }
    out = total_loss(outputs, targets)
    assert np.isfinite(float(out.total))
    for k in ("detector_loss", "descriptor_loss", "score_loss", "orient_loss",
              "positive_loss", "triplet_loss"):
        assert k in out.components


def test_near_collapsed_head_gets_escape_gradient():
    """The round-2 collapse: a (nearly) constant descriptor head pins the
    triplet at the margin with ~zero gradient.  The InfoNCE + variance terms
    must supply a strong restoring gradient in that neighborhood."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    K, Din, D = 16, 24, 32
    x = jnp.asarray(rng.standard_normal((K, Din)).astype(np.float32))

    def loss_of_head(params, lambda_nce, lambda_var):
        W, b = params
        # Near-collapsed linear head: output dominated by the bias, with the
        # anchor/positive/negative sets all drawn from the SAME head (as in
        # training, where negatives come from the descriptor map).
        d = x @ W + b  # (K, D)
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        desc = d[None]  # (1, K, D)
        negs = jnp.stack(
            [jnp.roll(d, s, axis=0) for s in (1, 2, 3, 4)], axis=1
        )[None]  # (1, K, 4, D)
        total, _ = descriptor_loss(
            desc, desc, negs, lambda_nce=lambda_nce, lambda_var=lambda_var
        )
        return total

    W0 = jnp.asarray(1e-4 * rng.standard_normal((Din, D)).astype(np.float32))
    b0 = jnp.asarray(rng.standard_normal(D).astype(np.float32))
    # Reference-equivalent losses (no anti-collapse terms): dead gradient —
    # pos_sim == neg_sim == 1 up to O(1e-4), triplet pinned at the margin.
    g_old = jax.grad(loss_of_head)((W0, b0), 0.0, 0.0)
    old_norm = float(sum(jnp.sum(g * g) for g in g_old)) ** 0.5
    # With the anti-collapse terms: strong escape gradient (the variance
    # hinge's d(std)/dW blows up as 1/std near the collapsed point).
    g_new = jax.grad(loss_of_head)((W0, b0), 1.0, 1.0)
    new_norm = float(sum(jnp.sum(g * g) for g in g_new)) ** 0.5
    assert new_norm > 100 * max(old_norm, 1e-9)
    # And the telemetry flags the collapse directly.
    d = (x @ W0 + b0)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    desc = d[None]
    negs = jnp.stack([jnp.roll(d, s, axis=0) for s in (1, 2)], axis=1)[None]
    _, parts = descriptor_loss(desc, desc, negs)
    assert float(parts["desc_std"]) < 1e-2
    assert float(parts["variance_loss"]) > 0.9


def test_detector_pos_weight_penalizes_all_background():
    """All-background scores must not be a near-optimum of the detector BCE
    (it was, under the reference's unweighted mean over ~19k cells)."""
    rng = np.random.default_rng(4)
    B, H, W = 1, 64, 64
    target = np.zeros((B, H, W), np.float32)
    ys, xs = rng.integers(2, H - 2, 12), rng.integers(2, W - 2, 12)
    target[0, ys, xs] = 1.0
    orient = np.zeros((B, 4), np.float32)
    background = np.full((B, H, W), -10.0, np.float32)
    correct = np.where(target > 0.5, 10.0, -10.0).astype(np.float32)
    l_bg, parts_bg = detector_loss(background, target, orient, orient)
    l_ok, _ = detector_loss(correct, target, orient, orient)
    # Balanced BCE: missing every positive costs ~half the maximum loss,
    # orders of magnitude above the correct prediction.
    assert float(l_bg) > 100 * float(l_ok)
    assert float(parts_bg["score_peak"]) < 0.01  # telemetry sees the collapse


def test_confidence_weight_gradient_is_stopped():
    """The descriptor loss must not reward lowering detection scores at hard
    points (mute-the-loss leg of the round-2 collapse)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(5)
    B, K, N, D, H, W = 1, 8, 4, 16, 10, 12
    outputs = {
        "score_logits": jnp.asarray(rng.standard_normal((B, H, W)), jnp.float32),
        "orient_pred": jnp.zeros((B, K)),
        "desc1": jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32),
        "desc2": jnp.asarray(rng.standard_normal((B, K, D)), jnp.float32),
        "negatives": jnp.asarray(rng.standard_normal((B, K, N, D)), jnp.float32),
        "score_at_kp": jnp.asarray(rng.standard_normal((B, K)), jnp.float32),
    }
    targets = {
        "score_target": jnp.zeros((B, H, W)),
        "orient_target": jnp.zeros((B, K)),
        "kp_mask": jnp.ones((B, K)),
    }

    def desc_term(score_at_kp):
        out = dict(outputs, score_at_kp=score_at_kp)
        return total_loss(out, targets).components["descriptor_loss"]

    g = jax.grad(desc_term)(outputs["score_at_kp"])
    assert float(jnp.abs(g).max()) == 0.0


def test_image_gradients_and_orientation():
    # Horizontal ramp: gradient points in +x => orientation ~ 0.
    ramp = np.tile(np.linspace(0, 1, 32, dtype=np.float32), (16, 1))[None]
    gx, gy = (np.asarray(g) for g in compute_image_gradients(ramp))
    assert gx[0, 8, 16] > 0
    assert abs(gy[0, 8, 16]) < 1e-5
    kpts = np.array([[[16.0, 8.0]]], np.float32)
    ang = float(compute_keypoint_orientations_simple(ramp, kpts)[0, 0])
    assert abs(ang) < 0.1
    # Vertical ramp => orientation ~ pi/2.
    vramp = np.tile(np.linspace(0, 1, 16, dtype=np.float32)[:, None], (1, 32))[None]
    ang_v = float(compute_keypoint_orientations_simple(vramp, kpts)[0, 0])
    assert abs(ang_v - np.pi / 2) < 0.1
