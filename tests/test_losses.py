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
