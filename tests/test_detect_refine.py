"""Quadratic sub-pixel peak refinement (ops/detect.quadratic_refine).

The trainable extractor's "quad" subpixel mode replaces the learned offset
head with a training-free 3-neighborhood quadratic fit (VERDICT r4 item 3:
an under-trained offset head injects up to ±2 px of localization noise).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from vit_colmap_tpu.ops.detect import quadratic_refine


def _quadratic_map(h, w, cx, cy):
    """Score map whose exact maximum sits at (cx, cy) — a separable
    downward parabola, so the 3-point quadratic fit is exact."""
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
    return -((xs - cx) ** 2) - (ys - cy) ** 2


@pytest.mark.parametrize("dx,dy", [(0.3, -0.2), (-0.45, 0.45), (0.0, 0.0)])
def test_recovers_subcell_peak(dx, dy):
    h, w = 16, 20
    cx, cy = 9 + dx, 7 + dy
    s = _quadratic_map(h, w, cx, cy)
    xy = jnp.asarray([[[9, 7]]], jnp.float32)  # integer peak cell
    offs = np.asarray(quadratic_refine(jnp.asarray(s[None], jnp.float32), xy))
    assert offs.shape == (1, 1, 2)
    np.testing.assert_allclose(offs[0, 0], [dx, dy], atol=1e-5)


def test_offsets_clamped_and_finite_at_borders():
    h, w = 8, 8
    s = np.zeros((h, w), np.float32)
    s[0, 0] = 1.0  # corner peak: neighbors clip to the border
    xy = jnp.asarray([[[0, 0], [7, 7]]], jnp.float32)
    offs = np.asarray(quadratic_refine(jnp.asarray(s[None]), xy))
    assert np.all(np.isfinite(offs))
    assert np.all(np.abs(offs) <= 0.5)


def test_flat_map_yields_zero_offsets():
    s = jnp.ones((1, 8, 8), jnp.float32)
    xy = jnp.asarray([[[3, 3]]], jnp.float32)
    offs = np.asarray(quadratic_refine(s, xy))
    np.testing.assert_allclose(offs, 0.0)


def test_extractor_subpixel_modes():
    from vit_colmap_tpu.features.trainable_vit_extractor import (
        TrainableViTExtractor,
    )

    with pytest.raises(ValueError):
        TrainableViTExtractor(backbone="vits14", subpixel="bogus")
    # Bool back-compat maps onto the named modes.
    assert TrainableViTExtractor(
        backbone="vits14", subpixel=True
    ).subpixel == "head"
    assert TrainableViTExtractor(
        backbone="vits14", subpixel=False
    ).subpixel == "none"


def test_extractor_quad_mode_runs():
    """The quad path must run end-to-end and move keypoints off cell
    centers by at most half a cell (2 px at the x4 scale-back)."""
    from vit_colmap_tpu.features.trainable_vit_extractor import (
        TrainableViTExtractor,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 112, 112, 3), np.uint8)
    ex_q = TrainableViTExtractor(
        backbone="vits14", num_keypoints=64, subpixel="quad"
    )
    ex_0 = TrainableViTExtractor(
        backbone="vits14", num_keypoints=64, subpixel="none"
    )
    xq, yq, _, _, vq, _ = ex_q.extract_batch(img)
    x0, y0, _, _, v0, _ = ex_0.extract_batch(img)
    # Same peaks (offsets don't change selection)...
    np.testing.assert_array_equal(vq, v0)
    # ...moved by at most half a cell (= 2 px after the x4 scale-back).
    assert np.max(np.abs(xq[vq] - x0[v0])) <= 2.0 + 1e-5
    assert np.max(np.abs(yq[vq] - y0[v0])) <= 2.0 + 1e-5
