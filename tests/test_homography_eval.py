"""Tests for the HPatches homography-evaluation protocol."""

import numpy as np

from vit_colmap_tpu.utils.homography_eval import (
    estimate_homography_corner_error,
    evaluate_pairs,
    match_reprojection_errors,
)


def _planar_pair(n=100, seed=0):
    rng = np.random.default_rng(seed)
    H = np.array([[1.05, 0.02, 5.0], [-0.01, 0.98, -3.0], [1e-5, -2e-5, 1.0]])
    k1 = rng.uniform(10, 300, (n, 2)).astype(np.float32)
    h = np.concatenate([k1, np.ones((n, 1), np.float32)], 1) @ H.T
    k2 = (h[:, :2] / h[:, 2:]).astype(np.float32)
    matches = np.stack([np.arange(n)] * 2, 1)
    return k1, k2, matches, H


def test_match_errors_zero_for_perfect_matches():
    k1, k2, m, H = _planar_pair()
    errs = match_reprojection_errors(k1, k2, m, H)
    assert errs.max() < 1e-3


def test_match_errors_detect_wrong_matches():
    k1, k2, m, H = _planar_pair()
    m_bad = m.copy()
    m_bad[:20, 1] = np.roll(m_bad[:20, 1], 1)  # derange 20 matches
    errs = match_reprojection_errors(k1, k2, m_bad, H)
    assert (errs[20:] < 1e-3).all()
    assert (errs[:20] > 1.0).mean() > 0.9


def test_corner_error_small_for_good_matches():
    k1, k2, m, H = _planar_pair(seed=1)
    rng = np.random.default_rng(2)
    k2n = k2 + 0.3 * rng.standard_normal(k2.shape).astype(np.float32)
    err = estimate_homography_corner_error(k1, k2n, m, H, (320, 320))
    assert err < 1.5, err


def test_evaluate_pairs_mma():
    k1, k2, m, H = _planar_pair(seed=3)
    m_bad = m.copy()
    m_bad[:50, 1] = np.roll(m_bad[:50, 1], 1)
    res = evaluate_pairs(
        [
            {"kpts1": k1, "kpts2": k2, "matches": m, "H": H, "image_wh": (320, 320)},
            {"kpts1": k1, "kpts2": k2, "matches": m_bad, "H": H, "image_wh": (320, 320)},
        ]
    )
    mma = res.mma
    assert mma[3.0] > 0.7  # first pair perfect, second half-corrupted
    assert res.homography_accuracy[3.0] >= 0.5
    assert "MMA" in res.summary()
