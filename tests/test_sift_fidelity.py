"""JAX-SIFT fidelity vs cv2.SIFT (VERDICT r1 item 7).

The JAX SIFT is the framework's SIFT baseline for the quality bake-off, so
its matching quality must be credible against a reference implementation.
Protocol: structured synthetic image warped by a known homography; extract
with cv2.SIFT and with ops.sift; mutual-NN match; score MMA@3px against the
GT homography.  Acceptance: JAX-SIFT within 10% of cv2 MMA@3 and comparable
match counts.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")


def _warp_pair(seed=0, size=(240, 320), scale=None):
    from vit_colmap_tpu.dataloader.synthetic_benchmark import (
        make_structured_image,
    )
    from vit_colmap_tpu.dataloader.synthetic_homography import (
        SyntheticHomographyConfig,
        generate_random_homography,
    )

    rng = np.random.default_rng(seed)
    h, w = size
    img1 = make_structured_image(rng, h, w)
    cfg = SyntheticHomographyConfig.moderate()
    if scale is not None:  # pin the zoom factor (scale-stress cases)
        cfg.scale_range = (scale, scale)
    H = generate_random_homography(w, h, cfg, rng)
    img2 = cv2.warpPerspective(img1, H, (w, h))
    return img1, img2, H


def _mutual_nn(d1, d2):
    """Mutual nearest-neighbor matches on L2-normalized rows."""
    d1 = d1.astype(np.float32)
    d2 = d2.astype(np.float32)
    d1 /= np.maximum(np.linalg.norm(d1, axis=1, keepdims=True), 1e-8)
    d2 /= np.maximum(np.linalg.norm(d2, axis=1, keepdims=True), 1e-8)
    sim = d1 @ d2.T
    nn12 = sim.argmax(1)
    nn21 = sim.argmax(0)
    idx1 = np.arange(len(d1))
    mutual = nn21[nn12] == idx1
    return np.stack([idx1[mutual], nn12[mutual]], axis=1)


def _mma(kp1, kp2, matches, H, t=3.0):
    if len(matches) == 0:
        return 0.0
    x1 = kp1[matches[:, 0], :2]
    x2 = kp2[matches[:, 1], :2]
    x1h = np.concatenate([x1, np.ones((len(x1), 1))], axis=1)
    proj = (H @ x1h.T).T
    proj = proj[:, :2] / proj[:, 2:]
    err = np.linalg.norm(proj - x2, axis=1)
    return float((err <= t).mean())


def _cv2_features(img, n=1024):
    sift = cv2.SIFT_create(nfeatures=n)
    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)
    kps, desc = sift.detectAndCompute(gray, None)
    kp = np.array([k.pt for k in kps], np.float32).reshape(-1, 2)
    return kp, (desc if desc is not None else np.zeros((0, 128), np.float32))


def _jax_features(img, n=1024):
    from vit_colmap_tpu.ops.sift import extract_sift

    gray = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY).astype(np.float32) / 255.0
    kp, dc = extract_sift(gray[None], max_keypoints=n)
    return kp[0][:, :2], dc[0]


@pytest.mark.slow
def test_jax_sift_mma_within_10pct_of_cv2():
    mma_cv, mma_jx, n_cv, n_jx = [], [], [], []
    for seed in (0, 1, 2):
        img1, img2, H = _warp_pair(seed)
        for feats, mmas, ns in ((_cv2_features, mma_cv, n_cv),
                                (_jax_features, mma_jx, n_jx)):
            k1, d1 = feats(img1)
            k2, d2 = feats(img2)
            m = _mutual_nn(d1, d2)
            mmas.append(_mma(k1, k2, m, H))
            ns.append(len(m))
    cv_mean, jx_mean = np.mean(mma_cv), np.mean(mma_jx)
    print(f"cv2 MMA@3 {cv_mean:.3f} ({mma_cv}), jax MMA@3 {jx_mean:.3f} "
          f"({mma_jx}); matches cv2 {n_cv} jax {n_jx}")
    assert jx_mean >= 0.9 * cv_mean, (cv_mean, jx_mean)
    # Match volume >= 0.8x cv2 (VERDICT r2 item 7).  The measured table
    # (results/SIFT_FIDELITY_r3.json, 8 cases across textures/sizes/zoom
    # incl. a 1200x1600 DTU-like frame) shows 1.67-2.24x cv2 since
    # multi-orientation keypoints + the 2x-upsampled first octave landed.
    assert np.mean(n_jx) >= 0.8 * np.mean(n_cv), (n_cv, n_jx)


@pytest.mark.slow
def test_subpixel_refinement_improves_localization():
    """Refined keypoints must localize a warped copy better than integer
    extrema: median GT error on matched pairs should be sub-pixel."""
    img1, img2, H = _warp_pair(seed=3)
    k1, d1 = _jax_features(img1)
    k2, d2 = _jax_features(img2)
    m = _mutual_nn(d1, d2)
    x1 = k1[m[:, 0]]
    x1h = np.concatenate([x1, np.ones((len(x1), 1))], axis=1)
    proj = (H @ x1h.T).T
    proj = proj[:, :2] / proj[:, 2:]
    err = np.linalg.norm(proj - k2[m[:, 1]], axis=1)
    good = err[err <= 3.0]
    assert len(good) > 30
    assert np.median(good) < 1.0, np.median(good)
