"""Tests for the JAX SIFT implementation."""

import numpy as np
import pytest

from vit_colmap_tpu.ops.sift import build_octave, extract_sift, find_extrema


def _blob_image(h=128, w=128, centers=((40, 40), (90, 60), (60, 100)), sigma=3.0):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = np.zeros((h, w), np.float32)
    for cy, cx in centers:
        img += np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * sigma**2))
    return img / img.max()


def test_octave_shapes():
    g = np.zeros((2, 64, 64), np.float32)
    gauss, dog = build_octave(g, num_scales=3)
    assert gauss.shape == (2, 6, 64, 64)
    assert dog.shape == (2, 5, 64, 64)


def test_extrema_found_at_blobs():
    img = _blob_image()
    gauss, dog = build_octave(img[None], num_scales=3)
    xy, s_idx, score, valid = find_extrema(dog, k_per_octave=32)
    xy, valid = np.asarray(xy)[0], np.asarray(valid)[0]
    found = xy[valid]
    assert len(found) >= 3
    # Each blob center has a detection within a few pixels.
    for cy, cx in ((40, 40), (90, 60), (60, 100)):
        d = np.linalg.norm(found - np.array([cx, cy]), axis=1).min()
        assert d < 4.0, (cx, cy, d)


def test_extract_sift_full():
    img = _blob_image()
    kpts, descs = extract_sift(img[None], max_keypoints=128)
    kp, dc = kpts[0], descs[0]
    assert kp.shape[1] == 4  # x, y, scale, orientation
    assert dc.shape == (len(kp), 128)
    assert dc.dtype == np.uint8
    assert len(kp) >= 3
    assert (kp[:, 0] >= 0).all() and (kp[:, 0] < 128).all()


def test_extract_sift_uint8_wire_equals_float():
    """uint8 input (the 4x-cheaper wire format the extractor sends; [0,1]
    normalization happens inside the fused program) must reproduce the
    float32 path exactly."""
    img = _blob_image()
    u8 = (img * 255.0).round().astype(np.uint8)
    kp_f, dc_f = extract_sift(
        u8.astype(np.float32)[None] / 255.0, max_keypoints=128
    )
    kp_u, dc_u = extract_sift(u8[None], max_keypoints=128)
    # Not bit-exact: XLA lowers the on-device /255 as multiply-by-
    # reciprocal, so values differ in the last ulp.  Same detections,
    # sub-milli-pixel positions, descriptors within one quantization step.
    assert len(kp_u[0]) == len(kp_f[0])
    np.testing.assert_allclose(kp_u[0], kp_f[0], atol=1e-3)
    assert (
        np.abs(dc_u[0].astype(int) - dc_f[0].astype(int)) <= 1
    ).mean() > 0.999


def test_sift_descriptors_match_under_translation():
    """Descriptors of the same content at shifted positions must match."""
    from vit_colmap_tpu.ops.matching import (
        compact_matches,
        match_pair,
        normalize_descriptors,
    )

    rng = np.random.default_rng(0)
    big = rng.random((200, 200)).astype(np.float32)
    import scipy.ndimage as ndi

    big = ndi.gaussian_filter(big, 2.0)
    big = (big - big.min()) / (big.max() - big.min())  # full contrast
    img1 = big[20:148, 20:148]
    img2 = big[28:156, 20:148]  # shifted 8 px vertically

    kpts, descs = extract_sift(
        np.stack([img1, img2]), max_keypoints=256, num_octaves=3,
        contrast_thresh=0.005,
    )
    k1, d1 = kpts[0], descs[0]
    k2, d2 = kpts[1], descs[1]
    assert len(k1) > 20 and len(k2) > 20

    n = max(len(d1), len(d2))
    import jax.numpy as jnp

    def pad(d, k):
        dp = np.zeros((n, 128), np.float32)
        dp[: len(d)] = d
        v = np.zeros(n, bool)
        v[: len(d)] = True
        kp = np.zeros((n, 2), np.float32)
        kp[: len(k)] = k[:, :2]
        return dp, v, kp

    d1p, v1, k1p = pad(d1, k1)
    d2p, v2, k2p = pad(d2, k2)
    idx = np.asarray(
        match_pair(
            np.asarray(normalize_descriptors(jnp.asarray(d1p))),
            np.asarray(normalize_descriptors(jnp.asarray(d2p))),
            v1,
            v2,
        )
    )
    m = compact_matches(idx, len(d1))
    assert len(m) >= 10, len(m)
    # Matched keypoints should be consistent with the 8-px vertical shift.
    dx = k2p[m[:, 1], 0] - k1p[m[:, 0], 0]
    dy = k2p[m[:, 1], 1] - k1p[m[:, 0], 1]
    good = (np.abs(dx - 0) < 3) & (np.abs(dy + 8) < 3)
    assert good.mean() > 0.6, good.mean()


def test_multi_orientation_emits_secondary_peaks():
    """A corner-like pattern with two strong gradient directions should
    yield duplicate keypoints (same x/y/scale, different orientation), the
    COLMAP max_num_orientations=2 behavior."""
    rng = np.random.default_rng(3)
    import scipy.ndimage as ndi

    img = ndi.gaussian_filter(rng.random((160, 160)).astype(np.float32), 2.0)
    img = (img - img.min()) / (img.max() - img.min())
    kp2, dc2 = extract_sift(img[None], max_keypoints=512, num_orientations=2)
    kp1, dc1 = extract_sift(img[None], max_keypoints=512, num_orientations=1)
    # Multi-orientation never loses keypoints and typically adds copies.
    assert len(kp2[0]) >= len(kp1[0])
    # Find at least one duplicated location with distinct orientations.
    xys = {}
    dup = 0
    for x, y, s, o in kp2[0]:
        key = (round(float(x), 2), round(float(y), 2), round(float(s), 3))
        if key in xys and abs(xys[key] - o) > 0.3:
            dup += 1
        xys[key] = o
    assert dup >= 1, "expected at least one secondary-orientation keypoint"


def test_single_orientation_unchanged_by_flag():
    """num_orientations=1 must reproduce the primary-peak-only output."""
    img = _blob_image()
    kp1, _ = extract_sift(img[None], max_keypoints=64, num_orientations=1)
    kp2, _ = extract_sift(img[None], max_keypoints=64, num_orientations=2)
    # Primaries (first occurrence per location) agree between the two modes.
    prim = {}
    for x, y, s, o in kp2[0]:
        key = (round(float(x), 2), round(float(y), 2))
        prim.setdefault(key, o)
    matched = 0
    for x, y, s, o in kp1[0]:
        key = (round(float(x), 2), round(float(y), 2))
        if key in prim and abs(prim[key] - o) < 1e-4:
            matched += 1
    assert matched >= min(len(kp1[0]), 3)


@pytest.fixture(autouse=True, scope="module")
def _fresh_compile_state():
    """The XLA:CPU compiler segfaults compiling this module's larger SIFT
    programs when hundreds of executables from ~25 prior modules are live
    (reproduced twice in full-suite runs; neither suite half triggers it
    alone).  Clearing compiled-program caches just before this module
    bounds that state at negligible cost (a global per-module clear made
    the suite recompile the multi-minute verification programs and blew
    the runtime)."""
    import jax

    jax.clear_caches()
    yield
