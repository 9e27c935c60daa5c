"""Integration tests for the ViT extractor + detection/descriptor ops.

Parallels the reference's ``tests/test_vit_integration.py`` shape/dtype
contracts (float32 Nx2 keypoints, uint8 Nx128 descriptors, DB row counts),
running the random-init backbone on tiny images (no network egress).
"""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.ops.detect import detect_keypoints, nms_maxpool, select_topk_binned
from vit_colmap_tpu.ops.interpolate import apply_pca, bilinear_sample, fit_pca


def test_nms_maxpool_suppresses_nonmaxima():
    s = np.zeros((1, 8, 8), np.float32)
    s[0, 3, 3] = 1.0
    s[0, 3, 4] = 0.5  # neighbor, should be suppressed
    s[0, 6, 6] = 0.8
    out = np.asarray(nms_maxpool(s, radius=1))
    assert out[0, 3, 3] == 1.0
    assert out[0, 3, 4] == 0.0
    assert out[0, 6, 6] == 0.8


def test_binned_topk_spreads_selections():
    # All mass in one corner cell; binning must still cap per-bin picks.
    s = np.zeros((1, 8, 8), np.float32)
    s[0, :2, :2] = np.array([[4, 3], [2, 1]])
    s[0, 6, 6] = 0.5
    xy, score, valid = select_topk_binned(s, bin_size=2, k_per_bin=2, k_total=4)
    xy, score, valid = np.asarray(xy), np.asarray(score), np.asarray(valid)
    picked = {tuple(p) for p in xy[0][valid[0]].astype(int)}
    # only 2 of the 4 corner points allowed, plus the lone far point
    corner = {(0, 0), (1, 0), (0, 1), (1, 1)} & picked
    assert len(corner) == 2
    assert (6, 6) in picked


def test_detect_keypoints_valid_mask():
    s = np.zeros((2, 16, 16), np.float32)
    s[0, 4, 4] = 1.0
    s[1, 2, 2] = 1.0
    s[1, 10, 12] = 0.9
    xy, score, valid = detect_keypoints(s, nms_radius=1, k_total=8)
    valid = np.asarray(valid)
    assert valid[0].sum() == 1
    assert valid[1].sum() == 2


def test_soft_nms_fills_budget_maxima_first():
    # A smooth bump: ONE strict local maximum, many positive non-maxima.
    # Hard NMS yields exactly 1 keypoint; soft mode must fill the budget
    # while still ranking the true maximum first (VERDICT r4 item 4:
    # maxima-starved token grids dropped below COLMAP's init floor).
    yy, xx = np.mgrid[0:16, 0:16].astype(np.float32)
    s = np.exp(-((xx - 8) ** 2 + (yy - 8) ** 2) / 40.0)[None]

    xy_h, sc_h, v_h = detect_keypoints(s, nms_radius=1, k_total=16)
    assert np.asarray(v_h)[0].sum() == 1

    xy_s, sc_s, v_s = detect_keypoints(
        s, nms_radius=1, k_total=16, nms_mode="soft"
    )
    xy_s, sc_s, v_s = np.asarray(xy_s), np.asarray(sc_s), np.asarray(v_s)
    assert v_s[0].sum() == 16  # budget filled
    assert tuple(xy_s[0, 0].astype(int)) == (8, 8)  # maximum ranked first
    assert sc_s[0, 0] > 1.0  # lifted above every non-maximum
    assert (sc_s[0, 1:] < 1.0).all()


def test_soft_nms_equals_hard_when_maxima_plentiful():
    # 4 well-separated peaks on a zero background, budget of 4: the soft
    # selection must be exactly the hard one (fill only kicks in when
    # maxima are scarce).
    s = np.zeros((1, 16, 16), np.float32)
    for i, (y, x) in enumerate([(2, 2), (2, 12), (12, 2), (12, 12)]):
        s[0, y, x] = 1.0 - 0.1 * i
    xy_h, _, v_h = detect_keypoints(s, nms_radius=1, k_total=4)
    xy_s, _, v_s = detect_keypoints(s, nms_radius=1, k_total=4,
                                    nms_mode="soft")
    pts_h = {tuple(p) for p in np.asarray(xy_h)[0][np.asarray(v_h)[0]].astype(int)}
    pts_s = {tuple(p) for p in np.asarray(xy_s)[0][np.asarray(v_s)[0]].astype(int)}
    assert pts_h == pts_s == {(2, 2), (12, 2), (2, 12), (12, 12)}


def test_bilinear_sample_exact_and_midpoint():
    fmap = np.arange(16, dtype=np.float32).reshape(4, 4, 1)
    pts = np.array([[1.0, 1.0], [1.5, 1.0], [0.0, 3.0]], np.float32)
    out = np.asarray(bilinear_sample(fmap, pts))
    assert out[0, 0] == 5.0  # fmap[1,1]
    assert out[1, 0] == 5.5  # midpoint of fmap[1,1]=5, fmap[1,2]=6
    assert out[2, 0] == 12.0  # fmap[3,0]


def test_pca_reduces_and_preserves_variance():
    rng = np.random.default_rng(0)
    # Data with 4 dominant directions in 32-D.
    basis = rng.standard_normal((4, 32)).astype(np.float32)
    coeff = rng.standard_normal((500, 4)).astype(np.float32)
    x = coeff @ basis + 0.01 * rng.standard_normal((500, 32)).astype(np.float32)
    comps, mean = fit_pca(x, out_dim=4)
    proj = np.asarray(apply_pca(x, comps, mean))
    assert proj.shape == (500, 4)
    # Projection keeps nearly all the variance.
    total_var = x.var(axis=0).sum()
    proj_var = proj.var(axis=0).sum()
    assert proj_var / total_var > 0.97


@pytest.mark.slow
def test_vit_extractor_end_to_end(tmp_path):
    import cv2

    from vit_colmap_tpu.features.vit_extractor import ViTExtractor

    image_dir = tmp_path / "imgs"
    image_dir.mkdir()
    rng = np.random.default_rng(1)
    for i in range(2):
        img = rng.integers(0, 255, (70, 84, 3), dtype=np.uint8)
        cv2.imwrite(str(image_dir / f"im{i}.png"), img)

    ex = ViTExtractor(backbone="vits14", max_keypoints=64, image_batch=2)
    db_path = tmp_path / "db.db"
    ex.extract(image_dir, db_path, "SIMPLE_PINHOLE")

    db = ColmapDatabase(db_path)
    assert db.num_images == 2
    for iid in db.read_images():
        k = db.read_keypoints(iid)
        d = db.read_descriptors(iid)
        assert k is not None and k.shape[1] == 2 and k.dtype == np.float32
        assert d is not None and d.shape == (len(k), 128) and d.dtype == np.uint8
        assert len(k) > 0
        # keypoints inside the original image bounds
        assert (k[:, 0] >= 0).all() and (k[:, 0] <= 84).all()
        assert (k[:, 1] >= 0).all() and (k[:, 1] <= 70).all()
    db.close()


def test_emit_float_desc_is_u8_roundtrip():
    """emit_float_desc: the 5th output must equal the device decode of the
    uint8 output (pipeline/match.py semantics), so matching on it is
    bit-identical to matching the DB's descriptors."""
    import jax.numpy as jnp

    from vit_colmap_tpu.features.vit_extractor import ViTExtractor
    from vit_colmap_tpu.pipeline.match import _decode_normalize_u8

    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, (2, 70, 84, 3), dtype=np.uint8)
    ex = ViTExtractor(backbone="vits14", max_keypoints=32, image_batch=2,
                      emit_float_desc=True)
    out = ex.extract_batch(imgs)
    assert len(out) == 5
    xy, sc, valid, desc_u8, desc_f32 = out
    ref = np.asarray(_decode_normalize_u8(
        jnp.asarray(desc_u8), jnp.asarray(valid), signed=True
    ))
    np.testing.assert_allclose(desc_f32, ref, atol=1e-6)
    assert (desc_f32[~valid] == 0).all()


def test_device_cache_matching_equals_db_path(tmp_path):
    """pipeline/match.py must produce identical matches whether descriptors
    come from the extractor's on-device cache or the DB round trip."""
    import shutil

    import cv2

    from vit_colmap_tpu.database import ColmapDatabase
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor
    from vit_colmap_tpu.pipeline.match import match_exhaustive
    from vit_colmap_tpu.utils.config import MatchingConfig

    rng = np.random.default_rng(11)
    image_dir = tmp_path / "images"
    image_dir.mkdir()
    base = rng.integers(0, 255, (70, 84, 3), dtype=np.uint8)
    for i in range(3):
        cv2.imwrite(str(image_dir / f"im_{i}.png"),
                    np.roll(base, i * 14, axis=1))

    ex = ViTExtractor(backbone="vits14", max_keypoints=32, image_batch=1,
                      seed=0)
    db_a = tmp_path / "a.db"
    ex.extract(image_dir, db_a, "PINHOLE", None)
    assert len(ex.device_cache) == 3
    db_b = tmp_path / "b.db"
    shutil.copy(db_a, db_b)

    cfg = MatchingConfig(descriptor_encoding="signed", do_verification=False)
    match_exhaustive(db_a, cfg, device_descriptors=ex.device_cache)
    match_exhaustive(db_b, cfg)

    tables = []
    for p in (db_a, db_b):
        with ColmapDatabase.open_database(p) as db:
            ids = sorted(db.read_images().keys())
            tables.append({
                (a, b): db.read_matches(a, b)
                for i, a in enumerate(ids) for b in ids[i + 1:]
            })
    assert tables[0].keys() == tables[1].keys()
    assert len(tables[0]) >= 1
    for k in tables[0]:
        np.testing.assert_array_equal(tables[0][k], tables[1][k])
