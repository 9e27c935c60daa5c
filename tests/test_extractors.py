"""Extractor-family integration tests: every extractor honors the
directory->database contract with its documented keypoint/descriptor format."""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase


@pytest.fixture
def image_dir(tmp_path):
    import cv2

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(0)
    base = rng.integers(40, 215, (84, 98, 3), dtype=np.uint8)
    base = cv2.GaussianBlur(base, (0, 0), 1.5)
    yy, xx = np.mgrid[0:84, 0:98]
    base[..., 1] = ((xx // 14 + yy // 14) % 2 * 120 + 60).astype(np.uint8)
    for i in range(2):
        M = np.float32([[1, 0, i * 3], [0, 1, 0]])
        cv2.imwrite(str(d / f"im{i}.png"), cv2.warpAffine(base, M, (98, 84)))
    return d


def _check_db(db_path, n_images, kp_cols, desc_cols=128):
    db = ColmapDatabase(db_path)
    assert db.num_images == n_images
    for iid in db.read_images():
        k = db.read_keypoints(iid)
        d = db.read_descriptors(iid)
        assert k is not None and len(k) > 0
        assert k.shape[1] == kp_cols and k.dtype == np.float32
        assert d.shape == (len(k), desc_cols) and d.dtype == np.uint8
    db.close()


def test_trainable_vit_extractor(tmp_path, image_dir):
    from vit_colmap_tpu.features.trainable_vit_extractor import (
        TrainableViTExtractor,
    )

    ex = TrainableViTExtractor(
        backbone="vits14",
        num_keypoints=256,
        detection_threshold=0.0,  # random init: accept everything
        image_batch=2,
    )
    db_path = tmp_path / "db.db"
    ex.extract(image_dir, db_path, "SIMPLE_RADIAL")
    _check_db(db_path, 2, kp_cols=6)
    # score column populated, scale column = 1
    db = ColmapDatabase(db_path)
    k = db.read_keypoints(sorted(db.read_images())[0])
    assert (k[:, 2] == 1.0).all()
    assert (k[:, 4] >= 0).all() and (k[:, 4] <= 1).all()
    db.close()


def test_sift_extractor(tmp_path, image_dir):
    from vit_colmap_tpu.features.sift_extractor import SiftExtractor

    ex = SiftExtractor(max_keypoints=256, num_octaves=2, contrast_thresh=0.01)
    db_path = tmp_path / "db.db"
    ex.extract(image_dir, db_path, "SIMPLE_PINHOLE")
    _check_db(db_path, 2, kp_cols=4)


def test_hybrid_extractor(tmp_path, image_dir):
    from vit_colmap_tpu.features.hybrid_extractor import HybridExtractor

    ex = HybridExtractor(
        backbone="vits14", detector="gftt", max_keypoints=128, image_batch=2
    )
    db_path = tmp_path / "db.db"
    ex.extract(image_dir, db_path, "SIMPLE_PINHOLE")
    _check_db(db_path, 2, kp_cols=2)


def test_rootsift_normalization():
    import jax.numpy as jnp

    from vit_colmap_tpu.features.hybrid_extractor import rootsift_normalize

    rng = np.random.default_rng(1)
    d = rng.standard_normal((10, 64)).astype(np.float32)
    out = np.asarray(rootsift_normalize(jnp.asarray(d)))
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
    # Signs preserved.
    assert (np.sign(out) == np.sign(d)).mean() > 0.99


@pytest.mark.slow
def test_vit_extractor_mixed_image_sizes(tmp_path):
    """Images of different sizes must group into per-size batches with
    separate cameras."""
    import cv2

    from vit_colmap_tpu.features.vit_extractor import ViTExtractor

    d = tmp_path / "imgs"
    d.mkdir()
    rng = np.random.default_rng(2)
    sizes = [(70, 84), (70, 84), (98, 112)]
    for i, (h, w) in enumerate(sizes):
        img = cv2.GaussianBlur(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8), (0, 0), 1.5
        )
        cv2.imwrite(str(d / f"im{i}.png"), img)

    ex = ViTExtractor(backbone="vits14", max_keypoints=64, image_batch=2)
    db_path = tmp_path / "db.db"
    ex.extract(d, db_path, "SIMPLE_PINHOLE")
    db = ColmapDatabase(db_path)
    assert db.num_images == 3
    assert db.num_cameras == 2  # one camera per image size
    cams = db.read_cameras()
    dims = sorted((c["width"], c["height"]) for c in cams.values())
    assert dims == [(84, 70), (112, 98)]
    for iid in db.read_images():
        k = db.read_keypoints(iid)
        assert k is not None and len(k) > 0
    db.close()


def test_trainable_min_keypoints_floor():
    """A head whose sigmoid never clears the 0.4 threshold must still emit
    its top-scoring peaks (min_keypoints floor) instead of zero keypoints;
    with min_keypoints=0 the reference's bare-threshold semantics return."""
    import numpy as np

    from vit_colmap_tpu.features.trainable_vit_extractor import (
        TrainableViTExtractor,
    )

    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (1, 56, 56, 3), dtype=np.uint8)

    ex = TrainableViTExtractor(
        backbone="vits14", num_keypoints=64, min_keypoints=16, image_batch=1,
        detection_threshold=0.99,  # nothing clears it at random init
    )
    x, y, orient, score, valid, desc = ex.extract_batch(img)
    assert 0 < valid[0].sum() <= 64
    assert valid[0].sum() >= min(16, int((score[0] > 1e-6).sum()))

    ex0 = TrainableViTExtractor(
        backbone="vits14", num_keypoints=64, min_keypoints=0, image_batch=1,
        detection_threshold=0.99,
    )
    _, _, _, _, valid0, _ = ex0.extract_batch(img)
    assert valid0[0].sum() == 0
