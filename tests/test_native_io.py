"""Native image decoder (native/image_io.cc) vs the cv2 reference path.

The decoder emits full-range JFIF I420 planes at the target size; paired
with ``unpack_yuv420(full_range=True)`` on device it must reproduce the
cv2 imread->resize->pack->unpack chain to within chroma-subsampling noise.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from vit_colmap_tpu.utils.native_io import (
    decode_batch_i420,
    load_native,
    probe_size,
)

pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native image decoder not built"
)


def _write_test_images(tmp_path):
    rng = np.random.default_rng(0)
    base = cv2.resize(
        rng.integers(0, 255, (24, 32, 3), dtype=np.uint8),
        (256, 192),
        interpolation=cv2.INTER_CUBIC,
    )
    jpg = tmp_path / "a.jpg"
    png = tmp_path / "b.png"
    cv2.imwrite(str(jpg), cv2.cvtColor(base, cv2.COLOR_RGB2BGR),
                [cv2.IMWRITE_JPEG_QUALITY, 95])
    cv2.imwrite(str(png), cv2.cvtColor(base, cv2.COLOR_RGB2BGR))
    return base, jpg, png


def test_probe_size(tmp_path):
    _, jpg, png = _write_test_images(tmp_path)
    assert probe_size(jpg) == (256, 192)
    assert probe_size(png) == (256, 192)
    assert probe_size(tmp_path / "missing.jpg") is None


@pytest.mark.parametrize("which", ["jpg", "png"])
def test_decode_matches_cv2_reference(tmp_path, which):
    base, jpg, png = _write_test_images(tmp_path)
    path = jpg if which == "jpg" else png
    tw, th = 252, 182  # patch-aligned-style target (even, != source)

    packed, ok = decode_batch_i420([path], tw, th)
    assert ok[0]
    assert packed.shape == (1, th * 3 // 2, tw)

    import jax

    from vit_colmap_tpu.ops.transfer import unpack_yuv420

    rgb_native = np.asarray(unpack_yuv420(packed, full_range=True))[0]

    ref = cv2.resize(base, (tw, th), interpolation=cv2.INTER_AREA).astype(
        np.float32
    )
    err = np.abs(rgb_native - ref).mean()
    # JPEG quantization + 4:2:0 chroma + bilinear-vs-area resize: a loose
    # mean-abs bound still catches channel swaps / range mistakes (those
    # produce errors > 20).
    assert err < 8.0, err


def test_batch_pad_and_failures(tmp_path):
    _, jpg, _ = _write_test_images(tmp_path)
    bad = tmp_path / "nope.jpg"
    bad.write_bytes(b"not an image")
    packed, ok = decode_batch_i420([jpg, bad], 64, 48, pad_to=4)
    assert packed.shape == (4, 72, 64)
    assert ok.tolist() == [True, False, False, False]
    assert packed[1].max() == 0  # failed slot zeroed


def test_grayscale_jpeg(tmp_path):
    g = np.linspace(0, 255, 64 * 64, dtype=np.uint8).reshape(64, 64)
    p = tmp_path / "g.jpg"
    cv2.imwrite(str(p), g)
    packed, ok = decode_batch_i420([p], 64, 64)
    assert ok[0]
    h = 64
    u = packed[0][h : h + h // 4].ravel()
    assert np.all(np.abs(u.astype(int) - 128) <= 1)  # neutral chroma


def test_extractor_native_path_matches_cv2_path(tmp_path):
    """Full ViTExtractor.extract through the native decoder vs the cv2
    path: same keypoint count contract and overlapping keypoints."""
    import jax

    jax.config.update("jax_platforms", "cpu")
    from vit_colmap_tpu.database import ColmapDatabase
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor

    rng = np.random.default_rng(5)
    imdir = tmp_path / "imgs"
    imdir.mkdir()
    base = cv2.resize(
        rng.integers(0, 255, (16, 16, 3), dtype=np.uint8),
        (140, 112),
        interpolation=cv2.INTER_CUBIC,
    )
    for i in range(2):
        cv2.imwrite(str(imdir / f"im{i}.jpg"),
                    np.roll(base, 14 * i, axis=1),
                    [cv2.IMWRITE_JPEG_QUALITY, 97])

    def run(db_name, transfer_format, monkey_native=None):
        ex = ViTExtractor(
            backbone="vits14",
            max_keypoints=64,
            transfer_format=transfer_format,
            image_batch=2,
        )
        db_path = tmp_path / db_name
        if monkey_native is not None:
            import vit_colmap_tpu.utils.native_io as nio

            orig = nio.load_native
            nio.load_native = lambda: None
            try:
                ex.extract(imdir, db_path, "PINHOLE")
            finally:
                nio.load_native = orig
        else:
            ex.extract(imdir, db_path, "PINHOLE")
        db = ColmapDatabase(db_path)
        kp = db.read_keypoints(1)
        db.close()
        return kp

    kp_native = run("native.db", "yuv420")
    kp_cv2 = run("cv2.db", "yuv420", monkey_native=True)
    assert kp_native is not None and len(kp_native) > 0
    assert kp_cv2 is not None and len(kp_cv2) > 0
    # The two decode chains differ in chroma range convention, resize
    # kernel and JPEG pipeline, so scores (and hence thresholded counts)
    # wobble with random weights; the contract is that detected LOCATIONS
    # largely coincide (patch-grid cells are 14 px apart, so exact-pixel
    # agreement is the norm for shared detections).
    a = {(round(float(x), 0), round(float(y), 0)) for x, y, *_ in kp_native}
    b = {(round(float(x), 0), round(float(y), 0)) for x, y, *_ in kp_cv2}
    # (Pixel-level decode parity is pinned by
    # test_decode_matches_cv2_reference; random-weight saliency amplifies
    # the residual decode differences, so this is a loose bound.)
    overlap = len(a & b) / min(len(a), len(b))
    assert overlap >= 0.3, (overlap, len(a), len(b))
    # Coordinates live on the patch grid of the 140x112 image.
    for x, y in a | b:
        assert 0 <= x <= 140 and 0 <= y <= 112
