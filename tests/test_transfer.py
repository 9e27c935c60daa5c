"""YUV420 transfer compression (ops/transfer.py).

The bench path sends I420-packed images (1.5 B/px) over the ~45 MB/s relay
and reconstructs RGB on device.  These tests pin the reconstruction to
cv2's I420 convention and bound the feature-level impact.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from vit_colmap_tpu.ops.transfer import (
    i420_to_c4,
    pack_batch_yuv420,
    pack_batch_yuv420_c4,
    unpack_yuv420,
    unpack_yuv420_c4,
)


def _smooth(rng, h=84, w=112):
    small = rng.integers(0, 255, (h // 8, w // 8, 3), dtype=np.uint8)
    return cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)


def test_roundtrip_matches_cv2_inverse():
    """Device reconstruction must track cv2's own YUV2RGB_I420 closely
    (same studio-range BT.601 matrix; only chroma upsampling differs:
    bilinear here vs nearest in cv2)."""
    rng = np.random.default_rng(0)
    img = _smooth(rng)
    packed = pack_batch_yuv420(img[None])
    ours = np.asarray(unpack_yuv420(jnp.asarray(packed)))[0]
    cv2_back = cv2.cvtColor(packed[0], cv2.COLOR_YUV2RGB_I420).astype(np.float32)
    err_ours = np.abs(ours - img.astype(np.float32)).mean()
    err_cv2 = np.abs(cv2_back - img.astype(np.float32)).mean()
    # Bilinear chroma upsampling should reconstruct at least as well as
    # cv2's nearest-neighbor inverse, and stay close on smooth content.
    assert err_ours <= err_cv2 + 0.5, (err_ours, err_cv2)
    assert err_ours < 8.0


def test_roundtrip_luma_near_lossless():
    """Grayscale content loses only studio-range quantization (<1 level)."""
    rng = np.random.default_rng(1)
    gray = _smooth(rng)[..., :1].repeat(3, axis=-1)
    packed = pack_batch_yuv420(gray[None])
    rec = np.asarray(unpack_yuv420(jnp.asarray(packed)))[0]
    assert np.abs(rec - gray.astype(np.float32)).mean() < 1.0


def test_odd_plane_alignment():
    """h % 4 != 0 (e.g. 70 = 14*5) packs U/V planes without row alignment;
    flat-offset slicing must still decode exactly like cv2.  Constant chroma
    isolates the plane layout from upsampling-filter differences."""
    img = np.zeros((70, 84, 3), np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 200, 50, 120
    packed = pack_batch_yuv420(img[None])
    ours = np.asarray(unpack_yuv420(jnp.asarray(packed)))[0]
    cv2_back = cv2.cvtColor(packed[0], cv2.COLOR_YUV2RGB_I420).astype(np.float32)
    assert np.abs(ours - cv2_back).max() < 1.0


def test_c4_wire_size():
    """4-bit chroma is 1.125 B/px: (H + ceil(H/4)) rows of width W."""
    rng = np.random.default_rng(2)
    for h, w in ((84, 112), (70, 84), (1190, 84)):
        img = _smooth(rng, h=h, w=w)
        packed = pack_batch_yuv420_c4(img[None])
        assert packed.shape == (1, h + (h + 3) // 4, w)
        assert packed.dtype == np.uint8


def test_c4_roundtrip_close_to_i420():
    """4-bit chroma adds at most a few gray levels of error on top of the
    I420 reconstruction (chroma quantizer max error is 8/255)."""
    rng = np.random.default_rng(0)
    img = _smooth(rng)
    i420 = pack_batch_yuv420(img[None])
    base = np.asarray(unpack_yuv420(jnp.asarray(i420)))[0]
    ours = np.asarray(unpack_yuv420_c4(jnp.asarray(i420_to_c4(i420))))[0]
    # Luma is untouched: any difference comes only from chroma quantization.
    diff = np.abs(ours - base)
    assert diff.mean() < 4.0, diff.mean()
    assert diff.max() <= 17.0 * 1.8, diff.max()  # 8/255 chroma err * matrix


def test_c4_luma_untouched():
    """The luma plane passes through bit-exactly (only chroma quantizes)."""
    rng = np.random.default_rng(5)
    img = _smooth(rng, h=70, w=84)  # h % 4 != 0: padded chroma rows
    i420 = pack_batch_yuv420(img[None])
    c4 = i420_to_c4(i420)
    h, w = 70, 84
    np.testing.assert_array_equal(
        c4.reshape(1, -1)[:, : h * w], i420.reshape(1, -1)[:, : h * w]
    )
    # Full-range pack path agrees with the studio path on shape/layout.
    c4f = pack_batch_yuv420_c4(img[None], full_range=True)
    assert c4f.shape == c4.shape


@pytest.mark.slow
def test_backbone_features_agree_across_formats():
    """Dense backbone features from the yuv420 path must stay close to the
    rgb path (cosine > 0.98 per token) — the transfer compression must not
    meaningfully perturb the representation."""
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor

    rng = np.random.default_rng(3)
    img = _smooth(rng, h=70, w=84)
    fmaps = {}
    for fmt in ("rgb", "yuv420", "yuv420c4"):
        ex = ViTExtractor(backbone="vits14", max_keypoints=32, image_batch=1,
                          seed=0, transfer_format=fmt)
        ex._forward = ex._build_forward()
        dense = ex._forward[0]
        batch = img[None]
        if fmt == "yuv420":
            batch = pack_batch_yuv420(batch)
        elif fmt == "yuv420c4":
            batch = pack_batch_yuv420_c4(batch)
        batch, B0 = ex._pad_batch(batch)  # 8-device mesh in tests
        fmaps[fmt] = np.asarray(
            dense(ex.params, jnp.asarray(batch))[:B0], np.float32
        ).reshape(-1, 384)
    a = fmaps["rgb"]
    for fmt in ("yuv420", "yuv420c4"):
        b = fmaps[fmt]
        cos = (a * b).sum(1) / (
            np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
        )
        assert cos.mean() > 0.97, (fmt, cos.mean())
        assert cos.min() > 0.8, (fmt, cos.min())
