"""YUV420 transfer compression (ops/transfer.py).

The bench path sends I420-packed images (1.5 B/px) over the ~45 MB/s relay
and reconstructs RGB on device.  These tests pin the reconstruction to
cv2's I420 convention and bound the feature-level impact.
"""

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

import jax.numpy as jnp

from vit_colmap_tpu.ops.transfer import pack_batch_yuv420, unpack_yuv420


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


@pytest.mark.slow
def test_backbone_features_agree_across_formats():
    """Dense backbone features from the yuv420 path must stay close to the
    rgb path (cosine > 0.98 per token) — the transfer compression must not
    meaningfully perturb the representation."""
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor

    rng = np.random.default_rng(3)
    img = _smooth(rng, h=70, w=84)
    fmaps = {}
    for fmt in ("rgb", "yuv420"):
        ex = ViTExtractor(backbone="vits14", max_keypoints=32, image_batch=1,
                          seed=0, transfer_format=fmt)
        ex._forward = ex._build_forward()
        dense = ex._forward[0]
        batch = img[None]
        if fmt == "yuv420":
            batch = pack_batch_yuv420(batch)
        batch, B0 = ex._pad_batch(batch)  # 8-device mesh in tests
        fmaps[fmt] = np.asarray(
            dense(ex.params, jnp.asarray(batch))[:B0], np.float32
        ).reshape(-1, 384)
    a, b = fmaps["rgb"], fmaps["yuv420"]
    cos = (a * b).sum(1) / (
        np.linalg.norm(a, axis=1) * np.linalg.norm(b, axis=1)
    )
    assert cos.mean() > 0.97, cos.mean()
    assert cos.min() > 0.8, cos.min()
