"""Dataset + synthetic homography tests (host-side machinery)."""

import numpy as np
import pytest

from vit_colmap_tpu.dataloader.hpatches_dataset import HPatchesDataset, train_val_split
from vit_colmap_tpu.dataloader.synthetic_homography import (
    SyntheticHomographyConfig,
    adjust_homography_for_resize,
    compose_homographies,
    create_synthetic_pair,
    generate_random_homography,
    photometric_jitter,
)


def _make_hpatches_tree(root, n_seq_i=2, n_seq_v=1, n_img=4, size=(60, 80)):
    """Minimal fake HPatches layout: i_*/v_* dirs with k.ppm + H_1_k."""
    import cv2

    rng = np.random.default_rng(0)
    names = [f"i_seq{k}" for k in range(n_seq_i)] + [
        f"v_seq{k}" for k in range(n_seq_v)
    ]
    for name in names:
        d = root / name
        d.mkdir(parents=True)
        base = rng.integers(0, 255, (*size, 3), dtype=np.uint8)
        cv2.imwrite(str(d / "1.ppm"), base)
        for j in range(2, n_img + 1):
            H = generate_random_homography(
                size[1], size[0], SyntheticHomographyConfig.conservative(), rng
            )
            warped = cv2.warpPerspective(base, H, (size[1], size[0]))
            cv2.imwrite(str(d / f"{j}.ppm"), warped)
            np.savetxt(str(d / f"H_1_{j}"), H)
    return names


def test_random_homography_properties():
    rng = np.random.default_rng(1)
    H = generate_random_homography(100, 80, rng=rng)
    assert H.shape == (3, 3)
    assert H[2, 2] == pytest.approx(1.0)
    # Center maps near center (translation bounded by 10% + rotation effects).
    c = H @ np.array([50.0, 40.0, 1.0])
    c = c[:2] / c[2]
    assert np.linalg.norm(c - [50, 40]) < 30


def test_create_synthetic_pair_warps_consistently():
    import cv2

    rng = np.random.default_rng(2)
    img = rng.integers(0, 255, (60, 80, 3), dtype=np.uint8)
    warped, H = create_synthetic_pair(img, SyntheticHomographyConfig.conservative(), rng)
    assert warped.shape == img.shape
    # Check warp consistency: warping img with H reproduces `warped`.
    again = cv2.warpPerspective(img, H, (80, 60))
    assert (again == warped).mean() > 0.99


def test_compose_and_resize_homographies():
    rng = np.random.default_rng(3)
    H12 = generate_random_homography(80, 60, rng=rng)
    H13 = generate_random_homography(80, 60, rng=rng)
    H23 = compose_homographies(H12, H13)
    np.testing.assert_allclose(H23 @ H12 / (H23 @ H12)[2, 2], H13, atol=1e-8)

    Hr = adjust_homography_for_resize(H12, (80, 60), (40, 30), (80, 60), (40, 30))
    # A point mapped at full res then scaled equals scaled point mapped by Hr.
    p = np.array([20.0, 15.0, 1.0])
    q = H12 @ p
    q = q[:2] / q[2]
    pr = np.array([10.0, 7.5, 1.0])
    qr = Hr @ pr
    qr = qr[:2] / qr[2]
    np.testing.assert_allclose(qr, q / 2, atol=1e-6)


def test_hpatches_dataset_discovery_and_pairs(tmp_path):
    _make_hpatches_tree(tmp_path)
    ds = HPatchesDataset(tmp_path, split="all", pair_mode="reference_only",
                         target_height=56, target_width=70)
    assert len(ds.sequences) == 3
    assert len(ds) == 3 * 3  # 3 seqs x pairs (1,2..4)

    ds_i = HPatchesDataset(tmp_path, split="illumination",
                           target_height=56, target_width=70)
    assert len(ds_i.sequences) == 2
    ds_v = HPatchesDataset(tmp_path, split="viewpoint",
                           target_height=56, target_width=70)
    assert len(ds_v.sequences) == 1

    ds_all = HPatchesDataset(tmp_path, split="all", pair_mode="all_pairs",
                             target_height=56, target_width=70)
    assert len(ds_all) == 3 * 6  # C(4,2) pairs per seq


def test_hpatches_getitem_and_batches(tmp_path):
    _make_hpatches_tree(tmp_path)
    ds = HPatchesDataset(tmp_path, pair_mode="reference_only",
                         target_height=56, target_width=70,
                         synthetic_ratio=0.5, seed=1)
    n_syn = sum(1 for s in ds.samples if s["synthetic"])
    assert n_syn == int(9 * 0.5)
    item = ds[0]
    assert item["image1"].shape == (56, 70, 3)  # patch-aligned
    assert item["H"].shape == (3, 3)
    # synthetic item generates on the fly
    syn_idx = next(i for i, s in enumerate(ds.samples) if s["synthetic"])
    syn = ds[syn_idx]
    assert syn["is_synthetic"]

    batches = list(ds.batches(batch_size=4, seed=0))
    assert all(b["image1"].shape == (4, 56, 70, 3) for b in batches)
    assert all(b["H"].shape == (4, 3, 3) for b in batches)

    tr, va = train_val_split(ds, 0.2, seed=0)
    assert len(tr) + len(va) == len(ds)
    assert not set(tr) & set(va)


def test_photometric_jitter_contract():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 255, (40, 50, 3), dtype=np.uint8)
    # strength=0 is the identity (reference's geometric-only behavior).
    assert np.array_equal(photometric_jitter(img, rng, strength=0.0), img)
    out = photometric_jitter(img, np.random.default_rng(7), strength=1.0)
    assert out.shape == img.shape and out.dtype == np.uint8
    assert not np.array_equal(out, img)  # jitter actually changed pixels
    # Deterministic under a seeded generator.
    again = photometric_jitter(img, np.random.default_rng(7), strength=1.0)
    assert np.array_equal(out, again)


def test_dataset_photometric_strength_changes_img2_only(tmp_path):
    _make_hpatches_tree(tmp_path, n_seq_i=1, n_seq_v=0, n_img=3)
    kw = dict(pair_mode="reference_only", target_height=56, target_width=70)
    plain = HPatchesDataset(tmp_path, seed=5, **kw)
    jit = HPatchesDataset(tmp_path, photometric_strength=1.0, seed=5, **kw)
    # p=0.5 per sample: across the samples at least one img2 must differ,
    # every img1 and every GT homography must be untouched.
    changed = 0
    for _ in range(4):  # 8 Bernoulli(0.5) draws: P(no jitter) = 0.4%
        for k in range(len(plain)):
            a, b = plain[k], jit[k]
            assert np.array_equal(a["image1"], b["image1"])
            assert np.allclose(a["H"], b["H"])
            changed += not np.array_equal(a["image2"], b["image2"])
    assert changed >= 1


def test_dataset_homography_maps_content(tmp_path):
    """GT homography after resize must actually align the resized images."""
    import cv2

    _make_hpatches_tree(tmp_path, n_seq_i=1, n_seq_v=0, n_img=2, size=(120, 160))
    ds = HPatchesDataset(tmp_path, pair_mode="reference_only",
                         target_height=112, target_width=154)
    item = ds[0]
    w1 = cv2.warpPerspective(item["image1"], item["H"], (154, 112))
    mask = (w1.sum(-1) > 0)
    diff = np.abs(
        w1.astype(np.float32) - item["image2"].astype(np.float32)
    )[mask]
    assert diff.mean() < 30, diff.mean()
