"""PCA persistence + order-independence (VERDICT r1 item 6, SURVEY §7 step 4).

The reference fit PCA lazily on whatever batch arrived first
(``/root/reference/vit_colmap/features/vit_extractor.py:588-653``), so
descriptors depended on image processing order and the hybrid extractor fit a
second, different projection.  Here the projection is fitted on a canonical
sorted-name sample, persisted to .npz, and shared.
"""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.ops.interpolate import fit_pca, load_pca, save_pca


def test_pca_save_load_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    x = rng.standard_normal((200, 32)).astype(np.float32)
    comps, mean = fit_pca(x, out_dim=8)
    p = tmp_path / "pca.npz"
    save_pca(p, comps, mean)
    comps2, mean2 = load_pca(p)
    np.testing.assert_array_equal(np.asarray(comps), np.asarray(comps2))
    np.testing.assert_array_equal(np.asarray(mean), np.asarray(mean2))


def test_pca_sign_canonicalization():
    # Same subspace fitted from different row orderings must produce
    # identically-signed components (largest-|entry| coordinate positive).
    rng = np.random.default_rng(1)
    x = rng.standard_normal((500, 16)).astype(np.float32)
    comps, _ = fit_pca(x, out_dim=4)
    comps = np.asarray(comps)
    pivots = np.argmax(np.abs(comps), axis=0)
    assert (comps[pivots, np.arange(4)] > 0).all()


def _make_images(tmp_path, names, rng_seed=7):
    """Write the SAME image contents under the given names (sorted order of
    ``names`` determines processing order inside extract())."""
    import cv2

    rng = np.random.default_rng(rng_seed)
    contents = [
        rng.integers(0, 255, (70, 84, 3), dtype=np.uint8) for _ in names
    ]
    d = tmp_path
    d.mkdir(exist_ok=True)
    for name, img in zip(names, contents):
        cv2.imwrite(str(d / name), img)
    return contents


def _read_desc_by_name(db_path):
    db = ColmapDatabase(db_path)
    out = {}
    for iid, info in db.read_images().items():
        out[info["name"]] = db.read_descriptors(iid)
    db.close()
    return out


@pytest.mark.slow
def test_extract_descriptors_reproduce_across_orderings(tmp_path):
    """Two runs over the same images with filename orderings that reverse the
    processing order must produce (near-)identical descriptors per content."""
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor

    names_a = ["a0.png", "a1.png", "a2.png", "a3.png"]
    # Reversed content-to-sorted-position mapping: content i gets name that
    # sorts at position (3 - i).
    names_b = ["b3.png", "b2.png", "b1.png", "b0.png"]
    contents = _make_images(tmp_path / "dirA", names_a)
    import cv2

    (tmp_path / "dirB").mkdir()
    for name, img in zip(names_b, contents):
        cv2.imwrite(str(tmp_path / "dirB" / name), img)

    kw = dict(backbone="vits14", max_keypoints=64, image_batch=2, seed=0)
    ex_a = ViTExtractor(**kw)
    ex_a.extract(tmp_path / "dirA", tmp_path / "a.db", "SIMPLE_PINHOLE")
    ex_b = ViTExtractor(**kw)
    ex_b.extract(tmp_path / "dirB", tmp_path / "b.db", "SIMPLE_PINHOLE")

    desc_a = _read_desc_by_name(tmp_path / "a.db")
    desc_b = _read_desc_by_name(tmp_path / "b.db")
    for i in range(4):
        da = desc_a[names_a[i]].astype(np.int16)
        db_ = desc_b[names_b[i]].astype(np.int16)
        assert da.shape == db_.shape
        # Identical fit sample (all 4 images <= pca_fit_images) in different
        # row order: allow <=1 quantization-step wobble from float reduction
        # order, require overwhelming exact agreement.
        diff = np.abs(da - db_)
        assert diff.max() <= 1
        assert (diff == 0).mean() > 0.99


@pytest.mark.slow
def test_persisted_pca_shared_and_exact(tmp_path):
    """A persisted pca_path must make descriptors bit-identical across runs
    and be loadable by the hybrid extractor (shared projection space)."""
    from vit_colmap_tpu.features.hybrid_extractor import HybridExtractor
    from vit_colmap_tpu.features.vit_extractor import ViTExtractor

    names = ["x0.png", "x1.png", "x2.png"]
    _make_images(tmp_path / "imgs", names, rng_seed=11)
    pca_path = tmp_path / "pca.npz"

    kw = dict(backbone="vits14", max_keypoints=64, image_batch=2, seed=0,
              pca_path=str(pca_path))
    ex1 = ViTExtractor(**kw)
    ex1.extract(tmp_path / "imgs", tmp_path / "r1.db", "SIMPLE_PINHOLE")
    assert pca_path.exists()

    ex2 = ViTExtractor(**kw)  # loads the persisted projection
    assert ex2._pca is not None
    ex2.extract(tmp_path / "imgs", tmp_path / "r2.db", "SIMPLE_PINHOLE")

    d1 = _read_desc_by_name(tmp_path / "r1.db")
    d2 = _read_desc_by_name(tmp_path / "r2.db")
    for n in names:
        np.testing.assert_array_equal(d1[n], d2[n])

    hy = HybridExtractor(backbone="vits14", max_keypoints=64, seed=0,
                         pca_path=str(pca_path))
    assert hy._pca is not None
    np.testing.assert_array_equal(
        np.asarray(hy._pca[0]), np.asarray(ex2._pca[0])
    )
