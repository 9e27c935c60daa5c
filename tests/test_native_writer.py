"""Native C++ DB writer: cross-implementation consistency with the Python
layer. Skipped when native/build.sh hasn't been run."""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.database.native import load_native


pytestmark = pytest.mark.skipif(
    load_native() is None, reason="native writer not built (native/build.sh)"
)


def test_native_writer_roundtrip(tmp_path):
    from vit_colmap_tpu.database.native import NativeDatabaseWriter

    p = tmp_path / "n.db"
    w = NativeDatabaseWriter(p)
    cid = w.add_camera(1, 640, 480, [600.0, 600.0, 320.0, 240.0])
    i1 = w.add_image("a.png", cid)
    i2 = w.add_image("b.png", cid)
    rng = np.random.default_rng(0)
    k = rng.random((50, 2)).astype(np.float32)
    d = rng.integers(0, 255, (50, 128), dtype=np.uint8)
    w.add_keypoints(i1, k)
    w.add_descriptors(i1, d)
    w.add_keypoints(i2, k)
    w.add_descriptors(i2, d)
    m = np.stack([np.arange(10, dtype=np.uint32)] * 2, 1)
    w.add_matches(i2, i1, m)  # reversed -> column swap path
    F = np.arange(9, dtype=np.float64).reshape(3, 3)
    w.add_two_view_geometry(i1, i2, m[:5], config=2, F=F)
    w.close()

    db = ColmapDatabase(p)
    assert db.num_images == 2
    np.testing.assert_array_equal(db.read_keypoints(i1), k)
    np.testing.assert_array_equal(db.read_descriptors(i2), d)
    np.testing.assert_array_equal(db.read_matches(i2, i1), m)
    np.testing.assert_array_equal(db.read_matches(i1, i2), m[:, ::-1])
    g = db.read_two_view_geometry(i1, i2)
    np.testing.assert_array_equal(g["inlier_matches"], m[:5])
    np.testing.assert_array_equal(g["F"], F)
    assert db.read_cameras()[cid]["model"] == "PINHOLE"
    db.close()


def test_native_matches_python_bytes(tmp_path):
    """Same writes through both implementations produce identical tables."""
    import sqlite3

    from vit_colmap_tpu.database.native import NativeDatabaseWriter

    rng = np.random.default_rng(1)
    k = rng.random((20, 2)).astype(np.float32)
    d = rng.integers(0, 255, (20, 128), dtype=np.uint8)
    m = np.stack([np.arange(7, dtype=np.uint32)] * 2, 1)

    p1 = tmp_path / "py.db"
    db = ColmapDatabase(p1)
    cid = db.add_camera("PINHOLE", 64, 48, [60.0, 60.0, 32.0, 24.0])
    iid1 = db.add_image("x.png", cid)
    iid2 = db.add_image("y.png", cid)
    db.add_keypoints(iid1, k)
    db.add_descriptors(iid1, d)
    db.add_matches(iid1, iid2, m)
    db.close()

    p2 = tmp_path / "cc.db"
    w = NativeDatabaseWriter(p2)
    cid2 = w.add_camera(1, 64, 48, [60.0, 60.0, 32.0, 24.0])
    jid1 = w.add_image("x.png", cid2)
    jid2 = w.add_image("y.png", cid2)
    w.add_keypoints(jid1, k)
    w.add_descriptors(jid1, d)
    w.add_matches(jid1, jid2, m)
    w.close()

    q = (
        "SELECT camera_id, model, width, height, params, prior_focal_length"
        " FROM cameras"
    )
    for query in (
        q,
        "SELECT image_id, name, camera_id FROM images ORDER BY image_id",
        "SELECT image_id, rows, cols, data FROM keypoints",
        "SELECT image_id, rows, cols, data FROM descriptors",
        "SELECT pair_id, rows, cols, data FROM matches",
    ):
        a = sqlite3.connect(p1).execute(query).fetchall()
        b = sqlite3.connect(p2).execute(query).fetchall()
        assert a == b, query
