"""Unit tests for the COLMAP-schema database layer.

Coverage the reference lacks (SURVEY.md section 4): pair_id encoding,
blob round-trips, match column-swap semantics, two-view geometry storage.
"""

import sqlite3

import numpy as np
import pytest

from vit_colmap_tpu.database import (
    MAX_IMAGE_ID,
    TWO_VIEW_CONFIG,
    ColmapDatabase,
    image_ids_to_pair_id,
    pair_id_to_image_ids,
)


def test_pair_id_roundtrip():
    for a, b in [(1, 2), (2, 1), (7, 7), (1, MAX_IMAGE_ID - 1), (31, 1000)]:
        pid = image_ids_to_pair_id(a, b)
        lo, hi = min(a, b), max(a, b)
        assert pair_id_to_image_ids(pid) == (lo, hi)
    assert image_ids_to_pair_id(1, 2) == 1 * MAX_IMAGE_ID + 2
    assert image_ids_to_pair_id(2, 1) == image_ids_to_pair_id(1, 2)


def test_camera_image_roundtrip(tmp_path):
    db = ColmapDatabase(tmp_path / "t.db")
    cid = db.add_pinhole_camera(640, 480, 600.0, 600.0, 320.0, 240.0)
    iid = db.add_image("img0.png", cid)
    db.commit()
    cams = db.read_cameras()
    assert cams[cid]["model"] == "PINHOLE"
    assert cams[cid]["width"] == 640
    np.testing.assert_allclose(cams[cid]["params"], [600, 600, 320, 240])
    imgs = db.read_images()
    assert imgs[iid]["name"] == "img0.png"
    assert imgs[iid]["camera_id"] == cid
    db.close()


def test_keypoints_descriptors_blob_roundtrip(tmp_path):
    db = ColmapDatabase(tmp_path / "t.db")
    cid = db.add_camera("SIMPLE_RADIAL", 100, 100, [80.0, 50.0, 50.0, 0.0])
    iid = db.add_image("a.png", cid)
    kpts = np.random.rand(37, 6).astype(np.float32) * 100
    desc = np.random.randint(0, 256, (37, 128), dtype=np.uint8)
    db.add_keypoints(iid, kpts)
    db.add_descriptors(iid, desc)
    db.commit()
    np.testing.assert_array_equal(db.read_keypoints(iid), kpts)
    np.testing.assert_array_equal(db.read_descriptors(iid), desc)
    db.close()


def test_matches_column_swap(tmp_path):
    """Matches written with id1 > id2 must be stored swapped and read back."""
    db = ColmapDatabase(tmp_path / "t.db")
    cid = db.add_pinhole_camera(10, 10, 10, 10, 5, 5)
    i1 = db.add_image("a", cid)
    i2 = db.add_image("b", cid)
    pairs = np.array([[0, 3], [1, 4], [2, 5]], dtype=np.uint32)
    db.add_matches(i2, i1, pairs)  # reversed order on purpose
    db.commit()
    # Reading in canonical order gives column-swapped indices.
    stored = db.read_matches(i1, i2)
    np.testing.assert_array_equal(stored, pairs[:, ::-1])
    # Reading in the original order gives back what we wrote.
    np.testing.assert_array_equal(db.read_matches(i2, i1), pairs)
    db.close()


def test_two_view_geometry_roundtrip(tmp_path):
    db = ColmapDatabase(tmp_path / "t.db")
    cid = db.add_pinhole_camera(10, 10, 10, 10, 5, 5)
    i1 = db.add_image("a", cid)
    i2 = db.add_image("b", cid)
    inl = np.array([[0, 1], [5, 2]], dtype=np.uint32)
    F = np.arange(9, dtype=np.float64).reshape(3, 3)
    db.add_two_view_geometry(i1, i2, inl, config=TWO_VIEW_CONFIG["CALIBRATED"], F=F)
    db.commit()
    g = db.read_two_view_geometry(i1, i2)
    np.testing.assert_array_equal(g["inlier_matches"], inl)
    assert g["config"] == TWO_VIEW_CONFIG["CALIBRATED"]
    np.testing.assert_array_equal(g["F"], F)
    db.close()


def test_counts_and_raw_sql_schema(tmp_path):
    """The schema must be queryable by raw sqlite exactly like COLMAP's."""
    path = tmp_path / "t.db"
    db = ColmapDatabase(path)
    cid = db.add_pinhole_camera(10, 10, 10, 10, 5, 5)
    ids = [db.add_image(f"im{i}", cid) for i in range(3)]
    for iid in ids:
        db.add_keypoints(iid, np.zeros((5, 2), np.float32))
        db.add_descriptors(iid, np.zeros((5, 128), np.uint8))
    db.add_matches(ids[0], ids[1], np.zeros((4, 2), np.uint32))
    db.add_two_view_geometry(ids[0], ids[1], np.zeros((3, 2), np.uint32))
    db.commit()
    assert db.num_images == 3
    assert db.num_keypoints == 15
    assert db.num_matches == 4
    assert db.num_matched_pairs == 1
    assert db.num_verified_pairs == 1
    db.close()

    # Raw-SQL read path used by MetricsExtractor (and by external tools).
    conn = sqlite3.connect(path)
    rows = conn.execute("SELECT rows FROM keypoints").fetchall()
    assert [r[0] for r in rows] == [5, 5, 5]
    (cfg,) = conn.execute("SELECT config FROM two_view_geometries").fetchone()
    assert cfg == TWO_VIEW_CONFIG["CALIBRATED"]
    conn.close()


def test_get_db_count_shim(tmp_path):
    db = ColmapDatabase(tmp_path / "t.db")
    assert ColmapDatabase.get_db_count(db, "num_images") == 0
    with ColmapDatabase.open_database(tmp_path / "t.db") as db2:
        assert db2.num_cameras == 0
