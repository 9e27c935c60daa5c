"""Golden-file COLMAP database compatibility (SURVEY §7 step 1, VERDICT r1
item 8).

``tests/data/golden_colmap.db`` is written by ``tests/make_golden_db.py`` —
an independent raw-sqlite transcription of COLMAP's database spec that never
imports vit_colmap_tpu.  (pycolmap does not exist in this environment, so
the spec transcription stands in for a pycolmap-written file.)  These tests
pin the production reader/writer to that spec:

* the reader decodes every table of the golden file exactly,
* the writer reproduces the golden file's schema (normalized sqlite_master
  SQL) and byte-identical blobs for identical content,
* pair_id encoding and the id-swap column-swap behave per spec.
"""

import sqlite3
from pathlib import Path

import numpy as np
import pytest

from tests.make_golden_db import MAX_IMAGE_ID, golden_content, write_golden
from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.database.colmap_db import (
    image_ids_to_pair_id,
    pair_id_to_image_ids,
)

GOLDEN = Path(__file__).parent / "data" / "golden_colmap.db"


@pytest.fixture(scope="module")
def golden_path(tmp_path_factory):
    if GOLDEN.exists():
        return GOLDEN
    p = tmp_path_factory.mktemp("golden") / "golden_colmap.db"
    write_golden(p)
    return p


def _norm_sql(sql: str) -> str:
    s = " ".join(sql.replace("IF NOT EXISTS ", "").split()).lower()
    return s.replace("( ", "(").replace(" )", ")")


def test_reader_decodes_golden_exactly(golden_path):
    cameras, images, keypoints, descriptors, matches, tvg = golden_content()
    db = ColmapDatabase(golden_path)
    try:
        cams = db.read_cameras()
        assert len(cams) == len(cameras)
        for cid, (model, w, h, params, prior) in enumerate(cameras, start=1):
            c = cams[cid]
            assert (c["width"], c["height"]) == (w, h)
            assert bool(c["prior_focal_length"]) == bool(prior)
            np.testing.assert_array_equal(c["params"], params)
        imgs = db.read_images()
        assert [imgs[i]["name"] for i in sorted(imgs)] == [
            n for n, _ in images
        ]
        for iid, kp in keypoints.items():
            np.testing.assert_array_equal(db.read_keypoints(iid), kp)
            np.testing.assert_array_equal(
                db.read_descriptors(iid), descriptors[iid]
            )
        for (i, j), m in matches.items():
            np.testing.assert_array_equal(db.read_matches(i, j), m)
        g = db.read_two_view_geometry(1, 2)
        ref = tvg[(1, 2)]
        np.testing.assert_array_equal(g["inlier_matches"], ref["inliers"])
        assert g["config"] == ref["config"]
        for key in ("F", "E", "H", "qvec", "tvec"):
            np.testing.assert_array_equal(
                np.asarray(g[key]).ravel(), ref[key].ravel()
            )
    finally:
        db.close()


def test_writer_reproduces_golden_schema_and_blobs(golden_path, tmp_path):
    cameras, images, keypoints, descriptors, matches, tvg = golden_content()
    out = tmp_path / "ours.db"
    db = ColmapDatabase(out)
    for model, w, h, params, prior in cameras:
        from vit_colmap_tpu.database.colmap_db import CAMERA_MODEL_NAMES

        db.add_camera(
            CAMERA_MODEL_NAMES[model], w, h, list(params),
            prior_focal_length=bool(prior),
        )
    for name, cam_id in images:
        db.add_image(name, camera_id=cam_id)
    for iid, kp in keypoints.items():
        db.add_keypoints(iid, kp)
        db.add_descriptors(iid, descriptors[iid])
    for (i, j), m in matches.items():
        db.add_matches(i, j, m)
    g = tvg[(1, 2)]
    db.add_two_view_geometry(
        1, 2, g["inliers"], config=g["config"], F=g["F"], E=g["E"],
        H=g["H"], qvec=g["qvec"], tvec=g["tvec"],
    )
    db.commit()
    db.close()

    gold = sqlite3.connect(golden_path)
    ours = sqlite3.connect(out)
    try:
        # Schema parity: normalized CREATE statements must match 1:1.
        q = ("SELECT name, sql FROM sqlite_master WHERE sql IS NOT NULL "
             "AND name NOT LIKE 'sqlite_%' ORDER BY name")
        gold_schema = {n: _norm_sql(s) for n, s in gold.execute(q)}
        ours_schema = {n: _norm_sql(s) for n, s in ours.execute(q)}
        assert gold_schema == ours_schema

        # Byte-identical rows in every data table.
        for table in ("cameras", "images", "keypoints", "descriptors",
                      "matches", "two_view_geometries"):
            grows = gold.execute(f"SELECT * FROM {table} ORDER BY 1").fetchall()
            orows = ours.execute(f"SELECT * FROM {table} ORDER BY 1").fetchall()
            assert grows == orows, f"table {table} differs"
    finally:
        gold.close()
        ours.close()


def test_pair_id_spec():
    assert image_ids_to_pair_id(1, 2) == 1 * MAX_IMAGE_ID + 2
    # Swapped ids encode to the same pair_id.
    assert image_ids_to_pair_id(2, 1) == image_ids_to_pair_id(1, 2)
    assert pair_id_to_image_ids(5 * MAX_IMAGE_ID + 9) == (5, 9)
    big = MAX_IMAGE_ID - 1
    assert pair_id_to_image_ids(image_ids_to_pair_id(big - 1, big)) == (
        big - 1, big,
    )


def test_swapped_matches_column_swap(tmp_path):
    """add_matches(i2, i1, m) must store pair_id(i1, i2) with the match
    columns swapped (COLMAP spec)."""
    db = ColmapDatabase(tmp_path / "swap.db")
    db.add_camera("PINHOLE", 64, 48, [50, 50, 32, 24])
    db.add_image("a.png", camera_id=1)
    db.add_image("b.png", camera_id=1)
    m = np.array([[3, 7], [1, 0]], np.uint32)
    db.add_matches(2, 1, m)  # reversed ids
    db.commit()
    back = db.read_matches(1, 2)
    np.testing.assert_array_equal(back, m[:, ::-1])
    db.close()
