#!/usr/bin/env python
"""Generate tests/data/golden_colmap.db — a COLMAP-schema database written
with raw sqlite3 + numpy only (NO vit_colmap_tpu imports).

This is an independent transcription of COLMAP's database spec
(colmap/src/colmap/scene/database.cc; the reference consumes it through
pycolmap at ``/root/reference/vit_colmap/database/colmap_db.py``): exact
DDL, pair_id = id1 * 2147483647 + id2 with id1 < id2, float32 keypoint
blobs, uint8 descriptor blobs, uint32 match blobs, float64 3x3 F/E/H and
qvec/tvec blobs.  pycolmap does not exist in this environment, so this
second implementation is the golden oracle the production writer/reader is
byte-compared against (SURVEY §7 step 1; VERDICT r1 item 8).

Deterministic: fixed RNG seed, fixed insert order — regenerating the file
reproduces it byte-for-byte (modulo sqlite page layout, which the test does
not depend on).
"""

from __future__ import annotations

import sqlite3
from pathlib import Path

import numpy as np

MAX_IMAGE_ID = 2147483647

DDL = [
    """CREATE TABLE cameras (
    camera_id INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    model     INTEGER NOT NULL,
    width     INTEGER NOT NULL,
    height    INTEGER NOT NULL,
    params    BLOB,
    prior_focal_length INTEGER NOT NULL)""",
    """CREATE TABLE images (
    image_id  INTEGER PRIMARY KEY AUTOINCREMENT NOT NULL,
    name      TEXT NOT NULL UNIQUE,
    camera_id INTEGER NOT NULL,
    prior_qw REAL, prior_qx REAL, prior_qy REAL, prior_qz REAL,
    prior_tx REAL, prior_ty REAL, prior_tz REAL,
    CONSTRAINT image_id_check CHECK(image_id >= 0 and image_id < 2147483647),
    FOREIGN KEY(camera_id) REFERENCES cameras(camera_id))""",
    "CREATE UNIQUE INDEX index_name ON images(name)",
    """CREATE TABLE keypoints (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE)""",
    """CREATE TABLE descriptors (
    image_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    FOREIGN KEY(image_id) REFERENCES images(image_id) ON DELETE CASCADE)""",
    """CREATE TABLE matches (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB)""",
    """CREATE TABLE two_view_geometries (
    pair_id INTEGER PRIMARY KEY NOT NULL,
    rows INTEGER NOT NULL, cols INTEGER NOT NULL, data BLOB,
    config INTEGER NOT NULL,
    F BLOB, E BLOB, H BLOB, qvec BLOB, tvec BLOB)""",
]


def golden_content():
    """The fixture's canonical content as plain numpy (shared by the test)."""
    rng = np.random.default_rng(42)
    cameras = [
        # (model_id, width, height, params float64, prior_focal_length)
        (1, 640, 480, np.array([600.0, 600.0, 320.0, 240.0]), 1),  # PINHOLE
        (2, 320, 240, np.array([280.0, 160.0, 120.0, -0.05]), 0),  # SIMPLE_RADIAL
    ]
    images = [("img_a.png", 1), ("img_b.png", 1), ("img_c.png", 2)]
    keypoints = {
        1: rng.uniform(0, 640, (5, 2)).astype(np.float32),
        2: rng.uniform(0, 640, (4, 6)).astype(np.float32),  # 6-col variant
        3: rng.uniform(0, 320, (3, 4)).astype(np.float32),  # 4-col variant
    }
    descriptors = {
        i: rng.integers(0, 256, (len(keypoints[i]), 128), dtype=np.uint8)
        for i in keypoints
    }
    matches = {
        (1, 2): np.array([[0, 1], [2, 3], [4, 0]], np.uint32),
        (1, 3): np.array([[1, 2]], np.uint32),
    }
    tvg = {
        (1, 2): dict(
            inliers=np.array([[0, 1], [2, 3]], np.uint32),
            config=2,  # CALIBRATED
            F=rng.standard_normal((3, 3)),
            E=rng.standard_normal((3, 3)),
            H=rng.standard_normal((3, 3)),
            qvec=np.array([1.0, 0.0, 0.0, 0.0]),
            tvec=np.array([0.1, -0.2, 0.97]),
        ),
    }
    return cameras, images, keypoints, descriptors, matches, tvg


def write_golden(path: Path) -> None:
    path.parent.mkdir(parents=True, exist_ok=True)
    if path.exists():
        path.unlink()
    conn = sqlite3.connect(path)
    for ddl in DDL:
        conn.execute(ddl)
    cameras, images, keypoints, descriptors, matches, tvg = golden_content()
    for model, w, h, params, prior in cameras:
        conn.execute(
            "INSERT INTO cameras(model, width, height, params, "
            "prior_focal_length) VALUES(?,?,?,?,?)",
            (model, w, h, params.astype(np.float64).tobytes(), prior),
        )
    for name, cam_id in images:
        conn.execute(
            "INSERT INTO images(name, camera_id) VALUES(?,?)", (name, cam_id)
        )
    for iid, kp in keypoints.items():
        conn.execute(
            "INSERT INTO keypoints VALUES(?,?,?,?)",
            (iid, kp.shape[0], kp.shape[1], kp.astype(np.float32).tobytes()),
        )
    for iid, d in descriptors.items():
        conn.execute(
            "INSERT INTO descriptors VALUES(?,?,?,?)",
            (iid, d.shape[0], d.shape[1], d.astype(np.uint8).tobytes()),
        )
    for (i, j), m in matches.items():
        assert i < j
        pair_id = i * MAX_IMAGE_ID + j
        conn.execute(
            "INSERT INTO matches VALUES(?,?,?,?)",
            (pair_id, m.shape[0], 2, m.astype(np.uint32).tobytes()),
        )
    for (i, j), g in tvg.items():
        pair_id = i * MAX_IMAGE_ID + j
        conn.execute(
            "INSERT INTO two_view_geometries VALUES(?,?,?,?,?,?,?,?,?,?)",
            (
                pair_id, g["inliers"].shape[0], 2,
                g["inliers"].astype(np.uint32).tobytes(), g["config"],
                g["F"].astype(np.float64).tobytes(),
                g["E"].astype(np.float64).tobytes(),
                g["H"].astype(np.float64).tobytes(),
                g["qvec"].astype(np.float64).tobytes(),
                g["tvec"].astype(np.float64).tobytes(),
            ),
        )
    conn.commit()
    conn.close()


if __name__ == "__main__":
    out = Path(__file__).parent / "data" / "golden_colmap.db"
    write_golden(out)
    print(f"Wrote {out} ({out.stat().st_size} bytes)")
