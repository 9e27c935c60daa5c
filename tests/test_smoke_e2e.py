"""End-to-end smoke test — the load-bearing e2e seam.

Mirrors the reference's ``tests/test_smoke_e2e.py:20-76``: synthesize
translated checkerboards, run the real Pipeline with the deterministic
DummyExtractor, real (in-repo, on-device) matching + verification, skip
reconstruction, and assert database invariants.
"""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.pipeline import Pipeline
from vit_colmap_tpu.utils.config import Config


def _make_checkerboards(image_dir, n=3, w=640, h=480, square=40):
    import cv2

    image_dir.mkdir(parents=True, exist_ok=True)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        shift = i * 8
        board = (((xx + shift) // square + yy // square) % 2 * 255).astype(np.uint8)
        img = np.stack([board] * 3, axis=-1)
        cv2.imwrite(str(image_dir / f"img_{i}.png"), img)


@pytest.fixture
def pipeline_run(tmp_path):
    image_dir = tmp_path / "images"
    _make_checkerboards(image_dir)
    config = Config()
    config.camera.model = "PINHOLE"
    config.extractor.extractor_type = "dummy"
    config.do_matching = True
    config.do_reconstruction = False
    db_path = tmp_path / "db.db"
    Pipeline(config).run(
        image_dir=image_dir,
        output_dir=tmp_path / "out",
        db_path=db_path,
        dataset="smoke",
        scene="checker",
        results_dir=tmp_path / "results",
    )
    return tmp_path, db_path


def test_pipeline_integration(pipeline_run):
    tmp_path, db_path = pipeline_run
    db = ColmapDatabase(db_path)
    assert db.num_cameras >= 1
    assert db.num_images == 3
    # Dummy descriptors are position-seeded: every pair matches everywhere.
    assert db.num_matched_pairs >= 1
    images = db.read_images()
    for iid in images:
        k = db.read_keypoints(iid)
        d = db.read_descriptors(iid)
        assert k is not None and len(k) > 0
        assert d is not None and len(d) == len(k)
        assert k.dtype == np.float32 and k.shape[1] == 2
        assert d.dtype == np.uint8 and d.shape[1] == 128
    db.close()


def test_pipeline_exports_metrics(pipeline_run):
    tmp_path, _ = pipeline_run
    json_path = tmp_path / "results" / "smoke" / "checker" / "dummy.json"
    assert json_path.exists()
    import json

    with open(json_path) as f:
        data = json.load(f)
    assert data["features"]["total_images"] == 3
    assert data["matching"]["matched_pairs"] >= 1
    assert (tmp_path / "results" / "summary.csv").exists()


def test_dummy_matches_are_identity(pipeline_run):
    """Position-seeded descriptors must match grid-position-to-grid-position."""
    _, db_path = pipeline_run
    db = ColmapDatabase(db_path)
    ids = sorted(db.read_images().keys())
    m = db.read_matches(ids[0], ids[1])
    assert m is not None and len(m) > 0
    # Same grid => descriptor identical => matches are the identity map.
    np.testing.assert_array_equal(m[:, 0], m[:, 1])
    db.close()


def test_shard_descriptors_mode_matches_identically(tmp_path):
    """match_exhaustive with descriptors sharded over the 8-device mesh
    (scale-out memory mode) must write the exact matches of the replicated
    default."""
    import shutil

    from vit_colmap_tpu.database import ColmapDatabase
    from vit_colmap_tpu.features.dummy_extractor import DummyExtractor
    from vit_colmap_tpu.pipeline.match import match_exhaustive
    from vit_colmap_tpu.utils.config import MatchingConfig

    image_dir = tmp_path / "images"
    _make_checkerboards(image_dir, n=3)
    base_db = tmp_path / "base.db"
    DummyExtractor(step=64).extract(image_dir, base_db, "PINHOLE", None)

    tables = {}
    for shard in (False, True):
        db_path = tmp_path / f"m_{shard}.db"
        shutil.copy(base_db, db_path)
        cfg = MatchingConfig(shard_descriptors=shard, do_verification=False)
        stats = match_exhaustive(db_path, cfg)
        assert stats.matched_pairs >= 1
        with ColmapDatabase.open_database(db_path) as db:
            ids = sorted(db.read_images().keys())
            tables[shard] = {
                (a, b): db.read_matches(a, b)
                for i, a in enumerate(ids) for b in ids[i + 1:]
            }
    assert tables[False].keys() == tables[True].keys()
    for k in tables[False]:
        np.testing.assert_array_equal(tables[False][k], tables[True][k])


def test_max_num_matches_cap(tmp_path):
    """MatchingConfig.max_num_matches must bound per-pair stored matches
    (COLMAP SiftMatchingOptions.max_num_matches semantics)."""
    from vit_colmap_tpu.features.dummy_extractor import DummyExtractor
    from vit_colmap_tpu.pipeline.match import match_exhaustive
    from vit_colmap_tpu.utils.config import MatchingConfig

    image_dir = tmp_path / "images"
    _make_checkerboards(image_dir, n=3)
    db_path = tmp_path / "db.db"
    # step=64 grid on 640x480 -> 70 keypoints/image, identity matches.
    DummyExtractor(step=64).extract(image_dir, db_path, "PINHOLE", None)

    cap = 5
    cfg = MatchingConfig(max_num_matches=cap, do_verification=False)
    stats = match_exhaustive(db_path, cfg)
    assert stats.matched_pairs >= 1
    with ColmapDatabase.open_database(db_path) as db:
        ids = sorted(db.read_images().keys())
        seen = 0
        for i, a in enumerate(ids):
            for b in ids[i + 1:]:
                m = db.read_matches(a, b)
                if m is not None and len(m):
                    assert len(m) <= cap
                    seen += 1
        assert seen >= 1
