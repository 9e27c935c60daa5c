"""Serving mode: one warm process handles many scenes.

The reference has no serving mode (one scene per CLI invocation,
``scripts/run_DTU_sift.sh``); :mod:`vit_colmap_tpu.pipeline.serve` exists to
amortize the relay's per-program first-dispatch tax across scenes.  These
tests run the server on CPU with the deterministic DummyExtractor and check
the contracts that matter for warmth: extractor reuse, per-scene isolation
(fresh DB, no stale device_cache bleed), and skip-and-continue on bad jobs.
"""

import json

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.pipeline.serve import (
    PipelineServer,
    SceneJob,
    _iter_jobs,
    main,
)
from vit_colmap_tpu.utils.config import Config


def _write_scene(image_dir, n=3, w=320, h=240, square=40, shift_step=8):
    import cv2

    image_dir.mkdir(parents=True, exist_ok=True)
    yy, xx = np.mgrid[0:h, 0:w]
    for i in range(n):
        board = (
            ((xx + i * shift_step) // square + yy // square) % 2 * 255
        ).astype(np.uint8)
        cv2.imwrite(
            str(image_dir / f"img_{i}.png"), np.stack([board] * 3, axis=-1)
        )


def _config():
    config = Config()
    config.camera.model = "PINHOLE"
    config.extractor.extractor_type = "dummy"
    config.do_matching = True
    config.do_reconstruction = False
    return config


def test_server_runs_scenes_with_one_warm_extractor(tmp_path):
    for name in ("a", "b"):
        _write_scene(tmp_path / name / "images")
    server = PipelineServer(_config())
    jobs = [
        SceneJob(
            image_dir=tmp_path / name / "images",
            output_dir=tmp_path / name / "out",
        )
        for name in ("a", "b")
    ]
    results = server.serve(jobs)

    assert [r.ok for r in results] == [True, True]
    # Both scenes produced valid, independent databases.
    for name in ("a", "b"):
        db = ColmapDatabase(tmp_path / name / "out" / "database.db")
        assert db.num_images == 3
        assert db.num_matched_pairs >= 1
        db.close()
    # The warm-program contract: ONE extractor instance served both scenes
    # (per-instance jitted programs, hence their first-dispatch taxes, are
    # paid once).
    assert len(server.pipeline._extractors) == 1
    # Per-job reports carry the stage split the bench consumes.
    for r in results:
        assert r.report["num_images"] == 3
        assert r.report["extract_s"] >= 0
        assert r.report["total_s"] >= r.report["extract_s"]


def test_server_rewrites_stale_db_and_survives_bad_job(tmp_path):
    _write_scene(tmp_path / "images")
    out = tmp_path / "out"
    out.mkdir()
    (out / "database.db").write_bytes(b"stale non-sqlite bytes")
    server = PipelineServer(_config())
    # A MISSING image_dir is not a failure for the dummy extractor (it
    # auto-generates 10 images, the reference's contract); a regular FILE
    # in image_dir's place is genuinely bad and raises inside the job.
    not_a_dir = tmp_path / "not_a_dir"
    not_a_dir.write_text("plain file where a directory should be")
    bad = SceneJob(image_dir=not_a_dir, output_dir=tmp_path / "o2")
    good = SceneJob(image_dir=tmp_path / "images", output_dir=out)
    results = server.serve([bad, good])
    # Bad job fails without killing the server; the good job then
    # overwrites the stale DB.
    assert [r.ok for r in results] == [False, True]
    assert results[0].error
    db = ColmapDatabase(out / "database.db")
    assert db.num_images == 3
    db.close()


def test_iter_jobs_parses_and_skips_malformed_lines(tmp_path):
    lines = [
        json.dumps({"image_dir": "/a", "output_dir": "/b", "scene": "s"}),
        "not json",
        "# comment",
        "",
        json.dumps({"image_dir": "/a"}),  # missing output_dir
        json.dumps({"image_dir": "/a", "output_dir": "/b", "bogus": 1}),
    ]
    jobs = list(_iter_jobs(lines))
    assert len(jobs) == 1
    assert jobs[0].scene == "s"
    assert jobs[0].db_path is None


def test_serve_cli_end_to_end(tmp_path, capsys):
    _write_scene(tmp_path / "images")
    jobs_file = tmp_path / "jobs.jsonl"
    jobs_file.write_text(
        json.dumps(
            {
                "image_dir": str(tmp_path / "images"),
                "output_dir": str(tmp_path / "out"),
            }
        )
        + "\n"
    )
    report = tmp_path / "report.json"
    main(
        [
            "--jobs", str(jobs_file),
            "--extractor", "dummy",
            "--camera-model", "PINHOLE",
            "--skip-reconstruction",
            "--report-json", str(report),
        ]
    )
    rows = json.loads(report.read_text())
    assert len(rows) == 1 and rows[0]["ok"]
    assert rows[0]["num_images"] == 3


def test_all_failed_jobs_exit_nonzero(tmp_path):
    not_a_dir = tmp_path / "not_a_dir"
    not_a_dir.write_text("plain file where a directory should be")
    jobs_file = tmp_path / "jobs.jsonl"
    jobs_file.write_text(
        json.dumps(
            {
                "image_dir": str(not_a_dir),
                "output_dir": str(tmp_path / "out"),
            }
        )
        + "\n"
    )
    with pytest.raises(SystemExit):
        main(
            [
                "--jobs", str(jobs_file),
                "--extractor", "dummy",
                "--skip-reconstruction",
            ]
        )
