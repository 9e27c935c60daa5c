"""Metrics extraction/export/plotting round-trip tests."""

import json

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.utils.export import MetricsExporter, export_metrics
from vit_colmap_tpu.utils.metrics import MetricsExtractor, MetricsResult


@pytest.fixture
def populated_db(tmp_path):
    db = ColmapDatabase(tmp_path / "m.db")
    cid = db.add_pinhole_camera(100, 100, 90, 90, 50, 50)
    ids = [db.add_image(f"i{i}", cid) for i in range(4)]
    rng = np.random.default_rng(0)
    for n, iid in zip((10, 20, 30, 40), ids):
        db.add_keypoints(iid, rng.random((n, 2)).astype(np.float32))
        db.add_descriptors(iid, rng.integers(0, 255, (n, 128), dtype=np.uint8))
    m = np.stack([np.arange(8, dtype=np.uint32)] * 2, 1)
    db.add_matches(ids[0], ids[1], m)
    db.add_matches(ids[1], ids[2], m[:5])
    db.add_two_view_geometry(ids[0], ids[1], m[:6], config=2)
    db.commit()
    db.close()
    return tmp_path / "m.db"


def test_feature_and_matching_metrics(populated_db, tmp_path):
    ex = MetricsExtractor(populated_db, tmp_path)
    f = ex.extract_feature_metrics()
    assert f.total_images == 4
    assert f.total_keypoints == 100
    assert f.avg_keypoints_per_image == 25
    assert f.median_keypoints == 25
    m = ex.extract_matching_metrics(min_threshold=6)
    assert m.total_image_pairs == 6
    assert m.matched_pairs == 2
    assert m.verified_pairs == 1
    assert m.total_raw_matches == 13
    assert m.total_inlier_matches == 6
    assert m.inlier_ratio == pytest.approx(6 / 13)
    assert m.config_distribution == {"CALIBRATED": 1}
    assert m.pairs_above_threshold == 1


def test_export_and_load_roundtrip(populated_db, tmp_path):
    ex = MetricsExtractor(populated_db, tmp_path)
    result = ex.extract_all_metrics("DS", "scene1", "vit", config={"a": 1})
    out_dir = tmp_path / "results"
    path = export_metrics(result, out_dir)
    assert path == out_dir / "DS" / "scene1" / "vit.json"
    loaded = MetricsExporter(out_dir).load_metrics("DS", "scene1", "vit")
    assert loaded.features.total_keypoints == 100
    assert loaded.matching.matched_pairs == 2
    assert loaded.config == {"a": 1}
    # summary.csv appended with header once
    export_metrics(result, out_dir)
    lines = (out_dir / "summary.csv").read_text().strip().splitlines()
    assert len(lines) == 3  # header + 2 rows
    assert MetricsExporter(out_dir).load_all_metrics()


def test_plotters_produce_files(populated_db, tmp_path):
    ex = MetricsExtractor(populated_db, tmp_path)
    out_dir = tmp_path / "results"
    for etype in ("colmap_sift", "vit"):
        export_metrics(
            ex.extract_all_metrics("DS", "s1", etype), out_dir
        )
    from vit_colmap_tpu.utils.plot_metrics import MetricsPlotter

    p = MetricsPlotter(out_dir)
    assert p.plot_comparison("DS", "s1", ["colmap_sift", "vit"]).exists()
    assert p.plot_single_scan("DS", "s1", "vit").exists()
    assert p.plot_summary().exists()


def test_training_plotter_jsonl(tmp_path):
    from vit_colmap_tpu.utils.plot_training import TrainingLossPlotter

    path = tmp_path / "scalars.jsonl"
    with open(path, "w") as f:
        for e in range(3):
            for s in range(4):
                f.write(json.dumps({
                    "event": "train", "epoch": e, "step": e * 4 + s,
                    "total_loss": 3.0 - e - 0.1 * s,
                    "detector_loss": 1.0, "descriptor_loss": 0.5,
                }) + "\n")
            f.write(json.dumps({
                "event": "val", "epoch": e, "total_loss": 3.1 - e
            }) + "\n")
    p = TrainingLossPlotter(path)
    ep, tr = p.epoch_means("total_loss")
    assert list(ep) == [0, 1, 2]
    assert tr[0] > tr[2]
    assert p.plot_total_loss(tmp_path / "t.png").exists()
    assert p.plot_components(tmp_path / "c.png").exists()
