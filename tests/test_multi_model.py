"""Multiple-model reconstruction: disconnected view clusters -> two models."""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.sfm.incremental import incremental_mapping
from vit_colmap_tpu.utils.config import ReconstructionConfig


def _add_cluster(db, cid, rng, n_cams, n_pts, label):
    X = np.concatenate(
        [rng.uniform(-1, 1, (n_pts, 2)), rng.uniform(4, 6, (n_pts, 1))], axis=1
    )
    ids = []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 0.1
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]]
        )
        C = np.array([1.5 * np.sin(ang), 0.05 * i, 5 - 5 * np.cos(ang)])
        t = -R @ C
        Xc = X @ R.T + t
        uv = (Xc[:, :2] / Xc[:, 2:]) * 500 + np.array([320, 240])
        uv += 0.3 * rng.standard_normal(uv.shape)
        iid = db.add_image(f"{label}_{i}.png", cid)
        db.add_keypoints(iid, uv.astype(np.float32))
        ids.append(iid)
    m = np.stack([np.arange(n_pts, dtype=np.uint32)] * 2, 1)
    for a in range(n_cams):
        for b in range(a + 1, n_cams):
            db.add_matches(ids[a], ids[b], m)
            db.add_two_view_geometry(ids[a], ids[b], m, config=2)
    return ids


@pytest.mark.slow
def test_two_disconnected_clusters_give_two_models(tmp_path):
    rng = np.random.default_rng(0)
    db = ColmapDatabase(tmp_path / "db.db")
    cid = db.add_pinhole_camera(640, 480, 500, 500, 320, 240)
    _add_cluster(db, cid, rng, n_cams=3, n_pts=120, label="a")
    _add_cluster(db, cid, rng, n_cams=3, n_pts=120, label="b")
    db.commit()
    db.close()

    recs = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse",
        ReconstructionConfig(multiple_models=True, ba_local_iters=10,
                             ba_global_iters=15),
    )
    assert len(recs) == 2
    for rec in recs.values():
        assert len(rec.images) == 3
        assert len(rec.points3D) >= 80
    # Disjoint image sets.
    names0 = {im.name for im in recs[0].images.values()}
    names1 = {im.name for im in recs[1].images.values()}
    assert not names0 & names1
    # multiple_models=False stops after one model.
    recs_single = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse2",
        ReconstructionConfig(multiple_models=False, ba_local_iters=10,
                             ba_global_iters=15),
    )
    assert len(recs_single) == 1
