"""Larger-scale incremental mapping: partial visibility, many images."""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.sfm.incremental import incremental_mapping
from vit_colmap_tpu.utils.config import ReconstructionConfig


@pytest.mark.slow
def test_incremental_mapping_12_views_partial_visibility(tmp_path):
    rng = np.random.default_rng(0)
    n_pts, n_cams = 800, 12
    X = np.concatenate(
        [rng.uniform(-2, 2, (n_pts, 2)), rng.uniform(4, 8, (n_pts, 1))], axis=1
    )
    K = np.array([[600.0, 0, 400], [0, 600.0, 300], [0, 0, 1]])

    db = ColmapDatabase(tmp_path / "db.db")
    cid = db.add_pinhole_camera(800, 600, 600, 600, 400, 300)

    cams, feats = [], []  # feats[i]: (global point idx -> local feature idx)
    ids = []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 0.05
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]]
        )
        C = np.array([3.0 * np.sin(ang), 0.05 * i, 6 - 6 * np.cos(ang)])
        t = -R @ C
        Xc = X @ R.T + t
        uv = (Xc[:, :2] / Xc[:, 2:]) * 600 + np.array([400, 300])
        uv += 0.4 * rng.standard_normal(uv.shape)
        visible = (
            (Xc[:, 2] > 0.1)
            & (uv[:, 0] > 0) & (uv[:, 0] < 800)
            & (uv[:, 1] > 0) & (uv[:, 1] < 600)
            # random dropout simulates detection failures
            & (rng.random(n_pts) > 0.25)
        )
        idxs = np.nonzero(visible)[0]
        local = {int(g): k for k, g in enumerate(idxs)}
        iid = db.add_image(f"v{i:02d}.png", cid)
        db.add_keypoints(iid, uv[idxs].astype(np.float32))
        cams.append((R, t))
        feats.append(local)
        ids.append(iid)

    # Matches from shared visibility.
    n_verified = 0
    for a in range(n_cams):
        for b in range(a + 1, n_cams):
            shared = sorted(set(feats[a]) & set(feats[b]))
            if len(shared) < 20:
                continue
            m = np.array(
                [[feats[a][g], feats[b][g]] for g in shared], np.uint32
            )
            db.add_matches(ids[a], ids[b], m)
            db.add_two_view_geometry(ids[a], ids[b], m, config=2)
            n_verified += 1
    db.commit()
    db.close()
    assert n_verified >= 30

    import time

    t0 = time.perf_counter()
    recs = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse",
        ReconstructionConfig(min_num_matches=15, ba_local_iters=10,
                             ba_global_iters=20),
    )
    dt = time.perf_counter() - t0
    assert len(recs) >= 1
    rec = recs[0]
    assert len(rec.images) == n_cams, len(rec.images)
    assert len(rec.points3D) >= 500, len(rec.points3D)
    assert rec.mean_reprojection_error() < 1.5
    assert rec.mean_track_length() > 4.0
    # Budget guard (1-core CPU): the mapper must not be host-loop bound.
    assert dt < 240, f"mapper too slow: {dt:.1f}s"
