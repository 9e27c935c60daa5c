"""Full-pipeline reconstruction test on rendered image content.

Unlike test_sfm (synthetic keypoints), this renders a textured two-plane 3D
scene with consistent multi-view geometry, then drives the REAL pipeline:
JAX SIFT extraction -> device matching -> RANSAC verification -> incremental
mapping + bundle adjustment — and checks the recovered structure against
ground truth (two depth planes at ratio 1.5, up to the free gauge scale).
"""

import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.pipeline import Pipeline
from vit_colmap_tpu.utils.config import Config

W, H = 320, 256
FOCAL = 300.0
K = np.array([[FOCAL, 0, W / 2], [0, FOCAL, H / 2], [0, 0, 1]])
Z_NEAR, Z_FAR = 4.0, 6.0


def _texture(rng, size=256):
    import cv2

    t = rng.random((size // 4, size // 4, 3)).astype(np.float32)
    t = cv2.resize(t, (size, size), interpolation=cv2.INTER_CUBIC)
    t = (t - t.min()) / (t.max() - t.min())
    return (t * 255).astype(np.uint8)


def _render_scene(image_dir, n_cams=4, seed=0):
    """Two textured fronto-parallel planes imaged by an arc of cameras."""
    import cv2

    rng = np.random.default_rng(seed)
    # Plane corners in world coords (x, y, z): near plane smaller & centered
    # left, far plane larger & right — both always in view.
    planes = [
        (np.array([[-2.4, -1.8, Z_FAR], [2.4, -1.8, Z_FAR],
                   [2.4, 1.8, Z_FAR], [-2.4, 1.8, Z_FAR]]), _texture(rng)),
        (np.array([[-1.8, -1.2, Z_NEAR], [1.2, -1.2, Z_NEAR],
                   [1.2, 1.2, Z_NEAR], [-1.8, 1.2, Z_NEAR]]), _texture(rng)),
    ]
    image_dir.mkdir(parents=True, exist_ok=True)
    cams = []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 0.06
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]]
        )
        C = np.array([1.2 * np.sin(ang), 0.05 * i, Z_NEAR - Z_NEAR * np.cos(ang)])
        t = -R @ C
        cams.append((R, t))
        img = np.zeros((H, W, 3), np.uint8)
        for corners, tex in planes:  # far plane drawn first
            Xc = corners @ R.T + t
            uv = (Xc[:, :2] / Xc[:, 2:]) * FOCAL + np.array([W / 2, H / 2])
            src = np.array(
                [[0, 0], [tex.shape[1] - 1, 0],
                 [tex.shape[1] - 1, tex.shape[0] - 1], [0, tex.shape[0] - 1]],
                np.float32,
            )
            Hmat = cv2.getPerspectiveTransform(src, uv.astype(np.float32))
            warped = cv2.warpPerspective(tex, Hmat, (W, H))
            mask = cv2.warpPerspective(
                np.full(tex.shape[:2], 255, np.uint8), Hmat, (W, H)
            )
            img[mask > 128] = warped[mask > 128]
        cv2.imwrite(str(image_dir / f"view_{i}.png"), img)
    return cams


@pytest.mark.slow
def test_full_reconstruction_two_planes(tmp_path):
    image_dir = tmp_path / "images"
    cams = _render_scene(image_dir, n_cams=4)

    config = Config()
    config.camera.model = "PINHOLE"
    config.camera.params = [FOCAL, FOCAL, W / 2, H / 2]
    config.extractor.extractor_type = "sift"
    config.extractor.max_keypoints = 1024
    config.matching.ransac_iters = 512
    config.reconstruction.min_num_matches = 15
    pipe = Pipeline(config)
    pipe.run(
        image_dir=image_dir,
        output_dir=tmp_path / "out",
        db_path=tmp_path / "db.db",
    )

    # Matching + verification produced usable pairs.
    db = ColmapDatabase(tmp_path / "db.db")
    assert db.num_images == 4
    assert db.num_matched_pairs >= 3
    assert db.num_verified_pairs >= 3
    db.close()

    # Reconstruction: all cameras registered, solid point cloud.
    assert len(pipe.reconstructions) >= 1
    rec = pipe.reconstructions[0]
    assert len(rec.images) >= 3
    assert len(rec.points3D) >= 30, len(rec.points3D)
    assert rec.mean_reprojection_error() < 2.0

    # Structure check: point depths (first registered camera's frame) must
    # cluster at two planes with depth ratio Z_FAR/Z_NEAR = 1.5 (scale-free).
    first = rec.images[min(rec.images)]
    R0 = first.R()
    t0 = first.tvec
    depths = np.array(
        [(R0 @ p.xyz + t0)[2] for p in rec.points3D.values()]
    )
    depths = depths[depths > 0]
    # Trim far-field outliers (low-parallax points triangulate at huge
    # depths while still reprojecting well) before the cluster check.
    depths = depths[depths < 3 * np.median(depths)]
    assert len(depths) >= 25
    # 1-D 2-means: cluster centers must sit at the two plane depths
    # (ratio Z_FAR/Z_NEAR = 1.5, scale-free).  Percentile ratios are
    # fragile when one plane dominates the detections.
    c = np.array([depths.min(), depths.max()])
    for _ in range(20):
        assign = np.abs(depths[:, None] - c[None]).argmin(1)
        for k in (0, 1):
            if (assign == k).any():
                c[k] = depths[assign == k].mean()
    ratio = c.max() / c.min()
    assert 1.2 < ratio < 2.2, (ratio, c)

    # GT pose oracle (sfm/align.py): Umeyama-align the recovered poses to
    # the renderer's exact ones.  Reprojection error alone can look fine on
    # subtly wrong geometry; this pins absolute accuracy (VERDICT r3 item 2).
    from vit_colmap_tpu.sfm.align import pose_errors_vs_gt

    gt = {f"view_{i}.png": cams[i] for i in range(len(cams))}
    pose = pose_errors_vs_gt(rec, gt)
    assert pose is not None and pose["aligned_cameras"] >= 3
    assert pose["pose_rot_err_deg_max"] < 0.5, pose
    # Center errors are normalized by the camera-center bbox diagonal —
    # harsh on this deliberately tiny-baseline scene (arc spans ~0.21 world
    # units against scene depth 4-6; typical measured rel err ~0.025 ==
    # 0.13% of scene depth).  The <1% contract lives on the DTU-50 bench
    # (scripts/bench_reconstruction.py), whose baseline is 3x wider.
    assert pose["pose_center_err_rel_max"] < 0.04, pose

    # Sparse model written to disk in COLMAP format.
    assert (tmp_path / "out" / "sparse" / "0" / "points3D.bin").exists()
