"""SfM stack tests: PnP, bundle adjustment, incremental mapping end-to-end."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.sfm.bundle import (
    BAProblem,
    axis_angle_to_matrix,
    bundle_adjust,
    matrix_to_axis_angle,
)
from vit_colmap_tpu.sfm.incremental import incremental_mapping
from vit_colmap_tpu.sfm.pnp import pnp_ransac
from vit_colmap_tpu.sfm.reconstruction import read_text
from vit_colmap_tpu.utils.config import ReconstructionConfig


def _look_at_scene(n_pts=200, n_cams=5, seed=0):
    """3D points in a box, cameras on an arc looking at the origin."""
    rng = np.random.default_rng(seed)
    X = rng.uniform([-1, -1, 3], [1, 1, 5], (n_pts, 3))
    K = np.array([[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]])
    cams = []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 0.12
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        C = np.array([2.0 * np.sin(ang), 0.1 * i, 4.0 - 4.0 * np.cos(ang)])
        t = -R @ C
        cams.append((R, t))
    return X, K, cams


def _project(R, t, K, X):
    Xc = X @ R.T + t
    uv = (Xc[:, :2] / Xc[:, 2:]) * np.diag(K)[:2] + K[:2, 2]
    return uv, Xc[:, 2]


def test_axis_angle_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(5):
        aa = rng.standard_normal(3) * 0.8
        R = np.asarray(axis_angle_to_matrix(jnp.asarray(aa)))
        aa2 = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        np.testing.assert_allclose(aa2, aa, atol=1e-5)


def test_pnp_ransac_recovers_pose():
    X, K, cams = _look_at_scene(n_pts=100)
    R, t = cams[2]
    uv, depth = _project(R, t, K, X)
    rng = np.random.default_rng(1)
    uv_noisy = uv + 0.5 * rng.standard_normal(uv.shape)
    # 20 outliers
    uv_noisy[:20] = rng.uniform(0, 640, (20, 2))
    n_pad = 128
    xy = np.zeros((n_pad, 2), np.float32)
    Xp = np.zeros((n_pad, 3), np.float32)
    mask = np.zeros(n_pad, bool)
    xy[:100], Xp[:100], mask[:100] = uv_noisy, X, True
    res = pnp_ransac(
        jnp.asarray(xy), jnp.asarray(Xp), jnp.asarray(mask),
        jnp.asarray(K, jnp.float32), jax.random.key(0), iters=512, max_error_px=4.0,
    )
    assert int(res.num_inliers) >= 70
    R_est = np.asarray(res.R)
    t_est = np.asarray(res.t)
    np.testing.assert_allclose(R_est, R, atol=0.02)
    np.testing.assert_allclose(t_est, t, atol=0.05)


def _make_ba_problem(cams, K, X, cam_noisy, pts, refine_focal=False,
                     K_scale=1.0):
    """All images share ONE camera (the mapper's common case)."""
    n_img, n_pts = len(cams), len(X)
    obs_cam, obs_pt, obs_xy = [], [], []
    for i, (R, t) in enumerate(cams):
        uv, _ = _project(R, t, K, X)
        for j in range(n_pts):
            obs_cam.append(i)
            obs_pt.append(j)
            obs_xy.append(uv[j])
    n_obs = len(obs_cam)
    K_used = K.copy()
    K_used[:2, :] *= K_scale  # wrong focal guess handed to BA
    K_used[:2, 2] = K[:2, 2]
    return BAProblem(
        cam_params=jnp.asarray(cam_noisy),
        focal_log=jnp.zeros(1, jnp.float32),
        points=jnp.asarray(pts),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_pt, jnp.int32),
        obs_xy=jnp.asarray(np.asarray(obs_xy), jnp.float32),
        obs_valid=jnp.ones(n_obs, bool),
        K=jnp.asarray(np.tile(K_used, (n_img, 1, 1)), jnp.float32),
        cam_of_img=jnp.zeros(n_img, jnp.int32),
        fixed_cam_mask=jnp.asarray([True, True] + [False] * (n_img - 2)),
        refine_focal_mask=jnp.full((1,), refine_focal),
    )


def test_bundle_adjust_reduces_error():
    X, K, cams = _look_at_scene(n_pts=60, n_cams=3)
    rng = np.random.default_rng(2)
    cam = np.zeros((3, 6), np.float32)
    for i, (R, t) in enumerate(cams):
        cam[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        cam[i, 3:6] = t
    # Perturb points (keep the two gauge-fixed cameras exact).
    pts = (X + 0.05 * rng.standard_normal(X.shape)).astype(np.float32)
    cam_noisy = cam.copy()
    cam_noisy[2, 3:6] += 0.05

    problem = _make_ba_problem(cams, K, X, cam_noisy, pts)
    cam_out, focal_out, dist_out, pts_out, msr = bundle_adjust(
        problem, iters=25, cg_iters=30
    )
    assert float(msr) < 0.05, float(msr)
    # Points recovered close to ground truth.
    err = np.linalg.norm(np.asarray(pts_out) - X, axis=-1)
    assert np.median(err) < 0.01
    # Focal scale untouched when refinement is off.
    np.testing.assert_allclose(np.asarray(focal_out), 0.0, atol=1e-8)


def test_bundle_adjust_refines_focal():
    """BA with a 10%-wrong focal guess recovers the true (shared) focal."""
    X, K, cams = _look_at_scene(n_pts=80, n_cams=4, seed=5)
    cam = np.zeros((4, 6), np.float32)
    for i, (R, t) in enumerate(cams):
        cam[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        cam[i, 3:6] = t
    pts = X.astype(np.float32)
    # Observations generated with the TRUE K; BA receives K scaled by 0.9.
    problem = _make_ba_problem(
        cams, K, X, cam, pts, refine_focal=True, K_scale=0.9
    )
    cam_out, focal_out, dist_out, pts_out, msr = bundle_adjust(
        problem, iters=30, cg_iters=40
    )
    assert float(msr) < 0.1, float(msr)
    scale = float(np.exp(np.asarray(focal_out)[0]))
    # 0.9 * exp(s) should approach 1.0.
    assert abs(scale - 1.0 / 0.9) < 0.05 * (1.0 / 0.9), scale


@pytest.mark.slow
def test_incremental_mapping_end_to_end(tmp_path):
    X, K, cams = _look_at_scene(n_pts=150, n_cams=5, seed=3)
    rng = np.random.default_rng(4)
    db = ColmapDatabase(tmp_path / "db.db")
    cid = db.add_pinhole_camera(640, 480, K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    ids = []
    for i, (R, t) in enumerate(cams):
        uv, depth = _project(R, t, K, X)
        uv = uv + 0.3 * rng.standard_normal(uv.shape)
        iid = db.add_image(f"cam{i}.png", cid)
        db.add_keypoints(iid, uv.astype(np.float32))
        db.add_descriptors(
            iid, rng.integers(0, 255, (len(uv), 128), dtype=np.uint8)
        )
        ids.append(iid)
    # identity correspondences for all pairs
    m = np.stack([np.arange(len(X))] * 2, axis=1).astype(np.uint32)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            db.add_matches(ids[a], ids[b], m)
            db.add_two_view_geometry(ids[a], ids[b], m, config=2)
    db.commit()
    db.close()

    cfg = ReconstructionConfig(min_num_matches=15)
    recs = incremental_mapping(tmp_path / "db.db", tmp_path, tmp_path / "sparse", cfg)
    assert len(recs) == 1
    rec = recs[0]
    assert len(rec.images) == 5
    assert len(rec.points3D) >= 100
    assert rec.mean_reprojection_error() < 1.5
    assert rec.mean_track_length() > 3.0

    # Sparse model written in COLMAP text format and round-trips.
    loaded = read_text(tmp_path / "sparse" / "0")
    assert len(loaded.images) == 5
    assert len(loaded.points3D) == len(rec.points3D)
    # Binary files exist.
    for name in ("cameras.bin", "images.bin", "points3D.bin"):
        assert (tmp_path / "sparse" / "0" / name).exists()


def test_track_merge(tmp_path):
    """try_merge combines duplicate 3D points when consistent and refuses
    inconsistent or same-image merges."""
    from vit_colmap_tpu.sfm.incremental import IncrementalMapper, _MapperState

    X, K, cams = _look_at_scene(n_pts=1, n_cams=4, seed=9)
    xyz = X[0]
    cameras = {1: {"camera_id": 1, "model": "PINHOLE", "width": 640,
                   "height": 480,
                   "params": np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
                   "prior_focal_length": True}}
    images = {i + 1: {"image_id": i + 1, "name": f"i{i}", "camera_id": 1}
              for i in range(4)}
    kps = {}
    for i, (R, t) in enumerate(cams):
        uv, _ = _project(R, t, K, X)
        kps[i + 1] = np.vstack([uv, uv + 500.0]).astype(np.float32)  # f0 good, f1 far
    state = _MapperState(cameras, images, kps)
    mapper = IncrementalMapper(state, {}, ReconstructionConfig())
    for i, (R, t) in enumerate(cams):
        state.poses[i + 1] = (R, t)

    # Same physical point observed as two separate tracks.
    pa = state.add_point(xyz + 0.001, [(1, 0), (2, 0)])
    pb = state.add_point(xyz - 0.001, [(3, 0), (4, 0)])
    assert mapper.try_merge(pa, pb)
    assert pb not in state.points
    assert len(state.tracks[pa]) == 4
    assert all(state.feat_pid[i][0] == pa for i in (1, 2, 3, 4))

    # Inconsistent merge (second point observed at far-off feature 1).
    pc = state.add_point(xyz, [(1, 1)])
    pd = state.add_point(xyz + np.array([5.0, 5.0, 0.0]), [(3, 1)])
    assert not mapper.try_merge(pc, pd)
    assert pd in state.points

    # Same-image overlap is refused.
    pe = state.add_point(xyz, [(2, 1)])
    assert not mapper.try_merge(pa, pe) or (2, 1) not in state.tracks[pa]


def test_track_merge_batch(tmp_path):
    """try_merge_batch must match sequential try_merge semantics: disjoint
    candidates evaluate vectorized, pid-sharing candidates chain, and
    inconsistent merges are refused."""
    from vit_colmap_tpu.sfm.incremental import IncrementalMapper, _MapperState

    X, K, cams = _look_at_scene(n_pts=3, n_cams=4, seed=11)
    cameras = {1: {"camera_id": 1, "model": "PINHOLE", "width": 640,
                   "height": 480,
                   "params": np.array([K[0, 0], K[1, 1], K[0, 2], K[1, 2]]),
                   "prior_focal_length": True}}
    images = {i + 1: {"image_id": i + 1, "name": f"i{i}", "camera_id": 1}
              for i in range(4)}
    kps = {}
    for i, (R, t) in enumerate(cams):
        uv, _ = _project(R, t, K, X)
        kps[i + 1] = np.vstack([uv, uv[:1] + 500.0, uv[:1]]).astype(
            np.float32
        )  # rows: 3 good points, 1 far-off, 1 extra view of X[0]
    state = _MapperState(cameras, images, kps)
    mapper = IncrementalMapper(state, {}, ReconstructionConfig())
    for i, (R, t) in enumerate(cams):
        state.poses[i + 1] = (R, t)

    # Two disjoint consistent candidates + one inconsistent + one chained.
    pa = state.add_point(X[0] + 0.001, [(1, 0), (2, 0)])
    pb = state.add_point(X[0] - 0.001, [(3, 0)])
    pc = state.add_point(X[1], [(1, 1), (2, 1)])
    pd = state.add_point(X[1] + 0.001, [(3, 1), (4, 1)])
    pe = state.add_point(X[2], [(1, 2)])
    pf = state.add_point(X[2] + np.array([5.0, 5.0, 0.0]), [(3, 2)])
    pg = state.add_point(X[0] + 0.002, [(4, 4)])  # chains onto pa after merge

    n = mapper.try_merge_batch(
        [(pa, pb), (pc, pd), (pe, pf), (pa, pg)]
    )
    assert n == 3, n
    assert pb not in state.points and pd not in state.points
    assert len(state.tracks[pa]) == 4  # pa (2) + pb (1) + chained pg (1)
    assert pg not in state.points
    assert pf in state.points  # inconsistent merge refused
    assert all(state.feat_pid[i][0] == pa for i in (1, 2, 3))
    assert state.feat_pid[4][4] == pa


def test_bundle_adjust_refines_distortion():
    """Observations generated with radial distortion k1=-0.15: BA starting
    from k=0 with refine_dist_mask on must recover k1 (COLMAP
    refine_extra_params behavior)."""
    X, K, cams = _look_at_scene(n_pts=80, n_cams=4, seed=7)
    k1_true = -0.15
    n_img = len(cams)
    obs_cam, obs_pt, obs_xy = [], [], []
    for i, (R, t) in enumerate(cams):
        Xc = X @ np.asarray(R).T + np.asarray(t)
        xn = Xc[:, :2] / Xc[:, 2:]
        r2 = (xn**2).sum(-1, keepdims=True)
        xd = xn * (1 + k1_true * r2)
        uv = xd * [K[0, 0], K[1, 1]] + [K[0, 2], K[1, 2]]
        for j in range(len(X)):
            obs_cam.append(i)
            obs_pt.append(j)
            obs_xy.append(uv[j])
    cam = np.zeros((n_img, 6), np.float32)
    for i, (R, t) in enumerate(cams):
        cam[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        cam[i, 3:6] = t
    problem = BAProblem(
        cam_params=jnp.asarray(cam),
        focal_log=jnp.zeros(1, jnp.float32),
        points=jnp.asarray(X.astype(np.float32)),
        obs_cam=jnp.asarray(obs_cam, jnp.int32),
        obs_point=jnp.asarray(obs_pt, jnp.int32),
        obs_xy=jnp.asarray(np.asarray(obs_xy), jnp.float32),
        obs_valid=jnp.ones(len(obs_cam), bool),
        K=jnp.asarray(np.tile(K, (n_img, 1, 1)), jnp.float32),
        cam_of_img=jnp.zeros(n_img, jnp.int32),
        fixed_cam_mask=jnp.asarray([True, True] + [False] * (n_img - 2)),
        refine_focal_mask=jnp.zeros(1, bool),
        dist=jnp.zeros((1, 2), jnp.float32),
        refine_dist_mask=jnp.asarray([[True, False]]),
    )
    cam_out, focal_out, dist_out, pts_out, msr = bundle_adjust(
        problem, iters=30, cg_iters=40
    )
    k1_est = float(np.asarray(dist_out)[0, 0])
    assert abs(k1_est - k1_true) < 0.02, (k1_est, float(msr))
    assert float(msr) < 0.5, float(msr)
    # k2 stays frozen.
    assert abs(float(np.asarray(dist_out)[0, 1])) < 1e-8


def test_bundle_adjust_dist_default_none_unchanged():
    """Callers that omit dist fields get identical pinhole behavior."""
    X, K, cams = _look_at_scene(n_pts=40, n_cams=3, seed=9)
    cam = np.zeros((3, 6), np.float32)
    for i, (R, t) in enumerate(cams):
        cam[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        cam[i, 3:6] = t
    pts = (X + 0.02 * np.random.default_rng(0).standard_normal(X.shape)).astype(
        np.float32
    )
    problem = _make_ba_problem(cams, K, X, cam, pts)
    cam_out, focal_out, dist_out, pts_out, msr = bundle_adjust(
        problem, iters=10, cg_iters=20
    )
    assert float(msr) < 0.05
    np.testing.assert_allclose(np.asarray(dist_out), 0.0, atol=1e-10)


def test_bundle_adjust_packed_matches_unpacked():
    """The packed single-transfer entry point (relay round-trip saver used by
    the mapper) must reproduce the unpacked solver exactly."""
    from vit_colmap_tpu.sfm.bundle import (
        bundle_adjust_packed,
        pack_ba_problem,
        unpack_ba_result,
    )

    X, K, cams = _look_at_scene(n_pts=40, n_cams=3)
    rng = np.random.default_rng(5)
    cam = np.zeros((3, 6), np.float32)
    for i, (R, t) in enumerate(cams):
        cam[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        cam[i, 3:6] = t
    pts = (X + 0.03 * rng.standard_normal(X.shape)).astype(np.float32)
    problem = _make_ba_problem(cams, K, X, cam, pts)
    n_img, n_cam = problem.cam_params.shape[0], problem.focal_log.shape[0]
    n_pts, n_obs = problem.points.shape[0], problem.obs_cam.shape[0]

    ref = bundle_adjust(problem, iters=8, cg_iters=20)
    fbuf, ibuf, bbuf = pack_ba_problem(
        problem.cam_params, problem.focal_log,
        np.zeros((n_cam, 2), np.float32), problem.points,
        problem.obs_cam, problem.obs_point, problem.obs_xy,
        problem.obs_valid, problem.K, problem.cam_of_img,
        problem.fixed_cam_mask, problem.refine_focal_mask,
        np.zeros((n_cam, 2), bool),
    )
    out = bundle_adjust_packed(
        fbuf, ibuf, bbuf, n_img=n_img, n_cam=n_cam, n_pts=n_pts,
        n_obs=n_obs, iters=8, cg_iters=20,
    )
    cam_o, focal_o, dist_o, pts_o, msr = unpack_ba_result(
        out, n_img, n_cam, n_pts
    )
    np.testing.assert_allclose(cam_o, np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(focal_o, np.asarray(ref[1]), atol=1e-6)
    np.testing.assert_allclose(pts_o, np.asarray(ref[3]), atol=1e-5)
    assert abs(msr - float(ref[4])) < 1e-6


def test_bundle_adjust_schur_matches_cg():
    """The Schur-complement direct solver (default ``ba_solver`` — one MXU
    factorization per LM step instead of ~20 sequential CG iterations) must
    converge to the same optimum as the matrix-free CG path."""
    X, K, cams = _look_at_scene(n_pts=60, n_cams=4)
    rng = np.random.default_rng(11)
    cam = np.zeros((4, 6), np.float32)
    for i, (R, t) in enumerate(cams):
        cam[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        cam[i, 3:6] = t
    pts = (X + 0.05 * rng.standard_normal(X.shape)).astype(np.float32)
    cam_noisy = cam.copy()
    cam_noisy[2:, 3:6] += 0.04
    problem = _make_ba_problem(cams, K, X, cam_noisy, pts)

    out_cg = bundle_adjust(problem, iters=20, cg_iters=50, solver="cg")
    out_sc = bundle_adjust(problem, iters=20, cg_iters=50, solver="schur")
    # Both reach (near-)zero residual on noise-free observations and agree
    # on the recovered geometry.
    assert float(out_sc[4]) < 0.05, float(out_sc[4])
    assert float(out_sc[4]) <= float(out_cg[4]) + 0.05
    np.testing.assert_allclose(
        np.asarray(out_sc[3]), np.asarray(out_cg[3]), atol=5e-3
    )
    np.testing.assert_allclose(
        np.asarray(out_sc[0]), np.asarray(out_cg[0]), atol=5e-3
    )


def test_bundle_adjust_schur_anchors_padding_distortion():
    """Schur path under mapper conditions: fixed anchor images, padded
    observations/points, and k1/k2 refinement enabled."""
    X, K, cams = _look_at_scene(n_pts=50, n_cams=4)
    rng = np.random.default_rng(12)
    cam = np.zeros((4, 6), np.float32)
    for i, (R, t) in enumerate(cams):
        cam[i, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
        cam[i, 3:6] = t
    pts = (X + 0.03 * rng.standard_normal(X.shape)).astype(np.float32)
    base = _make_ba_problem(cams, K, X, cam, pts)
    n_obs = base.obs_cam.shape[0]
    n_obs_pad, n_pts_pad = n_obs + 37, 64
    pad = lambda a, n, fill=0: jnp.concatenate(  # noqa: E731
        [a, jnp.full((n - a.shape[0],) + a.shape[1:], fill, a.dtype)]
    )
    problem = base._replace(
        points=pad(base.points, n_pts_pad),
        obs_cam=pad(base.obs_cam, n_obs_pad),
        obs_point=pad(base.obs_point, n_obs_pad),
        obs_xy=pad(base.obs_xy, n_obs_pad),
        obs_valid=pad(base.obs_valid, n_obs_pad, False),
        refine_focal_mask=jnp.ones(1, bool),
        dist=jnp.zeros((1, 2), jnp.float32),
        refine_dist_mask=jnp.ones((1, 2), bool),
    )
    cam_o, focal_o, dist_o, pts_o, msr = bundle_adjust(
        problem, iters=15, cg_iters=20, solver="schur"
    )
    assert float(msr) < 0.05, float(msr)
    # Anchored (fixed) images bit-identical to their input poses.
    np.testing.assert_array_equal(
        np.asarray(cam_o[:2]), np.asarray(problem.cam_params[:2])
    )
    # Padded points get a zero update.
    np.testing.assert_allclose(np.asarray(pts_o[50:]), 0.0, atol=1e-6)
    # Distortion stays near zero on pinhole ground truth.
    assert np.abs(np.asarray(dist_o)).max() < 0.02


def test_incremental_mapping_legacy_buckets(tmp_path):
    """The fine-bucket / per-phase-LM-budget configuration (pre program-count
    consolidation: ``ba_coarse_buckets=False``, ``ba_unified_iters=0``) still
    reconstructs to the same quality bar as the coarse default — padding and
    LM-budget choices are performance knobs, not semantics."""
    X, K, cams = _look_at_scene(n_pts=150, n_cams=5, seed=3)
    rng = np.random.default_rng(4)
    db = ColmapDatabase(tmp_path / "db.db")
    cid = db.add_pinhole_camera(640, 480, K[0, 0], K[1, 1], K[0, 2], K[1, 2])
    ids = []
    for i, (R, t) in enumerate(cams):
        uv, _ = _project(R, t, K, X)
        uv = uv + 0.3 * rng.standard_normal(uv.shape)
        iid = db.add_image(f"cam{i}.png", cid)
        db.add_keypoints(iid, uv.astype(np.float32))
        db.add_descriptors(
            iid, rng.integers(0, 255, (len(uv), 128), dtype=np.uint8)
        )
        ids.append(iid)
    m = np.stack([np.arange(len(X))] * 2, axis=1).astype(np.uint32)
    for a in range(len(ids)):
        for b in range(a + 1, len(ids)):
            db.add_matches(ids[a], ids[b], m)
            db.add_two_view_geometry(ids[a], ids[b], m, config=2)
    db.commit()
    db.close()

    cfg = ReconstructionConfig(
        min_num_matches=15, ba_coarse_buckets=False, ba_unified_iters=0
    )
    recs = incremental_mapping(
        tmp_path / "db.db", tmp_path, tmp_path / "sparse", cfg
    )
    assert len(recs) == 1
    rec = recs[0]
    assert len(rec.images) == 5
    assert rec.mean_reprojection_error() < 1.5
