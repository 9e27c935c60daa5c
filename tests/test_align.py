"""Unit tests for the GT pose oracle (sfm/align.py): Umeyama similarity
alignment and pose-error computation under a known gauge transform."""

import numpy as np

from vit_colmap_tpu.sfm.align import (
    pose_errors_vs_gt,
    rotation_angle_deg,
    umeyama,
)
from vit_colmap_tpu.sfm.reconstruction import Image, Reconstruction


def _rand_rotation(rng):
    q = rng.standard_normal(4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def test_umeyama_recovers_similarity():
    rng = np.random.default_rng(0)
    src = rng.standard_normal((20, 3))
    R = _rand_rotation(rng)
    s, t = 2.7, np.array([1.0, -2.0, 0.5])
    dst = s * src @ R.T + t
    s_hat, R_hat, t_hat = umeyama(src, dst)
    assert abs(s_hat - s) < 1e-9
    np.testing.assert_allclose(R_hat, R, atol=1e-9)
    np.testing.assert_allclose(t_hat, t, atol=1e-9)


def test_umeyama_reflection_guard():
    """Mirrored targets must still produce a proper rotation (det=+1)."""
    rng = np.random.default_rng(1)
    src = rng.standard_normal((10, 3))
    dst = src * np.array([1.0, 1.0, -1.0])  # reflection
    _, R, _ = umeyama(src, dst)
    assert np.linalg.det(R) > 0.99


def _make_rec_and_gt(rng, n=6, noise_rot_deg=0.0, noise_ctr=0.0):
    """A reconstruction whose poses are a similarity-transformed (plus
    optional noise) copy of the GT poses."""
    gt = {}
    rec = Reconstruction()
    S_R = _rand_rotation(rng)
    s, t_a = 0.4, np.array([3.0, 0.0, -1.0])
    for i in range(n):
        R = _rand_rotation(rng)
        C = rng.standard_normal(3) * 2.0
        gt[f"view_{i:03d}.png"] = (R, -R @ C)
        # Estimated pose in the transformed gauge: C_est such that
        # s*S_R@C_est + t_a == C  =>  C_est = S_R.T @ (C - t_a) / s
        # and R_est = R @ S_R (so R_est @ S_R^T... careful: align maps
        # R_est -> R_est @ R_a^T where R_a maps est->gt world frames).
        C_est = S_R.T @ (C - t_a) / s
        R_est = R @ S_R  # then R_est @ R_a^T with R_a = S_R^T ... see below
        if noise_rot_deg:
            ang = np.radians(noise_rot_deg)
            ax = rng.standard_normal(3)
            ax /= np.linalg.norm(ax)
            K = np.array([[0, -ax[2], ax[1]], [ax[2], 0, -ax[0]],
                          [-ax[1], ax[0], 0]])
            R_est = R_est @ (np.eye(3) + np.sin(ang) * K
                             + (1 - np.cos(ang)) * K @ K)
        C_est = C_est + rng.standard_normal(3) * noise_ctr
        q = _rot_to_quat(R_est)
        rec.images[i + 1] = Image(
            image_id=i + 1, name=f"view_{i:03d}.png", camera_id=1,
            qvec=q, tvec=-R_est @ C_est,
        )
    return rec, gt


def _rot_to_quat(R):
    w = np.sqrt(max(0.0, 1 + R[0, 0] + R[1, 1] + R[2, 2])) / 2
    if w > 1e-6:
        x = (R[2, 1] - R[1, 2]) / (4 * w)
        y = (R[0, 2] - R[2, 0]) / (4 * w)
        z = (R[1, 0] - R[0, 1]) / (4 * w)
    else:  # fallback for near-pi rotations
        x, y, z = 0.5, 0.0, 0.0
    return np.array([w, x, y, z])


def test_pose_errors_zero_under_pure_gauge():
    """A similarity-transformed copy of GT must align with ~zero error."""
    rng = np.random.default_rng(2)
    rec, gt = _make_rec_and_gt(rng)
    out = pose_errors_vs_gt(rec, gt)
    assert out is not None and out["aligned_cameras"] == 6
    assert out["pose_rot_err_deg_max"] < 1e-5
    assert out["pose_center_err_rel_max"] < 1e-7
    # est world = gt world / 0.4, so est->gt alignment scale is 0.4.
    assert abs(out["scale"] - 0.4) < 1e-6


def test_pose_errors_detect_injected_rotation_noise():
    rng = np.random.default_rng(3)
    rec, gt = _make_rec_and_gt(rng, noise_rot_deg=2.0)
    out = pose_errors_vs_gt(rec, gt)
    # Every camera was perturbed by exactly 2 deg about a random axis.
    assert 1.0 < out["pose_rot_err_deg_mean"] < 3.0


def test_pose_errors_requires_three_cameras():
    rng = np.random.default_rng(4)
    rec, gt = _make_rec_and_gt(rng, n=2)
    assert pose_errors_vs_gt(rec, gt) is None


def test_rotation_angle_deg():
    ang = np.radians(30.0)
    R = np.array(
        [[np.cos(ang), -np.sin(ang), 0], [np.sin(ang), np.cos(ang), 0],
         [0, 0, 1]]
    )
    assert abs(rotation_angle_deg(R) - 30.0) < 1e-9
    assert rotation_angle_deg(np.eye(3)) < 1e-6
