"""Five-point essential solver: minimal-case recovery + RANSAC integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vit_colmap_tpu.sfm.five_point import fit_essential_5pt


def _make_pair(rng, n=5, noise=0.0):
    aa = rng.standard_normal(3) * 0.3
    th = np.linalg.norm(aa)
    k = aa / max(th, 1e-9)
    K_ = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    R = np.eye(3) + np.sin(th) * K_ + (1 - np.cos(th)) * K_ @ K_
    t = rng.standard_normal(3)
    t /= np.linalg.norm(t)
    X = rng.uniform(-1, 1, (n, 3))
    X[:, 2] = rng.uniform(2, 6, n)
    p1 = X[:, :2] / X[:, 2:3]
    Xc = (R @ X.T).T + t
    p2 = Xc[:, :2] / Xc[:, 2:3]
    tx = np.array([[0, -t[2], t[1]], [t[2], 0, -t[0]], [-t[1], t[0], 0]])
    E = tx @ R
    E /= np.linalg.norm(E)
    if noise:
        p1 = p1 + rng.standard_normal(p1.shape) * noise
        p2 = p2 + rng.standard_normal(p2.shape) * noise
    return p1.astype(np.float32), p2.astype(np.float32), E.astype(np.float32)


def _best_err(cands, valid, E_true):
    best = np.inf
    for j in range(len(cands)):
        if not valid[j]:
            continue
        d = min(
            np.linalg.norm(cands[j] - E_true),
            np.linalg.norm(cands[j] + E_true),
        )
        best = min(best, d)
    return best


def test_recovers_true_essential_on_minimal_samples():
    rng = np.random.default_rng(0)
    trials = 60
    p1s, p2s, Es = zip(*[_make_pair(rng) for _ in range(trials)])
    E_cand, valid = jax.jit(fit_essential_5pt)(
        jnp.asarray(np.stack(p1s)), jnp.asarray(np.stack(p2s))
    )
    E_cand, valid = np.asarray(E_cand), np.asarray(valid)
    errs = np.array(
        [_best_err(E_cand[i], valid[i], Es[i]) for i in range(trials)]
    )
    # The two-chart float32 solver recovers the exact solution on the large
    # majority of random minimal problems; the rest are the ill-conditioned
    # far-root cases that RANSAC's redundancy absorbs.
    assert np.mean(errs < 5e-2) >= 0.8
    assert np.median(errs) < 5e-3


def test_candidates_satisfy_essential_constraints():
    rng = np.random.default_rng(1)
    p1, p2, _ = _make_pair(rng)
    E_cand, valid = fit_essential_5pt(jnp.asarray(p1), jnp.asarray(p2))
    E_cand, valid = np.asarray(E_cand), np.asarray(valid)
    assert valid.any()
    for j in np.nonzero(valid)[0]:
        E = E_cand[j].astype(np.float64)
        # Unit norm, on the essential manifold (equal nonzero singular
        # values + rank 2) — by construction via project_to_essential.
        s = np.linalg.svd(E, compute_uv=False)
        assert abs(np.linalg.norm(E) - 1.0) < 1e-3
        assert s[2] < 5e-3
        assert abs(s[0] - s[1]) < 5e-2


def test_five_point_ransac_beats_eight_point_at_low_inlier_ratio():
    """estimate_two_view(five_point=True) must find the epipolar geometry
    through heavy outlier contamination where w^8 sampling struggles."""
    from vit_colmap_tpu.ops.ransac import estimate_two_view

    rng = np.random.default_rng(2)
    n_in, n_out = 24, 56  # 30% inliers: w^5=0.24%, w^8=0.0066% per sample
    p1, p2, E_true = _make_pair(rng, n=n_in)
    o1 = rng.uniform(-1, 1, (n_out, 2)).astype(np.float32)
    o2 = rng.uniform(-1, 1, (n_out, 2)).astype(np.float32)
    pts1 = np.concatenate([p1, o1])
    pts2 = np.concatenate([p2, o2])
    perm = rng.permutation(n_in + n_out)
    pts1, pts2 = pts1[perm], pts2[perm]
    is_inlier = perm < n_in
    K = np.eye(3, dtype=np.float32)  # already normalized coords

    # 2048 hypotheses: an all-inlier 5-sample lands with P ~= 99.3%
    # (w^5 = 0.24%/sample); 256 was a knife-edge ~46% that happened to
    # pass under one host's FP numerics and fail under another's.  The
    # confidence early-exit keeps the cost at the successful-sample count,
    # not the budget.
    res = estimate_two_view(
        jnp.asarray(pts1), jnp.asarray(pts2),
        jnp.ones(len(pts1), bool),
        jnp.asarray(K), jnp.asarray(K), jnp.asarray(True),
        jax.random.key(0),
        iters=2048, max_error_px=2e-3, min_num_inliers=10,
        five_point=True,
    )
    inl = np.asarray(res.inlier_mask)
    # Must recover (nearly) all true inliers and reject most outliers.
    assert inl[is_inlier].sum() >= n_in - 2
    assert inl[~is_inlier].sum() <= 4


def test_eight_point_fallback_still_works():
    from vit_colmap_tpu.ops.ransac import estimate_two_view

    rng = np.random.default_rng(3)
    p1, p2, _ = _make_pair(rng, n=40)
    K = np.eye(3, dtype=np.float32)
    res = estimate_two_view(
        jnp.asarray(p1), jnp.asarray(p2), jnp.ones(len(p1), bool),
        jnp.asarray(K), jnp.asarray(K), jnp.asarray(True),
        jax.random.key(0),
        iters=128, max_error_px=2e-3, min_num_inliers=10,
        five_point=False,
    )
    assert int(res.num_inliers) >= 35
