"""Batched multi-view geometry primitives in JAX.

Replaces the geometric estimation that the reference delegates to COLMAP's
C++ (two-view verification inside ``pycolmap.match_exhaustive`` and the
mapper's triangulation, SURVEY.md §2.3) with vectorized, jit-friendly
implementations: every estimator works on a *batch* of minimal samples so
RANSAC hypotheses evaluate as single fused XLA programs (eigh/matmul map
onto MXU/VPU; no data-dependent control flow).

Conventions: points are (..., 2) pixel or normalized image coordinates;
homogeneous math is carried out explicitly.  Null spaces are computed via
``eigh`` of AᵀA (9x9) instead of SVD of A — symmetric eigendecomposition is
cheaper and better supported batched on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _homog(pts: jax.Array) -> jax.Array:
    return jnp.concatenate([pts, jnp.ones_like(pts[..., :1])], axis=-1)


def normalize_points(pts: jax.Array, weights: jax.Array):
    """Hartley normalization with per-point weights (masked points weight 0).

    Returns (normalized points, 3x3 transform T) such that x_norm = T @ x.
    """
    w = weights[..., None]
    wsum = jnp.maximum(jnp.sum(w, axis=-2, keepdims=True), 1e-8)
    mean = jnp.sum(pts * w, axis=-2, keepdims=True) / wsum
    centered = pts - mean
    rms = jnp.sqrt(
        jnp.sum(jnp.sum(centered**2, axis=-1, keepdims=True) * w, axis=-2, keepdims=True)
        / wsum.squeeze(-1)[..., None]
    )
    scale = jnp.sqrt(2.0) / jnp.maximum(rms, 1e-8)
    normed = centered * scale
    s = scale[..., 0, 0]
    mx, my = mean[..., 0, 0], mean[..., 0, 1]
    zeros = jnp.zeros_like(s)
    ones = jnp.ones_like(s)
    T = jnp.stack(
        [
            jnp.stack([s, zeros, -s * mx], axis=-1),
            jnp.stack([zeros, s, -s * my], axis=-1),
            jnp.stack([zeros, zeros, ones], axis=-1),
        ],
        axis=-2,
    )
    return normed, T


def _smallest_eigvec_sym(M: jax.Array, iters: int = 8) -> jax.Array:
    """Smallest-eigenvalue eigenvector of symmetric PSD (..., k, k) via
    shifted inverse iteration with Cholesky solves.

    TPU-critical: ``jnp.linalg.svd``/``eigh`` on huge batches of tiny
    matrices lower to slow iterative routines on TPU (measured 47 s for one
    16-pair verification batch).  Inverse iteration is pure
    matmul/triangular-solve arithmetic: the k x k solve amplifies the
    smallest eigendirection by 1/shift per step, so a handful of steps
    recover the nullspace to float32 accuracy regardless of conditioning.
    """
    k = M.shape[-1]
    tr = jnp.trace(M, axis1=-2, axis2=-1)[..., None, None]
    shift = 1e-7 * jnp.abs(tr) + 1e-12
    L = jnp.linalg.cholesky(M + shift * jnp.eye(k, dtype=M.dtype))
    # Guard failed factorizations (non-PSD from numeric noise): retry with a
    # larger shift where NaNs appeared.
    bad = jnp.isnan(L).any(axis=(-2, -1), keepdims=True)
    L2 = jnp.linalg.cholesky(M + (1e-3 * jnp.abs(tr) + 1e-8) * jnp.eye(k, dtype=M.dtype))
    L = jnp.where(bad, L2, L)

    v = jnp.full(M.shape[:-1], 1.0 / float(k) ** 0.5, dtype=M.dtype)
    for _ in range(iters):
        y = jax.scipy.linalg.solve_triangular(L, v[..., None], lower=True)
        v = jax.scipy.linalg.solve_triangular(
            L, y, lower=True, trans=1
        )[..., 0]
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    return v


def _nullspace_9(A: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Approximate right-nullspace of batched A (..., n, 9) -> (..., 9).

    Row-normalizes A for conditioning, then inverse iteration on AᵀA (see
    :func:`_smallest_eigvec_sym` for why not SVD on TPU)."""
    # Row-normalize FIRST (pure conditioning), then apply LS weights.
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    if weights is not None:
        A = A * weights[..., None]
    AtA = jnp.einsum("...ni,...nj->...ij", A, A)
    return _smallest_eigvec_sym(AtA)


def fit_fundamental(pts1: jax.Array, pts2: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Normalized 8-point algorithm, batched.

    pts1/pts2: (..., n>=8, 2); weights: optional (..., n) for weighted fits
    (used for inlier refits).  Returns (..., 3, 3) rank-2 F in input coords.
    """
    w = weights if weights is not None else jnp.ones(pts1.shape[:-1])
    p1n, T1 = normalize_points(pts1, w)
    p2n, T2 = normalize_points(pts2, w)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    ones = jnp.ones_like(x1)
    # Epipolar constraint rows: x2ᵀ F x1 = 0.
    A = jnp.stack(
        [x2 * x1, x2 * y1, x2, y2 * x1, y2 * y1, y2, x1, y1, ones], axis=-1
    )
    f = _nullspace_9(A, w)
    F = f.reshape(*f.shape[:-1], 3, 3)
    # Enforce rank 2 by subtracting the smallest singular component
    # (inverse-iteration nullspaces of FᵀF / FFᵀ — no batched tiny SVDs,
    # which are pathologically slow on TPU).
    v3 = _smallest_eigvec_sym(jnp.einsum("...ji,...jk->...ik", F, F), iters=6)
    u3 = _smallest_eigvec_sym(jnp.einsum("...ij,...kj->...ik", F, F), iters=6)
    s3 = jnp.einsum("...i,...ij,...j->...", u3, F, v3)
    F = F - s3[..., None, None] * u3[..., :, None] * v3[..., None, :]
    # Denormalize: F = T2ᵀ F_norm T1.
    F = jnp.swapaxes(T2, -1, -2) @ F @ T1
    # Scale-normalize for numerical comparability.
    norm = jnp.linalg.norm(F.reshape(*F.shape[:-2], 9), axis=-1)[..., None, None]
    return F / jnp.maximum(norm, 1e-12)


def fit_homography(pts1: jax.Array, pts2: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """Normalized DLT homography (>=4 points), batched -> (..., 3, 3)."""
    w = weights if weights is not None else jnp.ones(pts1.shape[:-1])
    p1n, T1 = normalize_points(pts1, w)
    p2n, T2 = normalize_points(pts2, w)
    x1, y1 = p1n[..., 0], p1n[..., 1]
    x2, y2 = p2n[..., 0], p2n[..., 1]
    zeros = jnp.zeros_like(x1)
    ones = jnp.ones_like(x1)
    # Two rows per correspondence.
    r1 = jnp.stack(
        [x1, y1, ones, zeros, zeros, zeros, -x2 * x1, -x2 * y1, -x2], axis=-1
    )
    r2 = jnp.stack(
        [zeros, zeros, zeros, x1, y1, ones, -y2 * x1, -y2 * y1, -y2], axis=-1
    )
    A = jnp.concatenate([r1, r2], axis=-2)
    w2 = jnp.concatenate([w, w], axis=-1)
    h = _nullspace_9(A, w2)
    H = h.reshape(*h.shape[:-1], 3, 3)
    H = jnp.linalg.inv(T2) @ H @ T1
    return H / jnp.where(jnp.abs(H[..., 2:3, 2:3]) > 1e-8, H[..., 2:3, 2:3], 1e-8)


def project_to_essential(F: jax.Array, iters: int = 12) -> jax.Array:
    """Closest essential matrix (singular values (s, s, 0)) to batched
    near-rank-2 F, SVD-free (batched tiny SVDs are pathologically slow on
    TPU; see :func:`_smallest_eigvec_sym`).

    Right singular basis: nullvector v3 by inverse iteration, dominant v1 by
    deflated power iteration, v2 = v3 x v1.  When the two nonzero singular
    values are close, power-iteration misconvergence within span(v1, v2) is
    harmless — the projection error scales with (s1 - s2).
    """
    A = jnp.einsum("...ji,...jk->...ik", F, F)  # FᵀF
    v3 = _smallest_eigvec_sym(A, iters=8)
    v = jnp.broadcast_to(
        jnp.array([0.577350, 0.577350, 0.577350], dtype=F.dtype), A.shape[:-1]
    )
    v = v - jnp.sum(v * v3, -1, keepdims=True) * v3
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", A, v)
        v = v - jnp.sum(v * v3, -1, keepdims=True) * v3
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)
    v1 = v
    v2 = jnp.cross(v3, v1)
    Fv1 = jnp.einsum("...ij,...j->...i", F, v1)
    Fv2 = jnp.einsum("...ij,...j->...i", F, v2)
    s1 = jnp.linalg.norm(Fv1, axis=-1)
    s2 = jnp.linalg.norm(Fv2, axis=-1)
    u1 = Fv1 / jnp.maximum(s1[..., None], 1e-12)
    u2 = Fv2 - jnp.sum(Fv2 * u1, -1, keepdims=True) * u1
    u2 = u2 / jnp.maximum(jnp.linalg.norm(u2, axis=-1, keepdims=True), 1e-12)
    s = ((s1 + s2) / 2.0)[..., None, None]
    return s * (
        u1[..., :, None] * v1[..., None, :] + u2[..., :, None] * v2[..., None, :]
    )


def fit_essential(pts1n: jax.Array, pts2n: jax.Array, weights: jax.Array | None = None) -> jax.Array:
    """8-point essential matrix on *normalized* (K⁻¹) coordinates, batched.

    Projects the linear solution onto the essential manifold
    (singular values (s, s, 0)) — SVD-free for TPU.
    """
    F = fit_fundamental(pts1n, pts2n, weights)
    return project_to_essential(F)


def sampson_error(F: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """Squared Sampson distance for F (..., 3, 3), pts (..., n, 2) -> (..., n)."""
    x1 = _homog(pts1)
    x2 = _homog(pts2)
    Fx1 = jnp.einsum("...ij,...nj->...ni", F, x1)
    Ftx2 = jnp.einsum("...ji,...nj->...ni", F, x2)
    x2Fx1 = jnp.sum(x2 * Fx1, axis=-1)
    denom = Fx1[..., 0] ** 2 + Fx1[..., 1] ** 2 + Ftx2[..., 0] ** 2 + Ftx2[..., 1] ** 2
    return x2Fx1**2 / jnp.maximum(denom, 1e-12)


def homography_error(H: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """Squared forward-transfer error ‖H x1 - x2‖² -> (..., n)."""
    x1 = _homog(pts1)
    Hx1 = jnp.einsum("...ij,...nj->...ni", H, x1)
    proj = Hx1[..., :2] / jnp.where(
        jnp.abs(Hx1[..., 2:]) > 1e-8, Hx1[..., 2:], 1e-8
    )
    return jnp.sum((proj - pts2) ** 2, axis=-1)


def closest_rotation(M: jax.Array, iters: int = 60) -> jax.Array:
    """Closest proper rotation to batched M (..., 3, 3) in Frobenius norm.

    Davenport q-method: the optimal quaternion is the dominant eigenvector
    of a symmetric 4x4 built from M, found by shifted power iteration — pure
    arithmetic (batched 3x3 SVD, the textbook route, is pathologically slow
    on TPU).  Always returns det=+1.
    """
    m = M / jnp.maximum(
        jnp.linalg.norm(M, axis=(-2, -1), keepdims=True), 1e-12
    )
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    tr = m00 + m11 + m22
    z1, z2, z3 = m12 - m21, m20 - m02, m01 - m10
    K = jnp.stack(
        [
            jnp.stack([tr, z1, z2, z3], axis=-1),
            jnp.stack([z1, 2 * m00 - tr, m01 + m10, m02 + m20], axis=-1),
            jnp.stack([z2, m01 + m10, 2 * m11 - tr, m12 + m21], axis=-1),
            jnp.stack([z3, m02 + m20, m12 + m21, 2 * m22 - tr], axis=-1),
        ],
        axis=-2,
    )
    # Shift so the largest eigenvalue dominates in magnitude; keep the shift
    # tight (|lambda| <= 2 for unit-Frobenius m) or power iteration crawls.
    Ks = K + 2.1 * jnp.eye(4, dtype=K.dtype)
    v = jnp.full(K.shape[:-1], 0.5, dtype=K.dtype)
    for _ in range(iters):
        v = jnp.einsum("...ij,...j->...i", Ks, v)
        v = v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
    # q-method convention: q maximizes tr(Rᵀ m) with R = R(q) as below.
    w, x, y, z = v[..., 0], v[..., 1], v[..., 2], v[..., 3]
    q = jnp.stack([w, x, y, z], axis=-1)
    R = qvec_to_rotmat(q)
    # qvec_to_rotmat builds R acting as column-vector rotation; q-method's B
    # convention may be its transpose — pick whichever is closer to m.
    d1 = jnp.sum((R - m) ** 2, axis=(-2, -1))
    d2 = jnp.sum((jnp.swapaxes(R, -1, -2) - m) ** 2, axis=(-2, -1))
    return jnp.where(
        (d2 < d1)[..., None, None], jnp.swapaxes(R, -1, -2), R
    )


def _skew(t: jax.Array) -> jax.Array:
    zeros = jnp.zeros_like(t[..., 0])
    return jnp.stack(
        [
            jnp.stack([zeros, -t[..., 2], t[..., 1]], axis=-1),
            jnp.stack([t[..., 2], zeros, -t[..., 0]], axis=-1),
            jnp.stack([-t[..., 1], t[..., 0], zeros], axis=-1),
        ],
        axis=-2,
    )


def decompose_essential(E: jax.Array):
    """E -> four (R, t) candidates, batched. Returns R (..., 4, 3, 3), t (..., 4, 3).

    SVD-free: t spans the left nullspace of E (inverse iteration on EEᵀ);
    for each ±t, R solves [t]x R = E, i.e. (I - ttᵀ)R = -[t]x E, recovered
    as the closest rotation to B = -[t]x E (q-method)."""
    En = E / jnp.maximum(
        jnp.linalg.norm(E, axis=(-2, -1), keepdims=True), 1e-12
    )
    EEt = jnp.einsum("...ij,...kj->...ik", En, En)
    t = _smallest_eigvec_sym(EEt, iters=8)
    B1 = -_skew(t) @ En
    B2 = _skew(t) @ En
    R1 = closest_rotation(B1)
    R2 = closest_rotation(B2)
    Rs = jnp.stack([R1, R1, R2, R2], axis=-3)
    ts = jnp.stack([t, -t, t, -t], axis=-2)
    return Rs, ts


def triangulate(P1: jax.Array, P2: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    """DLT triangulation, batched: P (..., 3, 4), pts (..., n, 2) -> (..., n, 3)."""
    def rows(P, pts):
        # x * P[2] - P[0]; y * P[2] - P[1]
        r0 = pts[..., 0:1] * P[..., None, 2, :] - P[..., None, 0, :]
        r1 = pts[..., 1:2] * P[..., None, 2, :] - P[..., None, 1, :]
        return jnp.stack([r0, r1], axis=-2)  # (..., n, 2, 4)

    A = jnp.concatenate([rows(P1, pts1), rows(P2, pts2)], axis=-2)  # (..., n, 4, 4)
    # Row-normalize for conditioning; nullspace via inverse iteration
    # (batched tiny SVDs are pathologically slow on TPU).
    A = A / jnp.maximum(jnp.linalg.norm(A, axis=-1, keepdims=True), 1e-12)
    AtA = jnp.einsum("...ki,...kj->...ij", A, A)
    X = _smallest_eigvec_sym(AtA, iters=6)
    return X[..., :3] / jnp.where(jnp.abs(X[..., 3:]) > 1e-10, X[..., 3:], 1e-10)


def cheirality_count(R: jax.Array, t: jax.Array, pts1n: jax.Array, pts2n: jax.Array, mask: jax.Array) -> jax.Array:
    """Count points in front of both cameras for pose (R, t), batched."""
    eye = jnp.broadcast_to(jnp.eye(3, 4), (*R.shape[:-2], 3, 4))
    P2 = jnp.concatenate([R, t[..., None]], axis=-1)
    X = triangulate(eye, P2, pts1n, pts2n)
    z1 = X[..., 2]
    X2 = jnp.einsum("...ij,...nj->...ni", R, X) + t[..., None, :]
    z2 = X2[..., 2]
    ok = (z1 > 1e-4) & (z2 > 1e-4) & mask
    return jnp.sum(ok, axis=-1)


def recover_pose_from_E(E: jax.Array, pts1n: jax.Array, pts2n: jax.Array, mask: jax.Array):
    """Pick the (R, t) with maximal cheirality support -> R (...,3,3), t (...,3)."""
    Rs, ts = decompose_essential(E)  # (..., 4, 3, 3), (..., 4, 3)
    counts = jax.vmap(cheirality_count, in_axes=(-3, -2, None, None, None), out_axes=-1)(
        Rs, ts, pts1n, pts2n, mask
    )
    best = jnp.argmax(counts, axis=-1)
    R = jnp.take_along_axis(Rs, best[..., None, None, None], axis=-3).squeeze(-3)
    t = jnp.take_along_axis(ts, best[..., None, None], axis=-2).squeeze(-2)
    return R, t


def rotmat_to_qvec(R: jax.Array) -> jax.Array:
    """Rotation matrix -> quaternion (w, x, y, z), batched, branch-free.

    Uses the robust 4-candidate construction (select the largest diagonal
    combination) so it is safe under vmap/jit.
    """
    m00, m01, m02 = R[..., 0, 0], R[..., 0, 1], R[..., 0, 2]
    m10, m11, m12 = R[..., 1, 0], R[..., 1, 1], R[..., 1, 2]
    m20, m21, m22 = R[..., 2, 0], R[..., 2, 1], R[..., 2, 2]
    t0 = 1.0 + m00 + m11 + m22  # 4w^2
    t1 = 1.0 + m00 - m11 - m22  # 4x^2
    t2 = 1.0 - m00 + m11 - m22  # 4y^2
    t3 = 1.0 - m00 - m11 + m22  # 4z^2
    c0 = jnp.stack([t0, m21 - m12, m02 - m20, m10 - m01], axis=-1)
    c1 = jnp.stack([m21 - m12, t1, m01 + m10, m02 + m20], axis=-1)
    c2 = jnp.stack([m02 - m20, m01 + m10, t2, m12 + m21], axis=-1)
    c3 = jnp.stack([m10 - m01, m02 + m20, m12 + m21, t3], axis=-1)
    cands = jnp.stack([c0, c1, c2, c3], axis=-2)  # (..., 4, 4)
    ts = jnp.stack([t0, t1, t2, t3], axis=-1)
    best = jnp.argmax(ts, axis=-1)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2).squeeze(-2)
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    return q * jnp.where(q[..., :1] < 0, -1.0, 1.0)


def undistort_points(pts_px, camera: dict):
    """Undistort pixel keypoints for SIMPLE_RADIAL / RADIAL cameras.

    COLMAP's verification/mapper work on undistorted observations; the
    reference gets this inside the C++ engine.  Fixed-point inversion of
    x_d = x_u (1 + k1 r^2 + k2 r^4) (5 iterations is exact to float32 for
    |k| <= 0.5).  Models without distortion return the input unchanged.

    Host-side numpy: runs once per image at load time.
    """
    import numpy as np

    p = np.asarray(camera["params"], np.float64)
    model = camera["model"]
    if model == "SIMPLE_RADIAL":
        f, cx, cy = p[0], p[1], p[2]
        k1, k2 = (p[3] if len(p) > 3 else 0.0), 0.0
        fx = fy = f
    elif model == "RADIAL":
        f, cx, cy = p[0], p[1], p[2]
        k1 = p[3] if len(p) > 3 else 0.0
        k2 = p[4] if len(p) > 4 else 0.0
        fx = fy = f
    else:
        return pts_px
    if k1 == 0.0 and k2 == 0.0:
        return pts_px

    pts = np.asarray(pts_px, np.float64)
    xd = (pts - [cx, cy]) / [fx, fy]
    xu = xd.copy()
    for _ in range(5):
        r2 = (xu**2).sum(-1, keepdims=True)
        xu = xd / (1.0 + k1 * r2 + k2 * r2**2)
    out = xu * [fx, fy] + [cx, cy]
    return out.astype(np.asarray(pts_px).dtype)


def qvec_to_rotmat(q: jax.Array) -> jax.Array:
    """Quaternion (w, x, y, z) -> rotation matrix, batched."""
    q = q / jnp.maximum(jnp.linalg.norm(q, axis=-1, keepdims=True), 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    return jnp.stack(
        [
            jnp.stack([1 - 2 * (y**2 + z**2), 2 * (x * y - w * z), 2 * (x * z + w * y)], axis=-1),
            jnp.stack([2 * (x * y + w * z), 1 - 2 * (x**2 + z**2), 2 * (y * z - w * x)], axis=-1),
            jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x**2 + y**2)], axis=-1),
        ],
        axis=-2,
    )
