"""Bundle adjustment in JAX — matrix-free Levenberg-Marquardt.

Replaces Ceres inside COLMAP's mapper (SURVEY.md §2.3 "Incremental SfM
mapper + bundle adjustment").  TPU-native formulation:

* parameters = camera poses (axis-angle + translation, 6 per image),
  **shared per-camera log-focal scales** (COLMAP-style intrinsics
  refinement), and 3D points, flattened into one vector,
* residuals = Huber-weighted pixel reprojection errors over a fixed-size
  observation array (image_idx, point_idx, xy, valid),
* the normal equations are solved **matrix-free**: (JᵀJ + λ diag)·v products
  come from one jvp + one vjp through the residual function, and Jacobi-
  preconditioned conjugate gradients runs inside the jitted step — no
  Jacobian or Schur complement is ever materialized, so the whole LM
  iteration is a handful of fused XLA kernels,
* the Huber weight is ``stop_gradient``-ed per linearization (IRLS) so the
  Gauss-Newton model stays consistent,
* step acceptance uses a fused 5-scale backtracking evaluation — no host
  syncs inside the optimization loop (it is one ``lax.scan``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp


def axis_angle_to_matrix(aa: jax.Array) -> jax.Array:
    """Rodrigues: (..., 3) -> (..., 3, 3).

    Differentiable at theta = 0: the angle is computed as
    sqrt(max(|aa|^2, eps)) so the backward pass never divides by zero (the
    naive norm NaNs the whole BA gradient at identity poses).
    """
    sq = jnp.sum(aa * aa, axis=-1, keepdims=True)
    theta = jnp.sqrt(jnp.maximum(sq, 1e-24))
    k = aa / theta
    kx, ky, kz = k[..., 0], k[..., 1], k[..., 2]
    zeros = jnp.zeros_like(kx)
    Km = jnp.stack(
        [
            jnp.stack([zeros, -kz, ky], axis=-1),
            jnp.stack([kz, zeros, -kx], axis=-1),
            jnp.stack([-ky, kx, zeros], axis=-1),
        ],
        axis=-2,
    )
    th = theta[..., None]
    eye = jnp.broadcast_to(jnp.eye(3), Km.shape)
    R = eye + jnp.sin(th) * Km + (1 - jnp.cos(th)) * (Km @ Km)
    # First-order fallback for tiny angles (accuracy, not safety).
    R_small = eye + Km * th
    return jnp.where(th < 1e-6, R_small, R)


def matrix_to_axis_angle(R: jax.Array) -> jax.Array:
    """(..., 3, 3) -> (..., 3). Safe for angles < pi - eps."""
    tr = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    cos = jnp.clip((tr - 1.0) / 2.0, -1.0, 1.0)
    theta = jnp.arccos(cos)
    v = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        axis=-1,
    )
    s = 2.0 * jnp.sin(theta)
    axis = v / jnp.where(jnp.abs(s) < 1e-8, 1.0, s)[..., None]
    return axis * theta[..., None]


class BAProblem(NamedTuple):
    """Fixed-shape bundle-adjustment problem.

    cam_params: (n_img, 6) axis-angle + t.  focal_log: (n_cam,) shared
    per-CAMERA log focal scale (effective f = K_f * exp(s); frozen unless
    ``refine_focal_mask`` allows it).  points: (n_pts, 3).
    obs_*: (n_obs,) observation table; obs_valid masks padding.
    K: (n_img, 3, 3); cam_of_img: (n_img,) image -> camera index;
    fixed_cam_mask: (n_img,) poses held constant (gauge fixing: the mapper
    pins the first registered image); refine_focal_mask: (n_cam,).
    """

    cam_params: jax.Array
    focal_log: jax.Array
    points: jax.Array
    obs_cam: jax.Array  # int32 (n_obs,) image index
    obs_point: jax.Array  # int32 (n_obs,)
    obs_xy: jax.Array  # (n_obs, 2) pixels
    obs_valid: jax.Array  # bool (n_obs,)
    K: jax.Array
    cam_of_img: jax.Array  # int32 (n_img,)
    fixed_cam_mask: jax.Array
    refine_focal_mask: jax.Array  # (n_cam,) bool
    # Radial distortion (COLMAP SIMPLE_RADIAL k1 / RADIAL k1,k2), applied to
    # normalized coords in the projection: x_d = x (1 + k1 r^2 + k2 r^4).
    # When used, obs_xy must be RAW (distorted) pixel observations — the
    # COLMAP/Ceres convention (`refine_extra_params`).  None -> zeros
    # (pinhole), keeping older construction sites and tests unchanged.
    dist: jax.Array | None = None  # (n_cam, 2) [k1, k2]
    refine_dist_mask: jax.Array | None = None  # (n_cam, 2) bool per param


CAM_DOF = 6


def _residuals(
    cam_params, focal_log, dist, points, problem: BAProblem, huber_delta
):
    """(n_obs, 2) Huber-scaled reprojection residuals."""
    cams = cam_params[problem.obs_cam]  # (n_obs, 6)
    X = points[problem.obs_point]  # (n_obs, 3)
    R = axis_angle_to_matrix(cams[:, :3])
    t = cams[:, 3:6]
    obs_camid = problem.cam_of_img[problem.obs_cam]
    fscale = jnp.exp(focal_log[obs_camid])
    Xc = jnp.einsum("nij,nj->ni", R, X) + t
    z = jnp.where(jnp.abs(Xc[:, 2:]) > 1e-8, Xc[:, 2:], 1e-8)
    xn = Xc[:, :2] / z
    kk = dist[obs_camid]  # (n_obs, 2)
    r2 = jnp.sum(xn * xn, axis=-1, keepdims=True)
    xn = xn * (1.0 + kk[:, 0:1] * r2 + kk[:, 1:2] * r2 * r2)
    Kobs = problem.K[problem.obs_cam]
    u = xn[:, 0] * Kobs[:, 0, 0] * fscale + Kobs[:, 0, 2]
    v = xn[:, 1] * Kobs[:, 1, 1] * fscale + Kobs[:, 1, 2]
    r = jnp.stack([u, v], axis=-1) - problem.obs_xy
    # Huber reweighting (IRLS): residual *= sqrt(w), w = delta/|r| beyond
    # delta.  The weight is treated as a constant per linearization
    # (stop_gradient) so the Gauss-Newton model stays consistent.
    norm = jnp.linalg.norm(r, axis=-1, keepdims=True)
    w = jnp.where(
        norm > huber_delta, jnp.sqrt(huber_delta / jnp.maximum(norm, 1e-8)), 1.0
    )
    r = r * jax.lax.stop_gradient(w)
    return jnp.where(problem.obs_valid[:, None], r, 0.0)


def _jtj_diag(
    cam_params, focal_log, dist, points, problem: BAProblem, huber_delta
):
    """Exact diag(JᵀJ), computed from per-observation Jacobians.

    Each residual row touches one image pose (6 dof), one shared focal (1),
    two shared distortion params and one point (3): a vmapped 2x12 Jacobian
    per observation + segment-sums gives the full diagonal without
    materializing J — the TPU stand-in for Ceres' block-diagonal
    bookkeeping.
    """
    n_img = cam_params.shape[0]
    n_cam = focal_log.shape[0]
    n_pts = points.shape[0]

    def one_obs(cam6, fl, kk, pt3, xy, Kmat, valid):
        def r(cp):
            c, f, k12, p = cp[:6], cp[6], cp[7:9], cp[9:]
            R = axis_angle_to_matrix(c[:3])
            Xc = R @ p + c[3:6]
            fs = jnp.exp(f)
            z = jnp.where(jnp.abs(Xc[2]) > 1e-8, Xc[2], 1e-8)
            xn = Xc[:2] / z
            r2 = jnp.sum(xn * xn)
            xn = xn * (1.0 + k12[0] * r2 + k12[1] * r2 * r2)
            u = xn[0] * Kmat[0, 0] * fs + Kmat[0, 2]
            v = xn[1] * Kmat[1, 1] * fs + Kmat[1, 2]
            res = jnp.stack([u, v]) - xy
            nrm = jnp.linalg.norm(res)
            w = jnp.where(
                nrm > huber_delta,
                jnp.sqrt(huber_delta / jnp.maximum(nrm, 1e-8)),
                1.0,
            )
            return res * w * valid

        J = jax.jacfwd(r)(
            jnp.concatenate([cam6, fl[None], kk, pt3])
        )  # (2, 12)
        return jnp.sum(J * J, axis=0)  # (12,)

    obs_focal = problem.cam_of_img[problem.obs_cam]
    sq = jax.vmap(one_obs)(
        cam_params[problem.obs_cam],
        focal_log[obs_focal],
        dist[obs_focal],
        points[problem.obs_point],
        problem.obs_xy,
        problem.K[problem.obs_cam],
        problem.obs_valid.astype(jnp.float32),
    )  # (n_obs, 12)
    cam_diag = jax.ops.segment_sum(sq[:, :6], problem.obs_cam, n_img)
    focal_diag = jax.ops.segment_sum(sq[:, 6], obs_focal, n_cam)
    dist_diag = jax.ops.segment_sum(sq[:, 7:9], obs_focal, n_cam)
    pt_diag = jax.ops.segment_sum(sq[:, 9:], problem.obs_point, n_pts)
    return jnp.concatenate(
        [cam_diag.ravel(), focal_diag, dist_diag.ravel(), pt_diag.ravel()]
    )


def _obs_jacobians(
    cam_params, focal_log, dist, points, problem: BAProblem, huber_delta
):
    """Per-observation Gauss-Newton rows: J (n_obs, 2, 12) and weighted
    residual r (n_obs, 2).

    Column layout per row: [cam 6 | focal_log 1 | k1 k2 | point 3].  The
    Huber IRLS weight is ``stop_gradient``-ed so J = w * dr/dtheta matches
    the model ``res_fn`` linearizes (same convention as the CG path's
    vjp-based gradient).
    """

    def one_obs(cam6, fl, kk, pt3, xy, Kmat, valid):
        def r(cp):
            c, f, k12, p = cp[:6], cp[6], cp[7:9], cp[9:]
            R = axis_angle_to_matrix(c[:3])
            Xc = R @ p + c[3:6]
            fs = jnp.exp(f)
            z = jnp.where(jnp.abs(Xc[2]) > 1e-8, Xc[2], 1e-8)
            xn = Xc[:2] / z
            r2 = jnp.sum(xn * xn)
            xn = xn * (1.0 + k12[0] * r2 + k12[1] * r2 * r2)
            u = xn[0] * Kmat[0, 0] * fs + Kmat[0, 2]
            v = xn[1] * Kmat[1, 1] * fs + Kmat[1, 2]
            res = jnp.stack([u, v]) - xy
            nrm = jnp.linalg.norm(res)
            w = jnp.where(
                nrm > huber_delta,
                jnp.sqrt(huber_delta / jnp.maximum(nrm, 1e-8)),
                1.0,
            )
            out = res * jax.lax.stop_gradient(w) * valid
            return out, out

        return jax.jacfwd(r, has_aux=True)(
            jnp.concatenate([cam6, fl[None], kk, pt3])
        )  # ((2, 12), (2,))

    obs_camid = problem.cam_of_img[problem.obs_cam]
    J, r = jax.vmap(one_obs)(
        cam_params[problem.obs_cam],
        focal_log[obs_camid],
        dist[obs_camid],
        points[problem.obs_point],
        problem.obs_xy,
        problem.K[problem.obs_cam],
        problem.obs_valid.astype(jnp.float32),
    )
    return J, r


def _inv3x3_sym(A):
    """Batched closed-form inverse of symmetric (n, 3, 3) matrices."""
    a, b, c = A[:, 0, 0], A[:, 0, 1], A[:, 0, 2]
    d, e, f = A[:, 1, 1], A[:, 1, 2], A[:, 2, 2]
    co00 = d * f - e * e
    co01 = c * e - b * f
    co02 = b * e - c * d
    co11 = a * f - c * c
    co12 = b * c - a * e
    co22 = a * d - b * b
    det = a * co00 + b * co01 + c * co02
    inv_det = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
    row0 = jnp.stack([co00, co01, co02], axis=-1)
    row1 = jnp.stack([co01, co11, co12], axis=-1)
    row2 = jnp.stack([co02, co12, co22], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2) * inv_det[:, None, None]


def _schur_step(x, lam, res_fn_unused, unpack, problem: BAProblem,
                huber_delta, col_free, free_mask, n_img, n_cam, n_pts):
    """One damped Gauss-Newton step via point-eliminating Schur complement.

    TPU-native alternative to the matrix-free CG solve: the CG inner loop
    is ~20 *sequential* while_loop iterations of tiny kernels per LM step —
    pure latency on the device.  Here points are eliminated with batched
    closed-form 3x3 inversions, the reduced camera system (M = 6*n_img +
    3*n_cam, a few hundred dims at mapper scale) is assembled densely with
    segment-sums and solved with ONE dense factorization on the MXU —
    an exact Newton step (CG at tol 1e-8 approximates the same solution),
    in a handful of chunky kernels.  Replaces Ceres' SPARSE_SCHUR
    (reference consumes it via pycolmap's mapper, run_pipeline.py:381-386).
    """
    M = 6 * n_img + 3 * n_cam
    cam, focal, dist, pts = unpack(x)
    J, r = _obs_jacobians(cam, focal, dist, pts, problem, huber_delta)

    # Column indices of each observation's 9 camera-side parameters.
    cam_cols = problem.obs_cam[:, None] * 6 + jnp.arange(6)[None, :]
    obs_camid = problem.cam_of_img[problem.obs_cam]
    shared_cols = 6 * n_img + obs_camid[:, None] * 3 + jnp.arange(3)[None, :]
    idx_c = jnp.concatenate([cam_cols, shared_cols], axis=1)  # (n_obs, 9)

    A = J[:, :, :9] * col_free[idx_c][:, None, :]  # fixed params: zero cols
    B = J[:, :, 9:12]

    # Block assembly via segment sums (dense reduced system, block-diagonal
    # point system).
    AtA = jnp.einsum("odi,odj->oij", A, A)  # (n_obs, 9, 9)
    AtB = jnp.einsum("odi,ody->oiy", A, B)  # (n_obs, 9, 3)
    BtB = jnp.einsum("odx,ody->oxy", B, B)  # (n_obs, 3, 3)
    Atr = jnp.einsum("odi,od->oi", A, r)  # (n_obs, 9)
    Btr = jnp.einsum("odx,od->ox", B, r)  # (n_obs, 3)

    keys_cc = (idx_c[:, :, None] * M + idx_c[:, None, :]).reshape(-1)
    Hcc = jax.ops.segment_sum(
        AtA.reshape(-1), keys_cc, num_segments=M * M
    ).reshape(M, M)
    keys_w = (problem.obs_point[:, None] * M + idx_c).reshape(-1)
    W = jax.ops.segment_sum(
        AtB.reshape(-1, 3), keys_w, num_segments=n_pts * M
    ).reshape(n_pts, M, 3)
    Hpp = jax.ops.segment_sum(BtB, problem.obs_point, num_segments=n_pts)
    g_c = jax.ops.segment_sum(
        Atr.reshape(-1), idx_c.reshape(-1), num_segments=M
    )
    g_p = jax.ops.segment_sum(Btr, problem.obs_point, num_segments=n_pts)

    # Marquardt damping (lam * diag, as in the CG path's matvec) + a floor
    # so padded points / empty blocks stay invertible.
    eye3 = jnp.eye(3)
    Hpp_d = (
        Hpp
        + lam * eye3 * Hpp[:, jnp.arange(3), jnp.arange(3)][:, None, :]
        + 1e-8 * eye3
    )
    Hpp_inv = _inv3x3_sym(Hpp_d)
    dcc = jnp.diag(Hcc)
    Hcc_d = Hcc + jnp.diag(lam * dcc)

    T = jnp.einsum("pmx,pxy->pmy", W, Hpp_inv)  # (n_pts, M, 3)
    S = Hcc_d - jnp.einsum("pmy,pny->mn", T, W)
    rhs = -g_c + jnp.einsum("pmy,py->m", T, g_p)
    # Fixed / padded camera columns: identity rows so the solve stays
    # non-singular and their update is exactly zero.
    S = S * (col_free[:, None] * col_free[None, :]) + jnp.diag(
        1.0 - col_free
    )
    rhs = rhs * col_free
    dc = jnp.linalg.solve(S, rhs)
    dp = -jnp.einsum(
        "pxy,py->px", Hpp_inv, g_p + jnp.einsum("pmx,m->px", W, dc)
    )

    cam_d = dc[: 6 * n_img].reshape(n_img, 6)
    shared_d = dc[6 * n_img :].reshape(n_cam, 3)
    dx = jnp.concatenate(
        [cam_d.ravel(), shared_d[:, 0], shared_d[:, 1:3].ravel(), dp.ravel()]
    )
    return dx * free_mask


@partial(
    jax.jit, static_argnames=("iters", "cg_iters", "huber_delta", "solver")
)
def bundle_adjust(
    problem: BAProblem,
    iters: int = 20,
    cg_iters: int = 50,
    huber_delta: float = 3.0,
    solver: str = "cg",
):
    """Run LM; returns (cam_params, focal_log, dist, points, mean sq
    residual)."""
    n_img = problem.cam_params.shape[0]
    n_cam = problem.focal_log.shape[0]
    n_pts = problem.points.shape[0]
    if problem.dist is None:
        problem = problem._replace(dist=jnp.zeros((n_cam, 2), jnp.float32))
    if problem.refine_dist_mask is None:
        problem = problem._replace(
            refine_dist_mask=jnp.zeros((n_cam, 2), bool)
        )

    def pack(cam, focal, dist, pts):
        return jnp.concatenate([cam.ravel(), focal, dist.ravel(), pts.ravel()])

    o_f = n_img * 6
    o_d = o_f + n_cam
    o_p = o_d + n_cam * 2

    def unpack(x):
        cam = x[:o_f].reshape(n_img, 6)
        focal = x[o_f:o_d]
        dist = x[o_d:o_p].reshape(n_cam, 2)
        pts = x[o_p:].reshape(n_pts, 3)
        return cam, focal, dist, pts

    cam_free = jnp.broadcast_to(
        ~problem.fixed_cam_mask[:, None], (n_img, 6)
    ).astype(jnp.float32)
    free_mask = pack(
        cam_free,
        problem.refine_focal_mask.astype(jnp.float32),
        problem.refine_dist_mask.astype(jnp.float32),
        jnp.ones((n_pts, 3)),
    )

    def res_fn(x):
        cam, focal, dist, pts = unpack(x)
        return _residuals(cam, focal, dist, pts, problem, huber_delta).ravel()

    def cost(x):
        r = res_fn(x)
        return 0.5 * jnp.dot(r, r)

    # (M,) free/fixed vector over the reduced (camera-side) parameters for
    # the Schur path: [cam 6*n_img | (focal, k1, k2) per camera].
    col_free = jnp.concatenate(
        [
            cam_free.ravel(),
            jnp.stack(
                [
                    problem.refine_focal_mask.astype(jnp.float32),
                    problem.refine_dist_mask[:, 0].astype(jnp.float32),
                    problem.refine_dist_mask[:, 1].astype(jnp.float32),
                ],
                axis=-1,
            ).ravel(),
        ]
    )

    def lm_step(carry):
        x, lam, it, _ = carry
        if solver == "schur":
            dx = _schur_step(
                x, lam, res_fn, unpack, problem, huber_delta,
                col_free, free_mask, n_img, n_cam, n_pts,
            )
        else:
            r = res_fn(x)
            cam, focal, dist, pts = unpack(x)
            diag = _jtj_diag(cam, focal, dist, pts, problem, huber_delta)
            diag = jnp.maximum(diag, 1e-6)
            # g = Jᵀ r via vjp; JᵀJ v via jvp + vjp; damping lam*diag.
            _, vjp = jax.vjp(res_fn, x)
            g = vjp(r)[0] * free_mask

            def matvec(v):
                v = v * free_mask
                jv = jax.jvp(res_fn, (x,), (v,))[1]
                return vjp(jv)[0] * free_mask + lam * diag * v

            precond = 1.0 / (diag * (1.0 + lam))

            dx, _ = jax.scipy.sparse.linalg.cg(
                matvec, -g, M=lambda v: precond * v, maxiter=cg_iters,
                tol=1e-8,
            )
            dx = dx * free_mask
        # Backtracking over a few step scales — all candidate costs evaluate
        # in one fused program; argmin picks the best (no host sync).
        scales = jnp.array([1.0, 0.5, 0.25, 0.1, 0.03], jnp.float32)
        costs = jax.vmap(lambda s: cost(x + s * dx))(scales)
        best = jnp.argmin(costs)
        c0 = cost(x)
        improved = costs[best] < c0
        x = jnp.where(improved, x + scales[best] * dx, x)
        lam = jnp.where(
            improved & (best == 0),
            jnp.maximum(lam * 0.3, 1e-10),
            jnp.where(improved, lam, lam * 10.0),
        )
        # Convergence: COLMAP/Ceres-style function tolerance (relative cost
        # decrease < 1e-6) or a stuck trust region (lam blown up by repeated
        # rejected steps).  Early exit matters at DTU scale: the refinement
        # global BAs are scheduled at 50 LM iterations but typically
        # converge in ~10 — a fixed-length scan pays for all 50.
        rel_dec = (c0 - jnp.minimum(costs[best], c0)) / jnp.maximum(c0, 1e-12)
        done = (improved & (rel_dec < 1e-6)) | (lam > 1e8)
        return x, lam, it + 1, done

    x0 = pack(
        problem.cam_params, problem.focal_log, problem.dist, problem.points
    )
    x_fin, _, _, _ = jax.lax.while_loop(
        lambda c: (c[2] < iters) & ~c[3],
        lm_step,
        (x0, jnp.float32(1e-4), jnp.int32(0), jnp.bool_(False)),
    )
    cam, focal, dist, pts = unpack(x_fin)
    r = _residuals(cam, focal, dist, pts, problem, huber_delta)
    n_valid = jnp.maximum(jnp.sum(problem.obs_valid), 1)
    msr = jnp.sum(jnp.sum(r * r, axis=-1)) / n_valid
    return cam, focal, dist, pts, msr


# ---------------------------------------------------------------------------
# Packed single-transfer entry point.
#
# On a remote-relay device (this environment's axon tunnel) every H2D/D2H
# array transfer is a full round trip: calling ``bundle_adjust`` with a
# 13-field BAProblem plus reading back its 5 outputs costs ~18 round trips
# per call, and the mapper makes one local-BA call per registration —
# measured as the dominant mapper substep (lba 79.5 s at DTU-50).  The
# packed form moves the problem in THREE typed buffers and returns ONE.
# ---------------------------------------------------------------------------


def pack_ba_problem(cam, focal_log, dist, pts, obs_cam, obs_pt, obs_xy,
                    obs_valid, K, cam_of_img, fixed, refine_focal,
                    refine_dist):
    """Host-side packing into (fbuf f32, ibuf i32, bbuf bool) numpy buffers.

    Layout must mirror ``bundle_adjust_packed``'s unpacking exactly.
    """
    import numpy as np

    fbuf = np.concatenate([
        np.asarray(cam, np.float32).ravel(),
        np.asarray(focal_log, np.float32).ravel(),
        np.asarray(dist, np.float32).ravel(),
        np.asarray(pts, np.float32).ravel(),
        np.asarray(obs_xy, np.float32).ravel(),
        np.asarray(K, np.float32).ravel(),
    ])
    ibuf = np.concatenate([
        np.asarray(obs_cam, np.int32).ravel(),
        np.asarray(obs_pt, np.int32).ravel(),
        np.asarray(cam_of_img, np.int32).ravel(),
    ])
    bbuf = np.concatenate([
        np.asarray(obs_valid, bool).ravel(),
        np.asarray(fixed, bool).ravel(),
        np.asarray(refine_focal, bool).ravel(),
        np.asarray(refine_dist, bool).ravel(),
    ])
    return fbuf, ibuf, bbuf


@partial(
    jax.jit,
    static_argnames=(
        "n_img", "n_cam", "n_pts", "n_obs", "iters", "cg_iters",
        "huber_delta", "solver",
    ),
)
def bundle_adjust_packed(
    fbuf: jax.Array,
    ibuf: jax.Array,
    bbuf: jax.Array,
    *,
    n_img: int,
    n_cam: int,
    n_pts: int,
    n_obs: int,
    iters: int = 20,
    cg_iters: int = 50,
    huber_delta: float = 3.0,
    solver: str = "cg",
) -> jax.Array:
    """``bundle_adjust`` over packed buffers; returns one packed vector
    [cam (n_img*6) | focal (n_cam) | dist (n_cam*2) | pts (n_pts*3) | msr]."""
    o = 0

    def take_f(n, shape):
        nonlocal o
        out = jax.lax.dynamic_slice_in_dim(fbuf, o, n).reshape(shape)
        o += n
        return out

    cam = take_f(n_img * 6, (n_img, 6))
    focal = take_f(n_cam, (n_cam,))
    dist = take_f(n_cam * 2, (n_cam, 2))
    pts = take_f(n_pts * 3, (n_pts, 3))
    obs_xy = take_f(n_obs * 2, (n_obs, 2))
    K = take_f(n_img * 9, (n_img, 3, 3))
    obs_cam = ibuf[:n_obs]
    obs_pt = ibuf[n_obs : 2 * n_obs]
    cam_of_img = ibuf[2 * n_obs : 2 * n_obs + n_img]
    obs_valid = bbuf[:n_obs]
    fixed = bbuf[n_obs : n_obs + n_img]
    refine_focal = bbuf[n_obs + n_img : n_obs + n_img + n_cam]
    refine_dist = bbuf[
        n_obs + n_img + n_cam : n_obs + n_img + n_cam + n_cam * 2
    ].reshape(n_cam, 2)

    problem = BAProblem(
        cam_params=cam,
        focal_log=focal,
        points=pts,
        obs_cam=obs_cam,
        obs_point=obs_pt,
        obs_xy=obs_xy,
        obs_valid=obs_valid,
        K=K,
        cam_of_img=cam_of_img,
        fixed_cam_mask=fixed,
        refine_focal_mask=refine_focal,
        dist=dist,
        refine_dist_mask=refine_dist,
    )
    cam_o, focal_o, dist_o, pts_o, msr = bundle_adjust(
        problem, iters=iters, cg_iters=cg_iters, huber_delta=huber_delta,
        solver=solver,
    )
    return jnp.concatenate([
        cam_o.ravel(), focal_o, dist_o.ravel(), pts_o.ravel(), msr[None]
    ])


def unpack_ba_result(out, n_img: int, n_cam: int, n_pts: int):
    """Split the packed result (numpy, after ONE D2H) back into parts."""
    import numpy as np

    out = np.asarray(out, np.float64)
    o_f = n_img * 6
    o_d = o_f + n_cam
    o_p = o_d + n_cam * 2
    o_e = o_p + n_pts * 3
    return (
        out[:o_f].reshape(n_img, 6),
        out[o_f:o_d],
        out[o_d:o_p].reshape(n_cam, 2),
        out[o_p:o_e].reshape(n_pts, 3),
        float(out[o_e]),
    )
