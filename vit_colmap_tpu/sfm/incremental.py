"""Incremental structure-from-motion mapper.

In-repo replacement for ``pycolmap.incremental_mapping`` (reference call site
``pipeline/run_pipeline.py:381-386``; option surface ``utils/config.py:
100-112``).  Host code orchestrates the model-building loop (tiny state:
which image registers next); ALL geometry runs as jitted device programs:

* two-view initialization: pose from the verified pair's essential matrix +
  batched DLT triangulation (:mod:`vit_colmap_tpu.sfm.geometry`),
* registration: vectorized PnP RANSAC (:mod:`vit_colmap_tpu.sfm.pnp`),
* new-point triangulation: batched over all matches of the new image,
* refinement: matrix-free LM bundle adjustment
  (:mod:`vit_colmap_tpu.sfm.bundle`) with pow2-bucketed problem shapes so
  jit programs are reused across the reconstruction.

Supports multiple models (``ReconstructionConfig.multiple_models``) and
writes COLMAP-format sparse models to ``output_path/<idx>/``.
"""

from __future__ import annotations

import logging
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.pipeline.match import camera_matrix
from vit_colmap_tpu.sfm import geometry as geom
from vit_colmap_tpu.sfm.bundle import (
    axis_angle_to_matrix,
    bundle_adjust_packed,
    matrix_to_axis_angle,
    pack_ba_problem,
    unpack_ba_result,
)
from vit_colmap_tpu.sfm.pnp import pnp_ransac_packed
from vit_colmap_tpu.sfm.reconstruction import (
    Camera,
    Image,
    Point3D,
    Reconstruction,
)
from vit_colmap_tpu.utils.config import ReconstructionConfig

logger = logging.getLogger(__name__)


def _next_pow2(n: int, minimum: int = 64) -> int:
    m = minimum
    while m < n:
        m *= 2
    return m


def _next_powk(n: int, minimum: int, k: int) -> int:
    """Round ``n`` up to ``minimum * k**j``.  Coarser buckets (k=4) than
    pow2 quantization: every distinct padded shape is its own XLA program,
    and on a remote-relay device each program pays a per-process
    executable-upload tax on first dispatch (results/EXTRACT_TAX_r3.json)
    on top of its compile — fewer, larger buckets trade trivially cheap
    padding FLOPs for far fewer programs."""
    m = minimum
    while m < n:
        m *= k
    return m


def _cpu_scope():
    """Context placing eager jnp ops on the host CPU backend.

    The mapper's one-shot glue geometry (init-pair bootstrap, steady-state
    DLT triangulation) is ~100 us of math per call; on the remote-TPU relay
    each eager op costs a ~26 ms dispatch plus a per-op compile that is
    below the persistent-cache threshold, so a single cold initialization
    measured 6 MINUTES of relay overhead (RECON r3).  Heavy iterative
    programs (PnP RANSAC, LM bundle adjustment) stay jitted on the TPU.
    """
    import contextlib

    try:
        return jax.default_device(jax.devices("cpu")[0])
    except RuntimeError:  # pragma: no cover - no cpu backend registered
        return contextlib.nullcontext()


def _qvec_from_R(R: np.ndarray) -> np.ndarray:
    with _cpu_scope():  # one 3x3 — keep it off the TPU relay
        return np.asarray(geom.rotmat_to_qvec(jnp.asarray(R)))


class _MapperState:
    """Mutable state of one model being built.

    ``feat_pid`` keeps a per-image int64 array mapping keypoint index ->
    point id (-1 = none) so correspondence counting and triangulation
    candidacy are vectorized gathers, not dict lookups (the reference's
    COLMAP does the equivalent with its C++ correspondence graph)."""

    def __init__(self, cameras, images, keypoints, keypoints_raw=None):
        self.cameras = cameras  # camera_id -> db dict
        self.images = images  # image_id -> db dict
        self.keypoints = keypoints  # image_id -> (N, 2) float32, undistorted
        # Raw (distorted) pixel observations for BA with in-model radial
        # distortion (COLMAP convention).  Same arrays when no distortion.
        self.keypoints_raw = (
            keypoints_raw if keypoints_raw is not None else keypoints
        )
        self.poses: dict[int, tuple[np.ndarray, np.ndarray]] = {}  # id -> (R, t)
        self.points: dict[int, np.ndarray] = {}  # point_id -> xyz
        self.tracks: dict[int, list[tuple[int, int]]] = {}
        self.feat_pid: dict[int, np.ndarray] = {
            iid: np.full(len(k), -1, np.int64) for iid, k in keypoints.items()
        }
        self.next_point_id = 1

    def K(self, image_id: int) -> np.ndarray:
        return camera_matrix(self.cameras[self.images[image_id]["camera_id"]])

    def get_pid(self, image_id: int, feat: int) -> int:
        pid = int(self.feat_pid[image_id][feat])
        return pid if pid >= 0 else None

    def add_point(self, xyz, obs: list[tuple[int, int]]) -> int:
        pid = self.next_point_id
        self.next_point_id += 1
        self.points[pid] = np.asarray(xyz, np.float64)
        self.tracks[pid] = list(obs)
        for iid, f in obs:
            self.feat_pid[iid][f] = pid
        return pid

    def add_observation(self, pid: int, image_id: int, feat: int) -> None:
        if self.feat_pid[image_id][feat] < 0:
            self.feat_pid[image_id][feat] = pid
            self.tracks[pid].append((image_id, feat))

    def remove_point(self, pid: int) -> None:
        for iid, f in self.tracks.pop(pid, []):
            if self.feat_pid[iid][f] == pid:
                self.feat_pid[iid][f] = -1
        self.points.pop(pid, None)


def _triangulation_angles(X, C1, C2):
    r1 = X - C1
    r2 = X - C2
    cos = np.sum(r1 * r2, axis=-1) / np.maximum(
        np.linalg.norm(r1, axis=-1) * np.linalg.norm(r2, axis=-1), 1e-12
    )
    return np.degrees(np.arccos(np.clip(cos, -1.0, 1.0)))


def _reproj_errors(R, t, K, X, xy):
    Xc = X @ R.T + t
    z = np.where(np.abs(Xc[:, 2:]) > 1e-9, Xc[:, 2:], 1e-9)
    uv = (Xc[:, :2] / z) * np.array([K[0, 0], K[1, 1]]) + np.array([K[0, 2], K[1, 2]])
    err = np.linalg.norm(uv - xy, axis=-1)
    return np.where(Xc[:, 2] > 1e-6, err, np.inf)


class IncrementalMapper:
    def __init__(self, state: _MapperState, pair_matches, config: ReconstructionConfig):
        self.s = state
        self.pair_matches = pair_matches  # (id1, id2) -> (M, 2) uint32 inliers
        self.cfg = config
        with _cpu_scope():  # keep the key chain off the relay (see _split_key)
            self._key = jax.random.key(0)
        # Per-phase wall-clock inside bundle_adjust (see its phase ledger).
        self.ba_phases = {
            "asm": 0.0, "dispatch": 0.0, "readback": 0.0, "calls": 0
        }

    def _split_key(self):
        # Split on the host CPU backend: on the relay an eager split is a
        # full dispatch round trip per registration.
        with _cpu_scope():
            self._key, k = jax.random.split(self._key)
        return k

    # ------------------------------------------------------ initialization
    def initialize(self) -> bool:
        """Pick the best verified pair and bootstrap the model."""
        t0 = time.perf_counter()
        candidates = sorted(
            self.pair_matches.items(), key=lambda kv: -len(kv[1])
        )
        for (i1, i2), m in candidates:
            if len(m) < max(self.cfg.min_num_matches, 30):
                continue
            with _cpu_scope():
                ok = self._try_init_pair(i1, i2, m)
            if ok:
                logger.info(
                    "Initialization took %.1fs", time.perf_counter() - t0
                )
                return True
        return False

    def _bootstrap_candidates(self, x1, x2, k1, k2, valid):
        """Candidate relative poses for an init pair: the essential-matrix
        pose plus homography decompositions (planar/low-parallax scenes
        make E degenerate — COLMAP falls back to H there too).

        ``x1``/``x2`` are padded to a shape bucket with ``valid`` marking
        real rows: the fits run with zero weights on padding, so every
        candidate pair shares one compiled program per bucket instead of
        compiling per exact match count (measured ~30 s of host-CPU compile
        inside initialize() at DTU-50)."""
        x1n = (x1 - k1[:2, 2]) / np.diag(k1)[:2]
        x2n = (x2 - k2[:2, 2]) / np.diag(k2)[:2]
        w = valid.astype(np.float32)
        cands = []
        # Essential bootstrap.
        E = np.asarray(
            geom.fit_essential(
                jnp.asarray(x1n)[None], jnp.asarray(x2n)[None],
                weights=jnp.asarray(w)[None],
            )[0]
        )
        R, t = geom.recover_pose_from_E(
            jnp.asarray(E)[None], jnp.asarray(x1n)[None],
            jnp.asarray(x2n)[None], jnp.asarray(valid)[None],
        )
        cands.append((np.asarray(R[0], np.float64), np.asarray(t[0], np.float64)))
        # Homography bootstrap (cv2 decomposition; host one-shot).
        try:
            import cv2

            H = np.asarray(
                geom.fit_homography(
                    jnp.asarray(x1)[None], jnp.asarray(x2)[None],
                    weights=jnp.asarray(w)[None],
                )[0],
                np.float64,
            )
            n_sol, Rs, ts, _ = cv2.decomposeHomographyMat(H, k1)
            for k in range(n_sol):
                tk = ts[k].ravel()
                norm = np.linalg.norm(tk)
                if norm > 1e-8:
                    cands.append((Rs[k], tk / norm))
        except Exception:  # pragma: no cover - cv2 edge cases
            logger.debug("homography decomposition failed", exc_info=True)
        return cands

    def _try_init_pair(self, i1, i2, m) -> bool:
        s = self.s
        k1, k2 = s.K(i1), s.K(i2)
        n = len(m)
        # Shape bucket (see _bootstrap_candidates): every candidate pair
        # reuses the same compiled fit/triangulate programs per bucket.
        n_pad = _next_pow2(n, 128)
        x1 = np.zeros((n_pad, 2), np.float64)
        x2 = np.zeros((n_pad, 2), np.float64)
        x1[:n] = s.keypoints[i1][m[:, 0]]
        x2[:n] = s.keypoints[i2][m[:, 1]]
        valid = np.zeros(n_pad, bool)
        valid[:n] = True
        thr = self.cfg.filter_max_reproj_error_px

        best = None  # (n_good, good mask, R, t, X)
        P1 = k1 @ np.eye(3, 4)
        for R, t in self._bootstrap_candidates(x1, x2, k1, k2, valid):
            P2 = k2 @ np.concatenate([R, t[:, None]], axis=1)
            X = np.asarray(
                geom.triangulate(
                    jnp.asarray(P1)[None], jnp.asarray(P2)[None],
                    jnp.asarray(x1)[None], jnp.asarray(x2)[None],
                )[0],
                np.float64,
            )
            with np.errstate(all="ignore"):  # padded rows: garbage in, masked out
                angles = _triangulation_angles(X, np.zeros(3), -R.T @ t)
                e1 = _reproj_errors(np.eye(3), np.zeros(3), k1, X, x1)
                e2 = _reproj_errors(R, t, k2, X, x2)
            good = (
                valid
                & (angles > self.cfg.min_triangulation_angle_deg)
                & (e1 < thr)  # NaN on padded rows compares False
                & (e2 < thr)
            )
            if best is None or good.sum() > best[0]:
                best = (int(good.sum()), good, R, t, X)

        n_good, good, R, t, X = best
        if n_good < max(self.cfg.min_num_matches, 20):
            return False

        s.poses[i1] = (np.eye(3), np.zeros(3))
        s.poses[i2] = (R, t)
        for idx in np.nonzero(good)[0]:
            s.add_point(
                X[idx], [(i1, int(m[idx, 0])), (i2, int(m[idx, 1]))]
            )
        logger.info(
            "Initialized model with pair (%d, %d): %d points", i1, i2, n_good
        )
        return True

    # --------------------------------------------------------- registration
    def _pairs_with(self, iid):
        """Yield (other_id, feats_self, feats_other) for registered partners."""
        s = self.s
        for (a, b), m in self.pair_matches.items():
            if a == iid and b in s.poses:
                yield b, m[:, 0], m[:, 1]
            elif b == iid and a in s.poses:
                yield a, m[:, 1], m[:, 0]

    def find_next_image(self):
        """Unregistered image with most visible 3D points (vectorized count)."""
        s = self.s
        best, best_count = None, 0
        for iid in s.images:
            if iid in s.poses:
                continue
            count = 0
            for other, fs, fo in self._pairs_with(iid):
                count += int((s.feat_pid[other][fo] >= 0).sum())
            if count > best_count:
                best, best_count = iid, count
        if best is None or best_count < 6:
            return None, None
        return best, self._collect_2d3d(best)

    def _collect_2d3d(self, iid):
        """[(feat_idx, point_id)] correspondences of an unregistered image."""
        s = self.s
        out = {}
        for other, fs, fo in self._pairs_with(iid):
            pids = s.feat_pid[other][fo]
            sel = pids >= 0
            for f_self, pid in zip(fs[sel], pids[sel]):
                if int(f_self) not in out:
                    out[int(f_self)] = int(pid)
        return list(out.items())

    def register_image(self, iid, corrs) -> bool:
        s = self.s
        xy = s.keypoints[iid][[f for f, _ in corrs]].astype(np.float32)
        X = np.stack([s.points[p] for _, p in corrs]).astype(np.float32)
        n = len(corrs)
        # Coarse (pow4) bucket: typical DTU registrations (200-400 corrs)
        # all land in ONE PnP program instead of one per pow2 size.
        n_pad = (
            _next_powk(n, 256, 4)
            if getattr(self.cfg, "ba_coarse_buckets", True)
            else _next_pow2(n)
        )
        xy_p = np.zeros((n_pad, 2), np.float32)
        X_p = np.zeros((n_pad, 3), np.float32)
        mask = np.zeros(n_pad, bool)
        xy_p[:n], X_p[:n], mask[:n] = xy, X, True

        # Packed call: one float buffer up, one result vector down (each
        # extra array is a relay round trip; see pnp_ransac_packed).
        fbuf = np.concatenate([
            xy_p.ravel(),
            X_p.ravel(),
            np.asarray(s.K(iid), np.float32).ravel(),
        ])
        out = np.asarray(pnp_ransac_packed(
            fbuf, mask, self._split_key(), n=n_pad, iters=512,
            max_error_px=self.cfg.filter_max_reproj_error_px * 2,
        ))
        n_inl = int(out[12])
        if n_inl < max(6, self.cfg.min_num_matches // 2):
            return False
        R = out[:9].reshape(3, 3).astype(np.float64)
        t = out[9:12].astype(np.float64)
        s.poses[iid] = (R, t)
        inl = out[13 : 13 + n] > 0.5
        for (f, pid), ok in zip(corrs, inl):
            if ok and pid in s.points:
                s.add_observation(pid, iid, f)
        logger.info("Registered image %d with %d/%d inliers", iid, n_inl, n)
        return True

    # --------------------------------------------------------------- merging
    def _merge_candidate(self, pa: int, pb: int):
        """Structural checks of COLMAP's MergeTracks: returns the weighted
        merged position when ``pa``/``pb`` are distinct live points whose
        combined track observes no image twice, else None."""
        s = self.s
        if pa == pb or pa not in s.points or pb not in s.points:
            return None
        ta, tb = s.tracks[pa], s.tracks[pb]
        imgs_a = {i for i, _ in ta}
        if any(i in imgs_a for i, _ in tb):
            return None
        wa, wb = len(ta), len(tb)
        return (wa * s.points[pa] + wb * s.points[pb]) / (wa + wb)

    def _merge_apply(self, pa: int, pb: int, xyz: np.ndarray) -> None:
        """Absorb pb into pa at the merged position."""
        s = self.s
        s.points[pa] = xyz
        for iid, f in s.tracks[pb]:
            s.feat_pid[iid][f] = pa
            s.tracks[pa].append((iid, f))
        s.points.pop(pb)
        s.tracks.pop(pb)

    def try_merge(self, pa: int, pb: int) -> bool:
        """Merge two 3D points into one track (COLMAP's MergeTracks) when
        the combined track is geometrically consistent."""
        s = self.s
        xyz = self._merge_candidate(pa, pb)
        if xyz is None:
            return False
        thr = self.cfg.filter_max_reproj_error_px
        obs = [
            (i, f) for i, f in s.tracks[pa] + s.tracks[pb] if i in s.poses
        ]
        if obs:
            # ONE vectorized reprojection over the combined track (was a
            # Python loop making a 1-row numpy call per observation).
            Rs = np.stack([s.poses[i][0] for i, _ in obs])
            ts = np.stack([s.poses[i][1] for i, _ in obs])
            Ks = np.stack([s.K(i) for i, _ in obs])
            uv = np.stack([s.keypoints[i][f] for i, f in obs]).astype(
                np.float64
            )
            Xc = np.einsum("nij,j->ni", Rs, xyz) + ts
            z = Xc[:, 2]
            zs = np.where(np.abs(z) > 1e-9, z, 1e-9)
            u = Xc[:, 0] / zs * Ks[:, 0, 0] + Ks[:, 0, 2]
            v = Xc[:, 1] / zs * Ks[:, 1, 1] + Ks[:, 1, 2]
            err = np.hypot(u - uv[:, 0], v - uv[:, 1])
            if not ((z > 1e-6) & np.isfinite(err) & (err <= thr)).all():
                return False
        self._merge_apply(pa, pb, xyz)
        return True

    def try_merge_batch(self, pairs) -> int:
        """Batched MergeTracks over candidate (pa, pb) pairs: consistency
        reprojections of ALL candidates with mutually disjoint pids run as
        one flat numpy computation (the per-candidate/per-observation host
        loop was ~94 s of the DTU-50 mapper).  A candidate sharing a pid
        with an earlier one in the batch chains through the scalar
        :meth:`try_merge` afterwards, preserving sequential semantics —
        batch-evaluated candidates are pairwise independent, so evaluating
        them against the pre-batch state is exact."""
        s = self.s
        thr = self.cfg.filter_max_reproj_error_px
        img_ids = sorted(s.poses.keys())
        if not img_ids:
            return sum(bool(self.try_merge(int(a), int(b))) for a, b in pairs)
        idx = {iid: k for k, iid in enumerate(img_ids)}
        Rs = np.stack([s.poses[i][0] for i in img_ids])
        ts = np.stack([s.poses[i][1] for i in img_ids])
        Ks = np.stack([s.K(i) for i in img_ids])

        cands: list[tuple[int, int, np.ndarray]] = []
        obs_img: list[int] = []
        obs_uv: list[np.ndarray] = []
        obs_cand: list[int] = []
        touched: set[int] = set()
        chained: list[tuple[int, int]] = []
        merged = 0
        for pa, pb in pairs:
            pa, pb = int(pa), int(pb)
            if pa in touched or pb in touched:
                chained.append((pa, pb))
                continue
            touched.add(pa)
            touched.add(pb)
            xyz = self._merge_candidate(pa, pb)
            if xyz is None:
                continue
            k = len(cands)
            cands.append((pa, pb, xyz))
            for iid, f in s.tracks[pa] + s.tracks[pb]:
                ik = idx.get(iid)
                if ik is not None:
                    obs_img.append(ik)
                    obs_uv.append(s.keypoints[iid][f])
                    obs_cand.append(k)
        if cands:
            X = np.stack([c[2] for c in cands])
            oc = np.asarray(obs_cand)
            cand_bad = np.zeros(len(cands), bool)
            if len(oc):
                oi = np.asarray(obs_img)
                uv = np.asarray(obs_uv, np.float64)
                R, t, Kk = Rs[oi], ts[oi], Ks[oi]
                Xc = np.einsum("nij,nj->ni", R, X[oc]) + t
                z = Xc[:, 2]
                zs = np.where(np.abs(z) > 1e-9, z, 1e-9)
                u = Xc[:, 0] / zs * Kk[:, 0, 0] + Kk[:, 0, 2]
                v = Xc[:, 1] / zs * Kk[:, 1, 1] + Kk[:, 1, 2]
                err = np.hypot(u - uv[:, 0], v - uv[:, 1])
                bad = ~((z > 1e-6) & np.isfinite(err) & (err <= thr))
                cand_bad = (
                    np.bincount(oc[bad], minlength=len(cands)) > 0
                )
            for k, (pa, pb, xyz) in enumerate(cands):
                if not cand_bad[k]:
                    self._merge_apply(pa, pb, xyz)
                    merged += 1
        for pa, pb in chained:
            merged += bool(self.try_merge(pa, pb))
        return merged

    # -------------------------------------------------------- triangulation
    def triangulate_new(self, iid) -> int:
        """Triangulate matches of image `iid` against registered partners."""
        s = self.s
        R2, t2 = s.poses[iid]
        K2 = s.K(iid)
        P2 = K2 @ np.concatenate([R2, t2[:, None]], axis=1)
        C2 = -R2.T @ t2
        created = 0
        thr_ext = self.cfg.filter_max_reproj_error_px
        # New-point candidates accumulated over all partners -> ONE
        # batched triangulation dispatch.
        cand_P1: list[np.ndarray] = []
        cand_C1: list[np.ndarray] = []
        cand_x1: list[np.ndarray] = []
        cand_x2: list[np.ndarray] = []
        cand_obs: list[tuple[int, int]] = []
        cand_fs: list[int] = []
        for other, f_self, f_other in self._pairs_with(iid):
            R1, t1 = s.poses[other]
            K1 = s.K(other)
            P1 = K1 @ np.concatenate([R1, t1[:, None]], axis=1)
            C1 = -R1.T @ t1

            # Track merging: both features already have DIFFERENT 3D points
            # -> the match says they are the same point; merge when the
            # combined track is consistent (COLMAP's MergeTracks).
            pid_s = s.feat_pid[iid][f_self]
            pid_o = s.feat_pid[other][f_other]
            both = (pid_s >= 0) & (pid_o >= 0) & (pid_s != pid_o)
            if both.any():
                self.try_merge_batch(zip(pid_o[both], pid_s[both]))

            # Track extension: partner feature already has a 3D point and our
            # feature is free -> join the track when the point reprojects
            # consistently into the new image (COLMAP's track continuation).
            ext_mask = (s.feat_pid[other][f_other] >= 0) & (
                s.feat_pid[iid][f_self] < 0
            )
            if ext_mask.any():
                fs_e = f_self[ext_mask]
                pids_e = s.feat_pid[other][f_other[ext_mask]]
                keep = np.array([p in s.points for p in pids_e])
                if keep.any():
                    fs_e, pids_e = fs_e[keep], pids_e[keep]
                    Xe = np.stack([s.points[int(p)] for p in pids_e])
                    uv_e = s.keypoints[iid][fs_e].astype(np.float64)
                    errs = _reproj_errors(R2, t2, K2, Xe, uv_e)
                    for fs_k, pid_k, ok in zip(
                        fs_e, pids_e, errs < thr_ext
                    ):
                        if ok:
                            s.add_observation(int(pid_k), iid, int(fs_k))

            new_mask = (s.feat_pid[iid][f_self] < 0) & (
                s.feat_pid[other][f_other] < 0
            )
            if not new_mask.any():
                continue
            fs = f_self[new_mask]
            fo = f_other[new_mask]
            # Collect candidates across ALL partners; triangulate in ONE
            # device call below (one dispatch per partner cost ~26 ms of
            # relay latency each — the mapper's dominant per-registration
            # cost at DTU scale).
            cand_P1.append(np.broadcast_to(P1, (len(fs), 3, 4)))
            cand_C1.append(np.broadcast_to(C1, (len(fs), 3)))
            cand_x1.append(s.keypoints[other][fo].astype(np.float64))
            cand_x2.append(s.keypoints[iid][fs].astype(np.float64))
            cand_obs.extend((other, int(f)) for f in fo)
            cand_fs.extend(int(f) for f in fs)

        if not cand_fs:
            return 0
        P1s = np.concatenate(cand_P1)
        C1s = np.concatenate(cand_C1)
        x1 = np.concatenate(cand_x1)
        x2 = np.concatenate(cand_x2)
        n = len(cand_fs)
        n_pad = _next_pow2(n, 256)
        pad = n_pad - n
        P1p = np.concatenate([P1s, np.tile(np.eye(3, 4), (pad, 1, 1))])
        x1p = np.concatenate([x1, np.zeros((pad, 2))])
        x2p = np.concatenate([x2, np.zeros((pad, 2))])
        P2p = np.broadcast_to(P2, (n_pad, 3, 4))
        # Tiny per-point DLT solves: run on the host CPU backend (see
        # _cpu_scope — eager ops over the TPU relay cost ~26 ms each).
        with _cpu_scope():
            X = np.asarray(
                geom.triangulate(
                    jnp.asarray(P1p, jnp.float32),
                    jnp.asarray(np.ascontiguousarray(P2p), jnp.float32),
                    jnp.asarray(x1p[:, None], jnp.float32),
                    jnp.asarray(x2p[:, None], jnp.float32),
                )[:, 0],
                np.float64,
            )[:n]
        # Host-side acceptance: reprojection via the P matrices directly.
        def _perrs(P, Xw, uv):
            uvw = np.einsum("nij,nj->ni", P[:, :, :3], Xw) + P[:, :, 3]
            w = uvw[:, 2]
            safe = np.where(np.abs(w) > 1e-9, w, 1e-9)
            e = np.linalg.norm(uvw[:, :2] / safe[:, None] - uv, axis=-1)
            return np.where(w > 1e-6, e, np.inf)

        e1 = _perrs(P1s, X, x1)
        e2 = _perrs(np.broadcast_to(P2, (n, 3, 4)), X, x2)
        angles = _triangulation_angles(X, C1s, np.broadcast_to(C2, (n, 3)))
        thr = self.cfg.filter_max_reproj_error_px
        good = (
            (angles > self.cfg.min_triangulation_angle_deg)
            & (e1 < thr)
            & (e2 < thr)
        )
        for k in np.nonzero(good)[0]:
            oid, fo_k = cand_obs[k]
            # A feature free at collection time may have been claimed by an
            # earlier candidate in this same batch (multiple partners can
            # propose the same new-image feature) — first accepted wins.
            if s.feat_pid[iid][cand_fs[k]] >= 0 or s.feat_pid[oid][fo_k] >= 0:
                continue
            s.add_point(X[k], [(oid, fo_k), (iid, cand_fs[k])])
            created += 1
        return created

    # ------------------------------------------------------------------ BA
    def local_bundle_adjust(self, iid: int, iters: int | None = None) -> float:
        """Local BA around a newly registered image (COLMAP's AdjustLocalBundle):
        the new image + its most-connected registered neighbors are variable,
        every other image observing their points is a fixed anchor.  Keeps
        the global LM solve out of the per-registration inner loop
        (VERDICT r1 item 5)."""
        s = self.s
        # Neighbors ranked by shared 3D points with iid.
        shared: dict[int, int] = {}
        pids_i = s.feat_pid[iid]
        for pid in pids_i[pids_i >= 0]:
            pid = int(pid)
            if pid not in s.tracks:
                continue
            for oid, _f in s.tracks[pid]:
                if oid != iid and oid in s.poses:
                    shared[oid] = shared.get(oid, 0) + 1
        neighbors = sorted(shared, key=lambda o: -shared[o])
        variable = [iid] + neighbors[: self.cfg.local_ba_num_images - 1]
        return self.bundle_adjust(
            iters=iters
            or getattr(self.cfg, "ba_local_inner_iters", None)
            or self.cfg.ba_local_iters,
            variable_imgs=variable,
            refine_focal=False,
            cg_iters=getattr(self.cfg, "ba_local_cg_iters", None),
        )

    def bundle_adjust(
        self,
        iters: int = 15,
        variable_imgs: list[int] | None = None,
        refine_focal: bool | None = None,
        cg_iters: int | None = None,
    ) -> float:
        t0 = time.perf_counter()
        if cg_iters is None:
            cg_iters = getattr(self.cfg, "ba_global_cg_iters", 50)
        solver = getattr(self.cfg, "ba_solver", "cg")
        # One LM budget for every BA call: the per-phase budgets (local 12 /
        # growth 25 / refine 50) predate the LM convergence early-exit in
        # bundle_adjust's while_loop — with the early exit, a single static
        # max costs nothing extra at runtime and collapses three program
        # signatures into one.
        unified = getattr(self.cfg, "ba_unified_iters", 0)
        if unified:
            iters = unified
        if solver == "schur":
            # cg_iters is dead under the Schur solver but is a static jit
            # arg — normalize it so local (20) vs global (50) budgets don't
            # split the compile cache.
            cg_iters = 0
        s = self.s
        if variable_imgs is None:
            img_ids = sorted(s.poses.keys())
            var_set = set(img_ids)
            pt_ids = sorted(s.points.keys())
        else:
            var_set = {i for i in variable_imgs if i in s.poses}
            pt_set: set[int] = set()
            for vid in var_set:
                pids = s.feat_pid[vid]
                for pid in pids[pids >= 0]:
                    if int(pid) in s.points:
                        pt_set.add(int(pid))
            pt_ids = sorted(pt_set)
            # Fixed anchors: every other registered image observing them.
            img_set = set(var_set)
            for pid in pt_ids:
                for oid, _f in s.tracks[pid]:
                    if oid in s.poses:
                        img_set.add(oid)
            img_ids = sorted(img_set)
        if len(pt_ids) == 0:
            return 0.0
        img_index = {iid: k for k, iid in enumerate(img_ids)}
        pt_index = {pid: k for k, pid in enumerate(pt_ids)}

        # Pad the camera block too so BA programs compile per bucket
        # (n_img used to be exact -> one recompile per registration).
        # Coarse (pow4) buckets: a DTU-50 run's local+global BA calls fit in
        # ~4 programs instead of ~15 (see _next_powk).
        coarse = getattr(self.cfg, "ba_coarse_buckets", True)
        if coarse:
            n_img = _next_powk(len(img_ids), 8, 4)
            n_pts_pad = _next_powk(len(pt_ids), 256, 4)
        else:
            n_img = _next_pow2(len(img_ids), 4)
            n_pts_pad = _next_pow2(len(pt_ids))
        # RAW (distorted) observations: BA models radial distortion in the
        # projection (COLMAP/Ceres convention) instead of consuming the
        # fixed-point-undistorted coords the rest of the mapper uses.
        obs = []
        for pid in pt_ids:
            for iid2, f in s.tracks[pid]:
                if iid2 in img_index:
                    obs.append(
                        (
                            img_index[iid2],
                            pt_index[pid],
                            s.keypoints_raw[iid2][f],
                        )
                    )
        n_obs_pad = (
            _next_powk(len(obs), 1024, 4)
            if coarse
            else _next_pow2(len(obs), 256)
        )

        cam = np.zeros((n_img, 6), np.float32)  # axis-angle + t
        Ks = np.tile(np.eye(3, dtype=np.float32), (n_img, 1, 1))
        # Shared per-camera focal parameters.
        cam_ids_used = sorted(
            {s.images[iid]["camera_id"] for iid in img_ids}
        )
        cam_index = {cid: k for k, cid in enumerate(cam_ids_used)}
        cam_of_img = np.zeros(n_img, np.int32)
        with _cpu_scope():  # per-camera glue math off the TPU relay
            for iid2, k in img_index.items():
                R, t = s.poses[iid2]
                cam[k, :3] = np.asarray(matrix_to_axis_angle(jnp.asarray(R)))
                cam[k, 3:6] = t
                Ks[k] = s.K(iid2)
                cam_of_img[k] = cam_index[s.images[iid2]["camera_id"]]
        pts = np.zeros((n_pts_pad, 3), np.float32)
        pts[: len(pt_ids)] = np.stack([s.points[p] for p in pt_ids])

        obs_cam = np.zeros(n_obs_pad, np.int32)
        obs_pt = np.zeros(n_obs_pad, np.int32)
        obs_xy = np.zeros((n_obs_pad, 2), np.float32)
        obs_valid = np.zeros(n_obs_pad, bool)
        for k, (ci, pi, xy) in enumerate(obs):
            obs_cam[k], obs_pt[k], obs_xy[k], obs_valid[k] = ci, pi, xy, True

        # Gauge: fix the first camera (Ceres-style; scale is a null direction
        # LM damping keeps bounded).  Local BA additionally fixes every
        # anchor image outside the variable set, and camera padding is fixed.
        fixed = np.ones(n_img, bool)
        for iid2, k in img_index.items():
            fixed[k] = iid2 not in var_set
        fixed[0] = True

        # Refine focal only for cameras WITHOUT a prior focal length
        # (user-provided intrinsics are trusted; fronto-parallel scenes make
        # focal/depth nearly unobservable and refinement drifts).
        do_refine = (
            self.cfg.ba_refine_focal if refine_focal is None else refine_focal
        )
        refine_focal_mask = np.zeros(len(cam_ids_used), bool)
        if do_refine:
            for cid, k in cam_index.items():
                refine_focal_mask[k] = not s.cameras[cid].get(
                    "prior_focal_length", False
                )
        refine_focal = refine_focal_mask
        # Radial distortion: initialize from camera params; refine k1
        # (SIMPLE_RADIAL) / k1,k2 (RADIAL) under the same no-prior gate as
        # focal (COLMAP refine_extra_params).
        dist = np.zeros((len(cam_ids_used), 2), np.float32)
        refine_dist = np.zeros((len(cam_ids_used), 2), bool)
        for cid, k in cam_index.items():
            model = s.cameras[cid]["model"]
            params = np.asarray(s.cameras[cid]["params"], np.float64)
            if model == "SIMPLE_RADIAL":
                dist[k, 0] = params[3] if len(params) > 3 else 0.0
                refine_dist[k] = (True, False)
            elif model == "RADIAL":
                dist[k, 0] = params[3] if len(params) > 3 else 0.0
                dist[k, 1] = params[4] if len(params) > 4 else 0.0
                refine_dist[k] = (True, True)
        if not (do_refine and self.cfg.ba_refine_extra_params):
            refine_dist[:] = False
        else:
            refine_dist &= refine_focal_mask[:, None]
        # Packed transfer: THREE H2D buffers + ONE D2H readback instead of a
        # 13-field problem + 5 outputs — on the remote-relay device each
        # array is a round trip and the per-registration local BA was the
        # dominant mapper substep (79.5 s of a 187 s DTU-50 mapper).
        n_cam_used = len(cam_ids_used)
        fbuf, ibuf, bbuf = pack_ba_problem(
            cam, np.zeros(n_cam_used, np.float32), dist, pts,
            obs_cam, obs_pt, obs_xy, obs_valid, Ks, cam_of_img,
            fixed, refine_focal, refine_dist,
        )
        t_asm = time.perf_counter()
        out = bundle_adjust_packed(
            fbuf, ibuf, bbuf,
            n_img=n_img, n_cam=n_cam_used, n_pts=n_pts_pad, n_obs=n_obs_pad,
            iters=iters, cg_iters=cg_iters, solver=solver,
        )
        t_disp = time.perf_counter()
        cam_out, focal_out, dist_out, pts_out, msr = unpack_ba_result(
            out, n_img, n_cam_used, n_pts_pad
        )
        t_read = time.perf_counter()
        # Phase ledger (assembly / async dispatch / execute+readback): the
        # lba substep is the top mapper cost at DTU scale — this names
        # where inside the call it goes (readback time = true device
        # execution on the relay; see docs/PERFORMANCE.md "relay
        # measurement rules").
        ph = self.ba_phases
        ph["asm"] += t_asm - t0
        ph["dispatch"] += t_disp - t_asm
        ph["readback"] += t_read - t_disp
        ph["calls"] += 1
        # Program-signature ledger: each distinct tuple is one compiled XLA
        # program (and one per-process relay upload).
        sig = (n_img, n_cam_used, n_pts_pad, n_obs_pad, iters, cg_iters)
        ph.setdefault("programs", {})[sig] = (
            ph.get("programs", {}).get(sig, 0) + 1
        )
        with _cpu_scope():
            for iid2, k in img_index.items():
                if iid2 not in var_set:
                    continue
                R = np.asarray(
                    axis_angle_to_matrix(jnp.asarray(cam_out[k, :3]))
                )
                s.poses[iid2] = (R, cam_out[k, 3:6])
        for pid, k in pt_index.items():
            s.points[pid] = pts_out[k]
        # Exact per-camera focal write-back (shared-intrinsics parameter).
        for cid, k in cam_index.items():
            scale = float(np.exp(focal_out[k]))
            if abs(scale - 1.0) > 1e-8:
                params = np.asarray(
                    s.cameras[cid]["params"], np.float64
                ).copy()
                n_f = 2 if s.cameras[cid]["model"] == "PINHOLE" else 1
                params[:n_f] *= scale
                s.cameras[cid]["params"] = params
            # Distortion write-back + refresh of the mapper's cached
            # undistorted observations (PnP/triangulation/filters consume
            # them; they must track the refined model).
            if refine_dist[k].any():
                params = np.asarray(
                    s.cameras[cid]["params"], np.float64
                ).copy()
                changed = False
                if len(params) > 3 and abs(dist_out[k, 0] - params[3]) > 1e-12:
                    params[3] = dist_out[k, 0]
                    changed = True
                if (
                    s.cameras[cid]["model"] == "RADIAL"
                    and len(params) > 4
                    and abs(dist_out[k, 1] - params[4]) > 1e-12
                ):
                    params[4] = dist_out[k, 1]
                    changed = True
                if changed:
                    s.cameras[cid]["params"] = params
                    for iid2 in s.images:
                        if (
                            s.images[iid2]["camera_id"] == cid
                            and iid2 in s.keypoints_raw
                        ):
                            s.keypoints[iid2] = geom.undistort_points(
                                s.keypoints_raw[iid2], s.cameras[cid]
                            )
        return float(msr)

    def filter_points(self) -> int:
        """Drop points with high mean reprojection error, too-short tracks,
        or any behind-camera observation.

        Vectorized: all observations are evaluated in one flat batch (the
        per-point Python loop was the mapper's host bottleneck at DTU scale).
        """
        s = self.s
        pids = list(s.points.keys())
        if not pids:
            return 0
        thr = self.cfg.filter_max_reproj_error_px

        img_ids = sorted(s.poses.keys())
        img_index = {iid: k for k, iid in enumerate(img_ids)}
        Rs = np.stack([s.poses[i][0] for i in img_ids])
        ts = np.stack([s.poses[i][1] for i in img_ids])
        Ks = np.stack([s.K(i) for i in img_ids])

        obs_pid, obs_img, obs_xy = [], [], []
        pt_index = {p: k for k, p in enumerate(pids)}
        for pid in pids:
            for iid, f in s.tracks[pid]:
                obs_pid.append(pt_index[pid])
                obs_img.append(img_index[iid])
                obs_xy.append(s.keypoints[iid][f])
        obs_pid = np.array(obs_pid)
        obs_img = np.array(obs_img)
        obs_xy = np.asarray(obs_xy, np.float64)
        X = np.stack([s.points[p] for p in pids])[obs_pid]

        R, t, Kk = Rs[obs_img], ts[obs_img], Ks[obs_img]
        Xc = np.einsum("nij,nj->ni", R, X) + t
        z = np.where(np.abs(Xc[:, 2:]) > 1e-9, Xc[:, 2:], 1e-9)
        f = np.stack([Kk[:, 0, 0], Kk[:, 1, 1]], axis=1)
        c = np.stack([Kk[:, 0, 2], Kk[:, 1, 2]], axis=1)
        uv = (Xc[:, :2] / z) * f + c
        err = np.linalg.norm(uv - obs_xy, axis=-1)
        behind = Xc[:, 2] <= 1e-6

        n_pts = len(pids)
        err_sum = np.bincount(obs_pid, weights=err, minlength=n_pts)
        cnt = np.bincount(obs_pid, minlength=n_pts)
        bad_behind = np.bincount(obs_pid, weights=behind, minlength=n_pts) > 0
        mean_err = err_sum / np.maximum(cnt, 1)
        drop = (cnt < 2) | bad_behind | (mean_err > thr)

        removed = 0
        for k in np.nonzero(drop)[0]:
            s.remove_point(pids[k])
            removed += 1
        return removed

    # ------------------------------------------------------------- finalize
    def to_reconstruction(self) -> Reconstruction:
        s = self.s
        rec = Reconstruction()
        for cid, cam in s.cameras.items():
            rec.cameras[cid] = Camera(
                camera_id=cid,
                model=cam["model"],
                width=cam["width"],
                height=cam["height"],
                params=np.asarray(cam["params"], np.float64),
            )
        for iid in s.poses:
            kps = s.keypoints[iid]
            pids = s.feat_pid[iid].copy()
            R, t = s.poses[iid]
            rec.images[iid] = Image(
                image_id=iid,
                name=s.images[iid]["name"],
                camera_id=s.images[iid]["camera_id"],
                qvec=_qvec_from_R(R),
                tvec=np.asarray(t, np.float64),
                xys=kps.astype(np.float64),
                point3D_ids=pids,
            )
        for pid, xyz in s.points.items():
            errs = []
            for iid, f in s.tracks[pid]:
                if iid in s.poses:
                    R, t = s.poses[iid]
                    e = _reproj_errors(
                        R, t, s.K(iid), xyz[None], s.keypoints[iid][f][None]
                    )[0]
                    if np.isfinite(e):
                        errs.append(e)
            rec.points3D[pid] = Point3D(
                point3D_id=pid,
                xyz=np.asarray(xyz, np.float64),
                error=float(np.mean(errs)) if errs else 0.0,
                track=list(s.tracks[pid]),
            )
        return rec


def incremental_mapping(
    db_path: Path | str,
    image_dir: Path | str,
    output_path: Path | str,
    config: ReconstructionConfig | None = None,
) -> dict[int, Reconstruction]:
    """Build one or more sparse models from a matched+verified database."""
    config = config or ReconstructionConfig()
    output_path = Path(output_path)

    db = ColmapDatabase(db_path)
    cameras = db.read_cameras()
    images = db.read_images()
    keypoints = {}
    keypoints_raw = {}
    for iid in images:
        k = db.read_keypoints(iid)
        k = k[:, :2] if k is not None and len(k) else np.zeros((0, 2), np.float32)
        # Mapper geometry uses an undistorted pinhole model; radial models'
        # observations are undistorted once here (geom.undistort_points).
        # BA consumes the raw coords and models distortion in-projection.
        keypoints_raw[iid] = k
        keypoints[iid] = geom.undistort_points(
            k, cameras[images[iid]["camera_id"]]
        )
    geometries = db.read_all_two_view_geometries()
    db.close()

    pair_matches = {
        ids: g["inlier_matches"].astype(np.int64)
        for ids, g in geometries.items()
        if len(g["inlier_matches"]) >= config.min_num_matches
    }
    logger.info(
        "Mapper input: %d images, %d verified pairs", len(images), len(pair_matches)
    )

    reconstructions: dict[int, Reconstruction] = {}
    remaining = set(images.keys())
    model_idx = 0
    while len(remaining) >= 2 and model_idx < config.max_models:
        sub_pairs = {
            (a, b): m
            for (a, b), m in pair_matches.items()
            if a in remaining and b in remaining
        }
        if not sub_pairs:
            break
        state = _MapperState(
            cameras,
            {i: images[i] for i in remaining},
            {i: keypoints[i] for i in remaining},
            {i: keypoints_raw[i] for i in remaining},
        )
        mapper = IncrementalMapper(state, sub_pairs, config)
        if not mapper.initialize():
            break
        mapper.bundle_adjust(iters=config.ba_local_iters)
        mapper.filter_points()

        stalled = 0
        last_global_size = 2
        # Per-substep wall-clock accounting (find/register/triangulate/
        # local BA/global BA) — the mapper is the reconstruction
        # bottleneck at DTU scale; this names the cost.
        t_sub = {
            k: 0.0
            for k in ("find", "register", "tri", "lba", "gba",
                      "refine_tri", "refine_gba")
        }

        def _timed(key, fn, *a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            t_sub[key] += time.perf_counter() - t0
            return out

        while True:
            iid, corrs = _timed("find", mapper.find_next_image)
            if iid is None:
                break
            if not _timed("register", mapper.register_image, iid, corrs):
                stalled += 1
                if stalled > 2:
                    break
                continue
            stalled = 0
            _timed("tri", mapper.triangulate_new, iid)
            # Local BA after every registration (cheap, bucketed shapes);
            # global BA only when the model grew enough (COLMAP schedule) —
            # the global LM stays out of the inner loop (VERDICT r1 item 5).
            _timed("lba", mapper.local_bundle_adjust, iid)
            if len(state.poses) >= config.global_ba_growth * last_global_size:
                _timed("gba", mapper.bundle_adjust, iters=config.ba_local_iters)
                _timed("gba", mapper.filter_points)
                last_global_size = len(state.poses)
        # Final iterative refinement (COLMAP-style): retriangulate features
        # that gained geometry during the build, then global BA + filter.
        # (Timed under refine_* — this phase was the ~380 s the r2 substep
        # log left unaccounted.)
        for _ in range(2):
            created = _timed(
                "refine_tri",
                lambda: sum(
                    mapper.triangulate_new(iid) for iid in list(state.poses)
                ),
            )
            _timed("refine_gba", mapper.bundle_adjust,
                   iters=config.ba_global_iters)
            removed = _timed("refine_gba", mapper.filter_points)
            logger.info(
                "Refinement round: +%d points, -%d filtered", created, removed
            )
            if created <= removed:
                break
        logger.info(
            "Mapper substep seconds: %s",
            {k: round(v, 1) for k, v in t_sub.items()},
        )
        logger.info(
            "BA phase seconds: %s",
            {
                k: (round(v, 1) if isinstance(v, float) else v)
                for k, v in mapper.ba_phases.items()
                if k != "programs"
            },
        )
        progs = mapper.ba_phases.get("programs", {})
        logger.info(
            "BA programs: %d distinct (n_img, n_cam, n_pts, n_obs, iters, "
            "cg) signatures over %d calls: %s",
            len(progs), sum(progs.values()),
            {str(k): v for k, v in sorted(progs.items())},
        )
        rec = mapper.to_reconstruction()
        if len(rec.images) >= 2 and len(rec.points3D) >= 10:
            rec.write(output_path / str(model_idx))
            reconstructions[model_idx] = rec
            logger.info(
                "Model %d: %d images, %d points, mean reproj %.3f px",
                model_idx,
                len(rec.images),
                len(rec.points3D),
                rec.mean_reprojection_error(),
            )
            model_idx += 1
        remaining -= set(state.poses.keys())
        if not config.multiple_models:
            break
    return reconstructions
