"""HPatches-style homography evaluation (MMA + homography accuracy).

Implements the standard HPatches matching protocol the reference evaluates
against qualitatively (BASELINE.json config 3: "dense descriptors +
mutual-NN matching + homography eval"):

* **MMA@t** — mean matching accuracy: fraction of mutual-NN matches whose
  ground-truth reprojection error is below t pixels, averaged over pairs,
* **homography accuracy@t** — fraction of pairs whose RANSAC-estimated
  homography warps the four image corners within t pixels of the GT warp.

All geometry is evaluated with the in-repo batched ops.
"""

from __future__ import annotations

import logging
from dataclasses import dataclass, field
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.dataloader.homography_utils import apply_homography
from vit_colmap_tpu.ops.ransac import _ransac_model
from vit_colmap_tpu.sfm import geometry as geom

logger = logging.getLogger(__name__)

DEFAULT_THRESHOLDS = (1.0, 3.0, 5.0)


@dataclass
class PairEval:
    num_matches: int
    match_errors: np.ndarray  # GT reprojection error per match (px)
    corner_error: float  # estimated-vs-GT corner warp error (px)


@dataclass
class HomographyEvalResult:
    thresholds: tuple[float, ...]
    pairs: list[PairEval] = field(default_factory=list)

    @property
    def mma(self) -> dict[float, float]:
        out = {}
        for t in self.thresholds:
            accs = [
                float((p.match_errors <= t).mean())
                for p in self.pairs
                if len(p.match_errors)
            ]
            out[t] = float(np.mean(accs)) if accs else 0.0
        return out

    @property
    def homography_accuracy(self) -> dict[float, float]:
        out = {}
        errs = [p.corner_error for p in self.pairs]
        for t in self.thresholds:
            out[t] = float(np.mean([e <= t for e in errs])) if errs else 0.0
        return out

    @property
    def avg_matches(self) -> float:
        return float(np.mean([p.num_matches for p in self.pairs])) if self.pairs else 0.0

    def summary(self) -> str:
        lines = [
            f"pairs: {len(self.pairs)}, avg matches: {self.avg_matches:.1f}",
            "MMA:      "
            + "  ".join(f"@{t:g}px {v:.3f}" for t, v in self.mma.items()),
            "H-acc:    "
            + "  ".join(
                f"@{t:g}px {v:.3f}" for t, v in self.homography_accuracy.items()
            ),
        ]
        return "\n".join(lines)


def match_reprojection_errors(
    kpts1: np.ndarray, kpts2: np.ndarray, matches: np.ndarray, H_gt: np.ndarray
) -> np.ndarray:
    """GT error of each match: ||H x1 - x2|| in pixels."""
    if len(matches) == 0:
        return np.zeros(0, np.float32)
    x1 = kpts1[matches[:, 0], :2]
    x2 = kpts2[matches[:, 1], :2]
    warped = np.asarray(
        apply_homography(jnp.asarray(H_gt, jnp.float32)[None], jnp.asarray(x1)[None])
    )[0]
    return np.linalg.norm(warped - x2, axis=-1)


def estimate_homography_corner_error(
    kpts1: np.ndarray,
    kpts2: np.ndarray,
    matches: np.ndarray,
    H_gt: np.ndarray,
    image_wh: tuple[int, int],
    iters: int = 512,
    max_error_px: float = 3.0,
    seed: int = 0,
) -> float:
    """RANSAC-estimate H from the matches; mean corner-warp error vs GT."""
    if len(matches) < 4:
        return float("inf")
    k_max = 1
    while k_max < len(matches):
        k_max *= 2
    p1 = np.zeros((k_max, 2), np.float32)
    p2 = np.zeros((k_max, 2), np.float32)
    mask = np.zeros(k_max, bool)
    p1[: len(matches)] = kpts1[matches[:, 0], :2]
    p2[: len(matches)] = kpts2[matches[:, 1], :2]
    mask[: len(matches)] = True
    H_est, _, n_inl = _ransac_model(
        geom.fit_homography,
        geom.homography_error,
        jnp.asarray(p1),
        jnp.asarray(p2),
        jnp.asarray(mask),
        jax.random.key(seed),
        iters,
        4,
        jnp.float32(max_error_px**2),
    )
    if int(n_inl) < 4:
        return float("inf")
    w, h = image_wh
    corners = np.array(
        [[0, 0], [w - 1, 0], [w - 1, h - 1], [0, h - 1]], np.float32
    )
    c_est = np.asarray(
        apply_homography(jnp.asarray(H_est)[None], jnp.asarray(corners)[None])
    )[0]
    c_gt = np.asarray(
        apply_homography(
            jnp.asarray(H_gt, jnp.float32)[None], jnp.asarray(corners)[None]
        )
    )[0]
    return float(np.linalg.norm(c_est - c_gt, axis=-1).mean())


def evaluate_pairs(
    pair_data: Sequence[dict],
    thresholds: Sequence[float] = DEFAULT_THRESHOLDS,
) -> HomographyEvalResult:
    """pair_data entries: {kpts1, kpts2, matches (R,2), H (3,3), image_wh}."""
    result = HomographyEvalResult(tuple(thresholds))
    for d in pair_data:
        errs = match_reprojection_errors(
            d["kpts1"], d["kpts2"], d["matches"], d["H"]
        )
        corner = estimate_homography_corner_error(
            d["kpts1"], d["kpts2"], d["matches"], d["H"], d["image_wh"]
        )
        result.pairs.append(
            PairEval(
                num_matches=len(d["matches"]),
                match_errors=errs,
                corner_error=corner,
            )
        )
    return result
