"""In-repo synthetic quality benchmarks (HPatches-style + multi-view SfM).

No datasets exist in this environment (zero egress), so the extractor
bake-off the reference exists for (SIFT vs ViT quality —
``/root/reference/README.md:15-23``) runs on rendered data:

* :func:`generate_synthetic_hpatches` — an HPatches-layout tree
  (``i_*``/``v_*`` sequences, ``k.ppm`` + ``H_1_k`` files) of structured
  multi-scale images: viewpoint sequences warp a base image by known
  homographies, illumination sequences apply photometric changes under an
  identity homography.  Readable by
  :class:`~vit_colmap_tpu.dataloader.hpatches_dataset.HPatchesDataset` and
  ``scripts/eval_hpatches.py``.
* :func:`render_multiview_scene` — textured slanted planes imaged by an arc
  of pinhole cameras, for full-reconstruction metrics (registered images,
  3D points, reprojection error).
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def make_structured_image(rng: np.random.Generator, h: int = 480, w: int = 640) -> np.ndarray:
    """A base image with structure at several scales: multi-octave smooth
    noise plus filled geometric shapes and lines, lightly blurred.  Gives
    corner detectors (SIFT/Harris) real gradients instead of white noise."""
    import cv2

    img = np.zeros((h, w, 3), np.float32)
    for scale, amp in ((4, 0.20), (16, 0.35), (64, 0.45)):
        small = rng.random(
            (max(2, h // scale), max(2, w // scale), 3)
        ).astype(np.float32)
        img += amp * cv2.resize(small, (w, h), interpolation=cv2.INTER_CUBIC)
    img -= img.min()
    img /= img.max() + 1e-9
    img = (img * 255).astype(np.uint8)
    for _ in range(40):
        color = tuple(int(c) for c in rng.integers(0, 256, 3))
        kind = int(rng.integers(0, 3))
        if kind == 0:
            center = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            radius = int(rng.integers(5, 60))
            thickness = -1 if rng.random() < 0.7 else 2
            cv2.circle(img, center, radius, color, thickness)
        elif kind == 1:
            pts = np.stack(
                [rng.integers(0, w, 3), rng.integers(0, h, 3)], axis=1
            ).astype(np.int32)
            cv2.fillPoly(img, [pts], color)
        else:
            p1 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            p2 = (int(rng.integers(0, w)), int(rng.integers(0, h)))
            cv2.line(img, p1, p2, color, int(rng.integers(1, 5)))
    return cv2.GaussianBlur(img, (0, 0), 1.0)


def _photometric_variant(rng: np.random.Generator, img: np.ndarray) -> np.ndarray:
    """Illumination change: gamma + gain/bias + mild noise (H = identity)."""
    gamma = float(rng.uniform(0.55, 1.7))
    gain = float(rng.uniform(0.7, 1.25))
    bias = float(rng.uniform(-25, 25))
    x = (img.astype(np.float32) / 255.0) ** gamma
    x = x * 255.0 * gain + bias
    x += rng.normal(0, 2.0, img.shape)
    return np.clip(x, 0, 255).astype(np.uint8)


def generate_synthetic_hpatches(
    root: Path,
    n_illum: int = 4,
    n_view: int = 6,
    n_img: int = 6,
    size: tuple[int, int] = (480, 640),
    seed: int = 0,
    preset: str = "moderate",
) -> list[str]:
    """Write an HPatches-layout benchmark tree; returns sequence names."""
    import cv2

    from vit_colmap_tpu.dataloader.synthetic_homography import (
        SyntheticHomographyConfig,
        generate_random_homography,
    )

    root = Path(root)
    h, w = size
    cfg = getattr(SyntheticHomographyConfig, preset)()
    rng = np.random.default_rng(seed)
    names = [f"i_synth{k}" for k in range(n_illum)] + [
        f"v_synth{k}" for k in range(n_view)
    ]
    for name in names:
        d = root / name
        d.mkdir(parents=True, exist_ok=True)
        base = make_structured_image(rng, h, w)
        cv2.imwrite(str(d / "1.ppm"), base)
        for j in range(2, n_img + 1):
            if name.startswith("i_"):
                H = np.eye(3)
                img_j = _photometric_variant(rng, base)
            else:
                H = generate_random_homography(w, h, cfg, rng)
                img_j = cv2.warpPerspective(base, H, (w, h))
            cv2.imwrite(str(d / f"{j}.ppm"), img_j)
            np.savetxt(str(d / f"H_1_{j}"), H)
    return names


def render_multiview_scene(
    image_dir: Path,
    n_cams: int = 8,
    size: tuple[int, int] = (480, 640),
    focal: float = 600.0,
    seed: int = 0,
    arc: float = 0.35,
):
    """Textured slanted planes viewed by an arc of cameras.

    Returns (cams, K): cams is a list of (R, t) world->camera, K the shared
    pinhole intrinsics.  Slanted planes break the planar-degeneracy so
    two-view verification exercises the CALIBRATED/E path.

    Also persists the ground-truth poses as ``gt_poses.json`` inside
    ``image_dir`` (keyed by file name) so the pose oracle
    (:mod:`vit_colmap_tpu.sfm.align`) works on cached scenes.
    """
    import cv2

    h, w = size
    rng = np.random.default_rng(seed)
    K = np.array([[focal, 0, w / 2], [0, focal, h / 2], [0, 0, 1]])
    # (corners (4,3), texture) — far backdrop plus slanted near planes.
    planes = [
        (
            np.array(
                [[-3.2, -2.4, 6.5], [3.2, -2.4, 6.5], [3.2, 2.4, 6.5], [-3.2, 2.4, 6.5]]
            ),
            make_structured_image(rng, 512, 512),
        ),
        (
            np.array(
                [[-2.2, -1.5, 5.4], [0.2, -1.4, 4.6], [0.2, 1.4, 4.6], [-2.2, 1.5, 5.4]]
            ),
            make_structured_image(rng, 384, 384),
        ),
        (
            np.array(
                [[0.3, -1.3, 4.4], [2.3, -1.5, 5.2], [2.3, 1.5, 5.2], [0.3, 1.3, 4.4]]
            ),
            make_structured_image(rng, 384, 384),
        ),
    ]
    image_dir = Path(image_dir)
    image_dir.mkdir(parents=True, exist_ok=True)
    cams = []
    for i in range(n_cams):
        # Total sweep stays `arc` radians regardless of camera count so the
        # planes remain in view at DTU-scale (49-64 images).
        ang = (i - (n_cams - 1) / 2) * (arc / max(n_cams - 1, 1))
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        C = np.array([2.0 * np.sin(ang), 0.04 * i, 5.0 - 5.0 * np.cos(ang)])
        t = -R @ C
        cams.append((R, t))
        img = np.zeros((h, w, 3), np.uint8)
        for corners, tex in planes:  # far plane drawn first
            Xc = corners @ R.T + t
            uv = (Xc[:, :2] / Xc[:, 2:]) * focal + np.array([w / 2, h / 2])
            src = np.array(
                [
                    [0, 0],
                    [tex.shape[1] - 1, 0],
                    [tex.shape[1] - 1, tex.shape[0] - 1],
                    [0, tex.shape[0] - 1],
                ],
                np.float32,
            )
            Hmat = cv2.getPerspectiveTransform(src, uv.astype(np.float32))
            warped = cv2.warpPerspective(tex, Hmat, (w, h))
            mask = cv2.warpPerspective(
                np.full(tex.shape[:2], 255, np.uint8), Hmat, (w, h)
            )
            img[mask > 128] = warped[mask > 128]
        cv2.imwrite(str(image_dir / f"view_{i:03d}.png"), img)
    from vit_colmap_tpu.sfm.align import save_gt_poses

    save_gt_poses(
        image_dir / "gt_poses.json",
        cams,
        [f"view_{i:03d}.png" for i in range(n_cams)],
    )
    return cams, K
