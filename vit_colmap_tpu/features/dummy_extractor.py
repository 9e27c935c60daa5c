"""Deterministic fake extractor — the model-free e2e seam.

Behavioral contract from the reference (``features/dummy_extractor.py:8-117``,
see SURVEY.md §4): a regular grid of keypoints (step 32, centered at
step/2 offsets) with 128-D uint8 descriptors *seeded by grid position* so the
same position matches across images without any model, and auto-generation of
10 random 640x480 images when the directory is empty.

TPU-native twist: the whole feature computation (grid + position-hashed
descriptors) is a single jitted JAX program batched over images of equal
size, exercising the same device->host->DB funnel the real extractors use.
"""

from __future__ import annotations

from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.features.base_extractor import BaseExtractor, list_images
from vit_colmap_tpu.utils.config import CameraConfig


@partial(jax.jit, static_argnames=("height", "width", "step", "dim"))
def dummy_features(
    seed: jax.Array, height: int, width: int, step: int = 32, dim: int = 128
):
    """Grid keypoints + position-seeded uint8 descriptors, on device.

    Descriptor determinism: per-keypoint PRNG key folded from the grid cell
    index (same formula as the reference: ``seed + gx * 1000 + gy``), so any
    two images share descriptors at equal positions.
    """
    ys = jnp.arange(step // 2, height, step, dtype=jnp.float32)
    xs = jnp.arange(step // 2, width, step, dtype=jnp.float32)
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    kpts = jnp.stack([xx.ravel(), yy.ravel()], axis=1)

    gx = (kpts[:, 0] / step).astype(jnp.int32)
    gy = (kpts[:, 1] / step).astype(jnp.int32)
    local_seeds = seed + gx * 1000 + gy

    def desc_for(s):
        key = jax.random.key(s)
        return jax.random.randint(key, (dim,), 0, 256, dtype=jnp.int32)

    desc = jax.vmap(desc_for)(local_seeds).astype(jnp.uint8)
    return kpts, desc


class DummyExtractor(BaseExtractor):
    def __init__(self, step: int = 32, seed: int = 42):
        self.step = step
        self.seed = seed

    def extract(
        self,
        image_dir: Path,
        db_path: Path,
        camera_model: str,
        camera_params: Optional[list[float]] = None,
    ) -> None:
        import cv2

        image_dir = Path(image_dir)
        image_files = list_images(image_dir)
        if not image_files:
            print(f"No images found in {image_dir}, generating 10 dummy images...")
            image_dir.mkdir(parents=True, exist_ok=True)
            rng = np.random.default_rng(self.seed)
            for i in range(10):
                img = rng.integers(0, 256, (480, 640, 3), dtype=np.uint8)
                path = image_dir / f"dummy_{i:03d}.png"
                cv2.imwrite(str(path), img)
                image_files.append(path)

        db = ColmapDatabase(db_path)
        first = cv2.imread(str(image_files[0]))
        if first is None:
            db.close()
            return
        height, width = first.shape[:2]
        explicit_params = camera_params is not None
        if camera_params is None:
            camera_params = CameraConfig(model=camera_model).get_default_params(
                width, height
            )
        camera_id = db.add_camera(
            camera_model, width, height, camera_params,
            prior_focal_length=explicit_params,
        )

        for img_file in image_files:
            img = cv2.imread(str(img_file))
            if img is None:
                continue
            h, w = img.shape[:2]
            kpts, desc = dummy_features(
                jnp.int32(self.seed), h, w, step=self.step
            )
            image_id = db.add_image(img_file.name, camera_id=camera_id)
            db.add_keypoints(image_id, np.asarray(kpts))
            db.add_descriptors(image_id, np.asarray(desc))

        db.commit()
        db.close()
