"""Trainable-ViT inference extractor.

Capability parity with the reference ``TrainableViTExtractor``
(``features/trainable_vit_extractor.py:18-395``): trained keypoint/descriptor
heads on the frozen backbone, sigmoid score map, max-pool NMS, threshold +
top-K selection (pipeline defaults 20480 kps / nms 1 / thresh 0.4,
``pipeline/run_pipeline.py:329-334``), sub-pixel offsets at quarter
resolution scaled x4 back to pixels, **6-column COLMAP keypoints**
(x, y, scale=1, orientation, score, 0), descriptors sampled at the keypoint
cells and quantized ``(d + 1) * 127.5`` to uint8, and SIMPLE_RADIAL/RADIAL
default intrinsics.

Checkpoints: orbax directories produced by
:mod:`vit_colmap_tpu.training.train`; absent -> random init (still runs).
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.features.base_extractor import BaseExtractor, list_images
from vit_colmap_tpu.models.dinov2 import patch_grid_size, preprocess
from vit_colmap_tpu.models.feature_model import make_feature_model
from vit_colmap_tpu.ops.detect import nms_maxpool
from vit_colmap_tpu.utils.config import CameraConfig

logger = logging.getLogger(__name__)


class TrainableViTExtractor(BaseExtractor):
    def __init__(
        self,
        weights_path: Optional[str] = None,
        backbone: str = "vitb14",
        num_keypoints: int = 20480,
        nms_radius: int = 1,
        detection_threshold: float = 0.4,
        min_keypoints: int = 256,
        image_batch: int = 2,
        dtype=jnp.bfloat16,
        seed: int = 0,
        subpixel: "bool | str" = True,
    ):
        self.num_keypoints = num_keypoints
        self.nms_radius = nms_radius
        self.detection_threshold = detection_threshold
        # Sub-pixel localization source (VERDICT r4 item 3 geometry bisect):
        #   "head" / True — the LEARNED offset head (reference semantics,
        #       ``trainable_vit_extractor.py:219-229`` there);
        #   "quad"        — training-free quadratic peak fit on the score
        #       map (ops/detect.quadratic_refine), immune to an
        #       under-trained offset head;
        #   "none" / False — cell centers (diagnostic control).
        if subpixel is True:
            subpixel = "head"
        elif subpixel is False:
            subpixel = "none"
        if subpixel not in ("head", "quad", "none"):
            raise ValueError(f"unknown subpixel mode {subpixel!r}")
        self.subpixel = subpixel
        # TPU-native robustness addition over the reference's bare 0.4
        # threshold (``trainable_vit_extractor.py:219-229``): when fewer
        # than ``min_keypoints`` NMS peaks clear the threshold (e.g. an
        # early-training head whose sigmoid ceiling sits below 0.4), keep
        # the top-scoring peaks instead of starving the pipeline to zero
        # keypoints.  Scores are sorted descending, so behavior is
        # bit-identical to the reference whenever >= min_keypoints pass.
        # Set min_keypoints=0 for exact reference semantics.
        self.min_keypoints = min(min_keypoints, num_keypoints)
        self.image_batch = image_batch

        # Reference torch checkpoints (.pt/.pth) carry eval-mode BatchNorms;
        # those fold into the convs, so the flax heads are built norm-free
        # for math-identical inference (models/convert.py).
        is_torch_ckpt = bool(weights_path) and str(weights_path).endswith(
            (".pt", ".pth")
        )
        self.model, self.cfg, self.bcfg = make_feature_model(
            backbone, dtype=dtype, norm="none" if is_torch_ckpt else "group"
        )
        key = jax.random.key(seed)
        self.params = self.model.init(key, jnp.zeros((1, 224, 224, 3)))
        if is_torch_ckpt:
            self._load_torch_checkpoint(weights_path)
        elif weights_path:
            self._load_checkpoint(weights_path)
        else:
            logger.warning(
                "No checkpoint provided; trainable heads are randomly initialized"
            )
        self._forward = None

    def _load_torch_checkpoint(self, path: str) -> None:
        """Load a reference-trained torch ``ViTFeatureModel`` checkpoint
        (any of the 3 layouts the reference tolerates,
        ``trainable_vit_extractor.py:102-109``); also restores the backbone
        when the checkpoint embeds it under ``backbone.*``."""
        from vit_colmap_tpu.models.convert import load_torch_feature_model

        heads, backbone = load_torch_feature_model(path, self.bcfg)
        p = dict(self.params["params"])
        p["heads"] = heads["params"]
        if backbone is not None:
            p["backbone"] = backbone["params"]
            logger.info("Restored embedded DINOv2 backbone from %s", path)
        self.params = {"params": p}
        logger.info("Loaded torch trained-head checkpoint from %s", path)

    def _load_checkpoint(self, path: str) -> None:
        """Accepts an orbax checkpoint dir (train-state or raw params) —
        the reference's 3-format tolerance (``trainable_vit_extractor.py:
        102-109``) maps to orbax layouts here."""
        import orbax.checkpoint as ocp

        path = Path(path).resolve()
        ckptr = ocp.StandardCheckpointer()
        restored = ckptr.restore(path)
        # Accept {heads_params: ...}, {params: {heads: ...}}, or raw heads.
        if isinstance(restored, dict):
            if "heads_params" in restored:
                heads = restored["heads_params"]
            elif "params" in restored and "heads" in restored.get("params", {}):
                heads = {"params": restored["params"]["heads"]}
            else:
                heads = restored
        else:
            heads = restored
        p = dict(self.params["params"])
        backbone = None
        # --train-backbone checkpoints store the combined trainable pytree
        # {"heads": ..., "backbone": ...} (training/train.py): restore both.
        if isinstance(heads, dict) and "backbone" in heads and "heads" in heads:
            backbone = heads["backbone"]
            heads = heads["heads"]
        hp = heads.get("params", heads)
        if "heads" in hp:
            hp = hp["heads"]
        p["heads"] = hp
        if backbone is not None:
            bp = backbone.get("params", backbone)
            if "backbone" in bp:
                bp = bp["backbone"]
            p["backbone"] = bp
            logger.info("Restored fine-tuned backbone from %s", path)
        self.params = {"params": p}
        logger.info("Loaded trainable-head checkpoint from %s", path)

    # -------------------------------------------------------------- device
    def _build_forward(self):
        model = self.model
        nms_radius = self.nms_radius
        k_total = self.num_keypoints
        thresh = self.detection_threshold
        min_k = self.min_keypoints
        subpixel = self.subpixel

        @jax.jit
        def forward(params, images_u8):
            out = model.apply(params, preprocess(images_u8))
            scores = jax.nn.sigmoid(out["score_logits"])  # (B, H4, W4)
            s = nms_maxpool(scores, nms_radius)
            B, H4, W4 = s.shape
            k = min(k_total, H4 * W4)
            top, idx = jax.lax.top_k(s.reshape(B, -1), k)
            ys = (idx // W4).astype(jnp.float32)
            xs = (idx % W4).astype(jnp.float32)
            # Threshold, with a top-min_k floor (see __init__): top_k sorts
            # descending, so >thresh entries form a prefix and the floor is
            # a no-op whenever enough peaks clear it.
            rank = jnp.arange(k, dtype=jnp.int32)[None, :]
            # The floor's score guard only needs to exclude NMS-suppressed
            # cells, which are exactly 0 (masked), not low-sigmoid peaks: a
            # `> 1e-6` guard defeated the floor precisely when an
            # under-trained head needed it (sigmoid(<-13.8) < 1e-6 ⇒ zero
            # keypoints — the round-2 bake-off failure mode).
            valid = (top > thresh) | ((rank < min_k) & (top > 0.0))

            def gather(m):
                flat = m.reshape(B, H4 * W4, -1)
                return jnp.take_along_axis(flat, idx[..., None], axis=1)

            offs = gather(out["offsets"])  # (B, k, 2)
            orient = gather(out["orientation"][..., None])[..., 0]
            desc = gather(out["descriptors"])  # (B, k, D)
            # Quarter-res cell + sub-pixel offset, scaled x4 to pixels
            # (reference ``trainable_vit_extractor.py:219-229``).
            if subpixel == "none":
                offs = jnp.zeros_like(offs)
            elif subpixel == "quad":
                from vit_colmap_tpu.ops.detect import quadratic_refine

                # Quadratic fit on the RAW (pre-NMS) score map at the peaks.
                xy_int = jnp.stack([xs, ys], axis=-1)
                offs = quadratic_refine(scores, xy_int)
            x_px = (xs + 0.5 + offs[..., 0]) * 4.0
            y_px = (ys + 0.5 + offs[..., 1]) * 4.0
            desc_u8 = jnp.clip((desc + 1.0) * 127.5, 0, 255).astype(jnp.uint8)
            return x_px, y_px, orient, top, valid, desc_u8

        return forward

    def extract_batch(self, images_u8: np.ndarray):
        if self._forward is None:
            self._forward = self._build_forward()
        x, y, orient, score, valid, desc = self._forward(
            self.params, jnp.asarray(images_u8)
        )
        return tuple(np.asarray(v) for v in (x, y, orient, score, valid, desc))

    # ---------------------------------------------------------------- host
    def extract(
        self,
        image_dir: Path,
        db_path: Path,
        camera_model: str,
        camera_params: Optional[list[float]] = None,
    ) -> None:
        import cv2

        image_dir = Path(image_dir)
        files = list_images(image_dir)
        if not files:
            logger.error("No images found in %s", image_dir)
            return

        db = ColmapDatabase(db_path)
        camera_ids: dict[tuple[int, int], int] = {}
        groups: dict[tuple[int, int], list[tuple[Path, np.ndarray]]] = {}
        for f in files:
            img = cv2.imread(str(f))
            if img is None:
                logger.warning("Unreadable image skipped: %s", f)
                continue
            rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            groups.setdefault(rgb.shape[:2], []).append((f, rgb))

        for (oh, ow), items in groups.items():
            th, tw = patch_grid_size(oh, ow)
            if (oh, ow) not in camera_ids:
                params = camera_params or CameraConfig(
                    model=camera_model
                ).get_default_params(ow, oh)
                camera_ids[(oh, ow)] = db.add_camera(
                    camera_model, ow, oh, params,
                    prior_focal_length=camera_params is not None,
                )
            cam_id = camera_ids[(oh, ow)]
            B = self.image_batch
            rx, ry = ow / tw, oh / th
            for s in range(0, len(items), B):
                chunk = items[s : s + B]
                batch = np.zeros((B, th, tw, 3), np.uint8)
                for b, (f, rgb) in enumerate(chunk):
                    if (oh, ow) != (th, tw):
                        rgb = cv2.resize(rgb, (tw, th), interpolation=cv2.INTER_AREA)
                    batch[b] = rgb
                x, y, orient, score, valid, desc = self.extract_batch(batch)
                for b, (f, _) in enumerate(chunk):
                    v = valid[b]
                    n = int(v.sum())
                    # 6-column COLMAP keypoints: x, y, scale=1, orientation,
                    # score, 0 (reference ``trainable_vit_extractor.py:241-254``).
                    kpts = np.zeros((n, 6), np.float32)
                    kpts[:, 0] = x[b][v] * rx
                    kpts[:, 1] = y[b][v] * ry
                    kpts[:, 2] = 1.0
                    kpts[:, 3] = orient[b][v]
                    kpts[:, 4] = score[b][v]
                    image_id = db.add_image(f.name, camera_id=cam_id)
                    db.add_keypoints(image_id, kpts)
                    db.add_descriptors(image_id, desc[b][v])
        db.commit()
        db.close()
