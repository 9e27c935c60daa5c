"""Frozen DINOv2 ViT feature extractor — batched, jitted, device-resident.

Capability parity with the reference ``ViTExtractor``
(``features/vit_extractor.py:17-768``): DINOv2 patch tokens, Harris/DoG
saliency, spatially-binned top-k keypoints + NMS, bilinear descriptor
interpolation, PCA 768->128, L2-normalize, x512 uint8 quantization,
grid->image coordinate mapping with the +0.5 patch-center offset, default
intrinsics f = max(w, h), and directory->database extraction.

TPU-native redesign (SURVEY.md §7 step 3-4):
* the ENTIRE per-image compute (normalize -> backbone -> saliency -> NMS ->
  binned top-k -> descriptor gather -> PCA -> quantize) is ONE jitted
  program batched over images — the reference crosses host<->device several
  times per image and runs Python loops for binning/NMS,
* ragged keypoint counts ride fixed shapes + validity masks,
* PCA is an explicit fit (stored on the extractor, persistable) rather than
  an order-dependent lazy SVD.
"""

from __future__ import annotations

import logging
from functools import partial
from pathlib import Path
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.database import ColmapDatabase
from vit_colmap_tpu.features.base_extractor import BaseExtractor, list_images
from vit_colmap_tpu.models.dinov2 import (
    PATCH_SIZE,
    make_backbone,
    patch_grid_size,
    preprocess,
)
from vit_colmap_tpu.ops.detect import detect_keypoints
from vit_colmap_tpu.ops.interpolate import (
    apply_pca,
    bilinear_sample_batched,
    fit_pca,
    l2_normalize,
    quantize_descriptors_signed,
)
from vit_colmap_tpu.ops.scoring import compute_saliency
from vit_colmap_tpu.utils.config import CameraConfig

logger = logging.getLogger(__name__)


@jax.jit
def _compact_valid_rows(desc: jax.Array, valid: jax.Array) -> jax.Array:
    """(B, N, D), (B, N) -> (B, N, D) with valid rows moved to the front
    (stable, order-preserving) so device rows align with the DB's compacted
    keypoint rows."""
    order = jnp.argsort(
        jnp.logical_not(valid).astype(jnp.int32), axis=1, stable=True
    )
    return jnp.take_along_axis(desc, order[..., None], axis=1)


class ViTExtractor(BaseExtractor):
    def __init__(
        self,
        weights_path: Optional[str] = None,
        backbone: str = "vitb14",
        max_keypoints: int = 4096,
        descriptor_dim: int = 128,
        saliency: str = "combined",
        nms_radius: int = 1,
        # "soft" ranks local maxima first but lets spread non-maxima fill
        # the keypoint budget — hard NMS on the coarse token grid yields
        # only ~100-150 strict maxima at 480x640 (34x45 tokens), which
        # starved wide-baseline scenes below COLMAP's 30-inlier init floor
        # (VERDICT r4 item 4).  See ops/detect.detect_keypoints.
        nms_mode: str = "soft",
        # Sub-token peak localization: separable quadratic fit through each
        # keypoint's 3x3 saliency neighborhood (ops/detect.quadratic_refine)
        # — at patch 14 a half-cell miss is ~7 px, the dominant term in the
        # frozen path's 2.0 deg pose error (RECON_VIT_r4).  Descriptors are
        # bilinearly sampled at the refined coordinates.
        refine: bool = True,
        bin_size: int = 2,
        k_per_bin: int = 4,
        image_batch: int = 4,
        dtype=jnp.bfloat16,
        seed: int = 0,
        pca_path: Optional[str] = None,
        pca_fit_images: int = 8,
        # "rgb" | "yuv420" | "yuv420c4" (4-bit packed chroma, 1.125 B/px);
        # see ops/transfer.py.
        transfer_format: str = "rgb",
        quantize: str = "none",  # "none" | "int8" (QKVO+MLP on int8 MXU)
        # "fixedmax_fused" | "fixedmax" | "flash" | "xla" | "auto" — the
        # fused packed-qkv kernel skips the per-head transposes (115 vs
        # 132 ms/stack in-model, round-5 sweep) and falls back to flash/XLA
        # off-TPU or for head_dim != 64.
        attn_impl: str = "fixedmax_fused",
        # Also emit match-ready L2-normalized float32 descriptors (invalid
        # rows zeroed) as a 5th output of extract_batch*: saves the
        # re-encode dispatch (~26 ms relay launch + compute) when matching
        # consumes device-resident descriptors directly.
        emit_float_desc: bool = False,
    ):
        self.backbone_name = backbone
        self.max_keypoints = max_keypoints
        self.descriptor_dim = descriptor_dim
        self.saliency = saliency
        self.nms_radius = nms_radius
        self.nms_mode = nms_mode
        self.refine = refine
        self.bin_size = bin_size
        self.k_per_bin = k_per_bin
        self.image_batch = image_batch
        self.pca_path = pca_path
        self.pca_fit_images = pca_fit_images
        self.transfer_format = transfer_format
        self.emit_float_desc = emit_float_desc

        # Frozen inference default: the fixed-max single-pass attention
        # kernel (no backward pass needed; 1.3x over generic flash on v5e).
        # Overridable for A/B measurement (profile_backbone's ablation put
        # XLA attention within ~9% in-stack — judge in the REAL program).
        self.model, self.cfg = make_backbone(
            backbone, dtype=dtype, attn_impl=attn_impl, quantize=quantize
        )
        key = jax.random.key(seed)
        if weights_path and Path(weights_path).is_dir():
            # Orbax checkpoint directory from ``training/train.py
            # --train-backbone``: the fine-tuned DINOv2 lives inside the
            # trainable pytree.  This is the frozen-ViT loop closure
            # (VERDICT r3 item 1): features learned by the fine-tuner drive
            # the frozen Harris/DoG + PCA extraction path.
            from vit_colmap_tpu.models.convert import load_backbone_from_orbax

            bb = load_backbone_from_orbax(str(weights_path))
            if bb is None:
                raise ValueError(
                    f"{weights_path} holds no backbone params (heads-only "
                    "checkpoint?); the frozen ViTExtractor needs a "
                    "--train-backbone checkpoint or a torch .pth file"
                )
            logger.info("Loaded fine-tuned backbone from %s", weights_path)
            self.params = bb
        elif weights_path:
            from vit_colmap_tpu.models.convert import load_torch_checkpoint

            logger.info("Loading backbone weights from %s", weights_path)
            self.params = load_torch_checkpoint(str(weights_path), self.cfg)
        else:
            logger.warning(
                "No weights provided; DINOv2 backbone is randomly initialized"
            )
            from vit_colmap_tpu.models.dinov2 import init_backbone_params

            self.params = init_backbone_params(self.model, key, 224, 224)
        # PCA projection: loaded from pca_path when present; otherwise fitted
        # deterministically in extract() (or lazily by the raw batch API).
        self._pca: Optional[tuple[jax.Array, jax.Array]] = None
        if pca_path is not None:
            from pathlib import Path as _P

            if _P(pca_path).exists():
                from vit_colmap_tpu.ops.interpolate import load_pca

                self._pca = load_pca(pca_path)
                logger.info("Loaded persisted PCA from %s", pca_path)
        self._forward = None  # compiled per (B, H, W)

    def set_pca(self, components: jax.Array, mean: jax.Array) -> None:
        """Install a shared PCA projection (e.g. fitted by another extractor)."""
        self._pca = (components, mean)

    # -------------------------------------------------------------- device
    def _build_forward(self):
        model = self.model
        saliency = self.saliency
        nms_radius = self.nms_radius
        nms_mode = self.nms_mode
        refine = self.refine
        bin_size = self.bin_size
        k_per_bin = self.k_per_bin
        k_total = self.max_keypoints
        emit_float = self.emit_float_desc

        # Multi-chip: images are data-parallel over the mesh's data axis.
        # The whole per-image program (backbone incl. Pallas flash attention
        # + detection) rides shard_map — pallas_call is opaque to the SPMD
        # partitioner, so automatic partitioning alone can't shard it
        # (SURVEY §2.4; VERDICT r1 item 3a).
        mesh = None
        if jax.device_count() > 1:
            from vit_colmap_tpu.parallel.mesh import get_mesh

            mesh = get_mesh()

        def _shard_over_batch(body, n_in_batch_args):
            """jit(body) single-device; jit(shard_map(body)) under a mesh.
            The first argument (params / replicated operands tuple) is
            replicated, the remaining args shard over 'data'."""
            if mesh is None:
                return jax.jit(body)
            from jax.sharding import PartitionSpec as PS

            try:
                from jax import shard_map
            except ImportError:  # older jax
                from jax.experimental.shard_map import shard_map

            in_specs = (PS(),) + (PS("data"),) * n_in_batch_args
            kw = dict(mesh=mesh, in_specs=in_specs, out_specs=PS("data"))
            try:  # Pallas flash attention inside -> no vma metadata
                return jax.jit(shard_map(body, check_vma=False, **kw))
            except TypeError:
                return jax.jit(shard_map(body, check_rep=False, **kw))

        transfer_format = self.transfer_format

        full_range = getattr(self, "_yuv_full_range", False)

        def _dense_body(params, images_u8):
            if transfer_format == "yuv420":
                from vit_colmap_tpu.ops.transfer import unpack_yuv420

                images_u8 = unpack_yuv420(images_u8, full_range=full_range)
            elif transfer_format == "yuv420c4":
                from vit_colmap_tpu.ops.transfer import unpack_yuv420_c4

                images_u8 = unpack_yuv420_c4(images_u8, full_range=full_range)
            x = preprocess(images_u8)
            out = model.apply(params, x)
            gh, gw = out["grid"]
            fmap = out["x_norm_patchtokens"].reshape(
                images_u8.shape[0], gh, gw, -1
            )
            return fmap

        def _detect(fmap, pca_comps, pca_mean):
            scores = compute_saliency(fmap.astype(jnp.float32), saliency)
            xy, sc, valid = detect_keypoints(
                scores,
                nms_radius=nms_radius,
                bin_size=bin_size,
                k_per_bin=k_per_bin,
                k_total=k_total,
                nms_mode=nms_mode,
            )
            if refine:
                from vit_colmap_tpu.ops.detect import quadratic_refine

                xy = xy + quadratic_refine(scores, xy)
            desc = bilinear_sample_batched(fmap.astype(jnp.float32), xy)
            desc = apply_pca(desc, pca_comps, pca_mean)
            desc = l2_normalize(desc)
            # Invertible signed encoding (decoded by MatchingConfig
            # descriptor_encoding="signed") — keeps negative PCA components,
            # unlike the reference's x512 clip (vit_extractor.py:243-250).
            desc_u8 = quantize_descriptors_signed(desc)
            if emit_float:
                # Match-ready f32 = the uint8 QUANTIZATION ROUND TRIP
                # (decode + mask + renormalize), not the raw float desc:
                # matching on it is bit-identical to matching the DB's
                # uint8 descriptors (pipeline/match.py
                # ``_decode_normalize_u8``), so the bench measures the
                # product's match semantics while skipping its re-encode
                # dispatch.
                dq = desc_u8.astype(jnp.float32) / 127.5 - 1.0
                dq = jnp.where(valid[..., None], dq, 0.0)
                dq = dq / jnp.maximum(
                    jnp.linalg.norm(dq, axis=-1, keepdims=True), 1e-8
                )
                return xy, sc, valid, desc_u8, dq
            return xy, sc, valid, desc_u8

        def _fused_body(replicated, images_u8):
            # One dispatch per batch once PCA is fitted — dispatch latency
            # over this environment's host<->device relay is material.
            params, pca_comps, pca_mean = replicated
            fmap = _dense_body(params, images_u8)
            return _detect(fmap, pca_comps, pca_mean)

        dense_features = _shard_over_batch(_dense_body, 1)
        detect_sharded = _shard_over_batch(
            lambda pca, fmap: _detect(fmap, *pca), 1
        )
        fused_sharded = _shard_over_batch(_fused_body, 1)

        def detect_and_describe(fmap, pca_comps, pca_mean):
            return detect_sharded((pca_comps, pca_mean), fmap)

        def fused(params, images_u8, pca_comps, pca_mean):
            return fused_sharded((params, pca_comps, pca_mean), images_u8)

        self._ndev = 1 if mesh is None else mesh.shape["data"]
        return dense_features, detect_and_describe, fused

    def _pad_batch(self, images_u8: np.ndarray) -> tuple[np.ndarray, int]:
        """Pad the image batch to a multiple of the mesh's data-axis size
        (zero images; their outputs are sliced away)."""
        ndev = getattr(self, "_ndev", 1)
        B0 = images_u8.shape[0]
        pad = (-B0) % ndev
        if pad:
            images_u8 = np.concatenate(
                [images_u8, np.zeros((pad, *images_u8.shape[1:]),
                                     images_u8.dtype)]
            )
        return images_u8, B0

    def extract_batch_async(self, images_u8: np.ndarray, packed: bool = False):
        """Dispatch one batch; returns device arrays (not synced) so callers
        can pipeline host->device transfers against compute.

        ``packed=True`` means ``images_u8`` is already I420-packed
        (B, H*3/2, W) — the native decoder's output — and skips host
        packing."""
        if self._forward is None:
            self._forward = self._build_forward()
        dense_features, detect_and_describe, fused = self._forward
        if not isinstance(images_u8, jax.Array):
            # Keep device-resident inputs device-resident (coercing a jax
            # array through numpy would round-trip it over the host link).
            images_u8 = np.asarray(images_u8)
        if not packed and self.transfer_format in ("yuv420", "yuv420c4"):
            from vit_colmap_tpu.ops.transfer import (
                pack_batch_yuv420,
                pack_batch_yuv420_c4,
            )

            fr = getattr(self, "_yuv_full_range", False)
            if self.transfer_format == "yuv420c4":
                images_u8 = pack_batch_yuv420_c4(images_u8, full_range=fr)
            elif fr:
                from vit_colmap_tpu.ops.transfer import pack_yuv420_full

                images_u8 = np.stack([pack_yuv420_full(im) for im in images_u8])
            else:
                images_u8 = pack_batch_yuv420(images_u8)
        images_u8, B0 = self._pad_batch(images_u8)
        if self._pca is None:
            fmap = dense_features(self.params, jnp.asarray(images_u8))
            flat = (
                fmap[:B0].astype(jnp.float32).reshape(-1, fmap.shape[-1])
            )
            self._pca = fit_pca(flat, self.descriptor_dim)
            logger.info(
                "Fitted PCA %d->%d on %d tokens",
                fmap.shape[-1],
                self.descriptor_dim,
                flat.shape[0],
            )
            out = detect_and_describe(fmap, *self._pca)
        else:
            out = fused(self.params, jnp.asarray(images_u8), *self._pca)
        if B0 != images_u8.shape[0]:
            out = tuple(o[:B0] for o in out)
        return out

    def device_extract_looped(self, staged: jax.Array, reps: int) -> jax.Array:
        """Run the fused extraction program ``reps`` times entirely on
        device as ONE dispatched program (a ``fori_loop``), returning a
        checksum scalar.

        This isolates TPU-native compute from host dispatch latency: on
        this environment's relay each program launch costs ~26 ms, so
        timing N separate ``extract_batch_async`` calls overstates device
        time (BENCH_r02's device-resident number read *below* the
        wire-inclusive one).  The loop body perturbs the input by the
        iteration index (uint8 wraparound) so XLA cannot hoist the
        loop-invariant extraction out of the loop, and only a scalar
        returns, so no output readback rides the measurement.

        ``staged`` must already be in the wire format the forward was
        built for (packed I420 when ``transfer_format == 'yuv420'``).
        """
        if self._forward is None:
            self._forward = self._build_forward()
        if self._pca is None:
            raise RuntimeError("fit PCA before benchmarking (extract once)")
        fused = self._forward[2]

        @partial(jax.jit, static_argnames="n")
        def loop(params, images, comps, mean, n):
            def body(i, acc):
                imgs = images + i.astype(jnp.uint8)
                _, sc, valid, desc = fused(params, imgs, comps, mean)[:4]
                return (
                    acc
                    + jnp.sum(sc, dtype=jnp.float32)
                    + jnp.sum(desc, dtype=jnp.int32).astype(jnp.float32)
                )

            return jax.lax.fori_loop(0, n, body, jnp.float32(0))

        return loop(self.params, staged, *self._pca, reps)

    def device_extract_pipelined(self, staged: jax.Array, reps: int):
        """Dispatch the fused extraction program ``reps`` times back-to-back
        (async) and block on the last output; returns wall seconds.

        Device-throughput measurement matching how production runs the
        program: dispatch i+1 is issued while the device still executes
        dispatch i, so only the first ~26 ms relay launch is exposed and no
        output readback rides the measurement.  (The ``fori_loop`` variant
        above measured ~15x slower than the SAME body as standalone
        dispatches — an XLA while-loop pessimization — and is kept only for
        A/B diagnosis; see EXTRACT_SWEEP_r3.)
        """
        import time as _time

        if self._forward is None:
            self._forward = self._build_forward()
        if self._pca is None:
            raise RuntimeError("fit PCA before benchmarking (extract once)")
        fused = self._forward[2]
        comps, mean = self._pca
        # Warm dispatch outside the timing (compile + first launch).
        # Sync via D2H materialization, NOT block_until_ready: on the axon
        # relay block_until_ready can return before the device finishes
        # (phantom sub-ms timings observed for 100+ ms programs); reading
        # a small output back is the only reliable barrier.  The scores
        # array (B, K) f32 is ~32 KB — amortized over ``reps`` dispatches
        # it adds <1 ms/rep of wire time.
        np.asarray(fused(self.params, staged, comps, mean)[1])
        t0 = _time.perf_counter()
        out = None
        for _ in range(reps):
            out = fused(self.params, staged, comps, mean)
        np.asarray(out[1])
        return _time.perf_counter() - t0

    def extract_batch(self, images_u8: np.ndarray):
        """(B, H, W, 3) uint8 RGB (H, W multiples of 14) ->
        (xy grid coords, scores, valid, uint8 desc) as numpy
        (+ float32 match-ready desc when ``emit_float_desc``)."""
        return tuple(
            np.asarray(a) for a in self.extract_batch_async(images_u8)
        )

    def _ensure_pca(self, rgbs_sorted: list[np.ndarray]) -> None:
        """Fit (or load) the PCA projection on a canonical image sample so
        descriptors are identical across runs and image orderings."""
        if self._pca is not None:
            return
        from vit_colmap_tpu.features.pca_store import (
            fit_pca_deterministic,
            resolve_pca,
        )

        if self._forward is None:
            self._forward = self._build_forward()
        dense_features = self._forward[0]

        def dense_fn(batch):
            if self.transfer_format in ("yuv420", "yuv420c4"):
                # The dense program consumes the wire format; pack with the
                # range convention it was built for.
                from vit_colmap_tpu.ops.transfer import (
                    pack_batch_yuv420,
                    pack_batch_yuv420_c4,
                    pack_yuv420_full,
                )

                fr = getattr(self, "_yuv_full_range", False)
                if self.transfer_format == "yuv420c4":
                    batch = pack_batch_yuv420_c4(batch, full_range=fr)
                elif fr:
                    batch = np.stack([pack_yuv420_full(im) for im in batch])
                else:
                    batch = pack_batch_yuv420(batch)
            padded, B0 = self._pad_batch(batch)
            return dense_features(self.params, jnp.asarray(padded))[:B0]

        self._pca = resolve_pca(
            self.pca_path,
            lambda: fit_pca_deterministic(
                dense_fn,
                rgbs_sorted,
                self.descriptor_dim,
                fit_images=self.pca_fit_images,
            ),
        )

    # ---------------------------------------------------------------- host
    @staticmethod
    def _map_coords(
        xy_grid: np.ndarray, resized_wh: tuple[int, int], orig_wh: tuple[int, int]
    ) -> np.ndarray:
        """Grid coords -> original image pixels with the +0.5 patch-center
        offset (reference ``vit_extractor.py:229-236``)."""
        rx = orig_wh[0] / resized_wh[0]
        ry = orig_wh[1] / resized_wh[1]
        x = (xy_grid[:, 0] + 0.5) * PATCH_SIZE * rx
        y = (xy_grid[:, 1] + 0.5) * PATCH_SIZE * ry
        return np.stack([x, y], axis=1).astype(np.float32)

    def extract(
        self,
        image_dir: Path,
        db_path: Path,
        camera_model: str,
        camera_params: Optional[list[float]] = None,
    ) -> None:
        import cv2

        # name -> (row-compacted device descriptors (N, D) uint8, count);
        # consumed by pipeline/match.py to match without re-uploading.
        self.device_cache: dict[str, tuple[jax.Array, int]] = {}

        image_dir = Path(image_dir)
        files = list_images(image_dir)
        if not files:
            logger.error("No images found in %s", image_dir)
            return

        db = ColmapDatabase(db_path)
        camera_ids: dict[tuple[int, int], int] = {}

        # Native decode path: JPEG/PNG -> I420 planes at target size in C++
        # (native/image_io.cc), skipping the cv2 RGB roundtrip and the host
        # pack.  Only for the YUV420 wire format; falls back to cv2 when the
        # library isn't built.  Must be decided BEFORE _build_forward: the
        # device unpack constants differ (full-range JFIF vs cv2 studio).
        native_io = None
        if (
            self.transfer_format in ("yuv420", "yuv420c4")
            and self._forward is None
        ):
            from vit_colmap_tpu.utils import native_io as _nio

            if _nio.load_native() is not None:
                native_io = _nio
                self._yuv_full_range = True

        # Group by original size so each group batches at one static shape.
        groups: dict[tuple[int, int], list[Path]] = {}
        imgs_cache: dict[Path, np.ndarray] = {}
        if native_io is not None:
            for f in files:
                wh = native_io.probe_size(f)
                if wh is None:
                    logger.warning("Unreadable image skipped: %s", f)
                    continue
                groups.setdefault((wh[1], wh[0]), []).append(f)
        else:
            for f in files:
                img = cv2.imread(str(f))
                if img is None:
                    logger.warning("Unreadable image skipped: %s", f)
                    continue
                rgb = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
                imgs_cache[f] = rgb
                groups.setdefault(rgb.shape[:2], []).append(f)

        # PCA is fitted on the first images in sorted-name order (NOT batch
        # arrival order) and persisted when pca_path is set, so descriptors
        # reproduce across runs/orderings (VERDICT r1 item 6).  The native
        # path decodes only the fit subset via cv2 (RGB needed host-side);
        # when a persisted PCA loads, no host decode happens at all.
        if self._pca is None:
            pca_loadable = bool(self.pca_path) and Path(self.pca_path).exists()
            if native_io is not None and not pca_loadable:
                for f in files[: self.pca_fit_images]:
                    img = cv2.imread(str(f))
                    if img is not None:
                        imgs_cache[f] = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
            if imgs_cache or pca_loadable:
                self._ensure_pca(
                    [imgs_cache[f] for f in files if f in imgs_cache]
                )

        for (oh, ow), gfiles in groups.items():
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

            # Dispatch every batch asynchronously first (device compute and
            # host->device transfers overlap the DB writes of earlier
            # batches), then sink results.  Under a mesh the batch rounds up
            # to the data-axis size so every chip gets an image.
            ndev = getattr(self, "_ndev", 1)
            B = ((self.image_batch + ndev - 1) // ndev) * ndev
            pending = []
            for start in range(0, len(gfiles), B):
                chunk = gfiles[start : start + B]
                if native_io is not None:
                    # C++ decode+resize straight into wire-format I420.
                    packed, ok = native_io.decode_batch_i420(
                        chunk, tw, th, pad_to=B, n_threads=2
                    )
                    ok = ok[: len(chunk)]
                    for f, good in zip(chunk, ok):
                        if not good:
                            logger.warning("Native decode failed: %s", f)
                    if not ok.any():
                        continue
                    if self.transfer_format == "yuv420c4":
                        # Repack the decoder's I420 into the 4-bit-chroma
                        # wire format (cheap host numpy; −25% H2D bytes).
                        from vit_colmap_tpu.ops.transfer import i420_to_c4

                        packed = i420_to_c4(packed)
                    batch, packed_flag = packed, True
                else:
                    ok = np.ones(len(chunk), bool)
                    batch = np.zeros((B, th, tw, 3), np.uint8)
                    for b, f in enumerate(chunk):
                        rgb = imgs_cache[f]
                        if (oh, ow) != (th, tw):
                            rgb = cv2.resize(
                                rgb, (tw, th), interpolation=cv2.INTER_AREA
                            )
                        batch[b] = rgb
                    packed_flag = False
                try:
                    pending.append(
                        (
                            chunk,
                            ok,
                            self.extract_batch_async(batch, packed=packed_flag),
                        )
                    )
                except Exception:
                    logger.exception("Extraction failed for batch at %s", chunk[0])
            for chunk, ok, (xy, sc, valid, desc) in pending:
                # Device handoff: keep row-compacted descriptors on device so
                # matching can consume them without the DB-read -> re-upload
                # round trip (pipeline/match.py ``device_descriptors``).
                desc_dev_c = _compact_valid_rows(desc, valid)
                xy, valid = np.asarray(xy), np.asarray(valid)
                desc_np = None  # read back lazily, only if rows are ragged
                for b, f in enumerate(chunk):
                    if not ok[b]:  # decode failure: skip, rows stay aligned
                        continue
                    v = valid[b]
                    cnt = int(v.sum())
                    kpts = self._map_coords(xy[b][v], (tw, th), (ow, oh))
                    image_id = db.add_image(f.name, camera_id=cam_id)
                    db.add_keypoints(image_id, kpts)
                    self.device_cache[f.name] = (desc_dev_c[b], cnt)
                    if desc_np is None:
                        desc_np = np.asarray(desc_dev_c)
                    db.add_descriptors(image_id, desc_np[b][:cnt])
        db.commit()
        db.close()
