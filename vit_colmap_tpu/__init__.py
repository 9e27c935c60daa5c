"""vit_colmap_tpu — TPU-native learned-feature SfM framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
``randyjhc/vit-colmap``: ViT (DINOv2-style) feature extraction, saliency-based
keypoint detection, exhaustive descriptor matching, two-view geometric
verification, incremental structure-from-motion with bundle adjustment, a
COLMAP-schema SQLite database, and a self-supervised training stack for a
keypoint/descriptor head — all designed TPU-first (device meshes, pjit,
Pallas kernels) rather than ported from the reference's CUDA/torch code.
"""

__version__ = "0.1.0"
