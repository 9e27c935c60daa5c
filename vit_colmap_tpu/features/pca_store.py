"""Deterministic, persistable PCA fitting shared by ViT-family extractors.

Replaces the reference's lazy first-batch SVD
(``/root/reference/vit_colmap/features/vit_extractor.py:588-653``), which made
descriptors depend on image arrival order and was re-fit separately by the
hybrid extractor.  Here the projection is fitted ONCE on a canonical sample —
the first ``fit_images`` files in sorted-name order — optionally saved to an
``.npz`` beside the model weights, and shared by every extractor that loads
the same path.
"""

from __future__ import annotations

import logging
from pathlib import Path
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from vit_colmap_tpu.models.dinov2 import patch_grid_size
from vit_colmap_tpu.ops.interpolate import fit_pca, load_pca, save_pca

logger = logging.getLogger(__name__)

MAX_FIT_TOKENS = 262_144  # cap covariance accumulation work


def fit_pca_deterministic(
    dense_fn: Callable[[np.ndarray], jax.Array],
    rgbs: Sequence[np.ndarray],
    out_dim: int,
    fit_images: int = 8,
) -> tuple[jax.Array, jax.Array]:
    """Fit PCA on the patch tokens of a canonical image subset.

    ``dense_fn`` maps a (B, H, W, 3) uint8 batch (H, W multiples of the patch
    size) to a (B, gh, gw, C) float feature map.  ``rgbs`` must already be in
    a canonical order (callers pass images in sorted-filename order); only the
    first ``fit_images`` entries are used, resized to patch-aligned shapes.
    Tokens beyond MAX_FIT_TOKENS are dropped by a fixed stride so the fit cost
    is bounded and still deterministic.
    """
    import cv2

    subset = list(rgbs[: max(1, fit_images)])
    groups: dict[tuple[int, int], list[np.ndarray]] = {}
    for rgb in subset:
        oh, ow = rgb.shape[:2]
        th, tw = patch_grid_size(oh, ow)
        if (oh, ow) != (th, tw):
            rgb = cv2.resize(rgb, (tw, th), interpolation=cv2.INTER_AREA)
        groups.setdefault((th, tw), []).append(rgb)

    token_chunks: list[np.ndarray] = []
    for (th, tw), imgs in sorted(groups.items()):
        fmap = dense_fn(np.stack(imgs))
        flat = np.asarray(fmap, dtype=np.float32).reshape(-1, fmap.shape[-1])
        token_chunks.append(flat)
    tokens = np.concatenate(token_chunks, axis=0)
    if tokens.shape[0] > MAX_FIT_TOKENS:
        stride = int(np.ceil(tokens.shape[0] / MAX_FIT_TOKENS))
        tokens = tokens[::stride]
    logger.info("Fitting PCA %d->%d on %d tokens from %d images",
                tokens.shape[1], out_dim, tokens.shape[0], len(subset))
    return fit_pca(jnp.asarray(tokens), out_dim)


def resolve_pca(
    pca_path: Optional[str],
    fit: Callable[[], tuple[jax.Array, jax.Array]],
) -> tuple[jax.Array, jax.Array]:
    """Load a persisted PCA if ``pca_path`` exists; otherwise run ``fit()``
    and persist the result to ``pca_path`` (when given) for reuse."""
    if pca_path and Path(pca_path).exists():
        logger.info("Loading persisted PCA from %s", pca_path)
        return load_pca(pca_path)
    comps, mean = fit()
    if pca_path:
        Path(pca_path).parent.mkdir(parents=True, exist_ok=True)
        save_pca(pca_path, comps, mean)
        logger.info("Saved fitted PCA to %s", pca_path)
    return comps, mean
