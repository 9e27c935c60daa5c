"""Exhaustive descriptor matching as batched XLA/MXU programs.

Replaces the reference's native ``pycolmap.match_exhaustive`` (invoked at
``pipeline/run_pipeline.py:356-363``; semantics configured at
``utils/config.py:54-96``) with a TPU-native design:

* descriptors of ALL images are padded to a fixed ``(num_images, N_max, D)``
  tensor with validity masks (ragged counts -> static shapes, SURVEY.md §7),
* each image pair is one row of a batched similarity matmul that runs on the
  MXU, followed by top-2 selection and COLMAP-compatible ratio / distance /
  cross-check filtering,
* pairs are vmapped into a single program and sharded across chips over a
  ``pairs`` mesh axis (see ``vit_colmap_tpu.parallel``).

COLMAP-matching semantics reproduced (SiftMatchingOptions): descriptors are
L2-normalized; similarity is the cosine dot product; the descriptor distance
is the *angular* distance ``acos(sim)``; a match is kept iff
``acos(best) <= max_distance`` and ``acos(best) <= max_ratio * acos(second)``
and (optionally) it is a mutual nearest neighbor.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def normalize_descriptors(desc: jax.Array) -> jax.Array:
    """uint8/float descriptors -> L2-normalized float32 rows."""
    d = desc.astype(jnp.float32)
    norm = jnp.linalg.norm(d, axis=-1, keepdims=True)
    return d / jnp.maximum(norm, 1e-8)


@partial(jax.jit, static_argnames=("cross_check",))
def match_pair(
    d1: jax.Array,  # (N, D) float32, L2-normalized rows
    d2: jax.Array,  # (M, D) float32, L2-normalized rows
    valid1: jax.Array,  # (N,) bool
    valid2: jax.Array,  # (M,) bool
    max_ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
) -> jax.Array:
    """Match one padded descriptor pair.

    Returns (N,) int32: for each keypoint in image 1 the matched index in
    image 2, or -1.  Fixed output shape; the host compacts to (R, 2).
    """
    # (N, M) cosine similarity — the MXU-heavy op.
    sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
    neg = jnp.float32(-2.0)
    sim = jnp.where(valid2[None, :], sim, neg)

    top2, idx2 = jax.lax.top_k(sim, 2)
    best_sim, second_sim = top2[:, 0], top2[:, 1]
    best_idx = idx2[:, 0]

    # Angular distances (COLMAP's acos metric on normalized descriptors).
    dist_best = jnp.arccos(jnp.clip(best_sim, -1.0, 1.0))
    dist_second = jnp.arccos(jnp.clip(second_sim, -1.0, 1.0))

    keep = valid1
    keep &= dist_best <= max_distance
    keep &= dist_best <= max_ratio * dist_second

    if cross_check:
        sim_t = jnp.where(valid1[:, None], sim, neg)
        best21 = jnp.argmax(sim_t, axis=0)  # (M,) best row for each column
        n = d1.shape[0]
        mutual = best21[best_idx] == jnp.arange(n, dtype=best21.dtype)
        keep &= mutual

    return jnp.where(keep, best_idx, -1).astype(jnp.int32)


@partial(jax.jit, static_argnames=("cross_check",))
def match_pairs_batched(
    d1: jax.Array,  # (P, N, D)
    d2: jax.Array,  # (P, M, D)
    valid1: jax.Array,  # (P, N)
    valid2: jax.Array,  # (P, M)
    max_ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
) -> jax.Array:
    """vmap of :func:`match_pair` over a batch of image pairs -> (P, N)."""
    fn = partial(
        match_pair,
        max_ratio=max_ratio,
        max_distance=max_distance,
        cross_check=cross_check,
    )
    return jax.vmap(fn)(d1, d2, valid1, valid2)


def prepare_int8_descriptors(desc_u8: jax.Array, valid: jax.Array, encoding: str):
    """uint8 descriptors -> exact int8-matmul matching operands.

    Decoded descriptors are an affine map of q: ``u = q`` (unsigned /
    SIFT-style) or ``u = 2q - 255`` (the signed ViT encoding, scaled by 2 to
    stay integral — cosine is scale-invariant).  With ``a = q - 128`` (int8):

        u1 . u2 = alpha * (a1 . a2) + beta * (sum(a1) + sum(a2)) + gamma

    where (alpha, beta, gamma) = (1, 128, 128^2 D) for unsigned and
    (4, 2, D) for signed — EXACT integer identities, so the int8 MXU path
    reproduces float cosine up to normalization rounding.

    Returns (a int8 (..., N, D), sums f32 (..., N), inv_norms f32 (..., N)
    with 0 marking invalid rows, coef f32 (3,)).
    """
    q = desc_u8.astype(jnp.int32)
    a = (q - 128).astype(jnp.int8)
    s = jnp.sum(q - 128, axis=-1).astype(jnp.float32)
    D = desc_u8.shape[-1]
    if encoding == "signed":
        u = (2 * q - 255).astype(jnp.float32)
        coef = jnp.array([4.0, 2.0, float(D)], jnp.float32)
    else:
        u = q.astype(jnp.float32)
        coef = jnp.array([1.0, 128.0, 128.0 * 128.0 * D], jnp.float32)
    norms = jnp.linalg.norm(u, axis=-1)
    inv = jnp.where(valid & (norms > 1e-6), 1.0 / jnp.maximum(norms, 1e-6), 0.0)
    return a, s, inv.astype(jnp.float32), coef


def resolve_use_pallas(use_pallas: bool | None = None) -> bool:
    """Auto-select the Pallas matching kernel on TPU-like backends.

    Measured on a v5e chip: 170.7 vs 77.5 pairs/s at 8x4096x4096x128 — the
    fused top-2 avoids materializing the similarity matrix in HBM.
    """
    if use_pallas is not None:
        return use_pallas
    import jax

    return jax.default_backend() not in ("cpu", "gpu")


def get_pair_matcher(use_pallas: bool | None = None):
    """Return a ``(d1, d2, v1, v2, max_ratio, max_distance, cross_check) ->
    (P, N) int32`` matcher: the Pallas kernel on TPU, XLA elsewhere.

    The Pallas path requires N, M, D to be multiples of 128 (the match
    driver pads to pow2 >= 128 already).
    """
    if resolve_use_pallas(use_pallas):
        import jax as _jax

        from vit_colmap_tpu.ops.pallas.match_kernel import pallas_match_pairs

        # Interpret mode keeps the kernel runnable on the CPU backend
        # (virtual-mesh tests); on TPU it compiles for real.
        interpret = _jax.default_backend() == "cpu"

        def matcher(
            d1, d2, v1, v2,
            max_ratio=0.8, max_distance=0.7, cross_check=True,
        ):
            if d1.shape[-1] % 128 == 0 and d1.shape[-2] % 128 == 0:
                return pallas_match_pairs(
                    d1, d2, v1, v2, max_ratio, max_distance, cross_check,
                    interpret=interpret,
                )
            return match_pairs_batched(
                d1, d2, v1, v2, max_ratio, max_distance, cross_check
            )

        return matcher
    return match_pairs_batched


def compact_matches(match_idx: np.ndarray, n_valid1: int) -> np.ndarray:
    """Host-side: (N,) row->col match indices with -1 padding -> (R, 2) uint32."""
    match_idx = np.asarray(match_idx[:n_valid1])
    rows = np.nonzero(match_idx >= 0)[0]
    return np.stack([rows, match_idx[rows]], axis=1).astype(np.uint32)


_PACK_SENTINEL = np.int32(2**31 - 1)  # sorts after any packed (row, col)


@jax.jit
def compact_matches_device(match_idx: jax.Array):
    """Device-side compaction of a (P, N) match array.

    Packs each match as ``(row << 16) | col`` (both < 32768 by the driver's
    pow2 padding cap) and sorts matches to the front of every row, so the
    host only needs to read back ``counts`` (P ints) plus a short prefix of
    ``packed`` instead of the full (P, N) array.  Over this environment's
    ~8 MB/s device->host relay that is the difference between ~32 ms and
    ~2 ms per 16-pair batch (see docs/PERFORMANCE.md).

    Returns ``(counts (P,) int32, packed (P, N) int32)`` where row p's first
    ``counts[p]`` entries are its matches in ascending-row order (the same
    order :func:`compact_matches` produces).
    """
    n = match_idx.shape[-1]
    rows = jnp.arange(n, dtype=jnp.int32)
    matched = match_idx >= 0
    counts = matched.sum(axis=-1).astype(jnp.int32)
    packed = jnp.where(
        matched, (rows << 16) | match_idx, jnp.int32(_PACK_SENTINEL)
    )
    # Sort keys are (row, col) lexicographic for matches, sentinel last.
    return counts, jnp.sort(packed, axis=-1)


def unpack_matches(packed_row: np.ndarray, count: int) -> np.ndarray:
    """Host-side: one row of ``compact_matches_device`` output -> (R, 2)."""
    p = np.asarray(packed_row[:count]).astype(np.uint32)
    return np.stack([p >> 16, p & 0xFFFF], axis=1).astype(np.uint32)
