"""Pallas TPU kernel: fused similarity-matmul + top-2 for descriptor matching.

The XLA path (:mod:`vit_colmap_tpu.ops.matching`) materializes the full
(N, M) cosine-similarity matrix in HBM before ``top_k`` — 64 MB per pair at
N = M = 4096.  This kernel tiles the matmul over (row-tile, col-tile) MXU
blocks and reduces each row tile's top-2 *inside* the kernel, so only
(N, M / TM) partials ever leave VMEM (~1.5 MB per pair): a ~40x cut in HBM
traffic for the matching stage, which is bandwidth-bound.

Design notes (see pallas_guide.md):
* grid = (pairs, N/TN, M/TM); every program computes one (TN, TM) similarity
  block with ``jnp.dot`` (MXU) and its per-row top-2 (VPU),
* each program writes its own output block — no cross-program accumulation,
  the tiny (N, M/TM) partial merge runs in XLA afterwards,
* cross-check reuses the same kernel with arguments swapped,
* ``interpret=True`` (auto on CPU) keeps unit tests hardware-independent.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

TN = 128  # minimum row tile
TM = 128  # minimum column tile


def _pick_tile(n: int, preferred: int = 512, minimum: int = 128) -> int:
    """Largest power-of-two tile <= preferred that divides n.

    Bigger tiles cut the number of accumulator-merge steps (the kernel's
    measured bottleneck): 512/512 tiles are 27% faster than 128/128 at
    16x4096^2x128 on v5e (28.5 vs 39.0 ms).
    """
    t = preferred
    while t > minimum and n % t != 0:
        t //= 2
    return t if n % t == 0 else minimum


def _make_topk2_kernel(tn: int, tm: int):
    def kernel(d1_ref, d2_ref, v2_ref, vals_ref, idx_ref):
        """Accumulates running (best, second, best_idx) across m-tiles.

        The output blocks are revisited for every m step (their index_map
        ignores m), so the running top-2 merge happens in fast memory; HBM
        only sees the final block.  Outputs are (tn, 128) tiles with the
        payload in columns 0..1 (tiling rules require 128 lanes).
        """
        m = pl.program_id(2)
        d1 = d1_ref[0]  # (tn, D) — blocks carry a leading (1,) pair dim
        d2 = d2_ref[0]  # (tm, D)
        v2 = v2_ref[0]  # (1, tm)
        sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
        sim = jnp.where(v2 > 0, sim, -2.0)
        # Manual top-2 (lax.top_k has no Pallas TPU lowering): max, mask the
        # argmax column (first occurrence on ties, like argmax), max again.
        local_b = jnp.max(sim, axis=1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        local_i_rel = jnp.min(
            jnp.where(sim >= local_b[:, None], col_ids, tm), axis=1
        )
        sim_wo = jnp.where(col_ids == local_i_rel[:, None], -2.0, sim)
        local_s = jnp.max(sim_wo, axis=1)
        local_i = local_i_rel + m * tm

        @pl.when(m == 0)
        def _():
            vals_ref[0] = jnp.full(vals_ref.shape[1:], -2.0, jnp.float32)
            idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)

        b_old = vals_ref[0, :, 0]
        s_old = vals_ref[0, :, 1]
        i_old = idx_ref[0, :, 0]
        new_b = jnp.maximum(b_old, local_b)
        new_s = jnp.maximum(
            jnp.minimum(b_old, local_b), jnp.maximum(s_old, local_s)
        )
        new_i = jnp.where(local_b > b_old, local_i, i_old)
        vals_ref[0, :, 0] = new_b
        vals_ref[0, :, 1] = new_s
        idx_ref[0, :, 0] = new_i

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_topk2(
    d1: jax.Array,  # (P, N, D) float32, rows L2-normalized
    d2: jax.Array,  # (P, M, D)
    valid2: jax.Array,  # (P, M) bool
    interpret: bool = False,
):
    """Per-row (best, second, best_idx) of d1 @ d2.T with invalid columns
    masked.  N, M, D must be multiples of the 128 tile."""
    P, N, D = d1.shape
    M = d2.shape[1]
    assert N % TN == 0 and M % TM == 0, (N, M)
    tn = _pick_tile(N)
    tm = _pick_tile(M)
    n_mt = M // tm
    v2 = valid2.astype(jnp.float32).reshape(P, 1, M)

    grid = (P, N // tn, n_mt)
    out_shape = [
        jax.ShapeDtypeStruct((P, N, 128), jnp.float32),  # cols 0/1: best/sec
        jax.ShapeDtypeStruct((P, N, 128), jnp.int32),  # col 0: best idx
    ]
    vals, idx = pl.pallas_call(
        _make_topk2_kernel(tn, tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, D), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, tm, D), lambda p, n, m: (p, m, 0)),
            pl.BlockSpec((1, 1, tm), lambda p, n, m: (p, 0, m)),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, 128), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, tn, 128), lambda p, n, m: (p, n, 0)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(d1, d2, v2)
    return vals[..., 0], vals[..., 1], idx[..., 0]


def _make_topk2_int8_kernel(tn: int, tm: int):
    """int8 variant: similarity from ONE int8 MXU matmul + affine correction.

    For uint8 descriptors q with an affine decode, cosine(u1, u2) is
    computed EXACTLY from a = q - 128 (int8):
        u1 . u2 = alpha * (a1 . a2) + beta * (sum(a1) + sum(a2)) + gamma
        cos     = (u1 . u2) * inv|u1| * inv|u2|
    Per-row sums and inverse norms are precomputed on device
    (ops.matching.prepare_int8_descriptors).  int8 halves the descriptor
    HBM traffic; measured neutral vs f32 at 4096^2x128 (top-2 bound).
    """

    def kernel(
        a1_ref, a2_ref, s1_ref, s2_ref, inv1_ref, inv2_ref, coef_ref,
        vals_ref, idx_ref,
    ):
        m = pl.program_id(2)
        a1 = a1_ref[0]  # (tn, D) int8
        a2 = a2_ref[0]  # (tm, D) int8
        s1 = s1_ref[0]  # (tn, 1) f32
        s2 = s2_ref[0]  # (1, tm) f32
        inv1 = inv1_ref[0]  # (tn, 1) f32
        inv2 = inv2_ref[0]  # (1, tm) f32 — 0 for invalid columns
        alpha = coef_ref[0, 0]
        beta = coef_ref[0, 1]
        gamma = coef_ref[0, 2]

        acc = jnp.dot(a1, a2.T, preferred_element_type=jnp.int32)  # MXU int8
        dot = alpha * acc.astype(jnp.float32) + beta * (s1 + s2) + gamma
        sim = dot * inv1 * inv2
        sim = jnp.where(inv2 > 0, sim, -2.0)

        local_b = jnp.max(sim, axis=1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        local_i_rel = jnp.min(
            jnp.where(sim >= local_b[:, None], col_ids, tm), axis=1
        )
        sim_wo = jnp.where(col_ids == local_i_rel[:, None], -2.0, sim)
        local_s = jnp.max(sim_wo, axis=1)
        local_i = local_i_rel + m * tm

        @pl.when(m == 0)
        def _():
            vals_ref[0] = jnp.full(vals_ref.shape[1:], -2.0, jnp.float32)
            idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)

        b_old = vals_ref[0, :, 0]
        s_old = vals_ref[0, :, 1]
        i_old = idx_ref[0, :, 0]
        new_b = jnp.maximum(b_old, local_b)
        new_s = jnp.maximum(
            jnp.minimum(b_old, local_b), jnp.maximum(s_old, local_s)
        )
        new_i = jnp.where(local_b > b_old, local_i, i_old)
        vals_ref[0, :, 0] = new_b
        vals_ref[0, :, 1] = new_s
        idx_ref[0, :, 0] = new_i

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_topk2_int8(
    a1: jax.Array,  # (P, N, D) int8 = q - 128
    a2: jax.Array,  # (P, M, D)
    s1: jax.Array,  # (P, N) f32 row sums of a
    s2: jax.Array,  # (P, M)
    inv1: jax.Array,  # (P, N) f32 inverse norms of decoded u
    inv2: jax.Array,  # (P, M) — 0 marks invalid rows
    coef: jax.Array,  # (3,) f32: alpha, beta, gamma
    interpret: bool = False,
):
    P, N, D = a1.shape
    M = a2.shape[1]
    assert N % TN == 0 and M % TM == 0, (N, M)
    tn = _pick_tile(N)
    tm = _pick_tile(M)
    n_mt = M // tm
    grid = (P, N // tn, n_mt)
    coef2 = jnp.broadcast_to(coef.reshape(1, 3), (1, 3))
    out_shape = [
        jax.ShapeDtypeStruct((P, N, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, N, 128), jnp.int32),
    ]
    vals, idx = pl.pallas_call(
        _make_topk2_int8_kernel(tn, tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, D), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, tm, D), lambda p, n, m: (p, m, 0)),
            pl.BlockSpec((1, tn, 1), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, 1, tm), lambda p, n, m: (p, 0, m)),
            pl.BlockSpec((1, tn, 1), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, 1, tm), lambda p, n, m: (p, 0, m)),
            pl.BlockSpec((1, 3), lambda p, n, m: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, 128), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, tn, 128), lambda p, n, m: (p, n, 0)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(
        a1,
        a2,
        s1[..., None],
        s2[:, None, :],
        inv1[..., None],
        inv2[:, None, :],
        coef2,
    )
    return vals[..., 0], vals[..., 1], idx[..., 0]


@functools.partial(
    jax.jit, static_argnames=("cross_check", "interpret")
)
def pallas_match_pairs_int8(
    a1, a2, s1, s2, inv1, inv2, coef,
    valid1,  # (P, N) bool — for the keep mask (inv encodes validity too)
    max_ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
    interpret: bool = False,
):
    """int8 drop-in for pallas_match_pairs; same COLMAP filter semantics."""
    best, second, best_idx = pallas_topk2_int8(
        a1, a2, s1, s2, inv1, inv2, coef, interpret=interpret
    )
    dist_best = jnp.arccos(jnp.clip(best, -1.0, 1.0))
    dist_second = jnp.arccos(jnp.clip(second, -1.0, 1.0))
    keep = valid1
    keep &= dist_best <= max_distance
    keep &= dist_best <= max_ratio * dist_second
    if cross_check:
        _, _, i21 = pallas_topk2_int8(
            a2, a1, s2, s1, inv2, inv1, coef, interpret=interpret
        )
        n = a1.shape[1]
        back = jnp.take_along_axis(i21, best_idx, axis=1)
        keep &= back == jnp.arange(n, dtype=back.dtype)[None]
    return jnp.where(keep, best_idx, -1).astype(jnp.int32)


def _make_topk2_colmax_kernel(tn: int, tm: int):
    """Fused forward top-2 + cross-check partials in ONE similarity pass.

    The plain cross-check runs the kernel twice (d1@d2.T then d2@d1.T),
    recomputing the identical similarity matrix transposed.  Here every
    (tn, tm) block additionally reduces its per-COLUMN (max, argmax-row,
    rows masked by valid1) into partial outputs keyed by (n, m) — no
    revisiting, so the (P, N/tn, M) partials stream to HBM (a few MB) and a
    tiny XLA merge over N/tn recovers the exact column argmax.  Tie
    semantics match the two-pass version bit-for-bit: first row achieving
    the max wins (within-block min-iota + across-block first-occurrence
    argmax).
    """

    def kernel(d1_ref, d2_ref, v1_ref, v2_ref, vals_ref, idx_ref,
               cvals_ref, cidx_ref):
        m = pl.program_id(2)
        n = pl.program_id(1)
        d1 = d1_ref[0]  # (tn, D)
        d2 = d2_ref[0]  # (tm, D)
        v1 = v1_ref[0]  # (tn, 1)
        v2 = v2_ref[0]  # (1, tm)
        sim = jnp.dot(d1, d2.T, preferred_element_type=jnp.float32)
        sim = jnp.where(v2 > 0, sim, -2.0)

        # --- per-row top-2 (same as _make_topk2_kernel)
        local_b = jnp.max(sim, axis=1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 1)
        local_i_rel = jnp.min(
            jnp.where(sim >= local_b[:, None], col_ids, tm), axis=1
        )
        sim_wo = jnp.where(col_ids == local_i_rel[:, None], -2.0, sim)
        local_s = jnp.max(sim_wo, axis=1)
        local_i = local_i_rel + m * tm

        @pl.when(m == 0)
        def _():
            vals_ref[0] = jnp.full(vals_ref.shape[1:], -2.0, jnp.float32)
            idx_ref[0] = jnp.zeros(idx_ref.shape[1:], jnp.int32)

        b_old = vals_ref[0, :, 0]
        s_old = vals_ref[0, :, 1]
        i_old = idx_ref[0, :, 0]
        new_b = jnp.maximum(b_old, local_b)
        new_s = jnp.maximum(
            jnp.minimum(b_old, local_b), jnp.maximum(s_old, local_s)
        )
        new_i = jnp.where(local_b > b_old, local_i, i_old)
        vals_ref[0, :, 0] = new_b
        vals_ref[0, :, 1] = new_s
        idx_ref[0, :, 0] = new_i

        # --- per-column max/argmax partial over this row block
        sim_r = jnp.where(v1 > 0, sim, -2.0)  # mask invalid d1 rows
        col_b = jnp.max(sim_r, axis=0)  # (tm,)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, sim.shape, 0)
        col_i_rel = jnp.min(
            jnp.where(sim_r >= col_b[None, :], row_ids, tn), axis=0
        )
        cvals_ref[0, 0, 0] = col_b
        cidx_ref[0, 0, 0] = col_i_rel + n * tn

    return kernel


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_topk2_colmax(
    d1: jax.Array,  # (P, N, D) float32, rows L2-normalized
    d2: jax.Array,  # (P, M, D)
    valid1: jax.Array,  # (P, N) bool
    valid2: jax.Array,  # (P, M) bool
    interpret: bool = False,
):
    """(best, second, best_idx, col_best_row): row top-2 AND the exact
    column argmax (cross-check backward direction) in one similarity pass."""
    P, N, D = d1.shape
    M = d2.shape[1]
    assert N % TN == 0 and M % TM == 0, (N, M)
    tn = _pick_tile(N)
    tm = _pick_tile(M)
    n_nt, n_mt = N // tn, M // tm
    v1 = valid1.astype(jnp.float32).reshape(P, N, 1)
    v2 = valid2.astype(jnp.float32).reshape(P, 1, M)

    grid = (P, n_nt, n_mt)
    # Column partials carry a singleton axis before the minor dim: TPU
    # lowering requires the block's last-two dims to divide (8, 128) or
    # equal the array dims — (1, 1, 1, tm) on (P, n_nt, 1, M) satisfies
    # that (1 == dim, tm % 128 == 0), while (1, 1, tm) on (P, n_nt, M)
    # does not (1 != n_nt, 1 % 8 != 0).
    out_shape = [
        jax.ShapeDtypeStruct((P, N, 128), jnp.float32),
        jax.ShapeDtypeStruct((P, N, 128), jnp.int32),
        jax.ShapeDtypeStruct((P, n_nt, 1, M), jnp.float32),
        jax.ShapeDtypeStruct((P, n_nt, 1, M), jnp.int32),
    ]
    vals, idx, cvals, cidx = pl.pallas_call(
        _make_topk2_colmax_kernel(tn, tm),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, tn, D), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, tm, D), lambda p, n, m: (p, m, 0)),
            pl.BlockSpec((1, tn, 1), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, 1, tm), lambda p, n, m: (p, 0, m)),
        ],
        out_specs=[
            pl.BlockSpec((1, tn, 128), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, tn, 128), lambda p, n, m: (p, n, 0)),
            pl.BlockSpec((1, 1, 1, tm), lambda p, n, m: (p, n, 0, m)),
            pl.BlockSpec((1, 1, 1, tm), lambda p, n, m: (p, n, 0, m)),
        ],
        out_shape=out_shape,
        interpret=interpret,
    )(d1, d2, v1, v2)
    cvals = cvals[:, :, 0]  # (P, n_nt, M)
    cidx = cidx[:, :, 0]
    # Merge column partials over the N/tn row blocks (first occurrence of
    # the max wins — argmax returns the lowest block, matching the
    # two-pass kernel's tie rule).
    blk = jnp.argmax(cvals, axis=1)  # (P, M)
    col_row = jnp.take_along_axis(cidx, blk[:, None, :], axis=1)[:, 0]
    return vals[..., 0], vals[..., 1], idx[..., 0], col_row


@functools.partial(
    jax.jit, static_argnames=("cross_check", "interpret", "fused_cross")
)
def pallas_match_pairs(
    d1: jax.Array,  # (P, N, D)
    d2: jax.Array,  # (P, M, D)
    valid1: jax.Array,  # (P, N)
    valid2: jax.Array,  # (P, M)
    max_ratio: float = 0.8,
    max_distance: float = 0.7,
    cross_check: bool = True,
    interpret: bool = False,
    fused_cross: bool = True,
):
    """Drop-in replacement for ``match_pairs_batched`` -> (P, N) int32."""
    if cross_check and fused_cross:
        best, second, best_idx, col_row = pallas_topk2_colmax(
            d1, d2, valid1, valid2, interpret=interpret
        )
    else:
        best, second, best_idx = pallas_topk2(
            d1, d2, valid2, interpret=interpret
        )

    dist_best = jnp.arccos(jnp.clip(best, -1.0, 1.0))
    dist_second = jnp.arccos(jnp.clip(second, -1.0, 1.0))
    keep = valid1
    keep &= dist_best <= max_distance
    keep &= dist_best <= max_ratio * dist_second

    if cross_check:
        n = d1.shape[1]
        if fused_cross:
            i21 = col_row
        else:
            _, _, i21 = pallas_topk2(d2, d1, valid1, interpret=interpret)
        # mutual: the best column's best row must be this row.
        back = jnp.take_along_axis(i21, best_idx, axis=1)
        keep &= back == jnp.arange(n, dtype=back.dtype)[None]

    return jnp.where(keep, best_idx, -1).astype(jnp.int32)
