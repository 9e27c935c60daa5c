"""Fixed-max flash attention for frozen-backbone inference on TPU.

Replaces the generic ``jax.experimental.pallas.ops.tpu.flash_attention`` in
the ViT extractor's hot path (reference hot loop:
``/root/reference/vit_colmap/features/vit_extractor.py:729-762``).  The
generic kernel spends its time on VPU softmax bookkeeping — running max,
accumulator rescaling every kv block — and on pad compute (q2048/k1024
blocks pad 9,690 tokens to 10,240 on both axes: ~12% wasted MXU work).

This kernel exploits two facts about *inference on a frozen model*:

1. Attention logits are bounded (LayerNorm'd q/k, fixed weights), so the
   numerically-safe running max can be dropped entirely: softmax is
   shift-invariant, so any shared constant factor cancels in acc/denom,
   and a clamp at 100 (in the exp2 domain) guards fp32 overflow — a
   frozen ViT's scaled logits stay far below it.  This deletes the
   per-block max pass, the comparison, and the accumulator rescale — the
   VPU work that capped the generic kernel at ~72 TFLOP/s.  The softmax
   scale and the exp->exp2 conversion are prefolded into q (one multiply
   per q element instead of one per score element).

2. The softmax denominator is a row-sum of p, which the MXU computes for
   free: V is extended with a ones column to 128 lanes (a (bq, bkv) @
   (bkv, 64) matmul already pads output lanes to 128, so the extension
   costs zero MXU time), making ``acc = p @ [V | 1 | 0]`` yield both the
   numerator and the denominator in one op.  The VPU does exp2 and
   nothing else.

Measured on v5e at the pipeline shape (B=2, H=12, N=9690, d=64):
4.00 ms/layer (144 TFLOP/s on useful FLOPs) vs 8.82 ms for the
best-tuned generic flash kernel — 2.2x, and within 13% of the raw
QK+PV matmul-pair rate (165 TFLOP/s) measured outside any kernel.

Inference-only: no backward pass.  Training uses the generic flash kernel
(``models/dinov2._flash_attention``) which has a VJP.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Safety clamp on the exp2 argument: exp2(100) * N * |v| < 2^128 (fp32 max)
# for realistic activations; a LayerNorm'd frozen ViT's logits stay far
# below 100 in the exp2 domain (typical |logit * scale * log2e| < 45).
_CLAMP = 100.0

LOG2E = math.log2(math.e)

# Block sizes: judged by IN-MODEL backbone time (scan-chained standalone
# timings amortize the wrapper ops and mislead): q2048/kv1024 168 ms vs
# q1024 193 ms vs q512 176 ms per vitb14 2-image forward on v5e.
_BLOCK_Q = 2048
_BLOCK_KV = 1024


def _kernel(q_ref, k_ref, v_ref, o_ref, acc_ref, *, n_valid, bkv, nkv):
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q = q_ref[0]          # (bq, d) bf16, scale * log2(e) prefolded into q
    k = k_ref[0]          # (bkv, d) bf16
    # MXU: scores in fp32 (contraction d=64 runs at full matmul rate).
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (bq, bkv), already in exp2 domain
    # No max subtraction: numerator and denominator share any constant
    # factor 2^-c, so it cancels in acc/denom.  The clamp alone guards
    # fp32 overflow (exp2(100)*N*|v| < 2^128 for realistic activations).
    p = jnp.exp2(jnp.minimum(s, _CLAMP))

    # [V | 1 | 0] built per block IN VMEM (a (bkv, 128) copy — building it
    # host-side materialized a full (BH, N, 128) HBM tensor per call,
    # ~5 ms/layer of wrapper traffic).  ones at col 64 -> the PV matmul
    # accumulates the softmax denominator in acc[:, 64] for free.
    v = v_ref[0]          # (bkv, 64) bf16
    vext = jnp.concatenate(
        [
            v,
            jnp.ones((v.shape[0], 1), v.dtype),
            jnp.zeros((v.shape[0], 63), v.dtype),
        ],
        axis=1,
    )

    # Mask kv pad columns (only the last block contains any).
    @pl.when(ik == nkv - 1)
    def _mask():
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1) + ik * bkv
        p_masked = jnp.where(col < n_valid, p, 0.0)
        acc_ref[...] += jax.lax.dot_general(
            p_masked.astype(jnp.bfloat16),
            vext,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik < nkv - 1)
    def _accum():
        acc_ref[...] += jax.lax.dot_general(
            p.astype(jnp.bfloat16),
            vext,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(ik == nkv - 1)
    def _finish():
        acc = acc_ref[...]
        denom = jnp.maximum(acc[:, 64:65], 1e-30)  # pad q rows: avoid 0/0
        o_ref[0] = (acc[:, :64] / denom).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("sm_scale", "block_q", "block_kv", "interpret")
)
def fixed_max_attention(
    q, k, v, sm_scale, block_q=_BLOCK_Q, block_kv=_BLOCK_KV, interpret=False
):
    """Non-causal single-pass attention, (B, H, N, <=64) -> same shape.

    Exact softmax up to fp32 exp2 rounding for logits below the overflow
    clamp.  Inference only (no VJP); ``interpret=True`` runs the Pallas
    interpreter for hardware-independent tests (repo convention, see
    ``match_kernel.py``).
    """
    B, H, N, d = q.shape
    if d > 64:
        raise ValueError("fixed_max_attention is specialized for head_dim <= 64")
    BH = B * H
    # Shrink blocks for short sequences (a 2048 q block on 1024 tokens
    # would pad 50%); floors at 256 to keep MXU tiles efficient.
    while block_q // 2 >= N and block_q > 256:
        block_q //= 2
    while block_kv // 2 >= N and block_kv > 256:
        block_kv //= 2
    nq = -(-N // block_q)
    nkv = -(-N // block_kv)
    Nq, Nkv = nq * block_q, nkv * block_kv

    # Prefold softmax scale and the exp->exp2 conversion into q: one f32
    # multiply over (BH, N, 64) instead of one per score element.
    qf = (q.astype(jnp.float32) * (sm_scale * LOG2E)).astype(q.dtype)
    qf = qf.reshape(BH, N, d)
    kf = k.reshape(BH, N, d)
    vf = v.reshape(BH, N, d)
    if d < 64:
        qf = jnp.pad(qf, ((0, 0), (0, 0), (0, 64 - d)))
        kf = jnp.pad(kf, ((0, 0), (0, 0), (0, 64 - d)))
        vf = jnp.pad(vf, ((0, 0), (0, 0), (0, 64 - d)))
    qf = jnp.pad(qf, ((0, 0), (0, Nq - N), (0, 0)))
    kf = jnp.pad(kf, ((0, 0), (0, Nkv - N), (0, 0)))
    vf = jnp.pad(vf, ((0, 0), (0, Nkv - N), (0, 0)))

    kernel = functools.partial(_kernel, n_valid=N, bkv=block_kv, nkv=nkv)
    out = pl.pallas_call(
        kernel,
        grid=(BH, nq, nkv),
        in_specs=[
            pl.BlockSpec((1, block_q, 64), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_kv, 64), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_kv, 64), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, 64), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((BH, Nq, 64), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, 128), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qf, kf, vf)
    return out[:, :N, :d].reshape(B, H, N, d)


def _kernel_pair(q_ref, k_ref, v_ref, o_ref, acc_ref, *, n_valid, bkv, nkv,
                 scale):
    """Two heads per invocation on 128-lane blocks of the packed qkv array.

    Identical math to :func:`_kernel`, unrolled over the two 64-lane head
    slices of each block (TPU tiles are 128 lanes wide, so 128-lane blocks
    keep every fetch tile-aligned regardless of the head's position inside
    the 3*D-lane packed array).  The softmax scale (with log2(e) folded in)
    is applied in VMEM — a (bq, 128) multiply per grid step, ~1/8th of the
    exp2 work.
    """
    ik = pl.program_id(2)

    @pl.when(ik == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)

    q2 = (q_ref[0].astype(jnp.float32) * scale).astype(q_ref.dtype)
    k2 = k_ref[0]
    v2 = v_ref[0]
    # kv-pad column mask, shared by both heads
    col = jax.lax.broadcasted_iota(
        jnp.int32, (q2.shape[0], k2.shape[0]), 1
    ) + ik * bkv

    for h in (0, 1):
        q = q2[:, 64 * h : 64 * h + 64]
        k = k2[:, 64 * h : 64 * h + 64]
        v = v2[:, 64 * h : 64 * h + 64]
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        p = jnp.exp2(jnp.minimum(s, _CLAMP))
        vext = jnp.concatenate(
            [
                v,
                jnp.ones((v.shape[0], 1), v.dtype),
                jnp.zeros((v.shape[0], 63), v.dtype),
            ],
            axis=1,
        )

        @pl.when(ik == nkv - 1)
        def _mask(p=p, vext=vext, h=h):
            p_masked = jnp.where(col < n_valid, p, 0.0)
            acc_ref[:, 128 * h : 128 * h + 128] += jax.lax.dot_general(
                p_masked.astype(jnp.bfloat16),
                vext,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

        @pl.when(ik < nkv - 1)
        def _accum(p=p, vext=vext, h=h):
            acc_ref[:, 128 * h : 128 * h + 128] += jax.lax.dot_general(
                p.astype(jnp.bfloat16),
                vext,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )

    @pl.when(ik == nkv - 1)
    def _finish():
        acc = acc_ref[...]
        o_ref[0] = jnp.concatenate(
            [
                (acc[:, :64] / jnp.maximum(acc[:, 64:65], 1e-30)),
                (acc[:, 128:192] / jnp.maximum(acc[:, 192:193], 1e-30)),
            ],
            axis=1,
        ).astype(o_ref.dtype)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "sm_scale", "block_q", "block_kv",
                     "interpret"),
)
def fixed_max_attention_qkv(
    qkv, num_heads, sm_scale, block_q=1024, block_kv=512,
    interpret=False,
):
    """Fused-layout fixed-max attention: (B, N, 3*D) packed qkv -> (B, N, D).

    ``qkv`` is the raw output of the fused qkv Dense (lane layout
    ``[q | k | v]``, each D = num_heads * 64 wide, head h at lanes
    ``[64h, 64h+64)`` of its section — exactly flax's
    ``reshape(B, N, 3, H, 64)`` convention).

    Default blocks are half of :func:`fixed_max_attention`'s: the pair
    kernel keeps TWO heads' (block_q, block_kv) f32 logits/exp temporaries
    plus double-width (128-lane) windows live, and at 2048x1024 Mosaic's
    scoped-vmem bound hits 20.3M against the 16M stack limit (observed at
    B=2, N=10240 — the headline-bench shape).  1024x512 bounds the
    temporaries at ~4M with identical MXU work.  Rather than materializing
    per-head ``(B, H, N, 64)`` tensors (three sublane-crossing transposes
    in, one out — the ~3.8 ms/layer attention "glue" in PROFILE_BACKBONE),
    the kernel's BlockSpec index maps address each HEAD PAIR's 128-lane
    slice of the packed array in place (128-lane blocks stay tile-aligned
    at any head offset), and output blocks land directly in ``(B, N, D)``
    layout for the out-projection.  MXU work is identical to
    :func:`fixed_max_attention`; only the HBM layout traffic differs.

    Requires head_dim == 64 and an even head count (vits/b/l14).
    Inference-only (no VJP).
    """
    B, N, threeD = qkv.shape
    D = threeD // 3
    if D != num_heads * 64 or num_heads % 2:
        raise ValueError(
            "fixed_max_attention_qkv requires head_dim == 64 and even heads"
        )
    H2 = num_heads // 2
    while block_q // 2 >= N and block_q > 256:
        block_q //= 2
    while block_kv // 2 >= N and block_kv > 256:
        block_kv //= 2
    nq = -(-N // block_q)
    nkv = -(-N // block_kv)
    # One padded length serves both the q and kv block grids (blocks are
    # powers of two, so aligning to the larger also aligns the smaller).
    L = -(-N // max(block_q, block_kv)) * max(block_q, block_kv)
    qkv = jnp.pad(qkv, ((0, 0), (0, L - N), (0, 0)))

    kernel = functools.partial(
        _kernel_pair, n_valid=N, bkv=block_kv, nkv=nkv,
        scale=float(sm_scale) * LOG2E,
    )
    # Block column unit is 128 lanes: head pair hp of q/k/v sits at packed
    # column hp / H2+hp / 2*H2+hp.
    out = pl.pallas_call(
        kernel,
        grid=(B * H2, nq, nkv),
        in_specs=[
            pl.BlockSpec(
                (1, block_q, 128),
                lambda bh, iq, ik: (bh // H2, iq, bh % H2),
            ),
            pl.BlockSpec(
                (1, block_kv, 128),
                lambda bh, iq, ik: (bh // H2, ik, H2 + bh % H2),
            ),
            pl.BlockSpec(
                (1, block_kv, 128),
                lambda bh, iq, ik: (bh // H2, ik, 2 * H2 + bh % H2),
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, 128), lambda bh, iq, ik: (bh // H2, iq, bh % H2)
        ),
        out_shape=jax.ShapeDtypeStruct((B, nq * block_q, D), qkv.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, 256), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(qkv, qkv, qkv)
    return out[:, :N, :]
