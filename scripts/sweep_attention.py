#!/usr/bin/env python
"""Sweep attention implementations/block sizes on the real TPU.

Extraction is backbone-bound and the backbone is attention-bound
(~2/3 of DINOv2-B FLOPs at 9.7K tokens), so the headline pairs/s rides on
this kernel.  Measures ms/layer for the ViT shape (B=2, H=12, N=9690,
d=64) across: XLA reference, Pallas flash_attention block combos, and
splash attention.

Timing discipline per docs/PERFORMANCE.md: scalar readback to force real
completion (block_until_ready lies on the axon relay), best of 3.
"""

from __future__ import annotations

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp

B, H, N, D = 2, 12, 9690, 64
SCALE = 1.0 / D**0.5


def bench(fn, q, k, v, reps=3):
    """ms per attention call, isolated from the ~26 ms dispatch+readback
    floor of the axon relay: time a scan-chained x10 and x2 program and
    difference them (out feeds back as q, so iterations can't be elided)."""

    def chained(iters):
        def body(c, _):
            return fn(c, k, v), None

        def prog(q0):
            out, _ = jax.lax.scan(body, q0, None, length=iters)
            return out

        return jax.jit(prog)

    f10, f2 = chained(10), chained(2)
    float(jnp.sum(f10(q)))  # compile
    float(jnp.sum(f2(q)))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(f10(q)))
        t10 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(jnp.sum(f2(q)))
        t2 = time.perf_counter() - t0
        best = min(best, (t10 - t2) / 8.0)
    return best * 1e3


def xla_attn(q, k, v):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * SCALE
    p = jax.nn.softmax(s.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v)


def flash(q, k, v, *, bq, bk):
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    n_pad = (-N) % max(bq, bk)
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    ids = (jnp.arange(N + n_pad) < N).astype(jnp.int32)
    ids = jnp.broadcast_to(ids, (B, N + n_pad))
    bs = BlockSizes(block_q=bq, block_k_major=bk, block_k=bk, block_b=1)
    out = flash_attention(q, k, v, segment_ids=SegmentIds(q=ids, kv=ids),
                          sm_scale=SCALE, block_sizes=bs)
    return out[:, :, :N]


def splash(q, k, v, *, bq, bkv):
    from jax.experimental.pallas.ops.tpu.splash_attention import (
        BlockSizes,
        FullMask,
        MultiHeadMask,
        make_splash_mha,
    )

    blk = max(bq, bkv)
    n_pad = (-N) % blk
    Np = N + n_pad
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    mask = MultiHeadMask([FullMask((Np, Np)) for _ in range(H)])
    bs = BlockSizes(
        block_q=bq, block_kv=bkv, block_kv_compute=bkv,
        block_q_dkv=bq, block_kv_dkv=bkv, block_kv_dkv_compute=bkv,
    )
    kernel = make_splash_mha(mask=mask, block_sizes=bs, head_shards=1,
                             q_seq_shards=1)

    def one(qb, kb, vb):
        return kernel(qb * SCALE, kb, vb)

    out = jax.vmap(one)(q, k, v)
    return out[:, :, :N]


def main():
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, H, N, D)), jnp.bfloat16)

    flops = 2 * 2 * B * H * N * N * D  # QK^T + PV
    print(f"device: {jax.devices()[0]}, shape B{B} H{H} N{N} d{D}, "
          f"{flops / 1e12:.2f} TFLOP per call")

    def report(name, ms):
        print(f"{name:<28} {ms:8.2f} ms  {flops / ms / 1e9:7.1f} TFLOP/s")

    from vit_colmap_tpu.ops.pallas.attention_kernel import fixed_max_attention

    def fixedmax(qq, kk, vv, *, bq, bkv):
        return fixed_max_attention(qq, kk, vv, SCALE, block_q=bq, block_kv=bkv)

    for bq, bkv in ((512, 512), (512, 1024), (1024, 512), (1024, 1024),
                    (1024, 2048), (2048, 1024)):
        try:
            report(f"fixedmax q{bq} kv{bkv}",
                   bench(partial(fixedmax, bq=bq, bkv=bkv), q, k, v))
        except Exception as e:
            print(f"fixedmax q{bq} kv{bkv} FAILED: {str(e)[:120]}")

    report("xla", bench(xla_attn, q, k, v))
    for bq, bk in ((512, 512), (1024, 1024), (512, 1024), (1024, 512),
                   (2048, 1024), (1024, 2048), (2048, 2048)):
        try:
            report(f"flash q{bq} k{bk}", bench(partial(flash, bq=bq, bk=bk), q, k, v))
        except Exception as e:
            print(f"flash q{bq} k{bk} FAILED: {str(e)[:120]}")
    for bq, bkv in ((512, 512), (1024, 1024), (512, 1024), (1024, 512),
                    (2048, 1024), (2048, 2048), (4096, 2048)):
        try:
            report(f"splash q{bq} kv{bkv}",
                   bench(partial(splash, bq=bq, bkv=bkv), q, k, v))
        except Exception as e:
            print(f"splash q{bq} kv{bkv} FAILED: {str(e)[:120]}")


if __name__ == "__main__":
    main()
