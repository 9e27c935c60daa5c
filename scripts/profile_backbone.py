#!/usr/bin/env python
"""Decompose the ViT backbone's per-layer time on the real TPU (VERDICT r2
item 4: where do the ~3.8 ms/layer of non-matmul glue go?).

Times a 12-block transformer stack on the extraction token shape
(B=2, N=9691, D=768) for ablated variants — full, attention removed, MLP
removed, LayerNorms as identity, LayerScale as identity — so each
component's in-model cost (including the layout changes and fusions XLA
builds around it) is a DIFFERENCE of end-to-end runs, not a per-op timer
(per-op timings through the axon relay lie; docs/PERFORMANCE.md).

Timing: scan-chained x10 vs x2 programs, differenced (the output feeds
back as the input so iterations can't be elided), best of 3.

Usage: python scripts/profile_backbone.py [--backbone vitb14] [--batch 2]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_colmap_tpu.models.dinov2 import (
    Attention,
    LayerScale,
    Mlp,
    ViTConfig,
)


class GluedAttention(nn.Module):
    """Attention with the softmax(QK^T)V kernel replaced by identity
    (out = q) but EVERY surrounding op kept — qkv projection, reshapes,
    head transposes, output transpose, out projection.  The difference
    full − this isolates the in-model cost of the Pallas kernel alone;
    this − nothing isolates projections + layout glue."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        from vit_colmap_tpu.models.dinov2 import _dense

        c = self.cfg
        B, N, D = x.shape
        head_dim = c.embed_dim // c.num_heads
        qkv = _dense(c, 3 * c.embed_dim, "qkv")(x)
        qkv = qkv.reshape(B, N, 3, c.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = jnp.swapaxes(q, 1, 2)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        # identity "kernel" that still consumes k and v so they aren't DCE'd
        out = q + 0.0 * (k + v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
        return _dense(c, c.embed_dim, "proj")(out)


class AblatedBlock(nn.Module):
    """Pre-norm block with each component optionally ablated to identity."""

    cfg: ViTConfig
    use_attn: bool = True
    use_mlp: bool = True
    use_ln: bool = True
    use_ls: bool = True
    attn_glue_only: bool = False

    @nn.compact
    def __call__(self, x):
        c = self.cfg

        def ln(name):
            if self.use_ln:
                return nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name=name)
            return lambda v: v

        def ls(name):
            if self.use_ls:
                return LayerScale(c.embed_dim, c.layerscale_init, name=name)
            return lambda v: v

        y = ln("norm1")(x)
        if self.attn_glue_only:
            y = GluedAttention(c, name="attn")(y)
        elif self.use_attn:
            y = Attention(c, name="attn")(y)
        x = x + ls("ls1")(y)
        y = ln("norm2")(x)
        if self.use_mlp:
            y = Mlp(c, name="mlp")(y)
        return x + ls("ls2")(y)


class Stack(nn.Module):
    cfg: ViTConfig
    depth: int
    use_attn: bool = True
    use_mlp: bool = True
    use_ln: bool = True
    use_ls: bool = True
    attn_glue_only: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(self.depth):
            x = AblatedBlock(
                self.cfg, self.use_attn, self.use_mlp, self.use_ln,
                self.use_ls, self.attn_glue_only,
                name=f"blocks_{i}",
            )(x)
        return x


def time_stack(cfg, depth, B, N, reps=3, **ablate):
    model = Stack(cfg, depth, **ablate)
    key = jax.random.key(0)
    x = jax.random.normal(key, (B, N, cfg.embed_dim), cfg.dtype)
    # Params MUST be jit ARGUMENTS, not closed-over constants: embedded
    # constants ship inside the HLO upload to the remote compile service,
    # and a 12-block ViT-B stack (~85M params, f32) blows its request-size
    # limit (queue4: "HTTP 413: length limit exceeded" on every variant
    # with MLPs present).
    params = model.init(key, x)

    def chained(iters):
        @jax.jit
        def prog(p, x0):
            def body(c, _):
                return model.apply(p, c), None

            out, _ = jax.lax.scan(body, x0, None, length=iters)
            return jnp.sum(out.astype(jnp.float32))

        return prog

    f10, f2 = chained(10), chained(2)
    float(f10(params, x))  # compile
    float(f2(params, x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f10(params, x))
        t10 = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(f2(params, x))
        t2 = time.perf_counter() - t0
        best = min(best, (t10 - t2) / 8.0)
    return best * 1e3  # ms per stack pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="vitb14")
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tokens", type=int, default=9691)
    ap.add_argument("--depth", type=int, default=12)
    ap.add_argument("--attn", default="fixedmax_fused",
                    help="attention impl for the full stack")
    args = ap.parse_args()

    from vit_colmap_tpu.utils.jax_cache import enable_persistent_cache

    enable_persistent_cache()

    cfg = ViTConfig.named(args.backbone, attn_impl=args.attn)
    B, N, depth = args.batch, args.tokens, args.depth

    variants = {
        "full": {},
        "no_attn": {"use_attn": False},
        # attention glue only: qkv/proj matmuls + reshapes/transposes kept,
        # softmax(QK^T)V kernel replaced by identity — full − this = the
        # Pallas kernel's in-model cost; this − no_attn = projections+glue.
        "attn_glue": {"attn_glue_only": True},
        "no_mlp": {"use_mlp": False},
        # exact-erf GELU control (tanh-approx became the model default in
        # r5): this − full = what the erf form costs on the VPU.
        "mlp_erf": {},
        "no_ln": {"use_ln": False},
        "no_ls": {"use_ls": False},
        "attn_xla": {},  # full stack, XLA attention (set below)
        # full stack, transposing per-head kernel — the pre-round-5
        # default, kept as the A/B control for the packed-layout kernel.
        "attn_unfused": {},
    }
    out = {}
    for name, ablate in variants.items():
        c = cfg
        b = B
        if name == "mlp_erf":
            c = ViTConfig.named(args.backbone, attn_impl=args.attn,
                                gelu="erf")
        elif name == "attn_xla":
            c = ViTConfig.named(args.backbone, attn_impl="xla")
            # Materialized (H, N, N) attention at N~9.7k exhausts HBM at
            # B=2 (queue4: RESOURCE_EXHAUSTED); B=1 is informational only.
            b = 1
        elif name == "attn_unfused":
            c = ViTConfig.named(args.backbone, attn_impl="fixedmax")
        try:
            ms = time_stack(c, depth, b, N, **ablate)
        except Exception as e:
            print(json.dumps({"variant": name,
                              "error": f"{type(e).__name__}: {e}"}))
            continue
        out[name] = round(ms, 2)
        print(json.dumps({"variant": name, "ms_per_stack": round(ms, 2),
                          "ms_per_layer": round(ms / depth, 3)}), flush=True)

    full = out.get("full")
    summary = {
        "metric": "backbone_ms_per_stack_full",
        "value": full,
        "unit": "ms",
        "shape": {"B": B, "N": N, "depth": depth,
                  "backbone": args.backbone, "attn": args.attn},
        "variants_ms": out,
    }
    if full is not None:
        comp = {}
        for name, key in (("attention_ms", "no_attn"),
                          ("mlp_ms", "no_mlp"),
                          ("layernorm_ms", "no_ln"),
                          ("layerscale_ms", "no_ls")):
            if key in out:
                comp[name] = round(full - out[key], 2)
        if "attn_glue" in out and "no_attn" in out:
            comp["attn_kernel_ms"] = round(full - out["attn_glue"], 2)
            comp["attn_proj_glue_ms"] = round(
                out["attn_glue"] - out["no_attn"], 2
            )
        if "mlp_erf" in out:
            comp["gelu_erf_premium_ms"] = round(out["mlp_erf"] - full, 2)
        summary["component_cost_ms"] = comp
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
