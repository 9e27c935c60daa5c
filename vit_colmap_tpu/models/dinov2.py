"""DINOv2-style Vision Transformer backbone in flax.

TPU-first reimplementation of the frozen backbone the reference pulls from
``torch.hub`` (used at ``features/vit_extractor.py:135-146`` and
``model/vit_feature_model.py:63-83``).  Architecture follows the public
DINOv2 ViT family: patch-14 conv embedding, cls (+optional register) tokens,
pre-norm transformer blocks with LayerScale, GELU MLP (SwiGLU for the giant
variant), and a final LayerNorm; ``forward_features`` returns
``x_norm_patchtokens`` / ``x_norm_clstoken`` like the torch reference so the
extractor layer is backend-agnostic.

TPU considerations: everything is static-shape and jit-friendly; attention is
a plain einsum chain (XLA fuses QK^T·softmax·V efficiently at the ~10K-token
sequence lengths this pipeline sees — SURVEY.md §5 "long-context" note);
computation dtype is bfloat16 by default with float32 parameters and final
norm in float32.  Position embeddings are bicubic-resized inside the traced
graph for arbitrary patch grids.

Weight porting from torch checkpoints: :mod:`vit_colmap_tpu.models.convert`.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

PATCH_SIZE = 14

# Canonical DINOv2 family configs (embed_dim, depth, num_heads, mlp_ratio, swiglu)
VIT_CONFIGS = {
    "vits14": dict(embed_dim=384, depth=12, num_heads=6, mlp_ratio=4.0, swiglu=False),
    "vitb14": dict(embed_dim=768, depth=12, num_heads=12, mlp_ratio=4.0, swiglu=False),
    "vitl14": dict(embed_dim=1024, depth=24, num_heads=16, mlp_ratio=4.0, swiglu=False),
    "vitg14": dict(
        embed_dim=1536, depth=40, num_heads=24, mlp_ratio=8 / 3, swiglu=True
    ),
}


@dataclass(frozen=True)
class ViTConfig:
    embed_dim: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    swiglu: bool = False
    patch_size: int = PATCH_SIZE
    num_register_tokens: int = 0
    layerscale_init: float = 1e-5
    ln_eps: float = 1e-6
    # Grid size the pretrained pos-embed was trained at (518/14 = 37).
    pretrain_grid: int = 37
    dtype: Any = jnp.bfloat16
    # "none" | "int8": int8 MXU path for the transformer matmuls
    # (QKVO + MLP), inference only — see QuantDense.
    quantize: str = "none"
    # Attention implementation: "auto" (flash on TPU for long sequences),
    # "xla", "flash", or "fixedmax".  Flash = generic Pallas fused attention
    # (differentiable; measured 1.8x over XLA at 9.7K tokens on v5e).
    # Fixedmax = inference-only single-pass kernel (ops/pallas/
    # attention_kernel.py; 1.3x over flash at the pipeline shape) — used by
    # the frozen extractors, NOT differentiable, falls back to flash/XLA
    # off-TPU or for head_dim > 64.
    attn_impl: str = "auto"
    # MLP activation: "tanh" (tanh-approximate GELU) | "erf" (exact, what
    # torch nn.GELU computes).  The exact erf costs ~12 ms/stack at the
    # pipeline shape on v5e (PROFILE_BACKBONE_r5 mlp_tanh ablation:
    # 115.0 -> 103.1 ms) because erf is a long VPU polynomial while tanh
    # rides the fast rational approximation.  In-env models are trained
    # AND served with the same activation, so "tanh" is self-consistent;
    # set "erf" when loading public torch DINOv2 checkpoints for strict
    # numerical parity with the reference
    # (/root/reference/vit_colmap/features/vit_extractor.py:135).
    gelu: str = "tanh"

    @classmethod
    def named(cls, name: str, **overrides) -> "ViTConfig":
        if name not in VIT_CONFIGS:
            raise ValueError(f"Unknown backbone {name!r}; options: {list(VIT_CONFIGS)}")
        return cls(**{**VIT_CONFIGS[name], **overrides})


class QuantDense(nn.Module):
    """int8 MXU dense: per-output-channel int8 weights, dynamic per-tensor
    int8 activations, fp32 accumulation + dequant.

    v5e's MXU runs int8 at 2x bf16 peak (measured 410 TOPS vs 207 TFLOP/s,
    docs/PERFORMANCE.md).  Parameters keep nn.Dense's exact pytree
    ('kernel' f32 (in, out), 'bias'), so torch->flax conversion and every
    checkpoint path are untouched; quantization happens in-graph (an
    abs-max + round over the weight is ~1e-4 of the matmul FLOPs).  Only
    sensible for the FROZEN inference path (rounding has no gradient).
    """

    features: int
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (in_dim, self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        # Per-output-channel weight scales.
        s_w = jnp.maximum(jnp.max(jnp.abs(kernel), axis=0), 1e-12) / 127.0
        w8 = jnp.round(kernel / s_w).astype(jnp.int8)
        # Dynamic per-tensor activation scale.
        xf = x.astype(jnp.float32)
        s_x = jnp.maximum(jnp.max(jnp.abs(xf)), 1e-12) / 127.0
        x8 = jnp.clip(jnp.round(xf / s_x), -127, 127).astype(jnp.int8)
        lead = x8.shape[:-1]
        acc = jax.lax.dot_general(
            x8.reshape(-1, in_dim),
            w8,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = acc.astype(jnp.float32) * (s_x * s_w) + bias
        return y.reshape(*lead, self.features).astype(self.dtype)


def _dense(c: "ViTConfig", features: int, name: str):
    """nn.Dense or QuantDense for the transformer matmuls per cfg.quantize."""
    if c.quantize == "int8":
        return QuantDense(features, dtype=c.dtype, name=name)
    return nn.Dense(features, dtype=c.dtype, name=name)


class LayerScale(nn.Module):
    dim: int
    init: float = 1e-5

    @nn.compact
    def __call__(self, x):
        gamma = self.param(
            "gamma", lambda k, s: jnp.full(s, self.init, jnp.float32), (self.dim,)
        )
        return x * gamma.astype(x.dtype)


_FLASH_BLOCK = 1024
_FLASH_BLOCK_Q = 2048  # q2048/k1024 measured best on v5e (8.82 vs 9.07 ms)


def _use_flash(impl: str, n_tokens: int) -> bool:
    if impl == "xla":
        return False
    import jax as _jax

    on_tpu = _jax.default_backend() not in ("cpu", "gpu")
    if impl == "flash":
        return on_tpu
    return on_tpu and n_tokens >= _FLASH_BLOCK


def _flash_attention(q, k, v, sm_scale):
    """Pallas fused attention with padding to the block size and segment-id
    masking of pad tokens (kernel requires seq % block == 0)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, H, N, d = q.shape
    bq = _FLASH_BLOCK_Q if N >= _FLASH_BLOCK_Q else _FLASH_BLOCK
    n_pad = (-N) % bq
    if n_pad:
        pad = ((0, 0), (0, 0), (0, n_pad), (0, 0))
        q, k, v = jnp.pad(q, pad), jnp.pad(k, pad), jnp.pad(v, pad)
    ids = (jnp.arange(N + n_pad) < N).astype(jnp.int32)
    ids = jnp.broadcast_to(ids, (B, N + n_pad))
    bs = BlockSizes(
        block_q=bq,
        block_k_major=_FLASH_BLOCK,
        block_k=_FLASH_BLOCK,
        block_b=1,
    )
    out = flash_attention(
        q, k, v, segment_ids=SegmentIds(q=ids, kv=ids),
        sm_scale=sm_scale, block_sizes=bs,
    )
    return out[:, :, :N]


class Attention(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        B, N, D = x.shape
        head_dim = c.embed_dim // c.num_heads
        qkv = _dense(c, 3 * c.embed_dim, "qkv")(x)
        if (
            c.attn_impl == "fixedmax_fused"
            and head_dim == 64
            and c.num_heads % 2 == 0
            and _use_flash("flash", N)
            and N >= _FLASH_BLOCK
        ):
            # Packed-layout kernel: heads are addressed in place inside the
            # qkv Dense output and the result lands directly in (B, N, D),
            # skipping the four sublane-crossing transposes below (the
            # ~3.8 ms/layer attention "glue" in PROFILE_BACKBONE).
            from vit_colmap_tpu.ops.pallas.attention_kernel import (
                fixed_max_attention_qkv,
            )

            out = fixed_max_attention_qkv(
                qkv, c.num_heads, sm_scale=head_dim**-0.5
            )
            return _dense(c, c.embed_dim, "proj")(out)
        qkv = qkv.reshape(B, N, 3, c.num_heads, head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        # (B, H, N, d)
        q = jnp.swapaxes(q, 1, 2)
        k = jnp.swapaxes(k, 1, 2)
        v = jnp.swapaxes(v, 1, 2)
        if (
            c.attn_impl == "fixedmax"
            and head_dim <= 64
            and _use_flash("flash", N)
            and N >= _FLASH_BLOCK
        ):
            from vit_colmap_tpu.ops.pallas.attention_kernel import (
                fixed_max_attention,
            )

            out = fixed_max_attention(q, k, v, sm_scale=head_dim**-0.5)
        elif _use_flash(c.attn_impl, N):
            out = _flash_attention(q, k, v, sm_scale=head_dim**-0.5)
        else:
            attn = jnp.einsum("bhqd,bhkd->bhqk", q * (head_dim**-0.5), k)
            attn = jax.nn.softmax(attn.astype(jnp.float32), axis=-1).astype(
                c.dtype
            )
            out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = jnp.swapaxes(out, 1, 2).reshape(B, N, D)
        return _dense(c, c.embed_dim, "proj")(out)


class Mlp(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        hidden = int(c.embed_dim * c.mlp_ratio)
        if c.swiglu:
            # DINOv2-g SwiGLU ffn: hidden rounded to multiple of 8 of 2/3 rule
            hidden = (int(hidden * 2 / 3) + 7) // 8 * 8
            w12 = _dense(c, 2 * hidden, "w12")(x)
            x1, x2 = jnp.split(w12, 2, axis=-1)
            h = nn.silu(x1) * x2
            return _dense(c, c.embed_dim, "w3")(h)
        h = _dense(c, hidden, "fc1")(x)
        h = nn.gelu(h, approximate=(c.gelu != "erf"))
        return _dense(c, c.embed_dim, "fc2")(h)


class Block(nn.Module):
    cfg: ViTConfig

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm1")(x)
        y = Attention(c, name="attn")(y)
        x = x + LayerScale(c.embed_dim, c.layerscale_init, name="ls1")(y)
        y = nn.LayerNorm(epsilon=c.ln_eps, dtype=c.dtype, name="norm2")(x)
        y = Mlp(c, name="mlp")(y)
        return x + LayerScale(c.embed_dim, c.layerscale_init, name="ls2")(y)


def interpolate_pos_embed(
    pos_embed: jax.Array, grid_h: int, grid_w: int, pretrain_grid: int
) -> jax.Array:
    """Bicubic-resize patch position embeddings to an arbitrary grid.

    pos_embed: (1, 1 + pretrain_grid**2, D) — cls first, then patch grid.
    Returns (1, 1 + grid_h * grid_w, D).
    """
    cls_pe = pos_embed[:, :1]
    patch_pe = pos_embed[:, 1:]
    d = patch_pe.shape[-1]
    patch_pe = patch_pe.reshape(1, pretrain_grid, pretrain_grid, d)
    if (grid_h, grid_w) != (pretrain_grid, pretrain_grid):
        patch_pe = jax.image.resize(
            patch_pe.astype(jnp.float32),
            (1, grid_h, grid_w, d),
            method="bicubic",
        )
    patch_pe = patch_pe.reshape(1, grid_h * grid_w, d)
    return jnp.concatenate([cls_pe.astype(patch_pe.dtype), patch_pe], axis=1)


class DinoV2(nn.Module):
    """DINOv2 ViT. Input: (B, H, W, 3) normalized images, H/W multiples of 14."""

    cfg: ViTConfig

    @nn.compact
    def __call__(self, x: jax.Array) -> dict[str, jax.Array]:
        c = self.cfg
        B, H, W, _ = x.shape
        gh, gw = H // c.patch_size, W // c.patch_size

        x = nn.Conv(
            c.embed_dim,
            kernel_size=(c.patch_size, c.patch_size),
            strides=(c.patch_size, c.patch_size),
            padding="VALID",
            dtype=c.dtype,
            name="patch_embed",
        )(x.astype(c.dtype))
        x = x.reshape(B, gh * gw, c.embed_dim)

        cls_token = self.param(
            "cls_token", nn.initializers.zeros, (1, 1, c.embed_dim), jnp.float32
        )
        pos_embed = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, 1 + c.pretrain_grid**2, c.embed_dim),
            jnp.float32,
        )
        pe = interpolate_pos_embed(pos_embed, gh, gw, c.pretrain_grid)
        cls = jnp.broadcast_to(cls_token, (B, 1, c.embed_dim))
        x = jnp.concatenate([cls.astype(c.dtype), x], axis=1)
        x = x + pe.astype(c.dtype)

        if c.num_register_tokens:
            reg = self.param(
                "register_tokens",
                nn.initializers.zeros,
                (1, c.num_register_tokens, c.embed_dim),
                jnp.float32,
            )
            reg = jnp.broadcast_to(
                reg, (B, c.num_register_tokens, c.embed_dim)
            ).astype(c.dtype)
            x = jnp.concatenate([x[:, :1], reg, x[:, 1:]], axis=1)

        for i in range(c.depth):
            x = Block(c, name=f"blocks_{i}")(x)

        x = nn.LayerNorm(epsilon=c.ln_eps, dtype=jnp.float32, name="norm")(
            x.astype(jnp.float32)
        )
        n_prefix = 1 + c.num_register_tokens
        return {
            "x_norm_clstoken": x[:, 0],
            "x_norm_patchtokens": x[:, n_prefix:],
            "grid": (gh, gw),
        }


# ImageNet normalization constants (the reference normalizes with these at
# ``features/vit_extractor.py:71-79``).
IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406], jnp.float32)
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225], jnp.float32)


def preprocess(images_uint8: jax.Array) -> jax.Array:
    """(B, H, W, 3) uint8 RGB -> normalized float32, fused into the graph."""
    x = images_uint8.astype(jnp.float32) / 255.0
    return (x - IMAGENET_MEAN) / IMAGENET_STD


def patch_grid_size(h: int, w: int, patch: int = PATCH_SIZE) -> tuple[int, int]:
    """Largest patch-aligned size <= (h, w) (reference resize rule,
    ``features/vit_extractor.py:121-129``)."""
    return max(h // patch, 1) * patch, max(w // patch, 1) * patch


def make_backbone(
    name: str = "vitb14",
    dtype=jnp.bfloat16,
    num_register_tokens: int = 0,
    attn_impl: str = "auto",
    quantize: str = "none",
) -> tuple[DinoV2, ViTConfig]:
    cfg = ViTConfig.named(
        name,
        dtype=dtype,
        num_register_tokens=num_register_tokens,
        attn_impl=attn_impl,
        quantize=quantize,
    )
    return DinoV2(cfg), cfg


def init_backbone_params(model: DinoV2, key: jax.Array, h: int = 224, w: int = 224):
    dummy = jnp.zeros((1, h, w, 3), jnp.float32)
    return model.init(key, dummy)
