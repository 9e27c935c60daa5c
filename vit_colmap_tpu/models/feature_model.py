"""Trainable keypoint/descriptor head on a frozen DINOv2 backbone.

Capability parity with the reference ``ViTFeatureModel``
(``model/vit_feature_model.py:12-314``): frozen backbone -> two upsampling
blocks (768->512->512) -> resize to exactly H/4 x W/4 -> shared trunk
(512->256) -> keypoint head (256->64->4: score logit, dx, dy, orientation)
and descriptor head (256->128->D, L2-normalized), plus
``forward_from_backbone_features`` so training reuses cached backbone
activations.

Deviations by design:
* GroupNorm instead of BatchNorm — the reference's canonical training config
  uses batch size 1 (``scripts/run_training.sh``) where BN statistics are
  degenerate; GroupNorm is batch-size independent and avoids mutable state
  in the jitted train step,
* NHWC layout + bfloat16 compute (MXU-friendly), float32 params.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from vit_colmap_tpu.models.dinov2 import DinoV2, ViTConfig, make_backbone


@dataclass(frozen=True)
class FeatureModelConfig:
    backbone: str = "vitb14"
    descriptor_dim: int = 128
    hidden: int = 512
    trunk_dim: int = 256
    dtype: Any = jnp.bfloat16
    # "group": GroupNorm in upsample blocks (native training config).
    # "none": no norm — used when loading reference torch checkpoints whose
    # eval-mode BatchNorms are folded into the preceding convs
    # (models/convert.py: fold_batchnorm), making inference math-identical.
    norm: str = "group"


class UpsampleBlock(nn.Module):
    """ConvTranspose(k4, s2) + Conv3x3 + GroupNorm + GELU
    (reference ``model/vit_feature_model.py:12-29``)."""

    out_ch: int
    dtype: Any = jnp.bfloat16
    norm: str = "group"

    @nn.compact
    def __call__(self, x):
        x = nn.ConvTranspose(
            self.out_ch, kernel_size=(4, 4), strides=(2, 2), padding="SAME",
            dtype=self.dtype,
        )(x)
        x = nn.Conv(self.out_ch, kernel_size=(3, 3), padding="SAME", dtype=self.dtype)(x)
        if self.norm == "group":
            x = nn.GroupNorm(num_groups=32, dtype=jnp.float32)(x.astype(jnp.float32))
        return nn.gelu(x.astype(self.dtype), approximate=False)


class FeatureHeads(nn.Module):
    """The trainable part: upsampler + trunk + keypoint/descriptor heads.

    Input: backbone patch features (B, gh, gw, C).
    Output dict: score_logits (B, H4, W4), offsets (B, H4, W4, 2),
    orientation (B, H4, W4), descriptors (B, H4, W4, D) L2-normalized —
    where (H4, W4) = (gh*14//4, gw*14//4), the reference's quarter-res map.
    """

    cfg: FeatureModelConfig

    @nn.compact
    def __call__(self, feats: jax.Array) -> dict[str, jax.Array]:
        c = self.cfg
        B, gh, gw, _ = feats.shape
        x = feats.astype(c.dtype)
        x = UpsampleBlock(c.hidden, c.dtype, c.norm, name="up1")(x)
        x = UpsampleBlock(c.hidden, c.dtype, c.norm, name="up2")(x)

        # Exact quarter-resolution target (reference resizes bilinearly to
        # H/4 x W/4, ``vit_feature_model.py:199-212``). 14/4 = 3.5: two 2x
        # upsamples give 4x grid = 56/14 -> resize 4*gh -> 3.5*gh.
        h4, w4 = gh * 14 // 4, gw * 14 // 4
        # antialias=False matches torch F.interpolate (the reference's
        # resize, align_corners=False) — jax antialiases downscales by
        # default, which breaks checkpoint parity.
        x = jax.image.resize(
            x.astype(jnp.float32), (B, h4, w4, x.shape[-1]), "bilinear",
            antialias=False,
        ).astype(c.dtype)

        trunk = nn.Conv(c.trunk_dim, (3, 3), padding="SAME", dtype=c.dtype, name="trunk")(x)
        trunk = nn.gelu(trunk, approximate=False)

        kp = nn.Conv(64, (3, 3), padding="SAME", dtype=c.dtype, name="kp1")(trunk)
        kp = nn.gelu(kp, approximate=False)
        kp = nn.Conv(4, (1, 1), dtype=jnp.float32, name="kp2")(kp.astype(jnp.float32))
        score_logits = kp[..., 0]
        offsets = jnp.tanh(kp[..., 1:3]) * 0.5  # sub-cell offsets in [-.5, .5]
        orientation = jnp.tanh(kp[..., 3]) * jnp.pi

        ds = nn.Conv(128, (3, 3), padding="SAME", dtype=c.dtype, name="desc1")(trunk)
        ds = nn.gelu(ds, approximate=False)
        ds = nn.Conv(c.descriptor_dim, (1, 1), dtype=jnp.float32, name="desc2")(
            ds.astype(jnp.float32)
        )
        desc = ds / jnp.maximum(jnp.linalg.norm(ds, axis=-1, keepdims=True), 1e-8)

        return {
            "score_logits": score_logits,
            "offsets": offsets,
            "orientation": orientation,
            "descriptors": desc,
        }


class ViTFeatureModel(nn.Module):
    """Frozen backbone + trainable heads, full forward from images.

    ``apply`` takes normalized images (B, H, W, 3); use
    :class:`FeatureHeads` directly (``forward_from_backbone_features``) when
    backbone activations are precomputed.
    """

    cfg: FeatureModelConfig
    backbone_cfg: ViTConfig

    def setup(self):
        self.backbone = DinoV2(self.backbone_cfg)
        self.heads = FeatureHeads(self.cfg)

    def __call__(self, images: jax.Array) -> dict[str, jax.Array]:
        out = self.backbone(images)
        gh, gw = out["grid"]
        feats = out["x_norm_patchtokens"].reshape(
            images.shape[0], gh, gw, -1
        )
        feats = jax.lax.stop_gradient(feats)  # frozen backbone
        return self.heads(feats)

    def forward_from_backbone_features(self, feats: jax.Array):
        return self.heads(feats)


def make_feature_model(
    backbone: str = "vitb14",
    descriptor_dim: int = 128,
    dtype=jnp.bfloat16,
    norm: str = "group",
    attn_impl: str = "fixedmax_fused",
) -> tuple[ViTFeatureModel, FeatureModelConfig, ViTConfig]:
    # The backbone is frozen (stop_gradient on its output), so the
    # inference-only fixed-max attention kernel is safe for training AND
    # extraction: no gradient ever flows through attention.
    _, bcfg = make_backbone(backbone, dtype=dtype, attn_impl=attn_impl)
    cfg = FeatureModelConfig(
        backbone=backbone, descriptor_dim=descriptor_dim, dtype=dtype, norm=norm
    )
    return ViTFeatureModel(cfg, bcfg), cfg, bcfg


def count_parameters(params) -> int:
    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def split_trainable(params: dict) -> tuple[dict, dict]:
    """Split a ViTFeatureModel param tree into (trainable heads, frozen
    backbone) — the reference's ``get_trainable_parameters``
    (``vit_feature_model.py:300-314``)."""
    p = params["params"]
    heads = {k: v for k, v in p.items() if k == "heads"}
    frozen = {k: v for k, v in p.items() if k != "heads"}
    return {"params": heads}, {"params": frozen}
