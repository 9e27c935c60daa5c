"""Torch-checkpoint -> flax parameter conversion.

Lets users bring the public DINOv2 ``torch.hub`` weights (the backbone the
reference loads at ``features/vit_extractor.py:135`` /
``model/vit_feature_model.py:63-83``) into the flax backbone.  Pure
key-mapping + transposes; no torch modules are executed.  This environment
has no network egress, so weights are optional: every model also runs
random-init (shapes/pipeline identical).
"""

from __future__ import annotations

import logging
from typing import Any, Mapping

import numpy as np

from vit_colmap_tpu.models.dinov2 import ViTConfig

logger = logging.getLogger(__name__)


def _t(w) -> np.ndarray:
    """torch tensor -> numpy (cpu, detached)."""
    try:
        return w.detach().cpu().numpy()
    except AttributeError:
        return np.asarray(w)


def torch_dinov2_to_flax(state_dict: Mapping[str, Any], cfg: ViTConfig) -> dict:
    """Map a torch DINOv2 ``state_dict`` into the flax ``DinoV2`` param tree.

    Key layout of the public DINOv2 checkpoints:
    ``patch_embed.proj.{weight,bias}``, ``cls_token``, ``pos_embed``,
    ``blocks.{i}.{norm1,attn.qkv,attn.proj,ls1,norm2,mlp.fc1,mlp.fc2,ls2}``,
    ``norm.{weight,bias}``.
    """
    sd = {k: _t(v) for k, v in state_dict.items()}
    p: dict[str, Any] = {}

    # Patch embed: torch conv (D, 3, k, k) -> flax (k, k, 3, D).
    p["patch_embed"] = {
        "kernel": sd["patch_embed.proj.weight"].transpose(2, 3, 1, 0),
        "bias": sd["patch_embed.proj.bias"],
    }
    p["cls_token"] = sd["cls_token"]
    p["pos_embed"] = sd["pos_embed"]
    if "register_tokens" in sd and cfg.num_register_tokens:
        p["register_tokens"] = sd["register_tokens"]

    def dense(prefix: str) -> dict:
        return {
            "kernel": sd[f"{prefix}.weight"].T,
            "bias": sd[f"{prefix}.bias"],
        }

    def layernorm(prefix: str) -> dict:
        return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}

    for i in range(cfg.depth):
        b = f"blocks.{i}"
        blk: dict[str, Any] = {
            "norm1": layernorm(f"{b}.norm1"),
            "attn": {"qkv": dense(f"{b}.attn.qkv"), "proj": dense(f"{b}.attn.proj")},
            "ls1": {"gamma": sd[f"{b}.ls1.gamma"]},
            "norm2": layernorm(f"{b}.norm2"),
            "ls2": {"gamma": sd[f"{b}.ls2.gamma"]},
        }
        if cfg.swiglu:
            blk["mlp"] = {
                "w12": dense(f"{b}.mlp.w12"),
                "w3": dense(f"{b}.mlp.w3"),
            }
        else:
            blk["mlp"] = {
                "fc1": dense(f"{b}.mlp.fc1"),
                "fc2": dense(f"{b}.mlp.fc2"),
            }
        p[f"blocks_{i}"] = blk

    p["norm"] = layernorm("norm")
    return {"params": p}


def load_torch_checkpoint(path: str, cfg: ViTConfig) -> dict:
    """Load a ``.pt``/``.pth`` DINOv2 checkpoint file and convert."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return torch_dinov2_to_flax(sd, cfg)
