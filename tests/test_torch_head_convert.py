"""Reference torch ViTFeatureModel checkpoint -> flax FeatureHeads conversion.

VERDICT r1 item 8: a reference-trained ``.pt`` checkpoint
(``/root/reference/vit_colmap/features/trainable_vit_extractor.py:102-109``,
3 tolerated layouts) must load into the TPU build.  The torch heads carry
BatchNorms; eval-mode BN folds into the preceding convs, so the flax heads
run norm-free with math-identical inference.  This test builds a torch
module with the reference's exact layer layout, saves a checkpoint, loads it
through the converter, and compares full head outputs numerically.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

DESC_DIM = 16
BACKBONE_DIM = 24
HIDDEN = 32
TRUNK = 20


class _TorchHeads(torch.nn.Module):
    """Reference ViTFeatureModel's trainable part with its exact state-dict
    key layout (``model/vit_feature_model.py:89-120``), tiny dims."""

    def __init__(self):
        super().__init__()

        class Up(torch.nn.Module):
            def __init__(self, cin, cout):
                super().__init__()
                self.deconv = torch.nn.ConvTranspose2d(cin, cout, 4, 2, 1)
                self.conv = torch.nn.Conv2d(cout, cout, 3, padding=1)
                self.bn = torch.nn.BatchNorm2d(cout)
                self.activation = torch.nn.GELU()

            def forward(self, x):
                return self.activation(self.bn(self.conv(self.deconv(x))))

        self.upsampler = torch.nn.Sequential(
            Up(BACKBONE_DIM, HIDDEN), Up(HIDDEN, HIDDEN)
        )
        self.trunk = torch.nn.Sequential(
            torch.nn.Conv2d(HIDDEN, TRUNK, 3, padding=1),
            torch.nn.BatchNorm2d(TRUNK),
            torch.nn.GELU(),
        )
        self.keypoint_head = torch.nn.Sequential(
            torch.nn.Conv2d(TRUNK, 64, 3, padding=1),
            torch.nn.BatchNorm2d(64),
            torch.nn.GELU(),
            torch.nn.Conv2d(64, 4, 1),
        )
        self.descriptor_head = torch.nn.Sequential(
            torch.nn.Conv2d(TRUNK, 128, 3, padding=1),
            torch.nn.BatchNorm2d(128),
            torch.nn.GELU(),
            torch.nn.Conv2d(128, DESC_DIM, 1),
        )

    def forward(self, feats, target_hw):
        x = self.upsampler(feats)
        x = torch.nn.functional.interpolate(
            x, size=target_hw, mode="bilinear", align_corners=False
        )
        t = self.trunk(x)
        kp = self.keypoint_head(t)
        ds = self.descriptor_head(t)
        return kp, torch.nn.functional.normalize(ds, p=2, dim=1, eps=1e-8)


def _randomize_bn_stats(model, rng):
    """Give BatchNorms non-trivial running stats so folding is actually
    exercised (fresh BNs have mean 0 / var 1)."""
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.copy_(
                torch.tensor(rng.standard_normal(m.num_features) * 0.3,
                             dtype=torch.float32)
            )
            m.running_var.copy_(
                torch.tensor(rng.uniform(0.5, 2.0, m.num_features),
                             dtype=torch.float32)
            )
            m.weight.data.copy_(
                torch.tensor(rng.uniform(0.7, 1.3, m.num_features),
                             dtype=torch.float32)
            )
            m.bias.data.copy_(
                torch.tensor(rng.standard_normal(m.num_features) * 0.1,
                             dtype=torch.float32)
            )


def _flax_heads_output(heads_params, feats_nhwc):
    import jax.numpy as jnp

    from vit_colmap_tpu.models.feature_model import (
        FeatureHeads,
        FeatureModelConfig,
    )

    cfg = FeatureModelConfig(
        descriptor_dim=DESC_DIM, hidden=HIDDEN, trunk_dim=TRUNK,
        dtype=jnp.float32, norm="none",
    )
    return FeatureHeads(cfg).apply(heads_params, jnp.asarray(feats_nhwc))


def test_torch_head_conversion_numeric_parity():
    from vit_colmap_tpu.models.convert import torch_feature_heads_to_flax

    rng = np.random.default_rng(0)
    torch.manual_seed(0)
    model = _TorchHeads().eval()
    with torch.no_grad():
        _randomize_bn_stats(model, rng)

    gh, gw = 6, 8
    feats = rng.standard_normal((1, BACKBONE_DIM, gh, gw)).astype(np.float32)
    h4, w4 = gh * 14 // 4, gw * 14 // 4
    with torch.no_grad():
        kp_t, desc_t = model(torch.tensor(feats), (h4, w4))
    kp_t, desc_t = kp_t.numpy(), desc_t.numpy()

    heads = torch_feature_heads_to_flax(model.state_dict())
    out = _flax_heads_output(heads, feats.transpose(0, 2, 3, 1))

    score = np.asarray(out["score_logits"])[0]
    np.testing.assert_allclose(score, kp_t[0, 0], atol=2e-4)
    # flax bounds offsets by tanh*0.5; torch emits raw dx/dy.
    np.testing.assert_allclose(
        np.asarray(out["offsets"])[0],
        np.tanh(kp_t[0, 1:3]).transpose(1, 2, 0) * 0.5,
        atol=2e-4,
    )
    np.testing.assert_allclose(
        np.asarray(out["orientation"])[0], np.tanh(kp_t[0, 3]) * np.pi, atol=2e-4
    )
    np.testing.assert_allclose(
        np.asarray(out["descriptors"])[0],
        desc_t[0].transpose(1, 2, 0),
        atol=2e-4,
    )


@pytest.mark.parametrize("layout", ["model_state_dict", "state_dict", "raw"])
def test_torch_checkpoint_layout_tolerance(tmp_path, layout):
    """All 3 reference checkpoint layouts load through the extractor path."""
    from vit_colmap_tpu.models.convert import load_torch_feature_model

    torch.manual_seed(1)
    model = _TorchHeads().eval()
    sd = model.state_dict()
    ckpt = sd if layout == "raw" else {layout: sd, "epoch": 3}
    path = tmp_path / "ckpt.pt"
    torch.save(ckpt, path)

    heads, backbone = load_torch_feature_model(str(path))
    assert backbone is None
    p = heads["params"]
    assert set(p) == {"up1", "up2", "trunk", "kp1", "kp2", "desc1", "desc2"}
    assert p["desc2"]["kernel"].shape[-1] == DESC_DIM
    # deconv kernels flipped+transposed into flax layout (kh, kw, in, out)
    assert p["up1"]["ConvTranspose_0"]["kernel"].shape == (4, 4, BACKBONE_DIM, HIDDEN)
