"""Training-stack tests: sampler math, heatmap GT, and a full DP train step
on an 8-device virtual CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_colmap_tpu.dataloader.homography_utils import (
    apply_homography,
    compose_homographies,
    feature_similarity_map,
    homography_rotation_angle,
    warp_patch_tokens,
)
from vit_colmap_tpu.dataloader.training_batch import gaussian_heatmap
from vit_colmap_tpu.dataloader.training_sampler import (
    hard_negatives,
    in_image_negatives,
    select_invariant_points,
)


def test_apply_homography_identity_and_translation():
    pts = np.array([[[10.0, 20.0], [0.0, 0.0]]], np.float32)
    I = np.eye(3, dtype=np.float32)[None]
    np.testing.assert_allclose(np.asarray(apply_homography(I, pts)), pts)
    T = np.eye(3, dtype=np.float32)[None]
    T[0, 0, 2], T[0, 1, 2] = 5.0, -3.0
    out = np.asarray(apply_homography(T, pts))
    np.testing.assert_allclose(out, pts + np.array([5.0, -3.0]), atol=1e-5)


def test_warp_patch_tokens_identity():
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((1, 6, 8, 16)).astype(np.float32)
    I = np.eye(3, dtype=np.float32)[None]
    warped, valid = warp_patch_tokens(feats, I)
    np.testing.assert_allclose(np.asarray(warped), feats, atol=1e-4)
    assert np.asarray(valid).all()


def test_warp_patch_tokens_translation_by_patches():
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 6, 8, 4)).astype(np.float32)
    # Shift image-1 content right by exactly 2 patches (28 px).
    H = np.eye(3, dtype=np.float32)[None]
    H[0, 0, 2] = 2 * 14.0
    warped, valid = warp_patch_tokens(feats, H)
    warped, valid = np.asarray(warped), np.asarray(valid)
    # Output cell (i, j) should equal feats[i, j-2].
    np.testing.assert_allclose(warped[0, :, 2:], feats[0, :, :-2], atol=1e-4)
    assert not valid[0, :, :2].any()  # left margin maps outside image 1
    assert valid[0, :, 2:].all()


def test_similarity_map_peaks_on_true_correspondence():
    rng = np.random.default_rng(2)
    feats1 = rng.standard_normal((1, 6, 8, 32)).astype(np.float32)
    I = np.eye(3, dtype=np.float32)[None]
    sim, valid = feature_similarity_map(feats1, feats1, I)
    np.testing.assert_allclose(np.asarray(sim)[np.asarray(valid)], 1.0, atol=1e-4)


def test_select_invariant_points_transfers_coords():
    rng = np.random.default_rng(3)
    feats1 = rng.standard_normal((1, 6, 8, 32)).astype(np.float32)
    H = np.eye(3, dtype=np.float32)[None]
    H[0, 0, 2] = 14.0  # one-patch shift
    # feats2[i, j] = feats1[i, j-1] (content moved right)
    feats2 = np.roll(feats1, 1, axis=2)
    inv = select_invariant_points(feats1, feats2, H, top_k=8)
    c2 = np.asarray(inv.coords2_grid)[0]
    c1 = np.asarray(inv.coords1_grid)[0]
    valid = np.asarray(inv.valid)[0]
    assert valid.sum() >= 4
    np.testing.assert_allclose(
        c1[valid], c2[valid] - np.array([1.0, 0.0]), atol=1e-4
    )
    assert np.asarray(inv.similarity)[0][valid].min() > 0.99


def test_in_image_negatives_respect_min_distance():
    rng = np.random.default_rng(4)
    dmap = rng.standard_normal((1, 10, 12, 8)).astype(np.float32)
    dmap /= np.linalg.norm(dmap, axis=-1, keepdims=True)
    anchors = np.array([[[6.0, 5.0]]], np.float32)
    adesc = np.asarray(dmap[:, 5, 6])[:, None]
    negs = np.asarray(
        in_image_negatives(dmap, anchors, adesc, jax.random.key(0), num_neg=16,
                           min_dist=3.0)
    )
    sims = (negs[0, 0] @ adesc[0, 0])
    # Replaced (near) candidates have sim -1; all others must be real cells.
    assert sims.min() >= -1.0 - 1e-5
    assert negs.shape == (1, 1, 16, 8)


def test_hard_negatives_exclude_near_cells():
    rng = np.random.default_rng(5)
    dmap = rng.standard_normal((1, 8, 8, 4)).astype(np.float32)
    dmap /= np.linalg.norm(dmap, axis=-1, keepdims=True)
    # Anchor descriptor equals cell (3, 3); the most similar cell IS (3, 3)
    # but it's within min_dist, so hard negatives must exclude it.
    anchors = np.array([[[3.0, 3.0]]], np.float32)
    adesc = dmap[:, 3, 3][:, None]
    hard = np.asarray(hard_negatives(dmap, anchors, adesc, top_n=3, min_dist=2.0))
    sims = hard[0, 0] @ adesc[0, 0]
    assert (sims < 0.9999).all()


def test_gaussian_heatmap():
    coords = np.array([[[2.0, 3.0], [10.0, 1.0]]], np.float32)
    valid = np.array([[True, False]])
    hm = np.asarray(gaussian_heatmap(coords, valid, 8, 12, sigma=1.0))
    assert hm.shape == (1, 8, 12)
    assert hm[0, 3, 2] == pytest.approx(1.0)
    assert hm[0, 1, 10] == pytest.approx(0.0)  # invalid keypoint contributes 0


def test_homography_helpers():
    a = np.float32(0.3)
    R = np.array(
        [[np.cos(a), -np.sin(a), 0], [np.sin(a), np.cos(a), 0], [0, 0, 1]],
        np.float32,
    )
    assert homography_rotation_angle(R) == pytest.approx(0.3, abs=1e-5)
    H1 = np.eye(3, dtype=np.float32) + 0.01
    H2 = R
    H12 = np.asarray(compose_homographies(H1[None], H2[None]))[0]
    np.testing.assert_allclose(H12 @ H1, H2, atol=1e-4)


@pytest.mark.slow
def test_full_train_step_multichip():
    """One DP train step over the 8-device virtual mesh, tiny shapes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from vit_colmap_tpu.models.dinov2 import ViTConfig, DinoV2
    from vit_colmap_tpu.models.feature_model import FeatureHeads, FeatureModelConfig
    from vit_colmap_tpu.parallel.mesh import get_mesh
    from vit_colmap_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    bcfg = ViTConfig(
        embed_dim=32, depth=2, num_heads=2, pretrain_grid=8, dtype=jnp.float32
    )
    backbone = DinoV2(bcfg)
    hcfg = FeatureModelConfig(descriptor_dim=16, hidden=32, trunk_dim=32,
                              dtype=jnp.float32)
    heads = FeatureHeads(hcfg)

    B, H, W = 8, 56, 56
    key = jax.random.key(0)
    bparams = backbone.init(key, jnp.zeros((1, H, W, 3)))
    gh, gw = H // 14, W // 14
    hparams = heads.init(key, jnp.zeros((1, gh, gw, bcfg.embed_dim)))

    opt = make_optimizer(total_steps=10)
    state = init_train_state(hparams, opt)
    step, eval_step = make_train_step(
        backbone.apply, heads.apply, opt, batch_kwargs={"top_k": 16}
    )

    mesh = get_mesh()
    assert mesh.devices.size == 8
    batch_sharding = NamedSharding(mesh, P("data"))
    rng = np.random.default_rng(0)
    batch = {
        "image1": jax.device_put(
            rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8), batch_sharding
        ),
        "image2": jax.device_put(
            rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8), batch_sharding
        ),
        "H": jax.device_put(
            np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)), batch_sharding
        ),
    }
    state2, metrics = step(state, bparams, batch, jax.random.key(1))
    assert int(state2.step) == 1
    assert np.isfinite(float(metrics["total_loss"]))
    # Parameters actually changed.
    diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.heads_params, state2.heads_params
    )
    assert max(jax.tree_util.tree_leaves(diff)) > 0

    m2 = eval_step(state2, bparams, batch, jax.random.key(2))
    assert np.isfinite(float(m2["total_loss"]))


@pytest.mark.slow
def test_train_backbone_finetune():
    """--train-backbone: gradients reach the backbone, both subtrees move,
    and the combined checkpoint layout round-trips into the extractor."""
    from vit_colmap_tpu.models.dinov2 import ViTConfig, DinoV2
    from vit_colmap_tpu.models.feature_model import FeatureHeads, FeatureModelConfig
    from vit_colmap_tpu.training.train_step import (
        init_train_state,
        make_finetune_optimizer,
        make_train_step,
    )

    bcfg = ViTConfig(
        embed_dim=32, depth=2, num_heads=2, pretrain_grid=8, dtype=jnp.float32
    )
    backbone = DinoV2(bcfg)
    hcfg = FeatureModelConfig(descriptor_dim=16, hidden=32, trunk_dim=32,
                              dtype=jnp.float32)
    heads = FeatureHeads(hcfg)
    B, H, W = 2, 56, 56
    key = jax.random.key(0)
    bparams = backbone.init(key, jnp.zeros((1, H, W, 3)))
    hparams = heads.init(key, jnp.zeros((1, H // 14, W // 14, bcfg.embed_dim)))
    opt = make_finetune_optimizer(
        learning_rate=3e-3, total_steps=10, warmup_steps=1,
        backbone_lr_scale=0.1,
    )
    trainable = {"heads": hparams, "backbone": bparams}
    state = init_train_state(trainable, opt)
    step, eval_step = make_train_step(
        backbone.apply, heads.apply, opt, batch_kwargs={"top_k": 16},
        train_backbone=True,
    )

    rng = np.random.default_rng(0)
    batch = {
        "image1": rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8),
        "image2": rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8),
        "H": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
    }
    state2, metrics = step(state, None, batch, jax.random.key(1))
    assert np.isfinite(float(metrics["total_loss"]))
    # The dense raw-token objective rides only the fine-tune path.
    assert "token_loss" in metrics and np.isfinite(float(metrics["token_loss"]))
    for sub in ("heads", "backbone"):
        diff = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()),
            state.heads_params[sub], state2.heads_params[sub],
        )
        assert max(jax.tree_util.tree_leaves(diff)) > 0, f"{sub} did not move"
    m2 = eval_step(state2, None, batch, jax.random.key(2))
    assert np.isfinite(float(m2["total_loss"]))


def test_dense_token_loss_discriminates():
    """dense_token_loss must (a) reward feature maps whose tokens identify
    their own location, (b) punish location-blind (constant) maps, and
    (c) exclude out-of-overlap cells via the homography mask."""
    from vit_colmap_tpu.dataloader.training_batch import dense_token_loss

    B, gh, gw, C = 2, 12, 12, 24
    key = jax.random.key(0)
    # Location-coded features: every cell gets a distinct random code.
    feats = jax.random.normal(jax.random.key(3), (1, gh, gw, C))
    feats = jnp.tile(feats, (B, 1, 1, 1))
    H_id = jnp.tile(jnp.eye(3), (B, 1, 1))
    good, aux = dense_token_loss(feats, feats, H_id, key)
    assert float(aux["token_pos_sim"]) > 0.8
    # Constant map: positives indistinguishable from negatives.
    flat = jnp.ones((B, gh, gw, C))
    bad, _ = dense_token_loss(flat, flat, H_id, key)
    assert float(good) < float(bad) - 1.0

    # Translation by half the image: OOB cells masked, loss still finite
    # and low for location-coded features under the true homography.
    shift = float(gw // 2 * 14)
    H_tr = jnp.tile(
        jnp.array([[1, 0, shift], [0, 1, 0], [0, 0, 1]], jnp.float32),
        (B, 1, 1),
    )
    feats2 = jnp.roll(feats, gw // 2, axis=2)
    tr, aux_tr = dense_token_loss(feats, feats2, H_tr, key)
    assert np.isfinite(float(tr))
    assert float(tr) < float(bad)


@pytest.mark.slow
def test_training_overfits_single_batch():
    """Gradient quality check: loss must drop markedly when overfitting one
    fixed batch (catches silently-broken gradients/losses)."""
    from vit_colmap_tpu.models.dinov2 import ViTConfig, DinoV2
    from vit_colmap_tpu.models.feature_model import FeatureHeads, FeatureModelConfig
    from vit_colmap_tpu.training.train_step import (
        init_train_state,
        make_optimizer,
        make_train_step,
    )

    bcfg = ViTConfig(
        embed_dim=32, depth=2, num_heads=2, pretrain_grid=8, dtype=jnp.float32
    )
    backbone = DinoV2(bcfg)
    hcfg = FeatureModelConfig(descriptor_dim=16, hidden=32, trunk_dim=32,
                              dtype=jnp.float32)
    heads = FeatureHeads(hcfg)
    B, H, W = 2, 56, 56
    key = jax.random.key(0)
    bparams = backbone.init(key, jnp.zeros((1, H, W, 3)))
    hparams = heads.init(key, jnp.zeros((1, H // 14, W // 14, bcfg.embed_dim)))
    opt = make_optimizer(learning_rate=3e-3, total_steps=40, warmup_steps=2)
    state = init_train_state(hparams, opt)
    step, _ = make_train_step(
        backbone.apply, heads.apply, opt, batch_kwargs={"top_k": 16}
    )

    rng = np.random.default_rng(0)
    batch = {
        "image1": rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8),
        "image2": rng.integers(0, 255, (B, H, W, 3), dtype=np.uint8),
        "H": np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)),
    }
    losses = []
    fixed_key = jax.random.key(7)  # fixed randomness: pure overfit signal
    for i in range(30):
        state, metrics = step(state, bparams, batch, fixed_key)
        losses.append(float(metrics["total_loss"]))
    first = np.mean(losses[:3])
    last = np.mean(losses[-3:])
    assert last < first * 0.8, (first, last)


def test_select_invariant_points_structure_prior():
    """A cornerness prior steers selection toward structured cells without
    promoting out-of-overlap cells (sim there is pinned at -1)."""
    rng = np.random.default_rng(7)
    feats1 = rng.standard_normal((1, 6, 8, 32)).astype(np.float32)
    feats2 = feats1.copy()  # identity pair: every cell has sim ~ 1
    I = np.eye(3, dtype=np.float32)[None]
    structure = np.zeros((1, 6, 8), np.float32)
    structure[0, 2, 3] = 1.0
    structure[0, 4, 5] = 0.9
    inv = select_invariant_points(
        feats1, feats2, I, top_k=2, structure2=structure, structure_alpha=1.0
    )
    c2 = np.asarray(inv.coords2_grid)[0]
    assert {tuple(c) for c in c2.astype(int)} == {(3, 2), (5, 4)}
    assert np.asarray(inv.valid)[0].all()


def test_image_structure_grid_marks_corners():
    from vit_colmap_tpu.dataloader.training_batch import image_structure_grid

    img = np.zeros((1, 56, 56, 3), np.uint8)
    img[0, :28, :28] = 255  # one bright square: corner energy at its edges
    g = np.asarray(image_structure_grid(img, 4, 4))
    assert g.shape == (1, 4, 4)
    assert g.max() <= 1.0 + 1e-6 and g.min() >= 0.0
    # The inner corner cell (1,1) outranks the flat interior/background.
    assert g[0, 1, 1] > g[0, 3, 3]
    assert g[0, 1, 1] > g[0, 0, 0]
