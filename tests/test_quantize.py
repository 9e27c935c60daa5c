"""int8 MXU path (QuantDense) vs the bf16 reference backbone.

Quantization must (a) keep nn.Dense's parameter pytree so checkpoints and
torch conversion are untouched, and (b) produce patch tokens whose
post-normalization cosine similarity to the bf16 path stays high enough
that matching is unaffected (the extractor L2-normalizes and PCA-projects
descriptors, so per-token direction is what matters).
"""

import numpy as np
import jax
import jax.numpy as jnp

from vit_colmap_tpu.models.dinov2 import (
    init_backbone_params,
    make_backbone,
)


def test_param_tree_identical():
    m16, _ = make_backbone("vits14")
    m8, _ = make_backbone("vits14", quantize="int8")
    p16 = init_backbone_params(m16, jax.random.key(0), 56, 56)
    p8 = init_backbone_params(m8, jax.random.key(0), 56, 56)
    t16 = jax.tree_util.tree_structure(p16)
    t8 = jax.tree_util.tree_structure(p8)
    assert t16 == t8
    # Same init -> same values.
    for a, b in zip(jax.tree_util.tree_leaves(p16), jax.tree_util.tree_leaves(p8)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_int8_tokens_close_to_bf16():
    m16, _ = make_backbone("vits14")
    m8, _ = make_backbone("vits14", quantize="int8")
    params = init_backbone_params(m16, jax.random.key(1), 112, 112)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 112, 112, 3)), jnp.float32)
    t16 = np.asarray(m16.apply(params, x)["x_norm_patchtokens"], np.float32)
    t8 = np.asarray(m8.apply(params, x)["x_norm_patchtokens"], np.float32)
    a = t16 / np.linalg.norm(t16, axis=-1, keepdims=True)
    b = t8 / np.linalg.norm(t8, axis=-1, keepdims=True)
    cos = (a * b).sum(-1)
    assert cos.mean() > 0.995, cos.mean()
    assert cos.min() > 0.97, cos.min()
