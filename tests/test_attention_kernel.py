"""Fixed-max inference attention kernel vs fp32 softmax (interpret mode).

The kernel (ops/pallas/attention_kernel.py) replaces the generic flash
attention in the frozen-extractor hot path; these tests pin its numerics
against the XLA fp32-softmax reference on CPU.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vit_colmap_tpu.ops.pallas.attention_kernel import fixed_max_attention


def _ref(q, k, v, scale):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhnm,bhmd->bhnd", p, v.astype(jnp.float32))


@pytest.mark.parametrize("n", [512, 700, 1024])
@pytest.mark.parametrize("d", [64, 32])
def test_matches_softmax_reference(n, d):
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 2, n, d)), jnp.bfloat16)
    scale = d**-0.5
    out = fixed_max_attention(
        q, k, v, scale, block_q=256, block_kv=512, interpret=True
    )
    ref = _ref(q, k, v, scale)
    assert out.shape == q.shape
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < 2e-2, err


def test_pad_tokens_do_not_leak():
    """n not a multiple of the block: pad kv columns must get zero weight."""
    rng = np.random.default_rng(1)
    n = 300  # blocks of 256 -> 212 pad columns in the last block
    q = jnp.asarray(rng.standard_normal((1, 1, n, 64)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((1, 1, n, 64)), jnp.bfloat16)
    v = jnp.asarray(100.0 * rng.standard_normal((1, 1, n, 64)), jnp.bfloat16)
    out = fixed_max_attention(
        q, k, v, 0.125, block_q=256, block_kv=256, interpret=True
    )
    ref = _ref(q, k, v, 0.125)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    # |v| ~ 100 -> absolute tolerance scales accordingly
    assert err < 2.0, err


def test_large_logits_clamped_not_nan():
    """Logits beyond the overflow clamp must saturate, not produce NaN."""
    rng = np.random.default_rng(2)
    q = jnp.asarray(50.0 * rng.standard_normal((1, 1, 256, 64)), jnp.bfloat16)
    k = jnp.asarray(50.0 * rng.standard_normal((1, 1, 256, 64)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((1, 1, 256, 64)), jnp.bfloat16)
    out = fixed_max_attention(
        q, k, v, 0.125, block_q=256, block_kv=256, interpret=True
    )
    assert bool(jnp.all(jnp.isfinite(out.astype(jnp.float32))))


@pytest.mark.parametrize("n", [512, 700])
@pytest.mark.parametrize("heads", [2, 4])
def test_fused_qkv_matches_softmax_reference(n, heads):
    """The packed-layout kernel must read each head's 64-lane slice of the
    qkv Dense output in place and agree with the per-head reference."""
    from vit_colmap_tpu.ops.pallas.attention_kernel import (
        fixed_max_attention_qkv,
    )

    rng = np.random.default_rng(3)
    D = 64 * heads
    qkv = jnp.asarray(rng.standard_normal((2, n, 3 * D)), jnp.bfloat16)
    scale = 64**-0.5
    out = fixed_max_attention_qkv(
        qkv, heads, scale, block_q=256, block_kv=256, interpret=True
    )
    assert out.shape == (2, n, D)
    # Reference: unpack with the flax (B, N, 3, H, 64) convention.
    q, k, v = (
        jnp.swapaxes(qkv.reshape(2, n, 3, heads, 64)[:, :, i], 1, 2)
        for i in range(3)
    )
    ref = jnp.swapaxes(_ref(q, k, v, scale), 1, 2).reshape(2, n, D)
    err = float(jnp.max(jnp.abs(out.astype(jnp.float32) - ref)))
    assert err < 2e-2, err


def test_fused_qkv_rejects_non64_head_dim():
    from vit_colmap_tpu.ops.pallas.attention_kernel import (
        fixed_max_attention_qkv,
    )

    qkv = jnp.zeros((1, 256, 3 * 96), jnp.bfloat16)  # head_dim 48
    with pytest.raises(ValueError):
        fixed_max_attention_qkv(qkv, 2, 0.125, interpret=True)
    qkv = jnp.zeros((1, 256, 3 * 192), jnp.bfloat16)  # 3 heads (odd)
    with pytest.raises(ValueError):
        fixed_max_attention_qkv(qkv, 3, 0.125, interpret=True)


def test_model_uses_fixedmax_config():
    """The frozen extractors request the inference kernel; training doesn't."""
    from vit_colmap_tpu.models.dinov2 import make_backbone

    _, cfg = make_backbone("vits14", attn_impl="fixedmax")
    assert cfg.attn_impl == "fixedmax"
    _, cfg = make_backbone("vits14")
    assert cfg.attn_impl == "auto"
