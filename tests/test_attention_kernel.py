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


def test_model_uses_fixedmax_config():
    """The frozen extractors request the inference kernel; training doesn't."""
    from vit_colmap_tpu.models.dinov2 import make_backbone

    _, cfg = make_backbone("vits14", attn_impl="fixedmax")
    assert cfg.attn_impl == "fixedmax"
    _, cfg = make_backbone("vits14")
    assert cfg.attn_impl == "auto"
