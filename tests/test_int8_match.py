"""int8 MXU matching path: exactness against the float pipeline."""

import numpy as np
import pytest

import jax.numpy as jnp

from vit_colmap_tpu.ops.matching import (
    match_pairs_batched,
    normalize_descriptors,
    prepare_int8_descriptors,
)
from vit_colmap_tpu.ops.pallas.match_kernel import (
    pallas_match_pairs_int8,
    pallas_topk2_int8,
)


def _rand_u8(rng, shape):
    return rng.integers(0, 256, shape, dtype=np.uint8)


@pytest.mark.parametrize("encoding", ["signed", "unsigned"])
def test_int8_cosines_match_float(encoding):
    rng = np.random.default_rng(0)
    P, N, D = 2, 128, 128
    q1 = _rand_u8(rng, (P, N, D))
    q2 = _rand_u8(rng, (P, N, D))
    valid = np.ones((P, N), bool)

    a1, s1, inv1, coef = prepare_int8_descriptors(jnp.asarray(q1), jnp.asarray(valid), encoding)
    a2, s2, inv2, _ = prepare_int8_descriptors(jnp.asarray(q2), jnp.asarray(valid), encoding)
    best, second, idx = (
        np.asarray(x)
        for x in pallas_topk2_int8(a1, a2, s1, s2, inv1, inv2, coef, interpret=True)
    )

    # Float reference cosine.
    if encoding == "signed":
        f1 = q1.astype(np.float32) / 127.5 - 1.0
        f2 = q2.astype(np.float32) / 127.5 - 1.0
    else:
        f1 = q1.astype(np.float32)
        f2 = q2.astype(np.float32)
    f1 /= np.linalg.norm(f1, axis=-1, keepdims=True)
    f2 /= np.linalg.norm(f2, axis=-1, keepdims=True)
    sim = np.einsum("pnd,pmd->pnm", f1, f2)
    np.testing.assert_allclose(best, sim.max(-1), atol=2e-5)
    np.testing.assert_array_equal(idx, sim.argmax(-1))


def test_int8_match_equals_float_match():
    rng = np.random.default_rng(1)
    P, N, D = 2, 128, 128
    # Correlated descriptors so ratio/distance tests actually fire.
    base = _rand_u8(rng, (P, N, D)).astype(np.int32)
    noise = rng.integers(-20, 20, (P, N, D))
    q1 = np.clip(base, 0, 255).astype(np.uint8)
    q2 = np.clip(base + noise, 0, 255).astype(np.uint8)
    perm = rng.permutation(N)
    q2 = q2[:, perm]
    valid = np.ones((P, N), bool)
    valid[:, 120:] = False

    a1, s1, inv1, coef = prepare_int8_descriptors(jnp.asarray(q1), jnp.asarray(valid), "unsigned")
    a2, s2, inv2, _ = prepare_int8_descriptors(jnp.asarray(q2), jnp.asarray(valid), "unsigned")
    out_i8 = np.asarray(
        pallas_match_pairs_int8(
            a1, a2, s1, s2, inv1, inv2, coef, jnp.asarray(valid),
            interpret=True,
        )
    )

    f1 = q1.astype(np.float32)
    f2 = q2.astype(np.float32)
    f1[~valid] = 0
    f2[~valid] = 0
    d1 = np.asarray(normalize_descriptors(jnp.asarray(f1)))
    d2 = np.asarray(normalize_descriptors(jnp.asarray(f2)))
    out_f32 = np.asarray(match_pairs_batched(d1, d2, valid, valid))
    np.testing.assert_array_equal(out_i8, out_f32)
    # sanity: many matches found
    assert (out_i8 >= 0).sum() > 100
