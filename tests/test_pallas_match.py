"""Pallas matching kernel vs the XLA reference path (interpret mode on CPU)."""

import numpy as np
import pytest

from vit_colmap_tpu.ops.matching import match_pairs_batched, normalize_descriptors
from vit_colmap_tpu.ops.pallas.match_kernel import pallas_match_pairs, pallas_topk2


def _data(P=2, N=256, M=128, D=128, seed=0, n_valid2=None):
    rng = np.random.default_rng(seed)
    d1 = np.asarray(normalize_descriptors(rng.standard_normal((P, N, D)).astype(np.float32)))
    d2 = np.asarray(normalize_descriptors(rng.standard_normal((P, M, D)).astype(np.float32)))
    v1 = np.ones((P, N), bool)
    v2 = np.ones((P, M), bool)
    if n_valid2 is not None:
        v2[:, n_valid2:] = False
    return d1, d2, v1, v2


def test_topk2_matches_xla_reference():
    d1, d2, v1, v2 = _data()
    best, second, idx = (np.asarray(x) for x in pallas_topk2(d1, d2, v2, interpret=True))
    sim = np.einsum("pnd,pmd->pnm", d1, d2)
    ref_idx = sim.argmax(-1)
    ref_best = sim.max(-1)
    sim_wo = sim.copy()
    np.put_along_axis(sim_wo, ref_idx[..., None], -np.inf, -1)
    ref_second = sim_wo.max(-1)
    np.testing.assert_allclose(best, ref_best, atol=1e-5)
    np.testing.assert_allclose(second, ref_second, atol=1e-5)
    np.testing.assert_array_equal(idx, ref_idx)


def test_topk2_respects_valid_mask():
    d1, d2, v1, v2 = _data(M=256, n_valid2=100)
    best, second, idx = (np.asarray(x) for x in pallas_topk2(d1, d2, v2, interpret=True))
    assert (idx < 100).all()


def test_pallas_match_equals_xla_match():
    d1, d2, v1, v2 = _data(P=2, N=256, M=256, seed=3, n_valid2=200)
    ref = np.asarray(
        match_pairs_batched(d1, d2, v1, v2, 0.95, 1.5, True)
    )
    out = np.asarray(
        pallas_match_pairs(d1, d2, v1, v2, 0.95, 1.5, True, interpret=True)
    )
    np.testing.assert_array_equal(out, ref)


def test_pallas_match_permutation_recovered():
    rng = np.random.default_rng(4)
    D, N = 128, 128
    base = rng.standard_normal((N, D)).astype(np.float32)
    perm = rng.permutation(N)
    d1 = np.asarray(normalize_descriptors(base))[None]
    d2 = d1[0][perm][None]
    v = np.ones((1, N), bool)
    idx = np.asarray(pallas_match_pairs(d1, d2, v, v, interpret=True))[0]
    np.testing.assert_array_equal(idx, np.argsort(perm))


def test_fused_cross_check_matches_two_pass():
    """The single-pass fused cross-check must reproduce the two-pass
    result on random descriptor sets with padding."""
    import jax.numpy as jnp

    from vit_colmap_tpu.ops.pallas.match_kernel import pallas_match_pairs

    rng = np.random.default_rng(7)
    P, N, M, D = 3, 256, 384, 128
    d1 = rng.standard_normal((P, N, D)).astype(np.float32)
    d2 = rng.standard_normal((P, M, D)).astype(np.float32)
    d1 /= np.linalg.norm(d1, axis=-1, keepdims=True)
    d2 /= np.linalg.norm(d2, axis=-1, keepdims=True)
    # Plant mutual matches so `keep` is nonempty.
    d2[:, :64] = d1[:, :64]
    v1 = np.ones((P, N), bool)
    v2 = np.ones((P, M), bool)
    v1[:, 200:] = False
    v2[:, 300:] = False
    args = (jnp.asarray(d1), jnp.asarray(d2), jnp.asarray(v1), jnp.asarray(v2))
    kw = dict(max_ratio=0.95, max_distance=1.2, cross_check=True,
              interpret=True)
    fused = np.asarray(pallas_match_pairs(*args, fused_cross=True, **kw))
    twopass = np.asarray(pallas_match_pairs(*args, fused_cross=False, **kw))
    assert (fused >= 0).sum() >= P * 50  # planted matches found
    np.testing.assert_array_equal(fused, twopass)
