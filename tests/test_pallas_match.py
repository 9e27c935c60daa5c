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
