import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.ops import (
    blocked_topk,
    cosine_topk_reference,
    fused_topk,
    rrf_fuse,
    rrf_fuse_reference,
)


def _random_corpus(n, d, q, seed=0):
    rng = np.random.default_rng(seed)
    embs = rng.standard_normal((n, d)).astype(np.float32)
    embs /= np.linalg.norm(embs, axis=1, keepdims=True)
    qs = rng.standard_normal((q, d)).astype(np.float32)
    qs /= np.linalg.norm(qs, axis=1, keepdims=True)
    return qs, embs


@pytest.mark.parametrize("n,d,q,k", [(1000, 64, 4, 10), (4096, 128, 16, 40)])
def test_blocked_matches_reference(n, d, q, k):
    qs, embs = _random_corpus(n, d, q)
    rs, ri = cosine_topk_reference(qs, embs, k)
    bs, bi = blocked_topk(qs, embs, k, block_n=512)
    np.testing.assert_allclose(np.asarray(bs), np.asarray(rs), atol=1e-5)
    assert np.mean(np.asarray(bi) == np.asarray(ri)) > 0.99  # ties only


@pytest.mark.parametrize(
    "n,d,q,k,block_n,tile_q",
    [
        (1024, 128, 8, 10, 256, 8),
        (3000, 64, 5, 40, 512, 8),  # ragged n and q → padding paths
        (256, 128, 130, 8, 256, 64),
    ],
)
def test_fused_matches_reference(n, d, q, k, block_n, tile_q):
    qs, embs = _random_corpus(n, d, q, seed=n)
    rs, _ = cosine_topk_reference(qs, embs, k)
    fs, fi = fused_topk(qs, embs, k, block_n=block_n, tile_q=tile_q)
    np.testing.assert_allclose(np.asarray(fs), np.asarray(rs), atol=1e-4)
    # ids must point at rows achieving those scores
    got = np.einsum("qd,qkd->qk", qs, np.asarray(embs)[np.asarray(fi)])
    np.testing.assert_allclose(got, np.asarray(rs), atol=1e-4)


def test_fused_k_larger_than_n():
    qs, embs = _random_corpus(16, 32, 2, seed=7)
    fs, fi = fused_topk(qs, embs, 32, block_n=16, tile_q=8)
    assert fs.shape == (2, 32)
    assert np.all(np.asarray(fs)[:, 16:] < -1e29)
    assert np.all(np.asarray(fi)[:, 16:] == -1)


def test_rrf_fuse_matches_reference():
    rankings = [
        [5, 3, 9, 1, -1],
        [3, 5, 7, -1, -1],
        [9, 2, 5, 4, 8],
    ]
    weights = [2.0, 1.0, 1.5]
    oracle = rrf_fuse_reference(rankings, weights)

    ids = jnp.asarray(np.array(rankings)[:, None, :], dtype=jnp.int32)
    w = jnp.asarray(weights, dtype=jnp.float32)
    scores, out_ids = rrf_fuse(ids, w, topk=8)
    scores, out_ids = np.asarray(scores)[0], np.asarray(out_ids)[0]

    got = {int(i): float(s) for i, s in zip(out_ids, scores) if i >= 0}
    assert set(got) == set(oracle)
    for cid, s in oracle.items():
        np.testing.assert_allclose(got[cid], s, rtol=1e-5)
    # ordering is by fused score descending
    valid = scores[out_ids >= 0]
    assert np.all(np.diff(valid) <= 1e-7)


def test_rrf_fuse_batch_and_padding():
    rng = np.random.default_rng(3)
    a, q, l = 4, 6, 20
    ids = rng.integers(0, 50, size=(a, q, l)).astype(np.int32)
    ids[ids % 7 == 0] = -1  # scattered empties
    w = np.array([2.0, 1.0, 1.5, 0.75], dtype=np.float32)
    scores, out_ids = rrf_fuse(jnp.asarray(ids), jnp.asarray(w), topk=10)
    for qi in range(q):
        oracle = rrf_fuse_reference([ids[ai, qi].tolist() for ai in range(a)], w)
        expect = sorted(oracle.values(), reverse=True)[:10]
        got = np.asarray(scores)[qi]
        got = got[got > -1e29]
        np.testing.assert_allclose(got, expect[: len(got)], rtol=1e-5)
