import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.ops.maxsim import maxsim, maxsim_reference
from rag_dpo_tpu.ops.sparse import ell_scores, ell_scores_reference, ell_topk


def _ell_corpus(n=300, l=16, vocab=100, seed=0):
    rng = np.random.default_rng(seed)
    terms = rng.integers(0, vocab, size=(n, l)).astype(np.int32)
    npad = rng.integers(0, l // 2, size=n)
    for i in range(n):
        if npad[i]:
            terms[i, -npad[i]:] = -1
    impacts = np.abs(rng.standard_normal((n, l))).astype(np.float32)
    impacts[terms == -1] = 0.0
    return jnp.asarray(terms), jnp.asarray(impacts)


def _ell_queries(q=4, t=8, vocab=100, seed=1):
    rng = np.random.default_rng(seed)
    qt = rng.integers(0, vocab, size=(q, t)).astype(np.int32)
    qt[:, -2:] = -2  # padded query slots
    qw = np.abs(rng.standard_normal((q, t))).astype(np.float32)
    qw[qt == -2] = 0.0
    return jnp.asarray(qt), jnp.asarray(qw)


def test_ell_scores_match_reference():
    dt, di = _ell_corpus()
    qt, qw = _ell_queries()
    ref = ell_scores_reference(dt, di, qt, qw)
    got = ell_scores(dt, di, qt, qw, block_n=64)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_ell_topk_matches_reference():
    dt, di = _ell_corpus(n=500, seed=3)
    qt, qw = _ell_queries(q=8, seed=4)
    ref = np.asarray(ell_scores_reference(dt, di, qt, qw))
    s, i = ell_topk(dt, di, qt, qw, k=10, block_n=128)
    s, i = np.asarray(s), np.asarray(i)
    expect = np.sort(ref, axis=1)[:, ::-1][:, :10]
    np.testing.assert_allclose(s, expect, rtol=1e-5, atol=1e-5)
    got = np.take_along_axis(ref, i, axis=1)
    np.testing.assert_allclose(got, expect, rtol=1e-5, atol=1e-5)


def test_ell_topk_k_exceeds_n():
    dt, di = _ell_corpus(n=5, l=4, seed=5)
    qt, qw = _ell_queries(q=2, t=4, seed=6)
    s, i = ell_topk(dt, di, qt, qw, k=8, block_n=4)
    assert s.shape == (2, 8)
    assert np.all(np.asarray(i)[:, 5:] == -1)


@pytest.mark.parametrize("q,lq,c,ld,d,bc", [
    (2, 8, 20, 16, 64, 8),
    (1, 16, 100, 32, 128, 32),
])
def test_maxsim_matches_reference(q, lq, c, ld, d, bc):
    rng = np.random.default_rng(q * c)
    qv = jnp.asarray(rng.standard_normal((q, lq, d)), jnp.float32)
    dv = jnp.asarray(rng.standard_normal((c, ld, d)), jnp.float32)
    q_mask = jnp.asarray(rng.random((q, lq)) > 0.2)
    d_mask = jnp.asarray(rng.random((c, ld)) > 0.2)
    # ensure at least one valid token everywhere
    q_mask = q_mask.at[:, 0].set(True)
    d_mask = d_mask.at[:, 0].set(True)
    ref = maxsim_reference(qv, q_mask, dv, d_mask)
    got = maxsim(qv, q_mask, dv, d_mask, block_c=bc)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)
