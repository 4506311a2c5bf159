import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.ops.postings import (
    SENTINEL,
    PostingsIndex,
    postings_candidates_topk,
)
from rag_dpo_tpu.ops.sparse import ell_scores_reference


def _corpus(n=400, l=12, vocab=80, seed=0):
    rng = np.random.default_rng(seed)
    terms = rng.integers(0, vocab, size=(n, l)).astype(np.int32)
    for i in range(n):  # unique terms per row (ELL invariant)
        row = np.unique(terms[i])
        terms[i] = -1
        terms[i, : len(row)] = row
    impacts = np.abs(rng.standard_normal((n, l))).astype(np.float32)
    impacts[terms == -1] = 0.0
    return terms, impacts


def _queries(q=8, t=6, vocab=80, seed=1):
    rng = np.random.default_rng(seed)
    qt = rng.integers(0, vocab, size=(q, t)).astype(np.int32)
    qt[:, -1] = -2
    qw = np.abs(rng.standard_normal((q, t))).astype(np.float32)
    qw[qt == -2] = 0.0
    return qt, qw


def _run(idx, terms, impacts, qt, qw, k=10, n_candidates=400):
    return postings_candidates_topk(
        *idx.device_arrays(), jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw), k=k,
        n_candidates=n_candidates,
    )


def test_build_dense_layout():
    terms, impacts = _corpus(n=1000, seed=3)
    idx = PostingsIndex.build(terms, impacts, vocab_size=80, cap=16)
    assert idx.post_docs.shape == (80, 16)
    # impact-descending within each row; sentinel-padded
    for tid in range(0, 80, 7):
        row = idx.post_impacts[tid]
        docs = idx.post_docs[tid]
        n_real = int((docs != SENTINEL).sum())
        assert np.all(np.diff(row[:n_real]) <= 1e-7)
        assert np.all(docs[n_real:] == SENTINEL)
        assert np.all(row[n_real:] == 0)


def test_candidates_topk_matches_reference():
    terms, impacts = _corpus()
    qt, qw = _queries()
    idx = PostingsIndex.build(terms, impacts, vocab_size=80, cap=1000)
    ref = np.asarray(ell_scores_reference(
        jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw)))
    s, d = map(np.asarray, _run(idx, terms, impacts, qt, qw))
    for row in range(qt.shape[0]):
        expect = np.sort(ref[row])[::-1][:10]
        nz = expect > 1e-6
        np.testing.assert_allclose(s[row][: nz.sum()], expect[nz],
                                   rtol=1e-5, atol=1e-5)
        for col in range(10):
            if d[row, col] >= 0 and s[row, col] > 1e-6:
                np.testing.assert_allclose(ref[row, d[row, col]],
                                           s[row, col], rtol=1e-5,
                                           atol=1e-5)


def test_candidates_topk_empty_query():
    terms, impacts = _corpus(n=50)
    idx = PostingsIndex.build(terms, impacts, vocab_size=80, cap=100)
    qt = np.full((2, 4), -2, np.int32)
    qw = np.zeros((2, 4), np.float32)
    s, d = _run(idx, terms, impacts, qt, qw, k=5)
    assert np.all(np.asarray(d) == -1)


def test_recall_vs_exact_on_zipfian_corpus():
    """Capped engine keeps top-k recall high under realistic term skew."""
    rng = np.random.default_rng(5)
    n, l, vocab = 20_000, 16, 500
    raw = (rng.pareto(1.2, size=(n, l)) * 10).astype(np.int64) % vocab
    terms = raw.astype(np.int32)
    for i in range(n):
        row = np.unique(terms[i])
        terms[i] = -1
        terms[i, : len(row)] = row
    impacts = np.abs(rng.standard_normal((n, l))).astype(np.float32)
    impacts[terms == -1] = 0
    qt, qw = _queries(q=6, t=8, vocab=vocab, seed=6)

    ref = np.asarray(ell_scores_reference(
        jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw)))
    idx = PostingsIndex.build(terms, impacts, vocab_size=vocab, cap=512)
    s, d = _run(idx, terms, impacts, qt, qw, k=10, n_candidates=512)
    d = np.asarray(d)
    recalls = []
    for row in range(qt.shape[0]):
        want = set(np.argsort(-ref[row])[:10].tolist())
        got = set(x for x in d[row] if x >= 0)
        recalls.append(len(want & got) / 10)
    assert np.mean(recalls) >= 0.8, recalls
