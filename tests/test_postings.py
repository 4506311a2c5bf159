import jax.numpy as jnp
import numpy as np
import pytest

from rag_dpo_tpu.ops.postings import (
    PostingsIndex,
    postings_candidates_topk,
    postings_topk,
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


def test_postings_exact_when_uncapped():
    terms, impacts = _corpus()
    qt, qw = _queries()
    idx = PostingsIndex.build(terms, impacts, vocab_size=80, cap=1000)
    ref = np.asarray(ell_scores_reference(
        jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw)))
    s, d = postings_topk(*idx.device_arrays(), jnp.asarray(qt),
                         jnp.asarray(qw), k=10, cap=idx.cap)
    s, d = np.asarray(s), np.asarray(d)
    for row in range(qt.shape[0]):
        expect = np.sort(ref[row])[::-1][:10]
        got = s[row]
        # zero-score docs may be omitted by the postings engine
        nz = expect > 1e-6
        np.testing.assert_allclose(got[: nz.sum()], expect[nz],
                                   rtol=1e-5, atol=1e-5)
        # returned ids achieve the returned scores
        for col in range(10):
            if d[row, col] >= 0 and got[col] > 1e-6:
                np.testing.assert_allclose(
                    ref[row, d[row, col]], got[col], rtol=1e-5,
                    atol=1e-5,
                )


def test_postings_capped_keeps_high_impact():
    terms, impacts = _corpus(n=1000, seed=3)
    idx = PostingsIndex.build(terms, impacts, vocab_size=80, cap=16)
    assert idx.lengths.max() <= 16
    # postings within a term are impact-descending
    for tid in range(0, 80, 7):
        s, e = idx.offsets[tid], idx.offsets[tid + 1]
        seg = idx.post_impacts[s:e]
        assert np.all(np.diff(seg) <= 1e-7)


def test_postings_empty_query():
    terms, impacts = _corpus(n=50)
    idx = PostingsIndex.build(terms, impacts, vocab_size=80, cap=100)
    qt = np.full((2, 4), -2, np.int32)
    qw = np.zeros((2, 4), np.float32)
    s, d = postings_topk(*idx.device_arrays(), jnp.asarray(qt),
                         jnp.asarray(qw), k=5, cap=idx.cap)
    assert np.all(np.asarray(d) == -1)


def test_candidates_topk_matches_reference():
    terms, impacts = _corpus()
    qt, qw = _queries()
    idx = PostingsIndex.build(terms, impacts, vocab_size=80, cap=1000)
    ref = np.asarray(ell_scores_reference(
        jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw)))
    s, d = postings_candidates_topk(
        *idx.device_arrays(), jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw), k=10, cap=idx.cap,
        n_candidates=400,
    )
    s, d = np.asarray(s), np.asarray(d)
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
    s, d = postings_candidates_topk(
        *idx.device_arrays(), jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw), k=5, cap=idx.cap)
    assert np.all(np.asarray(d) == -1)


def test_postings_recall_vs_exact_at_scale():
    """Capped engine keeps top-k recall high on a zipfian corpus."""
    rng = np.random.default_rng(5)
    n, l, vocab = 20_000, 16, 500
    # zipf-ish term distribution: low ids very frequent
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
    s, d = postings_topk(*idx.device_arrays(), jnp.asarray(qt),
                         jnp.asarray(qw), k=10, cap=idx.cap)
    d = np.asarray(d)
    recalls = []
    for row in range(qt.shape[0]):
        want = set(np.argsort(-ref[row])[:10].tolist())
        got = set(x for x in d[row] if x >= 0)
        recalls.append(len(want & got) / 10)
    assert np.mean(recalls) >= 0.8, recalls
