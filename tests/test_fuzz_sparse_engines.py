"""Differential fuzz: ELL equality-join engine vs impact-ordered
postings engine.

With cap ≥ max document frequency the postings engine loses nothing to
impact-ordered truncation, so both engines must return EXACTLY the same
docs and scores for any query; with a tiny cap the postings results
must still be a subset of the corpus scored identically (returned
scores are exact by construction).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax.numpy as jnp

from rag_dpo_tpu.ops.postings import (
    PostingsIndex,
    postings_candidates_topk,
)
from rag_dpo_tpu.ops.sparse import ell_topk


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_ell_vs_postings_exact(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(30, 300))
    ell_w = int(rng.choice([4, 8, 16]))
    vocab = int(rng.integers(10, 80))
    terms = rng.integers(0, vocab, (n, ell_w)).astype(np.int32)
    # random padding slots
    pad = rng.random((n, ell_w)) < 0.2
    terms[pad] = -1
    impacts = np.abs(rng.standard_normal((n, ell_w))).astype(np.float32)
    impacts[pad] = 0.0

    k = int(rng.choice([3, 10, 50]))
    q = int(rng.integers(1, 5))
    n_terms = int(rng.integers(1, 6))
    qt = rng.integers(0, vocab, (q, n_terms)).astype(np.int32)
    qw = np.abs(rng.standard_normal((q, n_terms))).astype(np.float32)

    # generous cap: nothing truncated → engines must agree exactly
    pidx = PostingsIndex.build(terms, impacts, vocab_size=vocab, cap=n)
    pd, pi = pidx.device_arrays()
    ps, pr = postings_candidates_topk(
        pd, pi, jnp.asarray(terms), jnp.asarray(impacts),
        jnp.asarray(qt), jnp.asarray(qw), k=k,
        n_candidates=min(4096, n_terms * n))
    es, er = ell_topk(jnp.asarray(terms), jnp.asarray(impacts),
                      jnp.asarray(qt), jnp.asarray(qw), k=k)
    ps, pr = np.asarray(ps), np.asarray(pr)
    es, er = np.asarray(es), np.asarray(er)
    for qi in range(q):
        pe = [(int(r), round(float(s), 4))
              for r, s in zip(pr[qi], ps[qi]) if r >= 0 and s > 1e-9]
        ee = [(int(r), round(float(s), 4))
              for r, s in zip(er[qi], es[qi]) if r >= 0 and s > 1e-9]
        # same scores in the same order; ids may swap only within ties
        assert [s for _, s in pe] == [s for _, s in ee], \
            (seed, qi, pe, ee)
        assert {r for r, _ in pe} == {r for r, _ in ee} or \
            len(pe) == len(ee), (seed, qi, pe, ee)
