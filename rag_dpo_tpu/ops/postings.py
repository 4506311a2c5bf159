"""Impact-ordered inverted index — sparse retrieval at corpus scale.

The ELL equality-join kernel (`ops.sparse`) is exact and simple but costs
O(Q·N·L·T): unbeatable at ≤100k chunks, hopeless at 1M+ (tens of
G-comparisons per batch). This module is the scalable engine — a real
inverted index laid out for the TPU's strengths:

* postings are stored DENSE per term — a [V, cap] doc-id matrix plus a
  [V, cap] impact matrix, each term's row sorted by descending BM25
  impact and truncated at `cap` (impact-ordered pruning, WAND-family:
  the low-impact tail of a frequent term's postings cannot change a
  top-k result in practice, and high-df terms carry near-zero IDF
  anyway). The dense layout makes the query-time fetch an *embedding
  lookup* ([Q·T] row ids into a 2D table) — the gather pattern XLA/TPU
  executes at bandwidth. (A flat CSR layout with element gathers
  serializes on TPU: measured >1 s/batch at 1M chunks.)
* query scoring is two-phase, sort-free:
    1. candidate generation — `approx_max_k` over the [Q, T·cap] single
       per-term contributions (a true top-k doc's best contribution is
       ≥ total/T, so it survives a generous candidate pool);
    2. exact re-score — gather each candidate's ELL row ([Q, C] row
       lookup) and evaluate the full BM25 sum (tiny equality join),
       dedup first-occurrence, exact top-k.

Cost: O(Q·T·cap) gather + O(Q·C·L·T) rescore, independent of corpus
size. Memory: V·cap·6 bytes (i32 docs + bf16→f32 impacts).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e30
SENTINEL = np.int32(0x7FFFFFFF)


@dataclasses.dataclass
class PostingsIndex:
    """Host container for the dense per-term posting tables."""

    post_docs: np.ndarray     # [V, cap] int32 doc ids, SENTINEL padded
    post_impacts: np.ndarray  # [V, cap] f32, impact-desc within a row
    cap: int
    n_docs: int

    @classmethod
    def build(cls, terms: np.ndarray, impacts: np.ndarray,
              vocab_size: int, cap: int = 512) -> "PostingsIndex":
        """Invert ELL arrays ([N, L] term ids / impacts) into the dense
        capped, impact-ordered layout. Uses the C++ ingestion runtime
        when available (≈4× faster than the numpy lexsort path at 1M)."""
        n, l = terms.shape
        try:
            from .. import native

            if native.is_available():
                post_docs, post_impacts = native.invert_postings_native(
                    terms, impacts, vocab_size, cap
                )
                return cls(post_docs=post_docs,
                           post_impacts=post_impacts, cap=cap, n_docs=n)
        except Exception:
            pass  # fall through to the numpy path
        flat_terms = terms.reshape(-1)
        flat_imps = impacts.reshape(-1)
        flat_docs = np.repeat(np.arange(n, dtype=np.int32), l)
        valid = flat_terms >= 0
        flat_terms = flat_terms[valid]
        flat_imps = flat_imps[valid]
        flat_docs = flat_docs[valid]

        # sort by (term asc, impact desc); rank within term
        order = np.lexsort((-flat_imps, flat_terms))
        t_sorted = flat_terms[order]
        d_sorted = flat_docs[order]
        i_sorted = flat_imps[order]
        counts = np.bincount(t_sorted, minlength=vocab_size)
        starts = np.zeros(vocab_size + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        rank = np.arange(len(t_sorted)) - starts[t_sorted]
        keep = rank < cap

        post_docs = np.full((vocab_size, cap), SENTINEL, np.int32)
        post_impacts = np.zeros((vocab_size, cap), np.float32)
        post_docs[t_sorted[keep], rank[keep]] = d_sorted[keep]
        post_impacts[t_sorted[keep], rank[keep]] = i_sorted[keep]
        return cls(post_docs=post_docs, post_impacts=post_impacts,
                   cap=cap, n_docs=n)

    def device_arrays(self):
        return (jnp.asarray(self.post_docs),
                jnp.asarray(self.post_impacts))


@functools.partial(jax.jit, static_argnames=("k", "n_candidates"))
def postings_candidates_topk(post_docs, post_impacts,
                             ell_terms, ell_impacts,
                             q_terms, q_weights, k: int,
                             n_candidates: int = 256,
                             penalty=None):
    """Two-phase sparse top-k.

    post_docs/post_impacts: [V, cap]; ell_terms/ell_impacts: [N, L];
    q_terms [Q, T] int32 (−2 = empty), q_weights [Q, T] f32 →
    ([Q, k] scores, [Q, k] doc ids, -1 padded). Scores are exact BM25
    totals for every returned doc; recall is bounded by candidate-pool
    coverage (cap × n_candidates — see module docstring). `penalty` [N]
    (0 = keep, large-negative = exclude) folds tombstone/filter masks
    into the rescore so excluded docs never claim top-k slots.
    """
    q, t = q_terms.shape
    cap = post_docs.shape[1]
    tid = jnp.clip(q_terms, 0, post_docs.shape[0] - 1)
    q_valid = (q_terms >= 0)[:, :, None]

    docs = jnp.where(q_valid, post_docs[tid], SENTINEL)   # [Q, T, cap]
    scores = jnp.where(
        q_valid & (docs != SENTINEL),
        post_impacts[tid] * q_weights[:, :, None], 0.0,
    )
    docs = docs.reshape(q, t * cap)
    scores = scores.reshape(q, t * cap)

    c = min(n_candidates, docs.shape[1])
    _, pos = jax.lax.approx_max_k(scores, c)
    cand = jnp.take_along_axis(docs, pos, axis=1)        # [Q, C]
    cand_valid = cand != SENTINEL
    safe = jnp.where(cand_valid, cand, 0)

    ct = ell_terms[safe]        # [Q, C, L] — row lookup
    ci = ell_impacts[safe]
    match = ct[:, :, :, None] == q_terms[:, None, None, :]  # [Q,C,L,T]
    contrib = jnp.where(
        match, ci[:, :, :, None] * q_weights[:, None, None, :], 0.0
    )
    total = jnp.sum(contrib, axis=(2, 3))                # [Q, C]
    if penalty is not None:
        total = total + penalty[safe]

    # first-occurrence dedup of candidate doc ids — compare the RAW ids
    # (SENTINEL intact): comparing `safe` would conflate invalid slots
    # with real doc 0 and could mark doc 0 a duplicate of an earlier
    # invalid candidate (review finding)
    same = cand[:, :, None] == cand[:, None, :]
    earlier = (
        jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
        < jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    )
    dup = jnp.any(same & earlier[None], axis=1)
    total = jnp.where(cand_valid & ~dup, total, NEG_INF)

    kk = min(k, c)
    top, ppos = jax.lax.top_k(total, kk)
    top_docs = jnp.take_along_axis(safe, ppos, axis=1)
    top_docs = jnp.where(top > NEG_INF / 2, top_docs, -1)
    if kk < k:
        top = jnp.pad(top, ((0, 0), (0, k - kk)),
                      constant_values=NEG_INF)
        top_docs = jnp.pad(top_docs, ((0, 0), (0, k - kk)),
                           constant_values=-1)
    return top, top_docs
