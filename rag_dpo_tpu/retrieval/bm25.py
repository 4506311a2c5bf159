"""BM25 statistics + ELL corpus builder for the device lexical arm.

Replaces the reference's two in-RAM rank_bm25 indexes (`src/rag/bm25_index.py`:
summary-level document prefilter at :76-173, chunk-level sparse arm at
:190-292 — both O(corpus) pure-Python loops per query). Here BM25-Okapi
per-term *impacts* are precomputed once at build time into the ELL arrays
consumed by `ops.sparse.ell_topk`; a query is just (term ids, IDF weights),
so scoring runs on device at memory bandwidth.

BM25 Okapi parameterization matches rank_bm25's defaults (k1=1.5, b=0.75,
epsilon=0.25; idf = ln((N−df+0.5)/(df+0.5)), negatives floored to
epsilon·avg_idf) so rankings are comparable with the reference's.
"""

from __future__ import annotations

import dataclasses
import math
from collections import Counter
from typing import Sequence

import numpy as np

from ..tokenize.french import tokenize_french_text


@dataclasses.dataclass
class Bm25Stats:
    vocab: dict[str, int]
    idf: np.ndarray          # [V] f32
    avgdl: float
    n_docs: int
    k1: float = 1.5
    b: float = 0.75
    epsilon: float = 0.25
    # document frequency per term + total token count: kept so the stats
    # can be *extended* on incremental appends (same term-id space) with
    # idf/avgdl recomputed exactly over the full corpus.
    df: np.ndarray | None = None        # [V] i64
    total_len: float = 0.0

    # ---------------------------------------------------------- serialize
    def to_dict(self) -> dict:
        terms = [""] * len(self.vocab)
        for t, i in self.vocab.items():
            terms[i] = t
        return {
            "terms": terms,
            "idf": np.asarray(self.idf, np.float32).tolist(),
            "avgdl": float(self.avgdl),
            "n_docs": int(self.n_docs),
            "k1": float(self.k1),
            "b": float(self.b),
            "epsilon": float(self.epsilon),
            "df": (np.asarray(self.df, np.int64).tolist()
                   if self.df is not None else None),
            "total_len": float(self.total_len),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "Bm25Stats":
        return cls(
            vocab={t: i for i, t in enumerate(d["terms"])},
            idf=np.asarray(d["idf"], np.float32),
            avgdl=float(d["avgdl"]),
            n_docs=int(d["n_docs"]),
            k1=float(d.get("k1", 1.5)),
            b=float(d.get("b", 0.75)),
            epsilon=float(d.get("epsilon", 0.25)),
            df=(np.asarray(d["df"], np.int64)
                if d.get("df") is not None else None),
            total_len=float(d.get("total_len", 0.0)),
        )

    # minimum shared prefix for a vocabulary term to count as a
    # morphological neighbor of a query token (see query_terms)
    NEIGHBOR_PREFIX = 6
    NEIGHBOR_WEIGHT = 0.5

    def _sorted_terms(self):
        """Vocab terms sorted lexicographically (cached) — the prefix
        range scan behind morphological neighbor expansion."""
        cached = getattr(self, "_sorted_terms_cache", None)
        if cached is None or cached[1] != len(self.vocab):
            terms = sorted(self.vocab)
            cached = (terms, len(self.vocab))
            object.__setattr__(self, "_sorted_terms_cache", cached)
        return cached[0]

    def _prefix_neighbors(self, tok: str) -> list[str]:
        """Vocabulary terms sharing ≥NEIGHBOR_PREFIX leading chars with
        `tok` (tok itself excluded). French derivational morphology —
        transfert / transférer / transferts, encadrer / encadrement —
        defeats exact-match BM25 (measured: the q46 'transférer …
        Union européenne' query misses the 'transfert … hors UE' true
        doc entirely, eval international category 0.25); a ≥6-char
        shared prefix recovers the family while 'conseil'/'consent'
        (5 shared) stay apart. Suffix stemmers do NOT cover this:
        noun/verb pairs like transfert/transférer have different
        derivational stems."""
        import bisect

        if len(tok) < self.NEIGHBOR_PREFIX:
            return []
        pre = tok[: self.NEIGHBOR_PREFIX]
        terms = self._sorted_terms()
        lo = bisect.bisect_left(terms, pre)
        out = []
        for i in range(lo, len(terms)):
            if not terms[i].startswith(pre):
                break
            if terms[i] != tok:
                out.append(terms[i])
        return out

    def query_terms(
        self, text: str, max_terms: int = 32, expand: bool = True
    ) -> tuple[np.ndarray, np.ndarray]:
        """→ ([T] term ids, [T] idf weights); pads with id -2 / weight 0.

        With `expand`, each query token also pulls its morphological
        prefix-neighbors from the vocabulary at NEIGHBOR_WEIGHT×idf —
        query-side only (no reindex, shared by the Python ELL and the
        native C++ scoring paths, which both consume these term ids).
        Exact tokens are added first so expansion can only use slots
        the exact terms left free."""
        ids, weights = [], []
        neighbors: list[str] = []
        seen = set()
        for tok in tokenize_french_text(text):
            if tok in seen:
                continue
            seen.add(tok)
            tid = self.vocab.get(tok)
            if tid is not None and tid not in ids:
                ids.append(tid)
                weights.append(float(self.idf[tid]))
            if expand:
                neighbors.extend(self._prefix_neighbors(tok))
            if len(ids) >= max_terms:
                break
        if expand:
            for term in neighbors:
                if len(ids) >= max_terms:
                    break
                tid = self.vocab[term]
                if tid not in ids:
                    ids.append(tid)
                    weights.append(self.NEIGHBOR_WEIGHT
                                   * float(self.idf[tid]))
        t = np.full((max_terms,), -2, np.int32)
        w = np.zeros((max_terms,), np.float32)
        t[: len(ids)] = ids
        w[: len(weights)] = weights
        return t, w


def build_bm25_stats(
    token_lists: Sequence[Sequence[str]],
    k1: float = 1.5,
    b: float = 0.75,
    epsilon: float = 0.25,
) -> Bm25Stats:
    n = len(token_lists)
    df: Counter = Counter()
    total_len = 0
    for toks in token_lists:
        total_len += len(toks)
        df.update(set(toks))
    vocab = {term: i for i, term in enumerate(sorted(df))}
    idf = np.zeros((len(vocab),), np.float32)
    neg = []
    for term, i in vocab.items():
        d = df[term]
        v = math.log((n - d + 0.5) / (d + 0.5))
        idf[i] = v
        if v < 0:
            neg.append(i)
    if len(vocab):
        avg_idf = float(idf.mean())
        idf[neg] = epsilon * avg_idf
    avgdl = total_len / max(n, 1)
    df_arr = np.zeros((len(vocab),), np.int64)
    for term, i in vocab.items():
        df_arr[i] = df[term]
    return Bm25Stats(vocab=vocab, idf=idf, avgdl=avgdl, n_docs=n, k1=k1,
                     b=b, epsilon=epsilon, df=df_arr,
                     total_len=float(total_len))


def _recompute_idf(df: np.ndarray, n: int, epsilon: float) -> np.ndarray:
    """rank_bm25 idf: ln((N−df+0.5)/(df+0.5)), negatives → ε·avg_idf.

    RETIRED terms (df=0 — every document that carried them was since
    replaced) are excluded from the average and weighted 0: a fresh
    rebuild's vocabulary wouldn't contain them at all, and their
    ln((N+0.5)/0.5) ceiling would otherwise inflate the negative-idf
    floor and drift common-term scores away from the fresh-build oracle
    (found by the incremental fuzz test)."""
    idf = np.log((n - df + 0.5) / (df + 0.5)).astype(np.float32)
    live = df > 0
    if live.any():
        avg = float(idf[live].mean())
        idf[(idf < 0) & live] = epsilon * avg
    idf[~live] = 0.0
    return idf


def extend_bm25_stats(
    stats: Bm25Stats, token_lists: Sequence[Sequence[str]]
) -> Bm25Stats:
    """Extend stats with new documents WITHOUT renumbering existing term
    ids: new terms are appended to the vocab in first-seen order, df /
    n_docs / avgdl are updated, and idf is recomputed exactly over the
    full corpus. This is the append/update-mode path — a fresh subset
    vocabulary would silently mismatch the term ids already written into
    the index's ELL arrays (advisor finding, round 1)."""
    assert stats.df is not None, (
        "stats lack df counts — rebuilt from a legacy checkpoint; "
        "run a reset build to enable incremental updates"
    )
    vocab = dict(stats.vocab)
    df = list(np.asarray(stats.df, np.int64))
    n = stats.n_docs
    total_len = stats.total_len
    for toks in token_lists:
        total_len += len(toks)
        n += 1
        for term in set(toks):
            tid = vocab.get(term)
            if tid is None:
                tid = len(vocab)
                vocab[term] = tid
                df.append(0)
            df[tid] += 1
    df_arr = np.asarray(df, np.int64)
    return Bm25Stats(
        vocab=vocab,
        idf=_recompute_idf(df_arr, n, stats.epsilon),
        avgdl=total_len / max(n, 1),
        n_docs=n,
        k1=stats.k1,
        b=stats.b,
        epsilon=stats.epsilon,
        df=df_arr,
        total_len=float(total_len),
    )


def update_stats_in_place(dst: Bm25Stats, src: Bm25Stats) -> Bm25Stats:
    """Copy `src`'s contents onto `dst` WITHOUT rebinding: every live
    holder of the `dst` object (retrievers built before an incremental
    ingest) sees the extended vocabulary and recomputed idf/avgdl. The
    vocab dict is updated (ids only ever append) and array/scalar fields
    are reassigned on the same instance."""
    dst.vocab.update(src.vocab)
    dst.idf = src.idf
    dst.avgdl = src.avgdl
    dst.n_docs = src.n_docs
    dst.df = src.df
    dst.total_len = src.total_len
    return dst


def retract_bm25_stats(
    stats: Bm25Stats, token_lists: Sequence[Sequence[str]]
) -> Bm25Stats:
    """Remove documents' contributions from the stats (update-mode
    prelude: the OLD version of a re-indexed doc must not keep counting
    toward df/avgdl). Term ids never renumber — a term whose df hits 0
    keeps its slot with idf recomputed over the remaining corpus."""
    assert stats.df is not None
    df = np.asarray(stats.df, np.int64).copy()
    n = stats.n_docs
    total_len = stats.total_len
    for toks in token_lists:
        total_len -= len(toks)
        n -= 1
        for term in set(toks):
            tid = stats.vocab.get(term)
            if tid is not None and df[tid] > 0:
                df[tid] -= 1
    n = max(n, 0)
    total_len = max(total_len, 0.0)
    return Bm25Stats(
        vocab=dict(stats.vocab),
        idf=_recompute_idf(df, n, stats.epsilon),
        avgdl=total_len / max(n, 1),
        n_docs=n,
        k1=stats.k1,
        b=stats.b,
        epsilon=stats.epsilon,
        df=df,
        total_len=float(total_len),
    )


def build_ell_corpus_tf(
    token_lists: Sequence[Sequence[str]],
    stats: Bm25Stats,
    ell_width: int = 32,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """→ (doc_terms [N, L] i32 padded -1, doc_tf [N, L] i32, doc_len [N]).

    Raw term-frequency form of the ELL corpus: impacts are *derived* from
    (tf, dl, stats) via `impacts_from_tf`, so they can be recomputed
    exactly when avgdl shifts on an incremental append — without
    retokenizing the corpus. Terms beyond `ell_width` are dropped,
    highest-tf-first kept (rare at chunk scale: ~600-word chunks have
    < 300 unique terms; width is configurable).
    """
    n = len(token_lists)
    terms = np.full((n, ell_width), -1, np.int32)
    tf_arr = np.zeros((n, ell_width), np.int32)
    dl_arr = np.zeros((n,), np.int32)
    for i, toks in enumerate(token_lists):
        tf = Counter(toks)
        dl_arr[i] = len(toks)
        items = sorted(tf.items(), key=lambda kv: -kv[1])[:ell_width]
        for slot, (term, f) in enumerate(items):
            tid = stats.vocab.get(term)
            if tid is None:
                continue
            terms[i, slot] = tid
            tf_arr[i, slot] = f
    return terms, tf_arr, dl_arr


def impacts_from_tf(
    tf: np.ndarray, dl: np.ndarray, stats: Bm25Stats
) -> np.ndarray:
    """impact(t, d) = tf·(k1+1) / (tf + k1·(1−b+b·dl/avgdl)) — the
    document side of BM25 Okapi; the query side multiplies by idf.
    Vectorized over the whole corpus ([N, L] tf, [N] dl)."""
    k1, b = stats.k1, stats.b
    tf = np.asarray(tf, np.float32)
    norm = k1 * (1 - b + b * np.asarray(dl, np.float32)
                 / max(stats.avgdl, 1e-9))
    with np.errstate(divide="ignore", invalid="ignore"):
        imp = tf * (k1 + 1) / (tf + norm[:, None])
    return np.where(tf > 0, imp, 0.0).astype(np.float32)


def build_ell_corpus(
    token_lists: Sequence[Sequence[str]],
    stats: Bm25Stats,
    ell_width: int = 32,
) -> tuple[np.ndarray, np.ndarray]:
    """→ (doc_terms [N, L] i32 padded -1, doc_impacts [N, L] f32)."""
    terms, tf, dl = build_ell_corpus_tf(token_lists, stats, ell_width)
    return terms, impacts_from_tf(tf, dl, stats)


def tokenize_corpus(texts: Sequence[str]) -> list[list[str]]:
    return [tokenize_french_text(t) for t in texts]


class SummaryBm25Index:
    """Document-level BM25 prefilter (summary-index role parity:
    `bm25_index.py:76-173` tokenizes title+summary+URL per document and
    returns the top-k doc paths used to restrict chunk retrieval)."""

    def __init__(self, ell_width: int = 64):
        self.ell_width = ell_width
        self.doc_keys: list[str] = []
        self.stats: Bm25Stats | None = None
        self._terms = None
        self._impacts = None
        self._dev = None  # (terms, impacts) on device, uploaded once

    def build(self, docs: Sequence[dict]):
        """docs: [{'doc_key', 'title', 'summary', 'url'}] (url optional)."""
        self.doc_keys = [d["doc_key"] for d in docs]
        token_lists = [
            tokenize_french_text(
                " ".join(
                    str(d.get(f, "") or "") for f in ("title", "summary", "url")
                )
            )
            for d in docs
        ]
        self.stats = build_bm25_stats(token_lists)
        self._terms, self._impacts = build_ell_corpus(
            token_lists, self.stats, self.ell_width
        )
        self._dev = None  # invalidate the device-resident copy

    def _device_arrays(self):
        """Upload the ELL corpus ONCE and reuse it. A per-search
        `jnp.asarray(self._terms)` re-shipped the whole summary corpus
        host→device on EVERY query — under 16 concurrent workers those
        simultaneous uploads spiked HBM next to the 12B decoder and
        RESOURCE_EXHAUSTed worker threads (seen live in
        bench_e2e_concurrent.py's coalesced arm)."""
        if getattr(self, "_dev", None) is None:
            import jax.numpy as jnp

            self._dev = (jnp.asarray(self._terms),
                         jnp.asarray(self._impacts))
        return self._dev

    # Below this corpus size the prefilter scores on HOST: the summary
    # index is per-DOCUMENT (hundreds–thousands of rows), where a numpy
    # ELL scan is microseconds while a device dispatch costs a ~28 ms
    # tunnel RTT per query AND transient HBM next to a near-full chip
    # (a serving run OOM'd exactly here under 16 concurrent workers).
    HOST_SCORE_MAX_DOCS = 65_536

    def search(self, query: str, top_k: int = 40) -> list[tuple[str, float]]:
        if not self.doc_keys:
            return []
        qt, qw = self.stats.query_terms(query)
        k = min(top_k, len(self.doc_keys))
        if len(self.doc_keys) <= self.HOST_SCORE_MAX_DOCS:
            scores = np.zeros((len(self.doc_keys),), np.float32)
            for t, w in zip(qt, qw):
                if t < 0:
                    continue
                hit = self._terms == t
                if hit.any():
                    scores += w * (self._impacts * hit).sum(axis=1)
            idx = np.argsort(-scores)[:k]
            return [(self.doc_keys[r], float(scores[r]))
                    for r in idx if scores[r] > 0]
        from ..ops.sparse import ell_topk
        import jax.numpy as jnp

        terms_d, impacts_d = self._device_arrays()
        s, i = ell_topk(
            terms_d, impacts_d,
            jnp.asarray(qt[None]), jnp.asarray(qw[None]),
            k=k,
        )
        s, i = np.asarray(s)[0], np.asarray(i)[0]
        return [
            (self.doc_keys[r], float(v))
            for r, v in zip(i, s)
            if r >= 0 and v > 0
        ]

    def relevant_doc_keys(self, query: str, top_k: int = 40) -> set[str]:
        return {k for k, _ in self.search(query, top_k)}
