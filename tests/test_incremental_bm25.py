"""Incremental-append BM25 consistency (advisor finding, round 1).

An append/update build must reuse and EXTEND the persisted vocabulary —
never re-derive a fresh subset vocab whose term ids clash with the ELL
arrays already stored. These tests assert that the incremental path
yields scores identical to a from-scratch build over the full corpus
(the reference's rank_bm25 always rebuilds over the whole collection:
/root/reference/src/rag/bm25_index.py:190-239).
"""

import numpy as np
import pytest

from rag_dpo_tpu.ingest.indexer import CorpusIndexer
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig
from rag_dpo_tpu.retrieval.bm25 import (
    Bm25Stats,
    build_bm25_stats,
    extend_bm25_stats,
)
from rag_dpo_tpu.tokenize.french import tokenize_french_text

BATCH_1 = [
    ("c1", "La notification de violation de données doit intervenir "
           "sous soixante-douze heures auprès de la CNIL."),
    ("c2", "Le registre des traitements est obligatoire pour tout "
           "responsable de traitement de données personnelles."),
    ("c3", "Le délégué à la protection des données conseille le "
           "responsable du traitement."),
]
BATCH_2 = [
    ("c4", "L'analyse d'impact relative à la protection des données "
           "est requise pour les traitements à risque élevé."),
    ("c5", "Le transfert international de données vers un pays tiers "
           "exige des clauses contractuelles types adéquates."),
]


def _chunks(batch):
    return [{"chunk_id": cid, "text": text, "doc_key": cid,
             "title": cid, "source_url": f"https://x/{cid}"}
            for cid, text in batch]


@pytest.fixture(scope="module")
def embedder():
    return Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))


def _sparse_results(index, stats, query, k=5):
    qt, qw = stats.query_terms(query, 16)
    s, i = index.search_sparse(qt[None], qw[None], k)
    ids = [index.ids[r] if r >= 0 else None for r in i[0]]
    return ids, s[0]


def test_extend_stats_preserves_term_ids():
    toks1 = [tokenize_french_text(t) for _, t in BATCH_1]
    toks2 = [tokenize_french_text(t) for _, t in BATCH_2]
    base = build_bm25_stats(toks1)
    merged = extend_bm25_stats(base, toks2)
    for term, tid in base.vocab.items():
        assert merged.vocab[term] == tid  # ids never renumber
    assert merged.n_docs == len(BATCH_1) + len(BATCH_2)
    # df/avgdl match a from-scratch build over everything
    full = build_bm25_stats(toks1 + toks2)
    assert merged.avgdl == pytest.approx(full.avgdl)
    for term, tid in merged.vocab.items():
        assert merged.df[tid] == full.df[full.vocab[term]]
        assert merged.idf[tid] == pytest.approx(
            full.idf[full.vocab[term]], abs=1e-6)


def test_append_matches_full_rebuild(embedder, tmp_path):
    indexer = CorpusIndexer(embedder, ell_width=16)
    index, stats, _ = indexer.build(_chunks(BATCH_1))
    index.save(tmp_path / "idx")

    from rag_dpo_tpu.index import DeviceIndex

    loaded = DeviceIndex.load(tmp_path / "idx")
    assert loaded.bm25_stats is not None  # persisted with checkpoint
    index2, stats2, _ = CorpusIndexer(embedder, ell_width=16).build(
        _chunks(BATCH_2), mode="append", index=loaded)

    full_index, full_stats, _ = CorpusIndexer(embedder, ell_width=16) \
        .build(_chunks(BATCH_1 + BATCH_2))

    for query in ["notification violation CNIL",
                  "analyse impact protection",
                  "transfert international clauses",
                  "registre des traitements"]:
        ids_inc, s_inc = _sparse_results(index2, stats2, query)
        ids_full, s_full = _sparse_results(full_index, full_stats, query)
        assert ids_inc == ids_full, query
        np.testing.assert_allclose(s_inc, s_full, rtol=1e-5, atol=1e-6)


def test_update_mode_rescores_old_rows(embedder):
    indexer = CorpusIndexer(embedder, ell_width=16)
    index, stats, _ = indexer.build(_chunks(BATCH_1))
    old_impacts = index._impacts.copy()
    # update c1 with longer text → avgdl shifts → ALL impacts re-derived
    new_chunk = [{"chunk_id": "c1", "doc_key": "c1", "title": "c1",
                  "source_url": "https://x/c1",
                  "text": BATCH_1[0][1] + " " + BATCH_2[0][1]}]
    index2, stats2, _ = CorpusIndexer(embedder, ell_width=16).build(
        new_chunk, mode="update", index=index)
    assert index2.n_rows == len(BATCH_1)
    # untouched rows' impacts changed because avgdl changed
    assert not np.allclose(old_impacts[1], index2._impacts[1])
    # and they equal the from-scratch values
    full_texts = [new_chunk[0]["text"]] + [t for _, t in BATCH_1[1:]]
    toks = [tokenize_french_text(t) for t in full_texts]
    full = build_bm25_stats(toks)
    assert stats2.avgdl == pytest.approx(full.avgdl)


def test_stats_roundtrip():
    toks = [tokenize_french_text(t) for _, t in BATCH_1]
    stats = build_bm25_stats(toks)
    back = Bm25Stats.from_dict(stats.to_dict())
    assert back.vocab == stats.vocab
    np.testing.assert_allclose(back.idf, stats.idf)
    np.testing.assert_array_equal(back.df, stats.df)
    assert back.avgdl == pytest.approx(stats.avgdl)


def test_native_delimiter_scrub():
    from rag_dpo_tpu import native

    if not native.is_available():
        pytest.skip("no native toolchain")
    texts = ["alpha\x01beta gamma", "delta epsilon"]
    stats, terms, impacts = native.build_ell_corpus_native(texts,
                                                           ell_width=8)
    assert stats.n_docs == 2  # \x01 inside a text must NOT split docs


def test_native_tf_export_matches_python():
    from rag_dpo_tpu import native
    from rag_dpo_tpu.retrieval.bm25 import (
        build_ell_corpus_tf,
        impacts_from_tf,
    )

    if not native.is_available():
        pytest.skip("no native toolchain")
    texts = [t for _, t in BATCH_1 + BATCH_2]
    stats_n, terms_n, impacts_n, tf_n, dl_n = \
        native.build_ell_corpus_native(texts, ell_width=12,
                                       return_tf=True)
    derived = impacts_from_tf(tf_n, dl_n, stats_n)
    np.testing.assert_allclose(derived, impacts_n, rtol=1e-5, atol=1e-7)
    toks = [tokenize_french_text(t) for t in texts]
    stats_p = build_bm25_stats(toks)
    _, tf_p, dl_p = build_ell_corpus_tf(toks, stats_p, 12)
    np.testing.assert_array_equal(dl_n, dl_p)
    np.testing.assert_array_equal(np.sort(tf_n), np.sort(tf_p))


_VOCAB_WORDS = (
    "notification violation registre traitement delegue protection "
    "analyse impact transfert international clause contractuelle "
    "consentement cookie prospection sanction amende controle "
    "securite chiffrement pseudonymisation archivage duree "
    "conservation droit acces effacement portabilite opposition "
    "sous-traitant responsable conjoint europeen adequat"
).split()


def test_fuzz_incremental_matches_fresh_rebuild(embedder):
    """Randomized append/update rounds must keep sparse scoring
    identical to a from-scratch rebuild over the same final corpus —
    the exact invariant the round-1 advisor finding violated."""
    rng = np.random.default_rng(0)
    for trial in range(4):
        def make_batch(start, n):
            out = []
            for j in range(n):
                words = rng.choice(_VOCAB_WORDS,
                                   size=rng.integers(6, 18))
                out.append((f"t{trial}c{start + j}",
                            "donnees " + " ".join(words)))
            return out

        b1 = make_batch(0, int(rng.integers(4, 9)))
        inc_idx, inc_stats, _ = CorpusIndexer(
            embedder, ell_width=16).build(_chunks(b1), mode="reset")
        corpus = list(b1)
        for round_ in range(int(rng.integers(1, 4))):
            if rng.integers(0, 2) and corpus:
                # update: rewrite an existing chunk's text
                pos = int(rng.integers(0, len(corpus)))
                cid = corpus[pos][0]
                new = make_batch(900 + round_ * 10, 1)[0][1]
                corpus[pos] = (cid, new)
                batch = [(cid, new)]
                mode = "update"
            else:
                batch = make_batch(100 + round_ * 100,
                                   int(rng.integers(2, 6)))
                corpus += batch
                mode = "append"
            inc_idx, inc_stats, _ = CorpusIndexer(
                embedder, ell_width=16).build(
                _chunks(batch), mode=mode, index=inc_idx)

        fresh_idx, fresh_stats, _ = CorpusIndexer(
            embedder, ell_width=16).build(_chunks(corpus), mode="reset")

        for _ in range(5):
            words = rng.choice(_VOCAB_WORDS, size=3)
            query = " ".join(words)
            inc_ids, inc_s = _sparse_results(inc_idx, inc_stats, query)
            fr_ids, fr_s = _sparse_results(fresh_idx, fresh_stats,
                                           query)
            ok_i = [x for x in inc_ids if x]
            ok_f = [x for x in fr_ids if x]
            assert ok_i == ok_f, (trial, query, ok_i, ok_f)
            np.testing.assert_allclose(
                np.asarray(inc_s)[:len(ok_i)],
                np.asarray(fr_s)[:len(ok_f)], rtol=1e-4, atol=1e-5)
