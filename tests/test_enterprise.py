"""Enterprise ingest: stats propagation to live retrievers, re-ingest
idempotency, OOV-vocabulary searchability (round-2 review findings)."""

import pathlib
import sys

import pytest

sys.path.insert(0, str(pathlib.Path(__file__).parent))

from fixture_docs import make_docx
from rag_dpo_tpu.ingest.enterprise import EnterpriseIngestor, TagRegistry
from rag_dpo_tpu.ingest.indexer import CorpusIndexer
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig, FakeLLMProvider
from rag_dpo_tpu.retrieval.retriever import HybridRetriever, RetrieverConfig

BASE = [
    {"chunk_id": "k0", "doc_key": "k0", "title": "contrôle",
     "source": "CNIL", "source_url": "https://x/0",
     "text": "La CNIL contrôle la conformité des traitements de données."},
    {"chunk_id": "k1", "doc_key": "k1", "title": "registre",
     "source": "CNIL", "source_url": "https://x/1",
     "text": "Le registre des activités de traitement est obligatoire."},
]


@pytest.fixture()
def stack(tmp_path):
    emb = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))
    index, stats, _ = CorpusIndexer(emb, ell_width=16).build(BASE)
    ing = EnterpriseIngestor(index, emb, stats,
                             TagRegistry(tmp_path / "tags.json"))
    retriever = HybridRetriever(
        index, emb, bm25_stats=stats,
        config=RetrieverConfig(use_prefilter=False, per_arm_k=8),
    )
    return emb, index, stats, ing, retriever, tmp_path


def test_live_retriever_sees_new_vocabulary(stack):
    """The retriever holds the SAME stats object built before the
    ingest; enterprise-only terms must become searchable through it."""
    emb, index, stats, ing, retriever, tmp = stack
    doc = tmp / "proc.docx"
    doc.write_bytes(make_docx())
    ing.ingest(doc, tags=["RH"])
    # 'notification' appears only in the docx fixture, not in BASE
    assert "notification" in stats.vocab  # in-place update propagated
    chunks = retriever.retrieve_candidates(
        "notification violation 72 heures", n_candidates=4)
    assert any(c.chunk_id.startswith("ent_") for c in chunks)


def test_reingest_same_document_is_idempotent(stack):
    emb, index, stats, ing, retriever, tmp = stack
    doc = tmp / "proc.docx"
    doc.write_bytes(make_docx())
    r1 = ing.ingest(doc, tags=["RH"])
    n_docs_after_first = stats.n_docs
    avgdl_after_first = stats.avgdl
    df_after_first = dict(zip(stats.vocab, stats.df[
        list(stats.vocab.values())]))
    # same bytes → same ent_<hash> ids → pure upsert
    r2 = ing.ingest(doc, tags=["RH", "Juridique"])
    assert r2["doc_id"] == r1["doc_id"]
    assert index.n_rows == len(BASE) + r1["n_chunks"]
    assert stats.n_docs == n_docs_after_first  # no double count
    assert stats.avgdl == pytest.approx(avgdl_after_first)
    for term, tid in stats.vocab.items():
        assert stats.df[tid] == df_after_first[term], term


def test_purge_then_list(stack):
    emb, index, stats, ing, retriever, tmp = stack
    doc = tmp / "proc.docx"
    doc.write_bytes(make_docx())
    r = ing.ingest(doc, tags=["RH"])
    assert ing.stats()["n_documents"] == 1
    n = ing.purge(r["doc_id"])
    assert n == r["n_chunks"]
    assert ing.list_documents() == []
