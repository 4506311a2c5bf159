"""ColBERT end-to-end: colbert-enabled index → MaxSim rerank pipeline."""

import numpy as np

from rag_dpo_tpu.ingest.indexer import CorpusIndexer
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig, FakeLLMProvider
from rag_dpo_tpu.rag import create_pipeline

from test_retrieval import CORPUS


def test_maxsim_pipeline_end_to_end():
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))
    chunks = []
    for cid, text, meta in CORPUS:
        c = dict(meta)
        c["chunk_id"] = cid
        c["text"] = text
        chunks.append(c)
    indexer = CorpusIndexer(embedder, ell_width=16, with_colbert=True,
                            colbert_len=48)
    index, stats, report = indexer.build(chunks, mode="reset")
    assert report.verification["self_retrieval_ok"]
    assert index._colbert is not None
    assert index._colbert.shape == (len(CORPUS), 48, 32)

    pipe = create_pipeline(index, embedder, FakeLLMProvider(),
                           bm25_stats=stats, use_maxsim=True)
    resp = pipe.query("violation de données notification CNIL")
    assert resp.answer and resp.sources
    # maxsim rerank actually ran (rerank_time recorded, scores set)
    assert resp.rerank_time >= 0


def test_maxsim_scores_prefer_relevant():
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))
    chunks = []
    for cid, text, meta in CORPUS:
        c = dict(meta)
        c["chunk_id"] = cid
        c["text"] = text
        chunks.append(c)
    indexer = CorpusIndexer(embedder, ell_width=16, with_colbert=True,
                            colbert_len=48)
    index, _, _ = indexer.build(chunks, mode="reset")

    from rag_dpo_tpu.retrieval.reranker import MaxSimReranker
    from rag_dpo_tpu.retrieval.types import RetrievedChunk

    pool = [
        RetrievedChunk(chunk_id=index.ids[r], text=chunks[r]["text"],
                       metadata=dict(index.meta.row(r)), score=0.5, row=r)
        for r in range(len(chunks))
    ]
    ranked = MaxSimReranker(index, embedder).rerank(
        CORPUS[1][1], pool, top_k=3  # query = exact text of chunk c1
    )
    assert ranked[0].chunk_id == "c1"
    assert ranked[0].rerank_score >= ranked[-1].rerank_score
