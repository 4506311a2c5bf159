"""Config-driven stack bootstrap over a saved index checkpoint."""

import json

import pytest

from rag_dpo_tpu.bootstrap import build_stack
from rag_dpo_tpu.ingest.indexer import CorpusIndexer
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig, FakeLLMProvider
from rag_dpo_tpu.utils.config import load_config
from rag_dpo_tpu.utils.paths import default_paths

from test_retrieval import CORPUS


@pytest.fixture(scope="module")
def saved_corpus(tmp_path_factory):
    root = tmp_path_factory.mktemp("boot")
    paths = default_paths(root).ensure()
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
    index, stats, _ = CorpusIndexer(embedder, ell_width=16).build(chunks)
    index.save(paths.index_dir)
    paths.document_summaries.write_text(json.dumps({
        m["doc_key"]: {"title": m["title"], "summary": t,
                       "url": m["source_url"], "navigation": False}
        for _, t, m in CORPUS
    }))
    return paths, embedder


def test_build_stack_and_query(saved_corpus):
    paths, embedder = saved_corpus
    cfg = load_config(env={"RAGDPO_LLM_MODE": "fake",
                           "RAGDPO_RETRIEVAL_USE_RERANKER": "false"})
    stack = build_stack(cfg, paths, llm=FakeLLMProvider(),
                        embedder=embedder)
    assert stack.index.n_rows == len(CORPUS)
    assert stack.bm25_stats is not None
    assert stack.summary_index is not None
    resp = stack.pipeline.query("délai de notification d'une violation")
    assert resp.answer and resp.sources
    resp2 = stack.agent.query("délai de notification d'une violation")
    assert resp2.answer
    # config drives orchestrator selection
    assert stack.active(use_agent=False) is stack.pipeline
    assert stack.active() is stack.agent  # agent.enable default true
    qid = stack.query_logger.log_query(resp)
    assert stack.query_logger.get_stats()["n_queries"] >= 1


def test_build_stack_missing_index(tmp_path):
    paths = default_paths(tmp_path).ensure()
    with pytest.raises(FileNotFoundError, match="rebuild"):
        build_stack(load_config(env={"RAGDPO_LLM_MODE": "fake"}), paths,
                    llm=FakeLLMProvider())


def test_embedder_index_dim_mismatch_fails_loudly(saved_corpus):
    """A default tiny embedder against an index built with another
    encoder must raise with the remedy, not return garbage (round-2
    review finding)."""
    paths, _ = saved_corpus
    cfg = load_config(env={"RAGDPO_LLM_MODE": "fake"})
    wrong = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            hidden_size=32, num_heads=4, use_flash_attention=False),
            colbert_dim=16),
    ))
    with pytest.raises(ValueError, match="embedder dim"):
        build_stack(cfg, paths, llm=FakeLLMProvider(), embedder=wrong)


def test_postings_candidates_override(saved_corpus):
    """retrieval.postings_candidates overrides the loaded index's
    rescore pool at serving time (round-3 tuning knob)."""
    from rag_dpo_tpu.providers import FakeLLMProvider
    from rag_dpo_tpu.utils.config import load_config

    paths, embedder = saved_corpus
    cfg = load_config(env={"RAGDPO_LLM_MODE": "fake",
                           "RAGDPO_RETRIEVAL_POSTINGS_CANDIDATES": "64"})
    stack = build_stack(cfg, paths, llm=FakeLLMProvider(),
                        embedder=embedder)
    assert stack.index.config.postings_candidates == 64
    resp = stack.pipeline.query("Quel délai de notification ?")
    assert resp.answer


def test_coalescing_knobs_wire_through_bootstrap(saved_corpus):
    """rerank_batch / query_batch config knobs enable the micro-
    batchers, and BOTH pipelines share ONE cross-encoder (one param
    set in HBM; pair-scoring coalesces across surfaces)."""
    paths, embedder = saved_corpus
    cfg = load_config(env={"RAGDPO_LLM_MODE": "fake",
                           "RAGDPO_RETRIEVAL_RERANK_BATCH": "16",
                           "RAGDPO_EMBEDDING_QUERY_BATCH": "32"})
    assert cfg.retrieval.rerank_batch == 16
    stack = build_stack(cfg, paths, llm=FakeLLMProvider())
    rr = stack.pipeline.reranker
    assert rr is not None and rr._pair_batcher is not None
    assert rr._pair_batcher.max_batch == 16
    # the agent pipeline reranks through the SAME instance — before
    # the shared-reranker fix the production agent path got NO
    # reranker at all (bootstrap never passed one; demo.py did)
    assert stack.agent.graph.c.reranker is rr
    resp = stack.pipeline.query("délai de notification d'une violation")
    assert resp.answer
    # query_batch applies to INJECTED embedders too (config said
    # coalesce; silently skipping left concurrent encodes serializing
    # with no signal — review finding)
    _, embedder2 = saved_corpus
    stack2 = build_stack(cfg, paths, llm=FakeLLMProvider(),
                         embedder=embedder2)
    assert embedder2._query_batcher is not None
    assert embedder2._query_batcher.max_batch == 32
