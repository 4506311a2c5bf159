"""Hermetic 48-question replay over the synthetic corpus.

End-to-end quality gate: corpus built from the reference's own
qa_dataset, full hybrid retrieval + extractive generation, scored by the
eval harness. Retrieval is the only thing that can fail — asserting score
floors makes this a regression test on the whole device path.
"""

import pytest

from rag_dpo_tpu.evals import EvalHarness, load_qa_dataset
from rag_dpo_tpu.evals.harness import EvalConfig
from rag_dpo_tpu.evals.retrieval_eval import cited_source_hit_rate
from rag_dpo_tpu.evals.synthetic import (
    ExtractiveFakeLLM,
    build_synthetic_corpus,
)
from rag_dpo_tpu.ingest.indexer import CorpusIndexer
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig
from rag_dpo_tpu.rag import create_pipeline
from rag_dpo_tpu.retrieval import HybridRetriever, RetrieverConfig


@pytest.fixture(scope="module")
def replay_stack():
    dataset = load_qa_dataset()
    chunks = build_synthetic_corpus(dataset)
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(
            encoder=EncoderConfig.tiny(use_flash_attention=False),
            colbert_dim=32,
        ),
        batch_size=64,
    ))
    index, stats, report = CorpusIndexer(
        embedder, ell_width=24).build(chunks, mode="reset")
    assert report.verification["self_retrieval_ok"]
    llm = ExtractiveFakeLLM()
    pipe = create_pipeline(
        index, embedder, llm, bm25_stats=stats,
        use_reranker=False,  # retrieval quality is what's under test
        use_expansion=False,
    )
    retriever = HybridRetriever(
        index, embedder, bm25_stats=stats,
        config=RetrieverConfig(use_prefilter=False),
    )
    return dataset, pipe, retriever, embedder


def test_cited_source_hit_rate(replay_stack):
    dataset, _, retriever, _ = replay_stack
    report = cited_source_hit_rate(dataset, retriever, k=5)
    # BM25-arm exact-keyword matching makes this high on the synthetic
    # corpus; a retrieval regression would crater it.
    assert report["mean_hit_rate"] >= 0.8, report["mean_hit_rate"]
    assert report["n_questions"] >= 40


def test_agent_replay_scores(replay_stack):
    """Same synthetic corpus through the AGENT pipeline."""
    from rag_dpo_tpu.agent import create_agent_pipeline

    dataset, _, retriever, embedder = replay_stack
    agent = create_agent_pipeline(
        retriever.index, embedder, ExtractiveFakeLLM(),
        bm25_stats=retriever.bm25_stats, use_expansion=False,
        enable_completeness=False,
    )
    harness = EvalHarness(agent, embedder=embedder, config=EvalConfig())
    report = harness.run(dataset[:8])
    assert report["global_score"] >= 0.45, report["global_score"]
    assert report["n_questions"] == 8


def test_full_replay_scores(replay_stack):
    dataset, pipe, _, embedder = replay_stack
    harness = EvalHarness(pipe, embedder=embedder,
                          config=EvalConfig())
    report = harness.run(dataset[:16])
    # sanity floors on the v2 NEAR-MISS corpus (synthetic.py v2: topic
    # titles + archive twins/blends/nav traps — random-init retrieval
    # is the bottleneck by design). The ratcheting per-metric gate is
    # tests/test_hermetic_regression.py; these only catch collapse.
    assert report["global_score"] >= 0.45, report["global_score"]
    assert report["faithfulness"] >= 0.9
    assert report["source_score"] >= 0.5, report["source_score"]
    assert report["n_questions"] == 16
