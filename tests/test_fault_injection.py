"""Fault injection: the degradation ladders under a failing LLM.

SURVEY.md §5 documents the reference's graceful-degradation posture
(expander→original, intent→factuel, reranker→passthrough, judge→keyword
fallback) but the reference never tests it. These tests inject failures
at each rung and assert the pipeline still answers with citations —
runtime resilience as an asserted property, not prose.
"""

from __future__ import annotations

import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig
from rag_dpo_tpu.providers.base import BaseLLMProvider, LLMResponse
from rag_dpo_tpu.providers.fake import FakeLLMProvider
from rag_dpo_tpu.rag.pipeline import create_pipeline
from rag_dpo_tpu.retrieval.bm25 import (
    build_bm25_stats,
    build_ell_corpus,
    tokenize_corpus,
)

from test_retrieval import CORPUS


class FlakyLLM(BaseLLMProvider):
    """Wraps a provider; fails calls whose (0-based) index is in
    `fail_calls`, or every call matching `fail_when(prompt)`."""

    model_name = "flaky"

    def __init__(self, inner, fail_calls=(), fail_when=None):
        self.inner = inner
        self.fail_calls = set(fail_calls)
        self.fail_when = fail_when
        self.n_calls = 0
        self.n_failed = 0

    def generate(self, prompt, system=None, temperature=0.0,
                 json_mode=False, max_tokens=None) -> LLMResponse:
        i = self.n_calls
        self.n_calls += 1
        if i in self.fail_calls or (
                self.fail_when and self.fail_when(prompt)):
            self.n_failed += 1
            return LLMResponse("", model=self.model_name,
                               error="injected failure")
        return self.inner.generate(prompt, system=system,
                                   temperature=temperature,
                                   json_mode=json_mode,
                                   max_tokens=max_tokens)


@pytest.fixture(scope="module")
def stack():
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))
    texts = [t for _, t, _ in CORPUS]
    metas = [dict(meta, text=text) for _, text, meta in CORPUS]
    out = embedder.embed(texts)
    tokens = tokenize_corpus(texts)
    stats = build_bm25_stats(tokens)
    terms, impacts = build_ell_corpus(tokens, stats, ell_width=16)
    index = DeviceIndex(IndexConfig(dim=embedder.dim, ell_width=16,
                                    row_block=8))
    index.add([c for c, _, _ in CORPUS], out["dense"], metas, terms,
              impacts)
    return index, embedder, stats


QUESTION = ("Quel est le délai de notification d'une violation de "
            "données à la CNIL ?")


def _pipe(stack, llm, **kw):
    index, embedder, stats = stack
    return create_pipeline(index, embedder, llm, bm25_stats=stats,
                           use_reranker=False, **kw)


def test_every_llm_call_fails_still_answers_in_band(stack):
    """Total LLM outage: intent→factuel, expansion→original query,
    generation error is reported in-band — never an exception."""
    llm = FlakyLLM(FakeLLMProvider(), fail_when=lambda p: True)
    resp = _pipe(stack, llm).query(QUESTION)
    assert resp.error  # generation could not succeed...
    assert resp.intent == "factuel"  # ...but intent degraded cleanly
    assert isinstance(resp.answer, str)  # in-band, no raise


def test_intent_failure_degrades_to_factuel(stack):
    llm = FlakyLLM(FakeLLMProvider(),
                   fail_when=lambda p: "classification" in p.lower())
    resp = _pipe(stack, llm).query(QUESTION)
    assert resp.intent == "factuel"
    assert llm.n_failed >= 1
    assert "[Source 1]" in resp.answer  # generation unaffected


def test_expansion_failure_uses_original_query(stack):
    llm = FlakyLLM(FakeLLMProvider(),
                   fail_when=lambda p: "reformule la question suivante"
                   in p.lower())
    resp = _pipe(stack, llm).query(QUESTION)
    assert llm.n_failed >= 1
    assert resp.sources, "retrieval must survive on the original query"
    assert "[Source 1]" in resp.answer


def test_first_generation_failure_recovers_via_retry(stack):
    """The quality-retry ladder refetches and regenerates when the
    first generation errors."""
    seen = {"n": 0}

    def fail_first_generation(p):
        if "contexte documentaire" in p.lower():
            seen["n"] += 1
            return seen["n"] == 1
        return False

    llm = FlakyLLM(FakeLLMProvider(), fail_when=fail_first_generation)
    resp = _pipe(stack, llm).query(QUESTION)
    assert resp.retried
    assert resp.error is None
    assert "[Source 1]" in resp.answer


def test_agent_completeness_failure_still_answers(stack):
    from rag_dpo_tpu.agent.graph import create_agent_pipeline

    index, embedder, stats = stack
    llm = FlakyLLM(FakeLLMProvider(),
                   fail_when=lambda p: "couverture" in p.lower()
                   or "complétude" in p.lower())
    agent = create_agent_pipeline(index, embedder, llm,
                                  bm25_stats=stats)
    resp = agent.query(QUESTION)
    assert "[Source 1]" in resp.answer
    assert resp.sources


def test_embedder_failure_surfaces_not_hangs(stack):
    """A hard non-LLM failure (embedder) must raise promptly — silent
    empty results would look like 'no documents found'."""
    index, _, stats = stack

    class BrokenEmbedder:
        dim = stack[1].dim

        def embed_queries(self, texts):
            raise RuntimeError("device lost")

        def embed(self, texts):
            raise RuntimeError("device lost")

    pipe = create_pipeline(index, BrokenEmbedder(), FakeLLMProvider(),
                           bm25_stats=stats, use_reranker=False,
                           use_expansion=False, use_intent=False)
    with pytest.raises(RuntimeError, match="device lost"):
        pipe.query(QUESTION)


@pytest.mark.parametrize("fail_at", [0, 1, 2, 3, 5, 7])
def test_agent_survives_failure_at_any_call_position(stack, fail_at):
    """Whatever single LLM call dies — rewrite, classify, expansion,
    decompose, generation, completeness — the agent must return an
    in-band RAGResponse, never raise."""
    from rag_dpo_tpu.agent.graph import create_agent_pipeline

    index, embedder, stats = stack
    llm = FlakyLLM(FakeLLMProvider(), fail_calls={fail_at})
    agent = create_agent_pipeline(index, embedder, llm,
                                  bm25_stats=stats)
    resp = agent.query(
        QUESTION,
        conversation_history=[{"role": "user", "content": "Bonjour"},
                              {"role": "assistant",
                               "content": "Bonjour !"}])
    assert isinstance(resp.answer, str) and resp.answer
    assert resp.total_time > 0
