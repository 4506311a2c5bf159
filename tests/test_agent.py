import json

import numpy as np
import pytest

from rag_dpo_tpu.agent import create_agent_pipeline
from rag_dpo_tpu.agent.tools import (
    RGPD_ARTICLES,
    calculate_deadline,
    check_answer_completeness,
    decompose_question,
    lookup_article,
    search_articles_by_topic,
)
from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig, FakeLLMProvider
from rag_dpo_tpu.providers.base import LLMResponse
from rag_dpo_tpu.retrieval.bm25 import (
    build_bm25_stats,
    build_ell_corpus,
    tokenize_corpus,
)

from test_retrieval import CORPUS


# ------------------------------------------------------------------- tools

def test_deadline_calculator():
    r = calculate_deadline("violation_notification_cnil", "2026-03-01")
    assert r.deadline == "2026-03-04 00:00"
    assert "33" in r.basis
    r = calculate_deadline("reponse_droits", "2026-01-31")
    assert r.deadline == "2026-02-28"  # month-end clamp
    assert calculate_deadline("inconnu") is None
    r = calculate_deadline("registre_mise_a_jour", "2026-03-01")
    assert r.deadline is None  # continuous obligation


def test_article_lookup():
    a = lookup_article("33")
    assert a["titre"].startswith("Notification")
    assert "34" in a["articles_lies"]
    assert lookup_article("28-3") is not None  # sub-reference
    assert lookup_article("999") is None
    assert len(RGPD_ARTICLES) >= 40


def test_article_topic_search():
    hits = search_articles_by_topic("sous-traitance")
    assert any(h["numero"] == "28" for h in hits)
    hits = search_articles_by_topic("sanctions")
    assert any(h["numero"] == "83" for h in hits)


def test_decompose_and_completeness_tools():
    class Decomposer(FakeLLMProvider):
        def generate(self, prompt, **kw):
            if "sous-questions" in prompt.lower():
                return LLMResponse(json.dumps({
                    "sub_questions": ["Quelle est la base légale ?",
                                      "Quels délais ?"],
                }))
            return LLMResponse(json.dumps({
                "coverage_pct": 60,
                "missing_aspects": ["délais"],
                "suggested_queries": ["délais de réponse"],
            }))

    subs = decompose_question(Decomposer(), "Base légale et délais ?")
    assert len(subs) == 2
    comp = check_answer_completeness(Decomposer(), "q", "réponse")
    assert comp.coverage_pct == 60
    assert comp.suggested_queries == ["délais de réponse"]
    # fallback on provider error
    class Broken(FakeLLMProvider):
        def generate(self, *a, **k):
            return LLMResponse("", error="down")
    assert decompose_question(Broken(), "q") == []
    assert check_answer_completeness(Broken(), "q", "a").coverage_pct == 100


# ------------------------------------------------------------------- graph

@pytest.fixture(scope="module")
def agent():
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32),
        batch_size=8,
    ))
    texts = [t for _, t, _ in CORPUS]
    metas = []
    for cid, text, meta in CORPUS:
        m = dict(meta)
        m["text"] = text
        metas.append(m)
    out = embedder.embed(texts)
    tokens = tokenize_corpus(texts)
    stats = build_bm25_stats(tokens)
    terms, impacts = build_ell_corpus(tokens, stats, ell_width=16)
    index = DeviceIndex(IndexConfig(dim=embedder.dim, ell_width=16,
                                    row_block=8))
    index.add([c for c, _, _ in CORPUS], out["dense"], metas, terms, impacts)
    return create_agent_pipeline(index, embedder, FakeLLMProvider(),
                                 bm25_stats=stats)


def test_agent_end_to_end(agent):
    resp = agent.query("Quel est le délai de notification d'une violation "
                       "de données ?")
    assert resp.answer
    assert resp.sources
    assert "retrieve" in resp.extras["node_trace"]
    assert "generate" in resp.extras["node_trace"]
    assert resp.extras["refusal_type"] is None


def test_agent_deterministic_refusal(agent):
    class RefusingLLM(FakeLLMProvider):
        def generate(self, prompt, **kw):
            if "intention" in (prompt + "").lower() or "intent" in prompt:
                return LLMResponse(json.dumps({"intent": "refus"}))
            return super().generate(prompt, **kw)

    saved = agent.components.llm, agent.components.intent_classifier.llm
    agent.components.intent_classifier.llm = RefusingLLM()
    try:
        resp = agent.query("Quelle est la météo à Paris demain ?")
        assert resp.model == "deterministic_refusal"
        assert resp.extras["refusal_type"] == "hors_perimetre"
        assert "périmètre" in resp.answer
        assert resp.sources == []
        # unconfirmed refus (no keyword) → reclassified, normal path
        resp2 = agent.query("Faut-il un registre des traitements ?")
        assert resp2.model != "deterministic_refusal"
    finally:
        agent.components.intent_classifier.llm = saved[1]


def test_agent_enrich_detects_articles(agent):
    resp = agent.query("Que dit l'article 33 sur la violation de données ?")
    assert "33" in resp.extras["detected_articles"]


def test_agent_completeness_re_retrieval(agent):
    class LowCoverage(FakeLLMProvider):
        def __init__(self):
            super().__init__()
            self.coverage_calls = 0

        def generate(self, prompt, **kw):
            if "couverture" in prompt.lower() or "complétude" in \
                    prompt.lower() or "coverage" in prompt:
                self.coverage_calls += 1
                if self.coverage_calls == 1:
                    return LLMResponse(json.dumps({
                        "coverage_pct": 50,
                        "missing_aspects": ["sanctions"],
                        "suggested_queries": ["sanctions violation"],
                    }))
                return LLMResponse(json.dumps({"coverage_pct": 95}))
            return super().generate(prompt, **kw)

    llm = LowCoverage()
    comps = agent.components
    saved = comps.llm
    comps.llm = llm
    try:
        resp = agent.query("Quelles obligations en cas de violation ?")
        trace = resp.extras["node_trace"]
        assert trace.count("retrieve") == 2  # re-retrieval happened
        assert resp.retried
    finally:
        comps.llm = saved
