"""Dual generation, map-reduce context, and agent conversation flows."""

import json

import pytest

from rag_dpo_tpu.providers import FakeLLMProvider
from rag_dpo_tpu.providers.base import LLMResponse
from rag_dpo_tpu.rag.context import ContextBuilder
from rag_dpo_tpu.rag.generator import Generator
from rag_dpo_tpu.rag.pipeline import RAGPipeline
from rag_dpo_tpu.retrieval.types import RetrievedChunk, RetrievedDocument


def _docs(n=3, chars=400):
    docs = []
    for i in range(n):
        chunk = RetrievedChunk(
            chunk_id=f"c{i}", text=("contenu numéro %d. " % i) * (chars // 20),
            metadata={"source_url": f"https://x.fr/{i}", "title": f"Doc {i}",
                      "heading": f"Section {i}"},
            score=1.0 - i * 0.1,
        )
        docs.append(RetrievedDocument(doc_key=f"x.fr/{i}", title=f"Doc {i}",
                                      chunks=[chunk], score=chunk.score))
    return docs


def test_reverse_packing_order():
    cb = ContextBuilder(reverse_packing=True)
    built = cb.build_context("q", _docs(3))
    # source 1 (most relevant) must appear LAST in the packed context
    pos1 = built.context_text.find("[Source 1]")
    pos3 = built.context_text.find("[Source 3]")
    assert pos3 < pos1
    cb2 = ContextBuilder(reverse_packing=False)
    built2 = cb2.build_context("q", _docs(3))
    assert built2.context_text.find("[Source 1]") < \
        built2.context_text.find("[Source 3]")


def test_truncation_keeps_best_sources_under_reverse_packing():
    """Overflow without an LLM cuts the FRONT (worst sources) — the tail
    holds [Source 1] under reverse packing (round-2 review finding)."""
    cb = ContextBuilder(llm=None, max_context_chars=600,
                        reverse_packing=True)
    built = cb.build_context("q", _docs(6))
    assert "[Source 1]" in built.context_text   # best source survives
    assert "[Source 6]" not in built.context_text  # worst one dropped
    cb2 = ContextBuilder(llm=None, max_context_chars=600,
                         reverse_packing=False)
    built2 = cb2.build_context("q", _docs(6))
    assert "[Source 1]" in built2.context_text  # front-packed: also kept


def test_delay_validation_requires_full_token():
    """'3 jours' must not pass because '3' appears in 'article 33'
    (round-2 review finding: bare-digit check was vacuous)."""
    from rag_dpo_tpu.rag.validators import GroundingValidator

    v = GroundingValidator()
    ctx = ("L'article 33 impose la notification sous 72 heures "
           "à l'autorité de contrôle.")
    bad = v.validate("Le délai est de 3 jours [Source 1].", ctx,
                     n_sources=1)
    assert any("délai" in i for i in bad.issues), bad.issues
    ok = v.validate("Le délai est de 72 heures [Source 1].", ctx,
                    n_sources=1)
    assert not any("délai" in i for i in ok.issues), ok.issues


def test_sources_trailer_strip_spares_prose():
    """'Source 1 indique…' in prose must survive; only a real
    'Sources :' trailer is stripped (round-2 review finding)."""
    import re

    from rag_dpo_tpu.agent import nodes as agent_nodes  # noqa: F401

    pattern = r"\n+#{0,3}\s*Sources?\s*:.*$"
    answer = ("**Oui.**\nSource 1 indique que le délai est de 72 "
              "heures. Détail important.\n\nSources :\n1. Guide CNIL")
    out = re.sub(pattern, "", answer, flags=re.IGNORECASE | re.DOTALL)
    assert "Détail important" in out
    assert "Guide CNIL" not in out


def test_map_reduce_triggers_over_budget():
    calls = {"map": 0, "reduce": 0}

    class MR(FakeLLMProvider):
        def generate(self, prompt, **kw):
            if "Éléments pertinents" in prompt:
                calls["map"] += 1
                return LLMResponse("note partielle [Source 1]")
            if "Notes :" in prompt:
                calls["reduce"] += 1
                return LLMResponse("fusion des notes [Source 1]")
            return super().generate(prompt, **kw)

    cb = ContextBuilder(llm=MR(), max_context_chars=500,
                        map_batch_chars=300)
    built = cb.build_context("q", _docs(4, chars=600))
    assert built.map_reduced
    assert calls["map"] >= 2 and calls["reduce"] == 1
    assert "fusion des notes" in built.context_text


def test_dual_generation_stance_selection():
    class DualLLM(FakeLLMProvider):
        def __init__(self):
            super().__init__()
            self.n = 0

        def chat(self, messages, temperature=0.0, max_tokens=None):
            self.n += 1
            if self.n % 2 == 1:
                return LLMResponse("Oui, c'est obligatoire.", "m")
            return LLMResponse(
                "Non, pas toujours [Source 1] [Source 2].", "m")

    from rag_dpo_tpu.rag.context import BuiltContext

    pipe = RAGPipeline(
        retriever=None, generator=Generator(DualLLM()),
        context_builder=ContextBuilder(),
        enable_dual_generation=True,
    )
    built = BuiltContext("sys", "user", "ctx", [{"n": 1}, {"n": 2}])
    gen = pipe._dual_generate(built, None)
    # stances disagree; B has more citations → B wins
    assert gen.text.startswith("Non")


def test_dual_generation_error_fallback():
    class FlakyLLM(FakeLLMProvider):
        def __init__(self):
            super().__init__()
            self.n = 0

        def chat(self, messages, temperature=0.0, max_tokens=None):
            self.n += 1
            if self.n == 1:
                return LLMResponse("", "m", error="boom")
            return LLMResponse("Réponse B [Source 1].", "m")

    from rag_dpo_tpu.rag.context import BuiltContext

    pipe = RAGPipeline(
        retriever=None, generator=Generator(FlakyLLM()),
        context_builder=ContextBuilder(), enable_dual_generation=True,
    )
    gen = pipe._dual_generate(
        BuiltContext("s", "u", "c", [{"n": 1}]), None)
    assert "Réponse B" in gen.text


def test_agent_multi_turn_rewrite():
    from test_retrieval import CORPUS
    from rag_dpo_tpu.agent import create_agent_pipeline
    from rag_dpo_tpu.index import DeviceIndex, IndexConfig
    from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
    from rag_dpo_tpu.providers import Embedder, EmbedderConfig

    class Rewriter(FakeLLMProvider):
        def generate(self, prompt, **kw):
            if "Question autonome" in prompt:
                return LLMResponse(
                    "Quel est le délai de notification d'une violation ?")
            return super().generate(prompt, **kw)

    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32), batch_size=8))
    texts = [t for _, t, _ in CORPUS]
    metas = [dict(m, text=t) for _, t, m in CORPUS]
    out = embedder.embed(texts)
    index = DeviceIndex(IndexConfig(dim=embedder.dim, ell_width=16,
                                    row_block=8))
    index.add([c for c, _, _ in CORPUS], out["dense"], metas)
    agent = create_agent_pipeline(index, embedder, Rewriter())

    resp = agent.query(
        "Et pour le délai ?",
        conversation_history=[
            {"role": "user", "content": "Parle-moi des violations"},
            {"role": "assistant", "content": "Une violation est…"},
        ],
    )
    assert "violation" in resp.extras["rewritten_question"].lower()
