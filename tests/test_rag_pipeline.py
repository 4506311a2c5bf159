import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig, FakeLLMProvider
from rag_dpo_tpu.rag import (
    ContextBuilder,
    GroundingValidator,
    IntentClassifier,
    RAGPipeline,
    create_pipeline,
)
from rag_dpo_tpu.rag.pipeline import (
    build_enterprise_where_filter,
    detect_stance,
    rebuild_documents_from_ranked_chunks,
)
from rag_dpo_tpu.rag.context import fix_markdown_formatting
from rag_dpo_tpu.rag.validators import extract_citations
from rag_dpo_tpu.retrieval.bm25 import (
    build_bm25_stats,
    build_ell_corpus,
    tokenize_corpus,
)
from rag_dpo_tpu.retrieval.types import RetrievedChunk
from rag_dpo_tpu.models import EncoderConfig as ECfg

from test_retrieval import CORPUS


@pytest.fixture(scope="module")
def pipeline():
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

    from rag_dpo_tpu.retrieval.reranker import CrossEncoderReranker

    return create_pipeline(
        index, embedder, FakeLLMProvider(),
        bm25_stats=stats,
        reranker=CrossEncoderReranker(
            model_config=ECfg.tiny(use_flash_attention=False)
        ),
    )


def test_pipeline_end_to_end(pipeline):
    resp = pipeline.query("Quel est le délai de notification d'une "
                          "violation de données à la CNIL ?")
    assert resp.answer
    assert resp.total_time > 0
    assert resp.intent == "factuel"
    assert resp.n_candidates > 0
    # FakeLLM cites Source 1 & 2 → renumbered sources section present
    assert "[Source 1]" in resp.answer
    assert resp.sources, "cited sources should be extracted"
    assert "Sources :" in resp.answer


def test_pipeline_empty_corpus_filter(pipeline):
    resp = pipeline.query("question", where_filter={"nature": "INEXISTANT"})
    assert "aucun document" in resp.answer.lower()
    assert resp.sources == []


def test_enterprise_filter_builder():
    f = build_enterprise_where_filter(["rh", "juridique"])
    assert f == {"$or": [{"source": "CNIL"}, {"tag_rh": True},
                         {"tag_juridique": True}]}
    f2 = build_enterprise_where_filter(["rh"], {"nature": "GUIDE"})
    assert "$and" in f2
    assert build_enterprise_where_filter(None, {"a": 1}) == {"a": 1}
    # raw UI labels normalize to the ingestor's tag_<slug> fields
    f3 = build_enterprise_where_filter(["RH", "Juridique & Contrats"])
    assert f3 == {"$or": [{"source": "CNIL"}, {"tag_rh": True},
                          {"tag_juridique_contrats": True}]}


def test_detect_stance():
    assert detect_stance("Oui, le RGPD s'applique.") == "oui"
    assert detect_stance("**Non**, ce n'est pas requis.") == "non"
    assert detect_stance("Cela dépend du contexte.") == "neutre"


def test_rebuild_documents_groups_and_caps():
    chunks = [
        RetrievedChunk("a1", "t", {"source_url": "https://x.fr/a"}, 0.9),
        RetrievedChunk("b1", "t", {"source_url": "https://x.fr/b"}, 0.8),
        RetrievedChunk("a2", "t", {"source_url": "http://www.x.fr/a/"}, 0.7),
        RetrievedChunk("a3", "t", {"source_url": "https://x.fr/a"}, 0.6),
    ]
    docs = rebuild_documents_from_ranked_chunks(chunks, 5, 2)
    assert [d.doc_key for d in docs] == ["x.fr/a", "x.fr/b"]
    assert len(docs[0].chunks) == 2  # capped at n_chunks_per_doc


def test_grounding_validator_catches_hallucinations():
    v = GroundingValidator()
    ctx = "L'amende maximale est de 20 millions d'euros. Article 83 du RGPD."
    ok = v.validate("L'amende peut atteindre 20 millions [Source 1].",
                    ctx, n_sources=2)
    assert ok.grounded
    bad = v.validate(
        "L'amende est de 50 millions d'euros selon l'article 99 "
        "[Source 7].", ctx, n_sources=2,
    )
    assert not bad.grounded
    assert bad.invented_sources == [7]
    assert any("article" in i for i in bad.issues)
    assert any("montant" in i or "50" in i for i in bad.issues)


def test_fix_invented_sources():
    fixed = GroundingValidator.fix_invented_sources(
        "Vrai [Source 1]. Faux [Source 9]. Mixte [Sources 2, 8].", 3
    )
    assert "[Source 1]" in fixed
    assert "Source 9" not in fixed
    assert "[Source 2]" in fixed and "8" not in fixed


def test_citation_renumbering():
    cb = ContextBuilder()
    sources = [{"n": i, "title": f"Doc {i}", "url": f"https://d/{i}",
                "chunk_ids": []} for i in range(1, 6)]
    answer = "Premier point [Source 4]. Second [Source 2]. Encore [Source 4]."
    out, used = cb.format_response_with_sources(answer, sources)
    assert "[Source 1]" in out and "[Source 2]" in out
    assert "[Source 4]" not in out
    assert [u["title"] for u in used] == ["Doc 4", "Doc 2"]
    assert "Sources :" in out


def test_markdown_fixup():
    out = fix_markdown_formatting("##Titre\n• point\n\n\n\ntexte **gras")
    assert "## Titre" in out
    assert "- point" in out
    assert "\n\n\n" not in out
    assert out.count("**") % 2 == 0


def test_intent_classifier_fallback_on_garbage():
    class Garbage(FakeLLMProvider):
        def generate(self, *a, **k):
            from rag_dpo_tpu.providers.base import LLMResponse
            return LLMResponse("pas du json")

    intent = IntentClassifier(Garbage()).classify("Qu'est-ce que le RGPD ?")
    assert intent.intent == "factuel"


def test_extract_citations_variants():
    assert extract_citations("a [Source 1] b [Sources 2, 3] c "
                             "[source 4] [Sources 5 et 6]") == \
        [1, 2, 3, 4, 5, 6]


class _SlowTrackingLLM(FakeLLMProvider):
    """FakeLLM that sleeps per call and records the max number of
    concurrently in-flight generate() calls."""

    def __init__(self, delay=0.15):
        super().__init__()
        import threading

        self._delay = delay
        self._lock = threading.Lock()
        self._inflight = 0
        self.max_inflight = 0

    def generate(self, *a, **k):
        import time as _t

        with self._lock:
            self._inflight += 1
            self.max_inflight = max(self.max_inflight, self._inflight)
        try:
            _t.sleep(self._delay)
            return super().generate(*a, **k)
        finally:
            with self._lock:
                self._inflight -= 1


def _tiny_stack(llm):
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
    index.add([c for c, _, _ in CORPUS], out["dense"], metas, terms,
              impacts)
    from rag_dpo_tpu.retrieval.reranker import CrossEncoderReranker

    return create_pipeline(
        index, embedder, llm, bm25_stats=stats,
        reranker=CrossEncoderReranker(
            model_config=ECfg.tiny(use_flash_attention=False)),
    )


def test_intent_classification_overlaps_expansion():
    """The intent LLM call runs concurrently with the expansion LLM
    call inside retrieval (the reference serializes them,
    `src/rag/pipeline.py:215,224`); outputs are unchanged."""
    llm = _SlowTrackingLLM()
    pipe = _tiny_stack(llm)
    resp = pipe.query("Quel est le délai de notification d'une "
                      "violation de données à la CNIL ?")
    assert resp.answer and resp.intent == "factuel"
    assert llm.max_inflight >= 2, "intent did not overlap expansion"


def test_overlap_intent_can_be_disabled():
    llm = _SlowTrackingLLM()
    pipe = _tiny_stack(llm)
    pipe.overlap_intent = False
    resp = pipe.query("Quel est le délai de notification d'une "
                      "violation de données à la CNIL ?")
    assert resp.answer and resp.intent == "factuel"
    assert llm.max_inflight == 1
