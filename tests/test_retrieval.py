import numpy as np
import pytest

from rag_dpo_tpu.index import DeviceIndex, IndexConfig
from rag_dpo_tpu.providers import Embedder, EmbedderConfig, FakeLLMProvider
from rag_dpo_tpu.rag.expander import QueryExpander
from rag_dpo_tpu.retrieval import (
    CrossEncoderReranker,
    HybridRetriever,
    RetrieverConfig,
    SummaryBm25Index,
)
from rag_dpo_tpu.retrieval.bm25 import (
    build_bm25_stats,
    build_ell_corpus,
    tokenize_corpus,
)
from rag_dpo_tpu.models import BgeM3Config, EncoderConfig

CORPUS = [
    ("c0", "Le délégué à la protection des données conseille le responsable "
           "de traitement sur les obligations du RGPD.",
     {"source_url": "https://cnil.fr/dpo-role", "title": "Rôle du DPO",
      "doc_key": "cnil.fr/dpo-role", "nature": "DOCTRINE",
      "heading": "Missions du DPO"}),
    ("c1", "En cas de violation de données personnelles, la notification à "
           "la CNIL doit intervenir dans les 72 heures.",
     {"source_url": "https://cnil.fr/violations", "title": "Violations",
      "doc_key": "cnil.fr/violations", "nature": "GUIDE",
      "heading": "Notification 72h"}),
    ("c2", "L'analyse d'impact relative à la protection des données est "
           "obligatoire pour les traitements à risque élevé.",
     {"source_url": "https://cnil.fr/aipd", "title": "AIPD",
      "doc_key": "cnil.fr/aipd", "nature": "GUIDE",
      "heading": "Quand faire une AIPD"}),
    ("c3", "Le registre des activités de traitement recense l'ensemble des "
           "traitements de données de l'organisme.",
     {"source_url": "https://cnil.fr/registre", "title": "Registre",
      "doc_key": "cnil.fr/registre", "nature": "DOCTRINE",
      "heading": "Tenir le registre"}),
    ("c4", "Les durées de conservation des données doivent être définies et "
           "proportionnées à la finalité du traitement.",
     {"source_url": "https://cnil.fr/durees", "title": "Durées",
      "doc_key": "cnil.fr/durees", "nature": "DOCTRINE",
      "heading": "Durées de conservation"}),
    ("c5", "La notification d'une violation comporte la nature de la "
           "violation et les mesures prises, transmises à la CNIL.",
     {"source_url": "https://cnil.fr/violations", "title": "Violations",
      "doc_key": "cnil.fr/violations", "nature": "GUIDE",
      "heading": "Contenu de la notification"}),
]


@pytest.fixture(scope="module")
def stack():
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

    summary = SummaryBm25Index()
    summary.build([
        {"doc_key": m["doc_key"], "title": m["title"], "summary": t,
         "url": m["source_url"]}
        for (_, t, m) in CORPUS
    ])
    retriever = HybridRetriever(
        index, embedder, bm25_stats=stats, summary_index=summary,
        query_expander=QueryExpander(FakeLLMProvider()),
        config=RetrieverConfig(per_arm_k=6, prefilter_top_docs=5),
    )
    return retriever, embedder, index


def test_lexical_retrieval_hits_right_chunk(stack):
    retriever, _, _ = stack
    chunks = retriever.retrieve_candidates(
        "notification violation 72 heures CNIL", n_candidates=4
    )
    assert chunks, "no candidates returned"
    # the 72h chunk must be in the fused candidates via the BM25 arm
    ids = [c.chunk_id for c in chunks]
    assert "c1" in ids
    assert all(c.text for c in chunks)
    assert chunks[0].score >= chunks[-1].score


def test_retrieve_documents_dedup(stack):
    retriever, _, _ = stack
    docs = retriever.retrieve("notification violation CNIL", n_documents=3,
                              n_chunks_per_doc=2)
    keys = [d.doc_key for d in docs]
    assert len(keys) == len(set(keys))
    viol = next((d for d in docs if d.doc_key == "cnil.fr/violations"), None)
    assert viol is not None
    assert len(viol.chunks) <= 2


def test_retrieve_with_filter(stack):
    retriever, _, _ = stack
    chunks = retriever.retrieve_candidates(
        "registre des traitements", n_candidates=4,
        where={"nature": "GUIDE"},
    )
    natures = {c.metadata["nature"] for c in chunks}
    assert natures <= {"GUIDE"}


def test_acronym_expansion_changes_queries(stack):
    retriever, _, _ = stack
    qs = retriever._queries("Que fait le DPO ?")
    assert "délégué à la protection des données" in qs[0]
    assert len(qs) >= 2  # fake LLM expansions parsed


def test_cross_encoder_reranker(stack):
    retriever, _, _ = stack
    chunks = retriever.retrieve_candidates("violation de données",
                                           n_candidates=6)
    rr = CrossEncoderReranker(
        model_config=EncoderConfig.tiny(use_flash_attention=False)
    )
    ranked = rr.rerank("violation de données", chunks, top_k=4)
    assert 3 <= len(ranked) <= 4  # min_keep fallback allowed
    scores = [c.rerank_score for c in ranked]
    assert scores == sorted(scores, reverse=True)


def test_reranker_empty_and_error_fallback():
    rr = CrossEncoderReranker(
        model_config=EncoderConfig.tiny(use_flash_attention=False)
    )
    assert rr.rerank("q", []) == []


def test_summary_prefilter(stack):
    _, _, index = stack
    summary = SummaryBm25Index()
    summary.build([
        {"doc_key": m["doc_key"], "title": m["title"], "summary": t}
        for (_, t, m) in CORPUS
    ])
    keys = summary.relevant_doc_keys("violation notification", top_k=3)
    assert "cnil.fr/violations" in keys


def test_summary_prefilter_host_path_and_device_parity(stack):
    """Small (document-level) summary corpora score on HOST — no
    per-query device dispatch at all (a serving run OOM'd in this
    prefilter under 16 concurrent workers next to the 12B, and the
    tunnel RTT costs more than the numpy scan anyway). Large corpora
    take the device ELL path with the corpus uploaded ONCE (a per-call
    `jnp.asarray(self._terms)` used to re-ship it on EVERY query)."""
    docs = [
        {"doc_key": m["doc_key"], "title": m["title"], "summary": t}
        for (_, t, m) in CORPUS
    ]
    summary = SummaryBm25Index()
    summary.build(docs)
    host_hits = summary.search("violation notification")
    assert summary._dev is None  # host path: nothing touched device

    dev_idx = SummaryBm25Index()
    dev_idx.build(docs)
    dev_idx.HOST_SCORE_MAX_DOCS = 0  # force the device path
    dev_hits = dev_idx.search("violation notification")
    dev = dev_idx._dev
    assert dev is not None
    dev_idx.search("registre des traitements")
    assert dev_idx._dev is dev  # same device buffers, no re-upload

    # host and device paths rank identically (scores equal within fp)
    assert [k for k, _ in host_hits][:3] == [k for k, _ in dev_hits][:3]
    for (hk, hs), (dk, ds) in zip(host_hits, dev_hits):
        assert hk == dk and abs(hs - ds) < 1e-3

    # rebuilding invalidates the cached device copy
    dev_idx.build(docs)
    assert dev_idx._dev is None


def test_pair_batching_matches_direct_and_coalesces():
    """enable_pair_batching: concurrent score_pairs callers get scores
    identical to the direct path, and the batcher stats prove the
    cross-encoder forwards coalesced."""
    import threading

    import numpy as np

    direct = CrossEncoderReranker(
        model_config=EncoderConfig.tiny(use_flash_attention=False))
    params = direct.load()
    batched = CrossEncoderReranker(
        model_config=EncoderConfig.tiny(use_flash_attention=False),
        params=params)
    batched.enable_pair_batching(max_batch=64, max_wait_ms=10.0)

    groups = [[(f"question {i}", f"passage {j} sur les données")
               for j in range(3 + i % 4)] for i in range(6)]
    want = [direct.score_pairs(g) for g in groups]

    batched.score_pairs(groups[0])          # warm
    batched._pair_batcher.stats.__init__()

    got = [None] * len(groups)
    barrier = threading.Barrier(len(groups))

    def run(i):
        barrier.wait()
        got[i] = batched.score_pairs(groups[i])

    ts = [threading.Thread(target=run, args=(i,))
          for i in range(len(groups))]
    [t.start() for t in ts]
    [t.join() for t in ts]
    for i in range(len(groups)):
        np.testing.assert_allclose(got[i], want[i], atol=1e-5,
                                   rtol=1e-5)
    st = batched._pair_batcher.stats
    assert st.n_device_calls < st.n_requests
    assert st.max_batch_seen > 1


def test_topic_matcher_boosts_matching_tags_at_rerank():
    """TopicMatcher wiring parity with the reference
    (`src/rag/pipeline.py:156-160` builds it whenever an embedding
    provider exists; `src/rag/reranker.py:168-180` applies the boost):
    identical topic/tag strings embed to cosine 1.0 → max boost; the
    default factory reranker carries a matcher."""
    import numpy as np

    from rag_dpo_tpu.rag.topics import TopicMatcher

    retriever, embedder, _ = None, None, None
    from rag_dpo_tpu.models import BgeM3Config
    from rag_dpo_tpu.providers import Embedder, EmbedderConfig

    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(encoder=EncoderConfig.tiny(
            use_flash_attention=False), colbert_dim=32)))
    tm = TopicMatcher(embedder)
    # identical strings → cosine 1.0 → the full +0.15
    assert abs(tm.topic_boost(["vidéosurveillance"],
                              ["vidéosurveillance"]) - 0.15) < 1e-6
    assert tm.topic_boost([], ["x"]) == 0.0
    assert tm.topic_boost(["x"], []) == 0.0

    # the factory default reranker carries a matcher (boost reaches
    # production rerank; regression for the dead-wiring gap)
    from rag_dpo_tpu.rag.pipeline import create_pipeline
    from rag_dpo_tpu.providers import FakeLLMProvider
    from rag_dpo_tpu.index import DeviceIndex, IndexConfig

    texts = ["La vidéosurveillance au travail est encadrée.",
             "Le registre des traitements est obligatoire."]
    dense = embedder.embed(texts)["dense"]
    metas = [{"text": t, "title": f"d{i}", "heading": "",
              "source_url": f"https://cnil.fr/d{i}", "doc_key": f"d{i}",
              "source": "CNIL", "nature": "DOCTRINE",
              "rgpd_topics": "vidéosurveillance" if i == 0 else "registre"}
             for i, t in enumerate(texts)]
    index = DeviceIndex(IndexConfig(dim=embedder.dim, ell_width=8,
                                    row_block=8))
    from rag_dpo_tpu.retrieval.bm25 import (
        build_bm25_stats, build_ell_corpus, tokenize_corpus,
    )
    tokens = tokenize_corpus(texts)
    stats = build_bm25_stats(tokens)
    terms, impacts = build_ell_corpus(tokens, stats, ell_width=8)
    index.add([f"c{i}" for i in range(2)], dense, metas, terms, impacts)
    pipe = create_pipeline(index, embedder, FakeLLMProvider(),
                           bm25_stats=stats)
    assert pipe.reranker is not None
    assert pipe.reranker.topic_matcher is not None


def test_expander_parallel_fanout_and_degradation():
    """On pool providers the expander fans out n single-reformulation
    requests (the expansion wall drops to the longest single decode);
    failures degrade to fewer reformulations, never a crash; explicit
    parallel=False keeps the single-call path."""

    class PoolStub:
        _driver = object()          # looks like a continuous provider

        def __init__(self):
            self.calls = []

        def generate(self, prompt, system=None, temperature=0.0,
                     max_tokens=None, **kw):
            from rag_dpo_tpu.providers.base import LLMResponse

            self.calls.append((prompt, max_tokens))
            if "vocabulaire juridique" in prompt:
                return LLMResponse("Quelles obligations légales "
                                   "s'appliquent au registre ?")
            if "plus générale" in prompt:
                return LLMResponse("", error="boom")  # one arm dies
            if "plus spécifique" in prompt:
                return LLMResponse("1. Comment tenir le registre "
                                   "des traitements au quotidien ?")
            return LLMResponse("Faut-il un registre ?")

    llm = PoolStub()
    ex = QueryExpander(llm, n_expansions=3)
    out = ex.expand("Comment tenir un registre des traitements ?")
    assert out[0] == "Comment tenir un registre des traitements ?"
    assert len(out) == 3            # 2 survivors of 3 fan-out arms
    assert all(10 <= len(r) <= 300 for r in out[1:])
    assert len(llm.calls) == 3
    assert all(mt == 36 for _, mt in llm.calls)  # capped decodes
    # numbered-list prefix stripped on the single-line parse
    assert not any(r.startswith("1.") for r in out)

    # forced single-call path still works
    class SingleStub:
        def generate(self, prompt, system=None, temperature=0.0,
                     max_tokens=None, **kw):
            from rag_dpo_tpu.providers.base import LLMResponse

            return LLMResponse("1. Variante une du registre ?\n"
                               "2. Variante deux du registre ?")

    ex2 = QueryExpander(SingleStub(), n_expansions=3, parallel=False)
    out2 = ex2.expand("Comment tenir un registre ?")
    assert len(out2) == 3 and out2[1].startswith("Variante une")

    # all arms failing degrades to [original]
    class DeadStub:
        _driver = object()

        def generate(self, *a, **k):
            from rag_dpo_tpu.providers.base import LLMResponse

            return LLMResponse("", error="down")

    ex3 = QueryExpander(DeadStub(), n_expansions=3)
    assert ex3.expand("Question ?") == ["Question ?"]


def test_calibrate_fusion_weights_downweights_broken_dense_arm():
    """calibrate_fusion_weights must (a) include the base point and
    report the full sweep, (b) never pick weights that score below the
    base config on the calibration labels, (c) move weight off a dense
    arm that ranks the true chunk poorly (here: random-init encoder vs
    lexically exact queries — BM25 is near-perfect, dense is noise)."""
    import dataclasses

    from rag_dpo_tpu.retrieval import calibrate_fusion_weights

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
    labeled = [(text[:60], cid) for cid, text, _ in CORPUS]
    base = RetrieverConfig(use_prefilter=False, n_expansions=0)
    cfg, report = calibrate_fusion_weights(
        index, embedder, stats, labeled, base_config=base, k=3)
    assert report["kind"] == "fusion_weight_calibration"
    points = {(e["weight_original"], e["weight_bm25_original"])
              for e in report["sweep"]}
    assert (base.weight_original, base.weight_bm25_original) in points
    by_point = {(e["weight_original"], e["weight_bm25_original"]):
                e["hit_rate"] for e in report["sweep"]}
    base_rate = by_point[(base.weight_original,
                          base.weight_bm25_original)]
    assert report["chosen"]["hit_rate"] >= base_rate
    assert cfg.weight_original == report["chosen"]["weight_original"]
    # expansion-arm weights keep the 2:1 orig:expansion ratio
    assert cfg.weight_expansion == cfg.weight_original / 2.0
