import json
import pathlib

import pytest

from rag_dpo_tpu.ingest import (
    ChunkerConfig,
    StructuralChunker,
    parse_document,
)
from rag_dpo_tpu.ingest.chunker import ChunkFeatureExtractor, table_to_text
from rag_dpo_tpu.ingest.classify import ChunkClassifier, DocumentClassifier
from rag_dpo_tpu.ingest.dedup import deduplicate
from rag_dpo_tpu.ingest.filter import RelevanceFilter
from rag_dpo_tpu.ingest.parsing import Section, Table
from rag_dpo_tpu.ingest.summaries import looks_like_navigation
from rag_dpo_tpu.providers import FakeLLMProvider
from rag_dpo_tpu.providers.base import LLMResponse

HTML_DOC = b"""<html><head><title>Guide AIPD</title></head><body>
<nav>menu menu menu</nav>
<div class="region-content">
<h2>Quand realiser une AIPD</h2>
<p>L'analyse d'impact est obligatoire pour les traitements susceptibles
d'engendrer un risque eleve pour les droits et libertes des personnes.</p>
<p>La CNIL publie une liste des types d'operations concernees.</p>
<h2>Les etapes</h2>
<p>Etape 1 : decrire le traitement. Etape 2 : evaluer la necessite.</p>
<table><tr><th>Critere</th><th>Seuil</th></tr>
<tr><td>Surveillance systematique</td><td>Grande echelle</td></tr></table>
</div>
<footer>pied de page</footer>
</body></html>"""


def test_parse_html_sections_and_tables():
    sections = parse_document(HTML_DOC, "html")
    headings = [s.heading for s in sections]
    assert "Quand realiser une AIPD" in headings
    assert "Les etapes" in headings
    etapes = next(s for s in sections if s.heading == "Les etapes")
    assert etapes.tables and etapes.tables[0].headers == ["Critere", "Seuil"]
    # nav/footer stripped
    assert not any("menu" in s.text for s in sections)


def test_parse_markdown_and_txt():
    md = "# Titre\n\nIntro.\n\n## Partie A\ncontenu a\n\n## Partie B\nb"
    sections = parse_document(md.encode(), "md")
    assert [s.heading for s in sections] == ["Titre", "Partie A", "Partie B"]
    txt = parse_document("juste du texte".encode(), "txt")
    assert txt[0].text == "juste du texte"


def test_parse_unknown_format_raises():
    with pytest.raises(ValueError, match="no parser"):
        parse_document(b"x", "pdf" if "pdf" not in
                       __import__("rag_dpo_tpu.ingest.parsing",
                                  fromlist=["supported_formats"]
                                  ).supported_formats() else "zzz")


def test_chunker_split_overlap_merge():
    long_text = ". ".join(
        f"Phrase numéro {i} avec assez de mots pour compter largement"
        for i in range(200)
    ) + "."
    chunker = StructuralChunker(ChunkerConfig(max_words=120, min_words=30,
                                              overlap_words=20))
    chunks = chunker.chunk_sections(
        [Section("Titre", long_text, 2)], "doc1"
    )
    assert len(chunks) > 5
    for c in chunks:
        assert len(c.body.split()) <= 170  # max + overlap slack
        assert c.text.startswith("[Titre]")
    # overlap: consecutive chunks share words
    w1 = c1 = chunks[0].body.split()
    w2 = chunks[1].body.split()
    assert set(w1[-10:]) & set(w2[:40])
    # ids unique & stable format
    assert chunks[0].chunk_id == "doc1#c0000"


def test_chunker_merges_small_pieces():
    chunker = StructuralChunker(ChunkerConfig(max_words=100, min_words=50))
    sections = [Section("H", "court morceau", 2),
                Section("H", " ".join(["mot"] * 80), 2)]
    chunks = chunker.chunk_sections(sections, "d")
    assert len(chunks) == 1


def test_table_conversion_mechanical_and_llm():
    table = Table(headers=["Critère", "Seuil"],
                  rows=[["Surveillance", "Grande échelle"]])
    mech = table_to_text(table, llm=None)
    assert "Critère: Surveillance" in mech
    class TableLLM(FakeLLMProvider):
        def generate(self, *a, **k):
            return LLMResponse("La surveillance s'applique à grande "
                               "échelle.\n[TAGS] surveillance, échelle")
    out = table_to_text(table, llm=TableLLM())
    assert "surveillance" in out.lower()


def test_feature_extractor():
    f = ChunkFeatureExtractor().extract(
        "L'article 33 impose une amende. Étape 1 : chiffrement des données "
        "de santé."
    )
    assert f["has_article_refs"] and f["has_sanctions"]
    assert f["has_steps"] and f["has_technical"]
    assert "santé" in f["sectors"]


def test_chunk_classifier_rules_and_ambiguity():
    clf = ChunkClassifier(llm=None)
    feats = ChunkFeatureExtractor().extract(
        "Étape 1 : faire le registre. Étape 2 : modèle de mention."
    )
    assert clf.classify("texte", feats) == "GUIDE"
    # ambiguous → constrained LLM
    class PickB(FakeLLMProvider):
        def generate(self, prompt, **kw):
            return LLMResponse("TECHNIQUE")
    clf2 = ChunkClassifier(llm=PickB(), ambiguity_gap=5.0)
    feats2 = ChunkFeatureExtractor().extract(
        "Étape 1 : chiffrement. Étape 2 : pseudonymisation. modèle"
    )
    assert clf2.classify("texte", feats2) in ("GUIDE", "TECHNIQUE")
    assert clf2.n_llm_calls == 1


def test_document_classifier_validator_and_cache():
    class Classifier(FakeLLMProvider):
        def generate(self, *a, **k):
            return LLMResponse(json.dumps({
                "nature": "GUIDE", "secteurs": ["Santé"],
                "importance": 22, "type_document": "guide",
                "mots_cles": ["aipd"],
            }))
    cache = {}
    dc = DocumentClassifier(Classifier(), cache=cache)
    c = dc.classify("d1", "Délibération SAN-2024-001",
                    "sanction de 100 000 euros amende")
    assert c.nature == "SANCTION"  # validator overrides GUIDE
    assert c.importance == 10      # clamped
    assert "d1" in cache
    # cache hit (SAME content) returns without LLM
    dc2 = DocumentClassifier(FakeLLMProvider(), cache=cache)
    same = dc2.classify("d1", "Délibération SAN-2024-001",
                        "sanction de 100 000 euros amende")
    assert same.nature == "SANCTION"
    # CHANGED content must re-classify, not return the stale entry
    # (incremental-update flow — round-2 review finding)
    changed = dc2.classify("d1", "Guide pratique AIPD",
                           "guide méthodologique analyse d'impact")
    assert changed.nature != "SANCTION"


def test_relevance_filter():
    f = RelevanceFilter(llm=None)
    d = f.decide("https://cnil.fr/fr/presse/communique", "t", "x")
    assert not d.keep and d.method == "url_exclude"
    d = f.decide("https://cnil.fr/fr/aipd", "Guide AIPD RGPD",
                 "analyse d'impact données personnelles sous-traitant "
                 "registre consentement")
    assert d.keep and d.method == "prescore"
    d = f.decide("https://cnil.fr/fr/page", "recette de cuisine", "du sel")
    assert not d.keep


def test_dedup_canonical_pick():
    docs = [
        {"doc_id": "a", "url": "http://x.fr/page-longue-url",
         "content": "même   contenu ici"},
        {"doc_id": "b", "url": "https://x.fr/p", "content": "même contenu ici"},
        {"doc_id": "c", "url": "https://x.fr/autre", "content": "différent"},
    ]
    kept, archived = deduplicate(docs)
    assert {d["doc_id"] for d in kept} == {"b", "c"}
    assert archived[0]["duplicate_of"] == "b"


def test_navigation_detection():
    nav = "\n".join(f"- Lien {i}" for i in range(20))
    assert looks_like_navigation(nav)
    real = ("Le responsable de traitement doit notifier toute violation "
            "de données dans les soixante-douze heures suivant sa "
            "découverte, conformément aux obligations du règlement." * 3)
    assert not looks_like_navigation(real)
