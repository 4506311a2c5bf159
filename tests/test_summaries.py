"""SummaryGenerator: fiche generation, navigation detection, resume
checkpointing, and the near-textless vision fallback (reference
`generate_document_summaries.py:36`)."""

import json

from rag_dpo_tpu.ingest.summaries import (
    SummaryGenerator,
    looks_like_navigation,
)
from rag_dpo_tpu.providers import FakeLLMProvider
from rag_dpo_tpu.providers.base import LLMResponse


class VisionFake(FakeLLMProvider):
    def __init__(self):
        super().__init__()
        self.vision_calls = []

    def generate_with_image(self, prompt, image_bytes, temperature=0.0):
        self.vision_calls.append(len(image_bytes))
        return LLMResponse("Infographie : les 6 étapes d'une AIPD.",
                           self.model_name)


LONG_TEXT = ("Le responsable de traitement doit tenir un registre des "
             "activités et notifier toute violation de données à la "
             "CNIL dans un délai de soixante-douze heures. ") * 6


def test_navigation_detection():
    assert looks_like_navigation("Accueil\n- Lien\n- Lien")
    assert not looks_like_navigation(LONG_TEXT)


def test_textual_document_uses_llm_not_vision(tmp_path):
    llm = VisionFake()
    gen = SummaryGenerator(llm)
    fiche = gen.summarize_document("Guide", [LONG_TEXT],
                                   raw_bytes=b"%PDF-raw")
    assert fiche["summary"]
    assert not fiche.get("via")
    assert llm.vision_calls == []  # enough text → no vision


def test_near_textless_document_falls_back_to_vision(tmp_path):
    llm = VisionFake()
    gen = SummaryGenerator(llm)
    fiche = gen.summarize_document("Infographie AIPD", ["(schéma)"],
                                   raw_bytes=b"%PDF-fake-image-bytes")
    assert fiche["via"] == "vision"
    assert "AIPD" in fiche["summary"]
    assert llm.vision_calls == [len(b"%PDF-fake-image-bytes")]
    assert fiche["navigation"] is False


def test_vision_error_degrades_to_nav_or_text():
    gen = SummaryGenerator(FakeLLMProvider())  # base stub: vision errors
    fiche = gen.summarize_document("Doc", ["(court)"], raw_bytes=b"x")
    assert fiche["navigation"] is True  # tiny text → nav heuristic


def test_run_checkpoints_and_passes_paths(tmp_path):
    llm = VisionFake()
    gen = SummaryGenerator(llm)
    img = tmp_path / "doc.pdf"
    img.write_bytes(b"%PDF-image-only")
    docs = {
        "d1": {"title": "Guide", "chunks": [LONG_TEXT],
               "url": "https://x/1"},
        "d2": {"title": "Infographie", "chunks": ["x"],
               "path": str(img), "url": "https://x/2"},
    }
    out = tmp_path / "summaries.json"
    results = gen.run(docs, out)
    assert results["d1"]["summary"] and not results["d1"].get("via")
    assert results["d2"]["via"] == "vision"
    saved = json.loads(out.read_text())
    assert set(saved) == {"d1", "d2"}
    # resume: second run re-does nothing (fiches already present)
    llm.calls.clear()
    llm.vision_calls.clear()
    gen.run(docs, out)
    assert llm.vision_calls == []
