"""Synthetic corpus + extractive generator for hermetic full-stack eval.

The reference's 90.4% benchmark needs its private 16,919-chunk CNIL index
plus live Ollama — unreproducible in CI. This module makes the 48-question
replay runnable hermetically:

* `build_synthetic_corpus(dataset)` — one relevant document per QA item,
  synthesized from its `expected_answer_summary` and
  `expected_sources_keywords` (+ distractor documents), so retrieval has
  a ground-truth target per question;
* `ExtractiveFakeLLM` — a deterministic generator that answers by
  extracting the context sentences sharing vocabulary with the question
  and citing their `[Source N]`. No hallucination by construction, so the
  eval exercises retrieval quality end-to-end: if retrieval surfaces the
  right document, keyword/source scores are high; if not, they drop.
"""

from __future__ import annotations

import re

from ..providers.fake import FakeLLMProvider
from ..tokenize.french import tokenize_french_text


def build_synthetic_corpus(dataset: list[dict],
                           n_distractors: int = 20) -> list[dict]:
    chunks = []
    for item in dataset:
        body = item.get("expected_answer_summary", "")
        kws = item.get("expected_sources_keywords") or []
        refs = item.get("reference_articles") or []
        # a real document about a topic contains the topic's phrasing:
        # heading from the question, body from the expected answer, a
        # keyword line like CNIL pages' tag footers.
        heading = item["question"].rstrip(" ?")
        text = f"{heading}. {body}"
        if refs:
            text += " Références : " + ", ".join(refs) + "."
        if kws:
            text += " Mots-clés : " + ", ".join(kws) + "."
        title = (kws[0].title() if kws else item["question"][:60])
        chunks.append({
            "chunk_id": f"qa_{item['id']}",
            "text": text,
            "heading": title,
            "title": title,
            "doc_key": f"cnil.fr/{item['id']}",
            "source_url": f"https://cnil.fr/fr/{item['id']}",
            "source": "CNIL",
            "nature": "DOCTRINE",
        })
    filler = [
        "La commission publie chaque année un rapport d'activité détaillant "
        "ses missions d'information et de contrôle.",
        "Le site propose des fiches pratiques destinées aux professionnels "
        "et aux particuliers sur des sujets variés.",
        "Des webinaires de sensibilisation sont organisés régulièrement à "
        "destination des organismes publics et privés.",
        "L'actualité réglementaire européenne fait l'objet d'une veille "
        "publiée sur le portail institutionnel.",
    ]
    for i in range(n_distractors):
        text = filler[i % len(filler)] + f" (édition {2020 + i % 6})"
        chunks.append({
            "chunk_id": f"distract_{i}",
            "text": text,
            "heading": "Informations générales",
            "title": f"Page générale {i}",
            "doc_key": f"cnil.fr/general/{i}",
            "source_url": f"https://cnil.fr/fr/general/{i}",
            "source": "CNIL",
            "nature": "MIXTE",
        })
    return chunks


_SOURCE_BLOCK = re.compile(r"\[Source (\d+)\]\s*([^\n]*)\n(.*?)(?=\n\[Source \d+\]|\Z)",
                           re.DOTALL)
_QUESTION_RE = re.compile(r"Question\s*:\s*(.+?)(?:\n|$)")


class ExtractiveFakeLLM(FakeLLMProvider):
    """Deterministic extractive answering over the provided context."""

    model_name = "fake-extractive"

    def _auto(self, prompt: str, system: str, json_mode: bool) -> str:
        if "[Source" in prompt and "Question" in prompt:
            return self._answer(prompt)
        return super()._auto(prompt, system, json_mode)

    def _answer(self, prompt: str) -> str:
        # find the LAST "Question :" occurrence (history may contain more)
        questions = _QUESTION_RE.findall(prompt)
        question = questions[-1] if questions else ""
        q_terms = set(tokenize_french_text(question))

        scored: list[tuple[float, int, str]] = []
        for m in _SOURCE_BLOCK.finditer(prompt):
            n = int(m.group(1))
            block = (m.group(2) or "") + " " + (m.group(3) or "")
            for sentence in re.split(r"(?<=[.!?])\s+", block):
                s_terms = set(tokenize_french_text(sentence))
                if not s_terms:
                    continue
                overlap = len(q_terms & s_terms)
                if overlap:
                    scored.append((overlap / (len(s_terms) ** 0.5), n,
                                   sentence.strip()))
        scored.sort(key=lambda x: -x[0])
        if not scored:
            return ("Les documents fournis ne permettent pas de répondre "
                    "précisément à cette question.")
        parts = []
        seen_sentences: set[str] = set()
        for _, n, sentence in scored[:3]:
            if sentence in seen_sentences:
                continue
            seen_sentences.add(sentence)
            parts.append(f"{sentence} [Source {n}]")
        return " ".join(parts)
