"""Prompt-surface parity: 7 distinct intent-specific system prompts
(reference `src/rag/context_builder.py:25-227`) and acronym breadth
(reference `src/utils/acronyms.py:6-149`, ~120 entries)."""

import dataclasses

from rag_dpo_tpu.rag.acronyms import ACRONYMS, expand_acronyms
from rag_dpo_tpu.rag.context import (
    BASE_SYSTEM_PROMPT,
    INTENT_INSTRUCTIONS,
    INTENT_SYSTEM_PROMPTS,
    ContextBuilder,
)

INTENTS = ["factuel", "methodologique", "organisationnel", "comparaison",
           "cas_pratique", "liste_exhaustive", "refus"]


@dataclasses.dataclass
class _Chunk:
    chunk_id: str
    text: str
    heading: str = ""
    source_url: str = "https://x"


@dataclasses.dataclass
class _Doc:
    doc_key: str
    title: str
    chunks: list
    score: float = 1.0


def _docs():
    return [_Doc("d1", "Doc un", [_Chunk("c1", "Texte source un.")]),
            _Doc("d2", "Doc deux", [_Chunk("c2", "Texte source deux.")])]


def test_each_intent_has_distinct_full_system_prompt():
    assert set(INTENT_SYSTEM_PROMPTS) == set(INTENTS)
    prompts = [INTENT_SYSTEM_PROMPTS[i] for i in INTENTS]
    assert len(set(prompts)) == 7
    # "full" means real prompt surface, not a one-liner per intent
    for intent, p in zip(INTENTS, prompts):
        assert len(p) > 700, (intent, len(p))
    # structural markers: every non-refus prompt carries citation rules
    # and a response plan; refus carries the sanction scaffolding
    for intent in INTENTS[:-1]:
        p = INTENT_SYSTEM_PROMPTS[intent]
        assert "[Source" in p
        assert "PLAN DE RÉPONSE" in p
    assert "art. 83" in INTENT_SYSTEM_PROMPTS["refus"]
    assert "323-1" in INTENT_SYSTEM_PROMPTS["refus"]


def test_build_context_selects_prompt_by_intent():
    builder = ContextBuilder()
    seen = set()
    for intent in INTENTS:
        built = builder.build_context("Question ?", _docs(), intent=intent)
        assert built.system_prompt == INTENT_SYSTEM_PROMPTS[intent]
        seen.add(built.system_prompt)
    assert len(seen) == 7
    # unknown intent falls back to the factual prompt
    built = builder.build_context("Q ?", _docs(), intent="inconnu")
    assert built.system_prompt == BASE_SYSTEM_PROMPT


def test_negative_instruction_slot_flows_into_user_prompt():
    builder = ContextBuilder()
    built = builder.build_context(
        "Question ?", _docs(), intent="factuel",
        negative_topics=["cookies", "prospection"],
    )
    assert "cookies" in built.user_prompt
    assert "prospection" in built.user_prompt
    assert all("{negative_instruction}" in t
               for t in INTENT_INSTRUCTIONS.values())


def test_acronym_dictionary_breadth():
    assert len(ACRONYMS) >= 120  # reference has ~120 entries
    # spot-check core DPO vocabulary is covered
    for key in ("rgpd", "cnil", "dpo", "aipd", "bcr", "cct", "cepd",
                "hds", "nir", "anssi", "snds", "ebios", "dpa"):
        assert key in ACRONYMS, key


def test_acronym_expansion_word_boundaries():
    out = expand_acronyms("Faut-il une AIPD pour la vidéosurveillance ?")
    assert "analyse d'impact" in out
    # no false trigger inside words or on French determiners
    assert expand_acronyms("ce traitement est licite") == \
        "ce traitement est licite"
    assert expand_acronyms("la place du marché") == "la place du marché"
