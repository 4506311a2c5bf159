"""Text-utility fuzz: LLM-JSON repair and markdown fixup.

extract_json_object must never raise on arbitrary garbage and must
recover every recoverable object; fix_markdown_formatting must be
idempotent (a second pass changes nothing) and never lose words.
"""

from __future__ import annotations

import json

import numpy as np
import pytest

from rag_dpo_tpu.rag.context import fix_markdown_formatting
from rag_dpo_tpu.rag.intent import extract_json_object


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_json_repair_never_raises_and_recovers(seed):
    rng = np.random.default_rng(seed)
    base = {"intent": "factuel", "topics": ["registre", "aipd"],
            "score": int(rng.integers(0, 100)), "ok": True}
    clean = json.dumps(base, ensure_ascii=False)
    corruptions = [
        lambda s: "Voici la réponse :\n" + s,              # prose prefix
        lambda s: s + "\nMerci !",                         # prose suffix
        lambda s: "```json\n" + s + "\n```",               # fence
        lambda s: s.replace('"factuel"', '"factuel",'),    # trailing comma
        lambda s: s[: int(len(s) * 0.8)],                  # truncation
        lambda s: s.replace('"', "'"),                     # single quotes
        lambda s: "".join(chr(rng.integers(32, 1000))
                          for _ in range(30)),             # pure garbage
    ]
    for corrupt in corruptions:
        text = corrupt(clean)
        out = extract_json_object(text)          # must not raise
        assert out is None or isinstance(out, dict)
    # the benign wrappers must recover the full object
    for corrupt in corruptions[:3]:
        out = extract_json_object(corrupt(clean))
        assert out and out.get("intent") == "factuel", corrupt(clean)


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_markdown_fixup_idempotent(seed):
    rng = np.random.default_rng(seed)
    pieces = ["## Titre", "##Titre collé", "- item", "• puce", "▪ carré",
              "**gras**", "**gras ouvert", "texte simple rgpd",
              "1. numéro", "", "", "[Source 1]", "---"]
    text = "\n".join(rng.choice(pieces,
                                size=int(rng.integers(3, 15))))
    once = fix_markdown_formatting(text)
    twice = fix_markdown_formatting(once)
    assert once == twice, (seed, repr(text), repr(once), repr(twice))
    # no word lost
    for w in text.split():
        w_clean = w.strip("*#•▪-")
        if w_clean:
            assert w_clean in once, (seed, w)
