"""LLM query expansion: 3 reformulations + graceful fallback.

Role parity with the reference's QueryExpander (`src/rag/query_expander.py`:
prompt at :19-27, expand at :66-113 — temp 0.7, numbered-list parse with
quality filters, fallback to [original] on any error). The multi-query
output feeds the batched dense/sparse arms of the retriever.
"""

from __future__ import annotations

import re

from ..providers.base import BaseLLMProvider

EXPANSION_PROMPT = """Tu aides un moteur de recherche documentaire RGPD/CNIL.
Reformule la question suivante de {n} façons différentes pour maximiser la
couverture de recherche. Chaque reformulation doit rester fidèle au sens,
utiliser un vocabulaire juridique ou opérationnel varié, et tenir en une
phrase. Réponds UNIQUEMENT par une liste numérotée.

Question : "{question}"
"""


class QueryExpander:
    def __init__(self, llm: BaseLLMProvider, n_expansions: int = 3,
                 temperature: float = 0.7):
        self.llm = llm
        self.n_expansions = n_expansions
        self.temperature = temperature

    def expand(self, question: str) -> list[str]:
        """→ [original, reformulation…] (always starts with the original)."""
        if self.n_expansions <= 0:
            return [question]
        resp = self.llm.generate(
            EXPANSION_PROMPT.format(question=question, n=self.n_expansions),
            temperature=self.temperature,
        )
        if not resp.ok or not resp.text.strip():
            return [question]
        refs = self._parse(resp.text, question)
        return [question] + refs[: self.n_expansions]

    def _parse(self, text: str, original: str) -> list[str]:
        out: list[str] = []
        for line in text.splitlines():
            m = re.match(r"\s*(?:\d+[.)]\s*|[-*]\s+)(.+)", line)
            if not m:
                continue
            cand = m.group(1).strip().strip('"').strip()
            # quality filters: length sane, not a copy of the original
            if not (10 <= len(cand) <= 300):
                continue
            if cand.lower() == original.lower():
                continue
            if cand in out:
                continue
            out.append(cand)
        return out
