"""Citation machinery fuzz: random answers through renumbering +
grounding.

Invariants for format_response_with_sources: output cites exactly
1..K densely; every kept citation maps to a real input source; the
Sources section lists exactly the cited ones in order; uncited answers
pass through untouched; out-of-range citations are dropped.
"""

from __future__ import annotations

import re

import numpy as np
import pytest

from rag_dpo_tpu.rag.context import ContextBuilder
from rag_dpo_tpu.rag.validators import extract_citations

_SENT = ["Le délai est de 72 heures", "Le registre est obligatoire",
         "L'AIPD s'impose", "Voir la doctrine CNIL",
         "La sanction peut atteindre 20 millions d'euros",
         "Chaque responsable documente sa conformité"]


def _answer(rng, n_sources):
    parts = []
    for _ in range(int(rng.integers(1, 8))):
        s = str(rng.choice(_SENT))
        r = rng.integers(0, 4)
        if r == 0:
            s += f" [Source {rng.integers(-2, n_sources + 3)}]"
        elif r == 1 and n_sources >= 2:
            a, b = rng.choice(n_sources, size=2, replace=False) + 1
            s += f" [Sources {a}, {b}]"
        elif r == 2:
            s += f" [Source {rng.integers(1, n_sources + 1)}]"
        parts.append(s + ".")
    return " ".join(parts)


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_citation_renumbering(seed):
    rng = np.random.default_rng(seed)
    n_sources = int(rng.integers(1, 9))
    sources = [{"n": i + 1, "title": f"Doc {i + 1}",
                "url": f"https://cnil.fr/d{i + 1}",
                "chunk_ids": [f"c{i + 1}"]} for i in range(n_sources)]
    answer = _answer(rng, n_sources)
    cb = ContextBuilder()
    out, used = cb.format_response_with_sources(answer, sources)

    cited_in = [c for c in extract_citations(answer)
                if 1 <= c <= n_sources]
    if not cited_in:
        assert out == answer and used == []
        return
    body = out.split("**Sources :**")[0]
    cited_out = sorted(set(extract_citations(body)))
    # dense 1..K
    assert cited_out == list(range(1, len(set(cited_in)) + 1)), \
        (seed, answer, out)
    # used sources aligned with new numbering and real inputs
    assert [u["n"] for u in used] == cited_out
    titles = {u["title"] for u in used}
    assert titles <= {s["title"] for s in sources}
    # sources section lists each used source once
    tail = out.split("**Sources :**")[1]
    for u in used:
        assert f"{u['n']}. {u['title']}" in tail
    # out-of-range citations never survive
    for c in extract_citations(out):
        assert 1 <= c <= len(used), (seed, out)
