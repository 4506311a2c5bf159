"""Chunker invariant fuzz: random section streams in, invariants out.

Invariants (reference behavior, process_and_chunk.py:973-1098): no
word lost (every input word appears in some chunk body), bodies never
exceed max_words unless a single sentence does, merged pieces respect
min_words where a same-heading neighbor existed, chunk ids unique and
ordered, heading prefixed into text.
"""

from __future__ import annotations

import numpy as np
import pytest

from rag_dpo_tpu.ingest.chunker import ChunkerConfig, StructuralChunker
from rag_dpo_tpu.ingest.parsing import Section

_WORDS = ("donnée traitement registre analyse impact délai sanction "
          "responsable sous-traitant finalité minimisation sécurité "
          "notification conformité audit contrôle archivage base "
          "légale consentement").split()


def _sentence(rng, n):
    words = list(rng.choice(_WORDS, size=n))
    words[0] = words[0].capitalize()  # the splitter follows French
    return " ".join(words) + "."      # convention: period + capital


@pytest.mark.parametrize("seed", range(6))
def test_fuzz_chunker_invariants(seed):
    rng = np.random.default_rng(seed)
    cfg = ChunkerConfig(max_words=int(rng.choice([40, 80, 600])),
                        min_words=int(rng.choice([5, 15, 100])),
                        overlap_words=int(rng.choice([0, 10, 50])))
    sections = []
    for si in range(int(rng.integers(1, 6))):
        n_sent = int(rng.integers(1, 12))
        body = " ".join(
            _sentence(rng, int(rng.integers(3, 40)))
            for _ in range(n_sent))
        sections.append(Section(
            heading=f"Titre {si}" if rng.integers(0, 2) else "",
            text=body, page_info=f"p{si}"))
    chunks = StructuralChunker(cfg).chunk_sections(sections, "doc")
    if not any(s.text for s in sections):
        assert chunks == []
        return

    # every input word appears in some chunk body
    all_bodies = " ".join(c.body for c in chunks)
    for sec in sections:
        for w in sec.text.split():
            assert w in all_bodies, (seed, w)

    ids = [c.chunk_id for c in chunks]
    assert len(set(ids)) == len(ids)
    assert ids == sorted(ids)

    for c in chunks:
        words = c.body.split()
        # the hard bound: max + overlap tail + merge slack — beyond
        # that only a single monster sentence may push (overlap-based
        # chunking's intrinsic overshoot, same as the reference's)
        bound = cfg.max_words + cfg.overlap_words + cfg.min_words
        if len(words) > bound:
            from rag_dpo_tpu.ingest.chunker import _SENTENCE_SPLIT

            sentences = _SENTENCE_SPLIT.split(c.body)
            assert any(len(s.split()) > cfg.max_words
                       for s in sentences), \
                (seed, len(words), bound)
        if c.heading:
            assert c.text.startswith(f"[{c.heading}]")
