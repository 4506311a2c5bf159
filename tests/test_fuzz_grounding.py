"""Grounding-validator fuzz: planted facts vs invented facts.

Random answers built from facts that either DO or DON'T appear in the
context; the deterministic hallucination check must flag every invented
amount/article/delay and accept every planted one.
"""

from __future__ import annotations

import numpy as np
import pytest

from rag_dpo_tpu.rag.validators import GroundingValidator

_FACTS = [
    ("une amende de {} millions d'euros", ["4", "10", "20", "35"]),
    ("l'article {} du RGPD", ["5", "17", "28", "33", "83"]),
    ("un délai de {} heures", ["24", "48", "72"]),
    ("un délai de {} jours", ["8", "15", "30"]),
]


@pytest.mark.parametrize("seed", range(8))
def test_fuzz_hallucination_detection(seed):
    rng = np.random.default_rng(seed)
    # context carries a random subset of fact values
    planted, invented = [], []
    ctx_parts = ["La réglementation prévoit plusieurs obligations."]
    for tmpl, values in _FACTS:
        vals = list(values)
        rng.shuffle(vals)
        split = int(rng.integers(1, len(vals)))
        for v in vals[:split]:
            ctx_parts.append(tmpl.format(v) + ".")
            planted.append((tmpl, v))
        for v in vals[split:]:
            invented.append((tmpl, v))
    context = " ".join(ctx_parts)

    v = GroundingValidator()
    # planted-only answer: no hallucination issues
    use = [planted[i] for i in
           rng.choice(len(planted), size=min(3, len(planted)),
                      replace=False)]
    answer = ("D'après les sources [Source 1], on note "
              + " et ".join(t.format(val) for t, val in use) + ".")
    rep = v.validate(answer, context, n_sources=2)
    halluc = [i for i in rep.issues
              if any(w in i for w in ("absent", "introuvable",
                                      "hallucin", "inventé"))]
    assert not halluc, (seed, answer, rep.issues)

    # one invented fact: must be flagged
    if invented:
        t, val = invented[int(rng.integers(0, len(invented)))]
        bad = answer[:-1] + f" ainsi que {t.format(val)}."
        rep2 = v.validate(bad, context, n_sources=2)
        assert len(rep2.issues) > len(rep.issues), \
            (seed, t.format(val), rep2.issues)
