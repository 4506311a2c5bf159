"""Fusion-weight calibration from labeled (query → true chunk) pairs.

The hybrid retriever fuses dense and BM25 arms with static RRF weights
(RetrieverConfig.weight_*). The right ratio depends on how strong the
dense encoder actually is on the corpus — a production BGE-M3 earns
dense-heavy weights, while a small or domain-shifted encoder can rank
the true document in the 100s where BM25 puts it at rank 2 (measured on
the hermetic v2 stack, q46: dense rank 157 vs BM25 rank 2; sweeping
dense 2.0→0.5 at bm25 2.0 moved true-doc@5 0.625→0.854). The reference
hard-codes its fusion constants for one encoder (`src/rag/retriever.py`);
this utility MEASURES them per deployment.

Calibration data comes from document content itself (titles, keyword
lines, body-sentence term subsets — e.g. `evals.train_encoder.
build_training_pairs`), never from a benchmark's questions, so tuning
on it cannot leak evaluation data.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from .retriever import HybridRetriever, RetrieverConfig

# (weight_original, weight_bm25_original) candidates; expansion-arm
# weights scale proportionally (same orig:expansion ratio as the
# defaults, 2:1)
DEFAULT_GRID: tuple[tuple[float, float], ...] = (
    (2.0, 1.5), (2.0, 2.0), (1.5, 2.0), (1.0, 2.0),
    (1.0, 1.5), (0.5, 2.0), (0.5, 1.5), (2.0, 1.0),
)


def _with_weights(base: RetrieverConfig, wd: float,
                  wb: float) -> RetrieverConfig:
    return dataclasses.replace(
        base,
        weight_original=wd,
        weight_expansion=wd / 2.0,
        weight_bm25_original=wb,
        weight_bm25_expansion=wb / 2.0,
    )


def calibrate_fusion_weights(
    index,
    embedder,
    bm25_stats,
    labeled: Sequence[tuple[str, str]],
    base_config: RetrieverConfig | None = None,
    grid: Sequence[tuple[float, float]] | None = None,
    k: int = 5,
    max_queries: int = 96,
    seed: int = 0,
) -> tuple[RetrieverConfig, dict]:
    """Pick the fusion-weight grid point with the best chunk hit@k on
    `labeled` (query text, true chunk_id) pairs. → (config, report).

    Ties break toward the base config's weights, then toward the
    earlier grid entry — calibration only moves weights when the data
    says so. The report carries the full measured sweep for audit
    (the same discipline as benchmarks/bench_oversample_study.py: no
    blind knobs)."""
    base = base_config or RetrieverConfig()
    grid = list(grid or DEFAULT_GRID)
    base_point = (base.weight_original, base.weight_bm25_original)
    if base_point not in grid:
        grid.insert(0, base_point)

    labeled = list(labeled)
    if len(labeled) > max_queries:
        rng = np.random.default_rng(seed)
        idx = rng.choice(len(labeled), size=max_queries, replace=False)
        labeled = [labeled[i] for i in sorted(idx)]

    sweep = []
    best = None
    for wd, wb in grid:
        cfg = _with_weights(base, wd, wb)
        retriever = HybridRetriever(index, embedder,
                                    bm25_stats=bm25_stats, config=cfg)
        hits = 0
        for query, true_id in labeled:
            cands = retriever.retrieve_candidates(query, n_candidates=k)
            if any(c.chunk_id == true_id for c in cands):
                hits += 1
        rate = hits / max(len(labeled), 1)
        entry = {"weight_original": wd, "weight_bm25_original": wb,
                 "hit_rate": round(rate, 4)}
        sweep.append(entry)
        better = best is None or rate > best[0] + 1e-12
        prefer_base = (best is not None
                       and abs(rate - best[0]) <= 1e-12
                       and (wd, wb) == base_point)
        if better or prefer_base:
            best = (rate, wd, wb)

    cfg = _with_weights(base, best[1], best[2])
    report = {
        "kind": "fusion_weight_calibration",
        "n_queries": len(labeled),
        "k": k,
        "chosen": {"weight_original": best[1],
                   "weight_bm25_original": best[2],
                   "hit_rate": round(best[0], 4)},
        "sweep": sweep,
    }
    return cfg, report
