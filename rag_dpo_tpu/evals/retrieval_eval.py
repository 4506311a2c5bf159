"""Retrieval-only, LLM-independent evaluation.

SURVEY.md §7 hard-part 6: "retrieval-level metrics (recall@5, cited-source
hit rate) must be designed to be LLM-independent" — the reference cannot
measure retrieval quality without its full Ollama stack. These metrics
need only the retriever:

* recall@k between two retrievers (ours vs a reference/oracle run)
* cited-source hit rate against `expected_sources_keywords`
* throughput (QPS) with warm-up and on-device chaining for axon
"""

from __future__ import annotations

import time
import unicodedata
from typing import Sequence


def _norm(text: str) -> str:
    text = unicodedata.normalize("NFKD", text.lower())
    return "".join(c for c in text if not unicodedata.combining(c))


def recall_at_k(result_ids: Sequence[Sequence[str]],
                oracle_ids: Sequence[Sequence[str]], k: int) -> float:
    """Mean fraction of the oracle's top-k present in ours."""
    assert len(result_ids) == len(oracle_ids)
    total = 0.0
    counted = 0
    for got, want in zip(result_ids, oracle_ids):
        want_k = list(want)[:k]
        if not want_k:
            continue  # no oracle rows → the query is unmeasurable
        counted += 1
        got_k = set(list(got)[:k])
        total += len(got_k & set(want_k)) / len(want_k)
    # divide by the MEASURABLE queries: skipped pairs must not deflate
    # the metric (review finding)
    return total / max(counted, 1)


def cited_source_hit_rate(dataset: Sequence[dict], retriever,
                          k: int = 5) -> dict:
    """For each QA item: do the top-k retrieved chunks mention the
    expected source keywords? (cited-source hit rate, BASELINE.json
    config 1)."""
    hits, total = 0, 0
    per_question = []
    for item in dataset:
        expected = item.get("expected_sources_keywords") or []
        if not expected:
            continue
        chunks = retriever.retrieve_candidates(item["question"],
                                               n_candidates=k)
        blob = _norm(" ".join(
            f"{c.title} {c.heading} {c.text} {c.source_url}"
            for c in chunks
        ))
        found = sum(
            1 for kw in expected
            if all(w in blob for w in _norm(kw).split() if len(w) > 2)
        )
        rate = found / len(expected)
        per_question.append({"id": item["id"], "hit_rate": round(rate, 3)})
        hits += rate
        total += 1
    return {
        "mean_hit_rate": round(hits / max(total, 1), 4),
        "n_questions": total,
        "per_question": per_question,
    }


def true_doc_hit_rate(dataset: Sequence[dict], retriever,
                      k: int = 5) -> dict:
    """Strict doc-id retrieval metric over the synthetic corpus: is the
    item's OWN ground-truth chunk (chunk_id `qa_<id>`) in the top-k?

    Unlike `cited_source_hit_rate` (keyword presence — a same-topic
    near-miss distractor counts as a hit), this is immune to topical
    look-alikes: only ranking the true document in the top-k scores.
    The metric the trained-vs-random-init encoder comparison gates on."""
    hits, total = 0, 0
    per_question = []
    for item in dataset:
        chunks = retriever.retrieve_candidates(item["question"],
                                               n_candidates=k)
        ids = {c.chunk_id for c in chunks}
        hit = f"qa_{item['id']}" in ids
        per_question.append({"id": item["id"], "hit": bool(hit)})
        hits += hit
        total += 1
    return {
        "hit_rate": round(hits / max(total, 1), 4),
        "n_questions": total,
        "per_question": per_question,
    }


def measure_qps(search_fn, queries, n_iters: int = 20,
                warmup: int = 2) -> dict:
    """Throughput of a batched search callable (host-side timing; for
    device-only chained timing see bench.py)."""
    for _ in range(warmup):
        search_fn(queries)
    t0 = time.time()
    for _ in range(n_iters):
        search_fn(queries)
    dt = (time.time() - t0) / n_iters
    q = len(queries)
    return {
        "qps": round(q / dt, 1),
        "latency_ms_per_batch": round(dt * 1e3, 3),
        "batch_size": q,
    }
