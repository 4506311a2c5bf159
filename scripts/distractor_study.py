"""Distractor-scaling study for the hermetic corpus (VERDICT r3 #7).

Sweeps the near-miss distractor density of the v2 synthetic corpus and
records the random-init retrieval difficulty at each point — the basis
for pinning the gate fixture's hardness. Run:

    JAX_PLATFORMS=cpu python scripts/distractor_study.py

Prints one JSON line per configuration and a markdown table suitable
for BENCHMARKS.md. The pinned gate fixture is the synthetic.py default
(near_miss_per_item=3, n_distractors=20).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"


def measure(near_miss: int, n_distractors: int, version: int = 2):
    from rag_dpo_tpu.evals import load_qa_dataset
    from rag_dpo_tpu.evals.retrieval_eval import (
        cited_source_hit_rate,
        true_doc_hit_rate,
    )
    from rag_dpo_tpu.evals.synthetic import build_synthetic_corpus
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
    from rag_dpo_tpu.providers import Embedder, EmbedderConfig
    from rag_dpo_tpu.retrieval import HybridRetriever, RetrieverConfig

    dataset = load_qa_dataset()
    chunks = build_synthetic_corpus(
        dataset, n_distractors=n_distractors, version=version,
        near_miss_per_item=near_miss)
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(
            encoder=EncoderConfig.tiny(use_flash_attention=False),
            colbert_dim=32),
        batch_size=64))
    index, stats, _ = CorpusIndexer(
        embedder, ell_width=24).build(chunks, mode="reset")
    retriever = HybridRetriever(
        index, embedder, bm25_stats=stats,
        config=RetrieverConfig(use_prefilter=False))
    kw = cited_source_hit_rate(dataset, retriever, k=5)["mean_hit_rate"]
    td = true_doc_hit_rate(dataset, retriever, k=5)["hit_rate"]
    return {"version": version, "near_miss_per_item": near_miss,
            "n_distractors": n_distractors, "n_chunks": len(chunks),
            "cited_kw_hit_at_5": kw, "true_doc_hit_at_5": td}


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    rows = []
    rows.append(measure(0, 20, version=1))   # the v1 (round 1-3) corpus
    for nm in (0, 1, 2, 3):
        rows.append(measure(nm, 20))
    rows.append(measure(3, 60))
    for r in rows:
        print(json.dumps(r), flush=True)
    print("\n| corpus | near-miss/item | fillers | chunks | "
          "kw hit@5 | true-doc@5 |")
    print("|---|---|---|---|---|---|")
    for r in rows:
        tag = f"v{r['version']}"
        pin = " **(pinned gate fixture)**" if (
            r["version"] == 2 and r["near_miss_per_item"] == 3
            and r["n_distractors"] == 20) else ""
        print(f"| {tag}{pin} | {r['near_miss_per_item']} | "
              f"{r['n_distractors']} | {r['n_chunks']} | "
              f"{r['cited_kw_hit_at_5']:.4f} | "
              f"{r['true_doc_hit_at_5']:.4f} |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
