"""Hermetic 48-question eval replay → committed regression record.

The reference keeps 80+ historical eval-result JSONs under `eval/` as a
regression record (`/root/reference/eval/results_*.json`, SURVEY §4).
This script produces the same kind of artifact for THIS framework with
zero external dependencies: synthetic corpus derived from the vendored
qa_dataset, tiny random-init encoder, extractive fake LLM — so the
recorded scores track the retrieval + orchestration path, not LLM
quality, and any regression in the device path moves them.

Run (CPU is fine and deterministic):
    JAX_PLATFORMS=cpu python scripts/run_hermetic_replay.py

Writes rag_dpo_tpu/evals/results/results_hermetic_<stamp>.json and
prints the summary line. With real weights + a real LLM endpoint, the
same harness replays the reference's 90.4% benchmark — see README
"Real-weights replay".
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

os.environ.setdefault("JAX_PLATFORMS", "cpu")


def main():
    import jax

    if os.environ.get("JAX_PLATFORMS") == "cpu":
        jax.config.update("jax_platforms", "cpu")

    from rag_dpo_tpu.evals import EvalHarness, load_qa_dataset
    from rag_dpo_tpu.evals.harness import EvalConfig
    from rag_dpo_tpu.evals.retrieval_eval import cited_source_hit_rate
    from rag_dpo_tpu.evals.synthetic import (
        ExtractiveFakeLLM,
        build_synthetic_corpus,
    )
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
    from rag_dpo_tpu.providers import Embedder, EmbedderConfig
    from rag_dpo_tpu.rag import create_pipeline
    from rag_dpo_tpu.retrieval import HybridRetriever, RetrieverConfig

    dataset = load_qa_dataset()
    chunks = build_synthetic_corpus(dataset)
    embedder = Embedder(EmbedderConfig(
        model=BgeM3Config(
            encoder=EncoderConfig.tiny(use_flash_attention=False),
            colbert_dim=32,
        ),
        batch_size=64,
    ))
    index, stats, report = CorpusIndexer(
        embedder, ell_width=24).build(chunks, mode="reset")
    assert report.verification["self_retrieval_ok"]
    pipe = create_pipeline(
        index, embedder, ExtractiveFakeLLM(), bm25_stats=stats,
        use_reranker=False, use_expansion=False,
    )
    harness = EvalHarness(pipe, embedder=embedder,
                          config=EvalConfig(n_runs=3))
    multi = harness.run_multi(dataset)

    retriever = HybridRetriever(
        index, embedder, bm25_stats=stats,
        config=RetrieverConfig(use_prefilter=False),
    )
    hits = cited_source_hit_rate(dataset, retriever, k=5)
    record = {
        "kind": "hermetic_replay",
        "notes": "synthetic corpus from the vendored qa_dataset; tiny "
                 "random-init encoder; extractive fake LLM — tracks the "
                 "retrieval/orchestration path, not LLM quality",
        "n_questions": len(dataset),
        "global_score": multi["global_score"],
        "high_spread_questions": multi["high_spread_questions"],
        "per_category": multi["runs"][0]["per_category"],
        "conciseness": multi["runs"][0]["conciseness"],
        "faithfulness": multi["runs"][0]["faithfulness"],
        "source_score": multi["runs"][0]["source_score"],
        "cited_source_hit_rate_at_5": hits["mean_hit_rate"],
        "total_time_seconds": multi["total_time_seconds"],
    }
    out_dir = (pathlib.Path(__file__).resolve().parent.parent
               / "rag_dpo_tpu" / "evals" / "results")
    path = EvalHarness.save_report(harness, record, out_dir,
                                   tag="hermetic")
    print(json.dumps({k: record[k] for k in
                      ("global_score", "faithfulness", "source_score",
                       "cited_source_hit_rate_at_5")}))
    print(f"saved {path}")


if __name__ == "__main__":
    main()
