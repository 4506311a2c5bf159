"""Mine the hermetic v2 per-category lows (VERDICT r4 item 5).

The committed trained record shows a wide per-category spread
(international 0.25 … procedure 0.92 in results_hermetic_20260820_*).
This script decomposes WHERE each weak category loses its score:

* retrieval: rank of the true chunk (`qa_<id>`) in the top-5; which
  near-miss class outranks it (twin_/blend_/nav_/other qa_/filler);
  per-arm ranks (dense-only vs sparse-only) to blame the arm;
* scoring: keyword / semantic / source components per question from a
  fresh harness run, so a retrieval-clean question with a low score is
  visibly a packing/answer problem instead.

Run:  JAX_PLATFORMS=cpu python scripts/mine_categories.py [category ...]
"""

import collections
import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("XLA_FLAGS",
                      "--xla_force_host_platform_device_count=8")


def classify_chunk(cid: str) -> str:
    for pre in ("twin_", "blend_", "nav_"):
        if cid.startswith(pre):
            return pre[:-1]
    if cid.startswith("qa_"):
        return "other_qa"
    return "filler"


def main() -> int:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import numpy as np

    from rag_dpo_tpu.evals import EvalHarness, load_qa_dataset
    from rag_dpo_tpu.evals.harness import EvalConfig
    from rag_dpo_tpu.evals.synthetic import (
        ExtractiveFakeLLM,
        build_synthetic_corpus,
    )
    from rag_dpo_tpu.evals.train_encoder import (
        TRAINED_NPZ,
        load_trained_params,
    )
    from rag_dpo_tpu.ingest.indexer import CorpusIndexer
    from rag_dpo_tpu.models import BgeM3Config, EncoderConfig
    from rag_dpo_tpu.providers import Embedder, EmbedderConfig
    from rag_dpo_tpu.rag import create_pipeline
    from rag_dpo_tpu.retrieval import HybridRetriever, RetrieverConfig

    want = set(sys.argv[1:]) or None
    dataset = load_qa_dataset()
    chunks = build_synthetic_corpus(dataset)
    params = (load_trained_params(TRAINED_NPZ)
              if pathlib.Path(TRAINED_NPZ).exists() else None)
    embedder = Embedder(
        EmbedderConfig(
            model=BgeM3Config(
                encoder=EncoderConfig.tiny(use_flash_attention=False),
                colbert_dim=32),
            batch_size=64),
        params=params)
    index, stats, _ = CorpusIndexer(
        embedder, ell_width=48).build(chunks, mode="reset")

    both = HybridRetriever(index, embedder, bm25_stats=stats,
                           config=RetrieverConfig(use_prefilter=False))
    dense = HybridRetriever(
        index, embedder, bm25_stats=stats,
        config=RetrieverConfig(use_prefilter=False, use_sparse=False))

    # mirror run_hermetic_replay's gated configuration (no reranker,
    # no expansion) so per-question scores match the committed series
    pipe = create_pipeline(index, embedder, ExtractiveFakeLLM(),
                           bm25_stats=stats, use_reranker=False,
                           use_expansion=False)
    harness = EvalHarness(pipe, embedder=embedder,
                          config=EvalConfig(n_runs=1))
    report = harness.run(dataset)
    by_id = {r["id"]: r for r in report["results"]}

    def rank_of(retriever, question, true_id, k=20):
        cands = retriever.retrieve_candidates(question, n_candidates=k)
        ids = [c.chunk_id for c in cands]
        return (ids.index(true_id) if true_id in ids else -1), ids

    cat_rows = collections.defaultdict(list)
    for item in dataset:
        cat = item.get("category")
        if want and cat not in want:
            continue
        qid = item["id"]
        true_id = f"qa_{qid}"
        r_both, ids5 = rank_of(both, item["question"], true_id)
        r_dense, _ = rank_of(dense, item["question"], true_id)
        winners = [classify_chunk(c) for c in ids5[:5]]
        sc = by_id[qid]
        cat_rows[cat].append({
            "id": qid,
            "rank_hybrid": r_both, "rank_dense": r_dense,
            "top5": winners,
            "global": sc["global_score"],
            "keyword": sc["keyword_score"],
            "semantic": sc["semantic_score"],
            "source": sc["source_score"],
            "conciseness": sc["conciseness_score"],
        })

    summary = {}
    for cat, rows in sorted(cat_rows.items(),
                            key=lambda kv: np.mean(
                                [r["global"] for r in kv[1]])):
        in5 = sum(1 for r in rows if 0 <= r["rank_hybrid"] < 5)
        wincount = collections.Counter(
            w for r in rows if r["rank_hybrid"] not in range(0, 1)
            for w in r["top5"][:1])
        summary[cat] = {
            "n": len(rows),
            "mean_global": round(float(np.mean(
                [r["global"] for r in rows])), 4),
            "true_in_top5": f"{in5}/{len(rows)}",
            "mean_keyword": round(float(np.mean(
                [r["keyword"] for r in rows])), 4),
            "mean_semantic": round(float(np.mean(
                [r["semantic"] for r in rows])), 4),
            "mean_source": round(float(np.mean(
                [r["source"] for r in rows])), 4),
            "rank1_winner_when_not_rank0": dict(wincount),
        }
        print(f"\n=== {cat} ===")
        print(json.dumps(summary[cat], ensure_ascii=False))
        for r in rows:
            print(json.dumps(r, ensure_ascii=False))
    return 0


if __name__ == "__main__":
    sys.exit(main())
