"""Time-to-first-token of the STREAMING RAG path with the 12B on-chip.

The reference's chat page blocks ~39 s with zero output
(`/root/reference/pages/1_💬_Chat.py:312` — the answer appears only
when generation completes). Here `/query {"stream": true}` starts
emitting as soon as retrieval + prefill finish; this bench measures
that gap on real hardware through `pipeline.query_stream` (the same
generator the SSE endpoint consumes).

Prints per-query: TTFT (first delta), total stream time. Run on the
real chip: python benchmarks/bench_ttft.py
"""

import dataclasses
import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.app.demo import build_demo_stack
from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

QUESTIONS = [
    "Quel est le délai de notification d'une violation de données à la CNIL ?",
    "Quelles sont les obligations du responsable de traitement ?",
    "Quand désigner un délégué à la protection des données ?",
    "Quelles mesures de sécurité exige l'article 32 du RGPD ?",
]


def main():
    cfg = DecoderConfig.mistral_nemo_12b()
    cfg = dataclasses.replace(cfg, quantize_weights=True,
                              tie_embeddings=True, max_seq_len=1536,
                              param_dtype=jnp.bfloat16, quantize_kv=True)
    llm = TPULLMProvider(cfg, max_new_tokens=96, continuous=True,
                         max_batch=8, speculative=True, prefix_cache=8,
                         prefill_chunk=256, decode_chunk=8)
    llm.generator.load()
    pipe, ctx = build_demo_stack(llm=llm)
    pipe.max_quality_retries = 0

    def stream_once(q, p=None):
        p = p or pipe
        t0 = time.time()
        ttft = None
        for kind, _ in p.query_stream(q):
            if kind == "delta" and ttft is None:
                ttft = time.time() - t0
        return ttft, time.time() - t0

    for q in QUESTIONS:                       # warm all shapes
        stream_once(q)
    ttfts, totals = [], []
    for q in QUESTIONS * 2:
        ttft, total = stream_once(q)
        if ttft is None:        # no delta (empty retrieval / gen error)
            print(f"no delta for {q!r} — skipped", flush=True)
            continue
        ttfts.append(ttft)
        totals.append(total)
        print(f"ttft={ttft:.2f}s total={total:.2f}s", flush=True)
    assert ttfts, "no query produced a streamed delta"

    # --- fast intent arm: intent by constrained choice + trigger
    # topics — the intent leg of the pre-stream window shrinks from a
    # 96-token decode to one prefill+extend
    from rag_dpo_tpu.rag.pipeline import create_pipeline

    pipe_fast = create_pipeline(
        ctx["index"], ctx["embedder"], llm,
        bm25_stats=ctx["bm25_stats"], summary_index=ctx["summary_index"],
        intent_fast=True)
    pipe_fast.max_quality_retries = 0
    for q in QUESTIONS:                       # warm choose shapes
        stream_once(q, pipe_fast)
    f_ttfts, f_totals = [], []
    for q in QUESTIONS * 2:
        ttft, total = stream_once(q, pipe_fast)
        if ttft is None:
            continue
        f_ttfts.append(ttft)
        f_totals.append(total)
        print(f"fast: ttft={ttft:.2f}s total={total:.2f}s", flush=True)

    out = {"bench": "ttft_streaming_rag_12B_int8",
           "device": str(jax.devices()[0]),
           "mean_ttft_s": round(float(np.mean(ttfts)), 2),
           "p95_ttft_s": round(float(np.quantile(ttfts, 0.95)), 2),
           "mean_total_s": round(float(np.mean(totals)), 2),
           "intent_fast_mean_ttft_s": (round(float(np.mean(f_ttfts)), 2)
                                       if f_ttfts else None),
           "intent_fast_mean_total_s": (round(float(np.mean(f_totals)), 2)
                                        if f_totals else None),
           "reference_first_output_s": 39.1,
           "ts": time.strftime("%Y-%m-%dT%H:%M:%S")}
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
