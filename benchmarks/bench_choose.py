"""What constrained choice decoding BUYS on the chip, measured.

Both classifiers on the query/ingest path make CONSTRAINED calls — the
answer is structurally one of k known strings — yet the reference shape
(and our fallback) is free generation + JSON/regex rescue
(`src/rag/intent_classifier.py:192-201`,
`src/processing/process_and_chunk.py:1107-1318`). `choose()` replaces
the whole decode loop with one prefill + ONE teacher-forced extend that
scores all k candidates at once, so its cost is independent of k and of
the answer's token length.

Arms (12B int8 weights, one chip, per-call latency after warm):

  intent_generate — the 7-intent JSON classification by free decode
                    (48 new tokens: the JSON object's realistic size)
  intent_choose   — the same decision by choose() over the 7 intents
  chunk_generate  — the 2-option chunk call by free decode (6 tokens)
  chunk_choose    — the same by choose() over the 2 natures

Random-init weights (zero-egress image): the DECISION is meaningless,
the latency is real — both arms run the same prompt shapes a converted
checkpoint would.

Run on the real chip:  python benchmarks/bench_choose.py
Tiny CPU smoke:        BENCH_TINY=1 python benchmarks/bench_choose.py
"""

import dataclasses
import json
import os
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.ingest.classify import CHUNK_CLASSIFY_PROMPT
from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider
from rag_dpo_tpu.rag.intent import (
    CHOOSE_PROMPT,
    CLASSIFY_PROMPT,
    VALID_INTENTS,
)
from rag_dpo_tpu.rag.topics import RGPD_TOPICS

QUESTIONS = [
    "Quel est le délai de réponse à une demande d'accès ?",
    "Comment mettre en place un registre des traitements ?",
    "Un salarié refuse la vidéosurveillance, que faire ?",
    "Quelle différence entre DPO interne et externe ?",
    "Liste des mentions obligatoires d'une politique de confidentialité",
    "L'AIPD est-elle obligatoire pour la géolocalisation ?",
    "Quelles sanctions pour un défaut de registre ?",
    "Faut-il le consentement pour les cookies de mesure d'audience ?",
]

EXCERPT = ("L'article 32 impose des mesures techniques et "
           "organisationnelles appropriées : chiffrement, "
           "pseudonymisation, tests réguliers. Étapes recommandées : "
           "1. cartographier, 2. évaluer les risques, 3. documenter.")


def timed(fn, reps):
    lat = []
    for i in range(reps):
        t0 = time.time()
        fn(i)
        lat.append(time.time() - t0)
    return {"mean_ms": round(1e3 * float(np.mean(lat)), 1),
            "p95_ms": round(1e3 * float(np.quantile(lat, 0.95)), 1)}


def main():
    tiny = bool(os.environ.get("BENCH_TINY"))
    if tiny:
        cfg = DecoderConfig.tiny()
    else:
        cfg = DecoderConfig.mistral_nemo_12b()
        cfg = dataclasses.replace(
            cfg, quantize_weights=True, tie_embeddings=True,
            max_seq_len=1536, param_dtype=jnp.bfloat16)
    t0 = time.time()
    llm = TPULLMProvider(cfg, max_new_tokens=64)
    llm.generator.load()
    print(f"decoder loaded in {time.time() - t0:.1f}s", flush=True)

    intent_prompts = [CLASSIFY_PROMPT.format(
        intents=", ".join(VALID_INTENTS),
        topics="; ".join(RGPD_TOPICS),
        question=q) for q in QUESTIONS]
    choose_prompts = [CHOOSE_PROMPT.format(question=q) for q in QUESTIONS]
    chunk_prompt = CHUNK_CLASSIFY_PROMPT.format(
        option_a="GUIDE", option_b="DOCTRINE", excerpt=EXCERPT)

    arms = {
        "intent_generate": lambda i: llm.generate(
            intent_prompts[i % len(QUESTIONS)], temperature=0.0,
            max_tokens=48),
        "intent_choose": lambda i: llm.choose(
            choose_prompts[i % len(QUESTIONS)], list(VALID_INTENTS)),
        "chunk_generate": lambda i: llm.generate(
            chunk_prompt, temperature=0.0, max_tokens=6),
        "chunk_choose": lambda i: llm.choose(
            chunk_prompt, ["GUIDE", "DOCTRINE"]),
    }
    reps = 2 if tiny else len(QUESTIONS)
    results = {}
    for name, fn in arms.items():
        t0 = time.time()
        for i in range(reps):        # warm pass: every shape compiles
            fn(i)
        warm_s = time.time() - t0
        results[name] = timed(fn, reps)
        results[name]["warm_s"] = round(warm_s, 1)
        print(json.dumps({name: results[name]}), flush=True)

    summary = {
        "bench": "constrained_choice_vs_free_generation",
        "model": "tiny" if tiny else "12B int8",
        "reps": reps,
        "intent_speedup": round(
            results["intent_generate"]["mean_ms"]
            / results["intent_choose"]["mean_ms"], 2),
        "chunk_speedup": round(
            results["chunk_generate"]["mean_ms"]
            / results["chunk_choose"]["mean_ms"], 2),
        "arms": results,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(summary), flush=True)
    if not tiny:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
