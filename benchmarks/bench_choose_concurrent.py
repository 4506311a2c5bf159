"""What BATCHED constrained choice buys under concurrency, measured.

`choose()` is on every query's critical path when intent_fast is on,
and background classifier floods (relevance filter, doc nature) fire it
in bursts. Unbatched, concurrent callers serialize at batch 1 behind a
semaphore — the device runs two weight sweeps per caller. With
`choose_batch`, a MicroBatcher coalesces same-bucket callers so the
sweeps amortize across the collection window (models/generate.py::
enable_choose_batching).

Arms (12B int8 weights, one chip, 16 workers × 8 calls each):

  solo_serialized — choose_batch off: dispatches serialize at batch 1
  micro_batched   — choose_batch=4: callers coalesce, pow2-padded

The reference has no equivalent surface (its constrained calls are
free-text + regex rescue through a single-user Ollama pipe,
`/root/reference/src/rag/intent_classifier.py:192-201`).

Run on the real chip:  python benchmarks/bench_choose_concurrent.py
Tiny CPU smoke:        BENCH_TINY=1 python benchmarks/bench_choose_concurrent.py
"""

import dataclasses
import json
import os
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("BENCH_TINY"):
    # the container pins JAX_PLATFORMS=axon via sitecustomize; the env
    # var alone does NOT switch backends — the config update does
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider
from rag_dpo_tpu.rag.intent import CHOOSE_PROMPT, VALID_INTENTS

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


def storm(llm, prompts, workers, calls_each):
    lat = []
    lock = threading.Lock()
    barrier = threading.Barrier(workers)

    def run(w):
        barrier.wait()
        for i in range(calls_each):
            p = prompts[(w * calls_each + i) % len(prompts)]
            t0 = time.time()
            llm.choose(p, list(VALID_INTENTS))
            dt = time.time() - t0
            with lock:
                lat.append(dt)

    ts = [threading.Thread(target=run, args=(w,))
          for w in range(workers)]
    t0 = time.time()
    [t.start() for t in ts]
    [t.join() for t in ts]
    wall = time.time() - t0
    n = workers * calls_each
    return {
        "calls": n,
        "wall_s": round(wall, 2),
        "choose_per_s": round(n / wall, 1),
        "mean_ms": round(1e3 * float(np.mean(lat)), 1),
        "p95_ms": round(1e3 * float(np.quantile(lat, 0.95)), 1),
    }


def main():
    tiny = bool(os.environ.get("BENCH_TINY"))
    workers = 4 if tiny else 16
    calls_each = 2 if tiny else 8
    choose_batch = 4
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

    prompts = [CHOOSE_PROMPT.format(question=q) for q in QUESTIONS]

    # warm b=1 programs (one per s-bucket) on the unbatched path
    t0 = time.time()
    for p in prompts:
        llm.choose(p, list(VALID_INTENTS))
    print(f"warm b=1: {time.time() - t0:.1f}s", flush=True)

    solo = storm(llm, prompts, workers, calls_each)
    print(json.dumps({"solo_serialized": solo}), flush=True)

    # enable batching, warm the b>1 programs with a throwaway storm
    llm.generator.enable_choose_batching(max_batch=choose_batch)
    t0 = time.time()
    storm(llm, prompts, workers, 2)
    print(f"warm batched: {time.time() - t0:.1f}s", flush=True)
    llm.generator._choose_batcher.stats.__init__()   # reset counters

    batched = storm(llm, prompts, workers, calls_each)
    st = llm.generator._choose_batcher.stats
    batched["device_calls"] = st.n_device_calls
    batched["mean_batch"] = round(st.mean_batch, 2)
    batched["max_batch_seen"] = st.max_batch_seen
    print(json.dumps({"micro_batched": batched}), flush=True)

    summary = {
        "bench": "concurrent_choose_batched_vs_serialized",
        "model": "tiny" if tiny else "12B int8",
        "workers": workers,
        "choose_batch": choose_batch,
        "throughput_gain": round(
            batched["choose_per_s"] / solo["choose_per_s"], 2),
        "arms": {"solo_serialized": solo, "micro_batched": batched},
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(summary), flush=True)
    if not tiny:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(summary) + "\n")


if __name__ == "__main__":
    main()
