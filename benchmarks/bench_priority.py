"""What priority classes BUY under mixed traffic, measured on the chip.

Workload: a flood of N_BATCH long "background" generations saturating
the slot pool (tagging/summaries/eval-shaped traffic), with N_INT short
"interactive" requests arriving one-by-one while the flood decodes
(chat-shaped traffic). Three arms, same workload:

1. fifo     — no classes (everything priority 0): each interactive
              request waits behind every queued background request.
2. priority — interactive at class 0, background at class 1: the
              interactive request jumps the queue and takes the NEXT
              freed slot.
3. preempt  — same classes + preemption: when the pool is full, the
              interactive arrival EVICTS the worst active background
              slot immediately; the victim re-queues and resumes
              bit-identically later (tests/test_priority.py).

The metric that matters is interactive latency (mean/p95): fifo pays
the whole queue, priority pays one slot-drain, preempt pays one
prefill. Background wall time is the cost side of the ledger.

Random-init weights (zero-egress image): token QUALITY is meaningless;
scheduling and wall time are real.

Run on the real chip:  python benchmarks/bench_priority.py
"""

import dataclasses
import json
import pathlib
import sys
import threading
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

jax.config.update("jax_compilation_cache_dir", "/root/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.providers.tpu_llm import TPULLMProvider

SLOTS = 16
MAX_SEQ = 1536
BATCH_NEW = 192          # background generations: long
INT_NEW = 32             # interactive: short (a chat answer's lead)
DECODE_CHUNK = 8
N_BATCH = 32             # two waves over the 16 slots
N_INT = 8
INT_GAP_S = 2.0          # interactive arrival spacing

PROMPT = ("Explique les obligations de l'article 32 du RGPD pour un "
          "responsable de traitement, avec des exemples de mesures "
          "techniques et organisationnelles.")


def run_arm(llm, eng, mode):
    """mode: 'fifo' | 'priority' | 'preempt'."""
    eng.preemption = (mode == "preempt")
    batch_prio = 0 if mode == "fifo" else 1
    tk0 = eng.stats["tokens"]
    pre0 = eng.stats["preempted"]
    st0 = eng.stats["steps"]
    pf0 = eng.stats["prefill_segments"]
    int_lat, int_ttft, lock = [], [], threading.Lock()

    def background(i):
        llm.generate(PROMPT + f" (fond {i})", max_tokens=BATCH_NEW,
                     priority=batch_prio)

    def interactive(i):
        t0 = time.time()
        first = None
        stream = llm.generate_stream(PROMPT + f" (chat {i})",
                                     max_tokens=INT_NEW, priority=0)
        try:
            for _ in stream:
                if first is None:
                    first = time.time() - t0
        finally:
            stream.close()
        with lock:
            int_lat.append(time.time() - t0)
            int_ttft.append(first if first is not None else
                            time.time() - t0)

    t0 = time.time()
    bthreads = [threading.Thread(target=background, args=(i,))
                for i in range(N_BATCH)]
    [t.start() for t in bthreads]
    time.sleep(INT_GAP_S)            # let the flood occupy the pool
    ithreads = []
    for i in range(N_INT):
        th = threading.Thread(target=interactive, args=(i,))
        th.start()
        ithreads.append(th)
        time.sleep(INT_GAP_S)
    [t.join() for t in ithreads]
    [t.join() for t in bthreads]
    while eng.busy:
        time.sleep(0.05)
    wall = time.time() - t0
    return {
        "arm": mode,
        "wall_s": round(wall, 2),
        "interactive_mean_latency_s": round(float(np.mean(int_lat)), 2),
        "interactive_p95_latency_s": round(
            float(np.quantile(int_lat, 0.95)), 2),
        "interactive_mean_ttft_s": round(float(np.mean(int_ttft)), 2),
        "interactive_max_latency_s": round(max(int_lat), 2),
        "tokens_decoded": eng.stats["tokens"] - tk0,
        "tok_per_s": round((eng.stats["tokens"] - tk0) / wall, 1),
        "preempted": eng.stats["preempted"] - pre0,
        "steps": eng.stats["steps"] - st0,
        "prefill_segments": eng.stats["prefill_segments"] - pf0,
    }


def main():
    import os

    global SLOTS, BATCH_NEW, INT_NEW, N_BATCH, N_INT, INT_GAP_S
    tiny = bool(os.environ.get("BENCH_TINY"))
    if tiny:
        SLOTS, BATCH_NEW, INT_NEW, N_BATCH, N_INT = 2, 48, 6, 4, 2
        INT_GAP_S = 0.3
        cfg = DecoderConfig.tiny()
    else:
        cfg = DecoderConfig.mistral_nemo_12b()
        cfg = dataclasses.replace(
            cfg, quantize_weights=True, tie_embeddings=True,
            max_seq_len=MAX_SEQ, param_dtype=jnp.bfloat16,
            quantize_kv=True)
    t0 = time.time()
    llm = TPULLMProvider(cfg, max_new_tokens=BATCH_NEW,
                         continuous=True, max_batch=SLOTS,
                         speculative=not tiny,
                         prefill_chunk=256, decode_chunk=DECODE_CHUNK)
    llm.generator.load()
    print(f"decoder loaded in {time.time() - t0:.1f}s", flush=True)
    eng = llm._driver.engine
    t0 = time.time()
    llm.warm_decoder()
    print(f"warm_decoder: {time.time() - t0:.1f}s", flush=True)
    list(llm.generate_stream(PROMPT, max_tokens=8))
    if tiny:
        # tiny CPU decode finishes before interactive arrivals land —
        # throttle to restore realistic pacing
        orig_step = eng.step
        eng.step = lambda: (time.sleep(0.05), orig_step())[1]

    results = {}
    for mode in ("fifo", "priority", "preempt"):
        r = run_arm(llm, eng, mode)
        results[mode] = r
        print(json.dumps(r), flush=True)

    summary = {
        "bench": "priority_under_mixed_load",
        "model": "12B int8, int8 KV",
        "slots": SLOTS, "background": N_BATCH, "interactive": N_INT,
        "batch_new": BATCH_NEW, "int_new": INT_NEW,
        "p95_gain_priority": round(
            results["fifo"]["interactive_p95_latency_s"]
            / results["priority"]["interactive_p95_latency_s"], 2),
        "p95_gain_preempt": round(
            results["fifo"]["interactive_p95_latency_s"]
            / results["preempt"]["interactive_p95_latency_s"], 2),
        "arms": results,
        "ts": time.strftime("%Y-%m-%dT%H:%M:%S"),
    }
    print(json.dumps(summary), flush=True)
    if not tiny:
        with open(pathlib.Path(__file__).parent / "RESULTS.jsonl",
                  "a") as f:
            f.write(json.dumps(summary) + "\n")
    llm._driver.close()


if __name__ == "__main__":
    main()


