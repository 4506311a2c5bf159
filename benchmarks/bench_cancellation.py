"""What cancellation and deadlines BUY under load, measured on the chip.

Three arms over the same workload (32 streamed generations, 16-slot
int8-KV continuous pool, 12B int8 weights):

1. full          — every client reads its stream to completion.
2. abandon-drain — half the clients stop CONSUMING after ABANDON_AT
                   tokens but the requests keep decoding (pre-cancel
                   behavior: a disconnected SSE socket changed nothing
                   on the device; tokens burn into nowhere).
3. abandon-cancel— the same half CLOSE their stream at ABANDON_AT
                   tokens: the cancel frees their slots at the next
                   step and the queued second wave admits early.

Arm 2 vs arm 3 isolates the feature: identical client behavior, the
only difference is whether the pool keeps paying for gone consumers.

A fourth arm deadlines EVERY request at DEADLINE_S (tight enough that
late-wave requests expire from the queue): measures the SLO guarantee —
no caller waits past its budget by more than ~one decode dispatch.

Random-init weights (zero-egress image): token QUALITY is meaningless;
scheduling, step accounting, and wall time are real.

Run on the real chip:  python benchmarks/bench_cancellation.py
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
from rag_dpo_tpu.serving import DeadlineExceeded

SLOTS = 16
MAX_SEQ = 1536
MAX_NEW = 192            # decode-dominated: long generations make the
                         # reclaimed slots visible in wall time (at 96
                         # the run was prefill/admission-bound and the
                         # cancel win showed up only as freed tokens)
DECODE_CHUNK = 8
N_REQUESTS = 32          # two waves over the 16 slots
ABANDON_AT = 32          # tokens read before the client goes away
DEADLINE_S = 8.0         # arm 4: per-request wall budget

PROMPT = ("Explique les obligations de l'article 32 du RGPD pour un "
          "responsable de traitement, avec des exemples de mesures "
          "techniques et organisationnelles.")


def run_arm(llm, eng, mode):
    """mode: 'full' | 'drain' | 'cancel' | 'deadline'."""
    tk0 = eng.stats["tokens"]
    c0 = eng.stats["cancelled"]
    st0 = eng.stats["steps"]
    pf0 = eng.stats["prefill_segments"]
    done_lat, lock = [], threading.Lock()
    timeouts = []

    def client(i):
        abandon = mode in ("drain", "cancel") and i % 2 == 1
        t0 = time.time()
        kwargs = {"max_tokens": MAX_NEW}
        if mode == "deadline":
            kwargs["timeout_s"] = DEADLINE_S
        stream = llm.generate_stream(PROMPT + f" ({i})", **kwargs)
        n = 0
        try:
            for _ in stream:            # one delta per decoded token
                n += 1
                if abandon and n >= ABANDON_AT:
                    break
        except DeadlineExceeded:
            with lock:
                timeouts.append(time.time() - t0)
            return
        finally:
            if mode == "cancel" or not abandon:
                stream.close()
            # 'drain' abandoners: leave the stream OPEN and un-consumed
            # — the request keeps decoding (the pre-cancel world);
            # the generator object is parked in _parked so refcount GC
            # can't close it behind our back
            if mode == "drain" and abandon:
                _parked.append(stream)
        if not abandon:
            with lock:
                done_lat.append(time.time() - t0)

    global _parked
    _parked = []
    t0 = time.time()
    threads = [threading.Thread(target=client, args=(i,))
               for i in range(N_REQUESTS)]
    [t.start() for t in threads]
    [t.join() for t in threads]
    # drain mode: wall time must include the engine finishing the
    # abandoned requests — that's the cost being measured
    while eng.busy:
        time.sleep(0.05)
    wall = time.time() - t0
    for s in _parked:
        s.close()
    _parked = []
    out = {
        "arm": mode,
        "wall_s": round(wall, 2),
        "completed": len(done_lat),
        "mean_completed_latency_s": round(float(np.mean(done_lat)), 2)
        if done_lat else None,
        "p95_completed_latency_s": round(
            float(np.quantile(done_lat, 0.95)), 2) if done_lat else None,
        "tokens_decoded": eng.stats["tokens"] - tk0,
        "tok_per_s": round((eng.stats["tokens"] - tk0) / wall, 1),
        "cancelled": eng.stats["cancelled"] - c0,
        "steps": eng.stats["steps"] - st0,
        "prefill_segments": eng.stats["prefill_segments"] - pf0,
    }
    if mode == "deadline":
        out["timed_out"] = len(timeouts)
        out["max_timeout_unblock_s"] = round(max(timeouts), 2) \
            if timeouts else None
        out["deadline_s"] = DEADLINE_S
    return out


def main():
    import os

    global SLOTS, MAX_NEW, N_REQUESTS, ABANDON_AT, DEADLINE_S
    tiny = bool(os.environ.get("BENCH_TINY"))
    if tiny:
        # logic smoke on CPU: tiny arch, small counts, throttled later
        SLOTS, MAX_NEW, N_REQUESTS, ABANDON_AT = 2, 24, 4, 6
        DEADLINE_S = 2.0
        cfg = DecoderConfig.tiny()
    else:
        cfg = DecoderConfig.mistral_nemo_12b()
        cfg = dataclasses.replace(
            cfg, quantize_weights=True, tie_embeddings=True,
            max_seq_len=MAX_SEQ, param_dtype=jnp.bfloat16,
            quantize_kv=True)
    t0 = time.time()
    llm = TPULLMProvider(cfg, max_new_tokens=MAX_NEW,
                         continuous=True, max_batch=SLOTS,
                         speculative=not tiny,
                         prefill_chunk=256, decode_chunk=DECODE_CHUNK)
    llm.generator.load()
    print(f"decoder loaded in {time.time() - t0:.1f}s", flush=True)
    eng = llm._driver.engine
    t0 = time.time()
    llm.warm_decoder()
    print(f"warm_decoder: {time.time() - t0:.1f}s", flush=True)
    # warm the exact request shape once
    list(llm.generate_stream(PROMPT, max_tokens=8))
    if tiny:
        # tiny CPU decode is so fast requests finish before any
        # cancel/deadline lands — throttle to restore realistic pacing
        orig_step = eng.step
        eng.step = lambda: (time.sleep(0.05), orig_step())[1]

    results = {}
    for mode in ("full", "drain", "cancel", "deadline"):
        r = run_arm(llm, eng, mode)
        results[mode] = r
        print(json.dumps(r), flush=True)

    gain = results["drain"]["wall_s"] / results["cancel"]["wall_s"]
    summary = {
        "bench": "cancellation_under_load",
        "model": "12B int8, int8 KV",
        "slots": SLOTS, "requests": N_REQUESTS,
        "max_new": MAX_NEW, "abandon_at_tokens": ABANDON_AT,
        "cancel_vs_drain_speedup": round(gain, 2),
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
