"""Chunked prefill in the continuous engine, 12B int8, one v5e chip.

The scenario the feature exists for: a slot is streaming an answer
while a LONG RAG prompt (a retrieval context) is admitted into the
pool. With whole-prompt prefill (prefill_chunk=0, the round-3
behavior) the admission runs one batch-1 prefill dispatch over all
positions and every neighbor's token stream stalls for its full
duration. With prefill_chunk=256 the prompt prefills in bounded
segments interleaved with pool decode dispatches, so the neighbor's
worst inter-token gap shrinks to ~one segment + one decode step.

Two measurements:

1. **Neighbor stall** at a 2048-token admission (both modes fit):
   the streaming neighbor's max inter-token gap across the admission
   window (host-clock timestamps on its on_token callback).
2. **Memory feasibility** at 4096 tokens: the whole-prompt prefill
   program allocates per-layer [4096, 5120] f32 dot temps from the
   int8-dequant matmuls (~80 MB × live window) ON TOP of the 12 GB
   weights + pool KV and RESOURCE_EXHAUSTs the 16 GB chip; the chunked
   path's segments bound those temps at [256, 5120] (~5 MB) and admit
   the same prompt. Chunked prefill is a memory bound, not just a
   latency bound. (The 4096 whole-prompt attempt runs LAST — after an
   OOM the device can wedge the process.)

On output equality: the NEIGHBOR's stream must be bit-identical (its
programs don't change — CPU tests assert full engine invisibility);
the LONG request runs whole-prefill vs segmented-extend — different
XLA programs whose bf16 drift under random init can flip argmax (same
caveat as the speculative bit-exactness note in BENCHMARKS.md); with
real weights' decisive margins they agree.

Run on the real chip:  python benchmarks/bench_chunked_prefill.py
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

from rag_dpo_tpu.models.decoder import DecoderConfig
from rag_dpo_tpu.models.generate import SamplingConfig, TextGenerator
from rag_dpo_tpu.serving.continuous import ContinuousEngine

SHORT, LONG, LONG_BIG = 128, 2048, 4096
NEIGHBOR_BUDGET, LONG_BUDGET = 160, 32
SLOTS, CHUNK = 2, 4


def run_case(gen, sampling, short_p, long_p, long_len, prefill_chunk):
    eng = ContinuousEngine(gen, slots=SLOTS, sampling=sampling,
                           chunk=CHUNK, prefill_chunk=prefill_chunk)
    stamps = []
    ra = eng.submit(short_p, SHORT, NEIGHBOR_BUDGET,
                    on_token=lambda rid, t: stamps.append(time.time()))
    for _ in range(4):                  # neighbor decoding steadily
        eng.step()
    n_before = len(stamps)
    t0 = time.time()
    rb = eng.submit(long_p[:long_len], long_len, LONG_BUDGET)
    results = eng.run()
    wall = time.time() - t0
    gaps = np.diff(np.asarray(stamps[max(n_before - 1, 0):]))
    dispatch_gaps = gaps[gaps > 1e-3]     # chunk-boundary gaps only
    return {
        "max_gap_ms": round(float(gaps.max()) * 1000, 1),
        "p50_dispatch_gap_ms": round(
            float(np.median(dispatch_gaps)) * 1000, 1),
        "wall_s": round(wall, 2),
        "prefill_segments": eng.stats["prefill_segments"],
    }, results[ra], results[rb]


def main():
    # Phase A (stall comparison) sizes the context to the 2048-token
    # admission; phase B (4096 feasibility) rebuilds the generator at
    # the bigger context over the SAME weight tree. Sizing matters:
    # the pool KV is [slots, max_seq, ...] — a 4352-token context costs
    # 0.7 GB/slot at 12B dims, and carrying it through phase A is what
    # tips the whole-prompt 2048 prefill over the 16 GB chip.
    cfg = DecoderConfig.mistral_nemo_12b()
    cfg = dataclasses.replace(cfg, quantize_weights=True,
                              tie_embeddings=True,
                              max_seq_len=LONG + 256,
                              param_dtype=jnp.bfloat16)
    gen = TextGenerator(cfg)
    t0 = time.time()
    gen.load()
    print(f"12B int8 loaded in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    short_p = rng.integers(3, cfg.vocab_size, (SHORT,)).astype(np.int32)
    long_p = rng.integers(3, cfg.vocab_size,
                          (LONG_BIG,)).astype(np.int32)
    sampling = SamplingConfig(temperature=0.0, eos_id=-1, pad_id=1)

    # warm every program both 2048 cases touch, then measure
    for pc in (0, 256):
        run_case(gen, sampling, short_p, long_p, LONG, pc)

    out = {"bench": "chunked_prefill_12B_int8",
           "device": str(jax.devices()[0]),
           "short_prompt": SHORT, "long_prompt": LONG,
           "neighbor_budget": NEIGHBOR_BUDGET, "slots": SLOTS,
           "chunk": CHUNK}
    whole, a0, b0 = run_case(gen, sampling, short_p, long_p, LONG, 0)
    out["whole_prefill"] = whole
    print("whole-prompt prefill (2048):", whole, flush=True)
    chunked, a1, b1 = run_case(gen, sampling, short_p, long_p, LONG,
                               256)
    out["chunked_256"] = chunked
    print("chunked prefill (2048/256):", chunked, flush=True)
    out["neighbor_identical"] = bool(a0 == a1)
    out["long_identical"] = bool(b0 == b1)
    out["neighbor_stall_reduction"] = round(
        whole["max_gap_ms"] / chunked["max_gap_ms"], 2)

    # 4096 feasibility at the bigger context: chunked first (fits),
    # whole-prompt LAST (OOMs — a wedged device after
    # RESOURCE_EXHAUSTED can't hurt anything that still needs to run)
    cfg_big = dataclasses.replace(cfg, max_seq_len=LONG_BIG + 256)
    gen = TextGenerator(cfg_big, params=gen._params)
    run_case(gen, sampling, short_p, long_p, LONG_BIG, 256)  # warm
    big_chunked, _, rb = run_case(gen, sampling, short_p, long_p,
                                  LONG_BIG, 256)
    big_chunked["long_tokens_out"] = len(rb)
    out["big_4096_chunked"] = big_chunked
    print("chunked prefill (4096/256):", big_chunked, flush=True)
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    try:
        big_whole, _, _ = run_case(gen, sampling, short_p, long_p,
                                   LONG_BIG, 0)
        out["big_4096_whole"] = big_whole
    except Exception as e:  # noqa: BLE001 — recording the OOM is the point
        msg = str(e)
        out["big_4096_whole"] = {
            "error": type(e).__name__,
            "oom": ("RESOURCE_EXHAUSTED" in msg
                    or "memory" in msg.lower()),
            "message": msg[:160]}
    print("whole prefill (4096):", out["big_4096_whole"], flush=True)
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
