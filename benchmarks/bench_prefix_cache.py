"""Automatic prefix caching at 12B int8, one v5e chip.

The RAG serving shape: every request carries the same system prompt +
shared instruction scaffold and differs only in its question/context
tail. Workload: 16 requests of 1024 prompt tokens sharing their first
896 (7 × 128-token blocks), 16 new tokens each (prefill-dominated, the
regime APC targets).

Arms: continuous engine with prefix_cache=0 (every admission pays the
full 1024-token prefill) vs prefix_cache=2 (block 128 — admissions
after the first reuse the shared 896-token K/V and prefill only their
128-token suffix).

Run on the real chip:  python benchmarks/bench_prefix_cache.py
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

N_REQ, SLOTS, CHUNK = 16, 8, 8
SHARED, PROMPT, MAX_NEW, BLK = 896, 1024, 16, 128


def run_arm(gen, prompts, sampling, cache_entries):
    eng = ContinuousEngine(gen, slots=SLOTS, sampling=sampling,
                           chunk=CHUNK, prefix_cache=cache_entries,
                           prefix_block=BLK)
    t0 = time.time()
    rids = [eng.submit(p, PROMPT, MAX_NEW) for p in prompts]
    results = eng.run()
    wall = time.time() - t0
    got = sum(len(results[r]) for r in rids)
    return {
        "wall_s": round(wall, 2),
        "tokens": got,
        "tok_per_s": round(got / wall, 1),
        "prefix_hits": eng.stats["prefix_hits"],
        "prefix_saved_tokens": eng.stats["prefix_saved_tokens"],
    }, results


def main():
    cfg = DecoderConfig.mistral_nemo_12b()
    cfg = dataclasses.replace(cfg, quantize_weights=True,
                              tie_embeddings=True,
                              max_seq_len=PROMPT + MAX_NEW + 16,
                              param_dtype=jnp.bfloat16)
    gen = TextGenerator(cfg)
    t0 = time.time()
    gen.load()
    print(f"12B int8 loaded in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    shared = rng.integers(3, cfg.vocab_size, (SHARED,)).astype(np.int32)
    prompts = [np.concatenate([
        shared, rng.integers(3, cfg.vocab_size,
                             (PROMPT - SHARED,)).astype(np.int32)])
        for _ in range(N_REQ)]
    sampling = SamplingConfig(temperature=0.0, eos_id=-1, pad_id=1)

    # warm every program both arms use (full prefill, suffix extend,
    # pool decode, insert/release)
    for entries in (0, 2):
        run_arm(gen, prompts[:2], sampling, entries)

    out = {"bench": "prefix_cache_12B_int8",
           "device": str(jax.devices()[0]), "n_requests": N_REQ,
           "prompt_tokens": PROMPT, "shared_prefix": SHARED,
           "block": BLK, "max_new": MAX_NEW, "slots": SLOTS}
    cold, res_cold = run_arm(gen, prompts, sampling, 0)
    warm, res_warm = run_arm(gen, prompts, sampling, 2)
    assert res_cold == res_warm, "APC changed outputs"
    out["no_cache"] = cold
    out["prefix_cache"] = warm
    out["speedup_wall"] = round(cold["wall_s"] / warm["wall_s"], 2)
    out["outputs_identical"] = True
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
