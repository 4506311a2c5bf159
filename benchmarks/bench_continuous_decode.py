"""Continuous batching vs grouped batching at 12B int8, one v5e chip.

The workload that separates the two: N requests with HETEROGENEOUS
output lengths. Grouped decoding (providers/tpu_llm.py micro-batcher:
a group decodes in lockstep to its longest member, next group waits)
burns slots on finished rows; the continuous engine
(serving/continuous.py) frees a slot the chunk its request finishes
and admits the next one.

Workload: 24 requests, prompt 128, max_new drawn from
{16, 32, 64, 128} (seeded). Baseline = 3 sequential groups of 8, each
decoding max(max_new of group) steps (the provider's behavior when 8
concurrent callers share a window). Engine = 8 slots, chunk 8.

Metric: total wall for all 24, aggregate USEFUL tok/s (pads/overrun
excluded for the baseline), mean completion time.

Run on the real chip:  python benchmarks/bench_continuous_decode.py
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

PROMPT = 128
N_REQ, SLOTS, CHUNK = 24, 8, 8
BUDGETS = (16, 32, 64, 128)


def main():
    cfg = DecoderConfig.mistral_nemo_12b()
    cfg = dataclasses.replace(cfg, quantize_weights=True,
                              tie_embeddings=True,
                              max_seq_len=PROMPT + max(BUDGETS),
                              param_dtype=jnp.bfloat16)
    gen = TextGenerator(cfg)
    t0 = time.time()
    gen.load()
    print(f"12B int8 loaded in {time.time() - t0:.1f}s", flush=True)

    rng = np.random.default_rng(0)
    prompts = rng.integers(3, cfg.vocab_size,
                           (N_REQ, PROMPT)).astype(np.int32)
    budgets = rng.choice(BUDGETS, N_REQ)
    useful = int(budgets.sum())
    out = {"bench": "continuous_vs_grouped_12B_int8",
           "device": str(jax.devices()[0]), "n_requests": N_REQ,
           "slots": SLOTS, "chunk": CHUNK, "prompt_tokens": PROMPT,
           "useful_tokens": useful,
           "budgets": np.bincount(budgets,
                                  minlength=max(BUDGETS) + 1)[
                                  list(BUDGETS)].tolist()}

    # eos_id=-1: random weights never emit a chosen EOS; budgets govern
    sampling = SamplingConfig(temperature=0.0, eos_id=-1, pad_id=1)

    # ---- grouped baseline: batches of 8 decode to the group max
    lengths = np.full((SLOTS,), PROMPT, np.int32)
    for b_steps in sorted({int(budgets[g * SLOTS:(g + 1) * SLOTS].max())
                           for g in range(N_REQ // SLOTS)}):
        gen.generate_ids(prompts[:SLOTS], lengths,
                         dataclasses.replace(sampling,
                                             max_new_tokens=b_steps))
    t0 = time.time()
    done_at = []
    for g in range(N_REQ // SLOTS):
        sl = slice(g * SLOTS, (g + 1) * SLOTS)
        steps = int(budgets[sl].max())
        gen.generate_ids(
            prompts[sl], lengths,
            dataclasses.replace(sampling, max_new_tokens=steps))
        done_at.extend([time.time() - t0] * SLOTS)
    wall = time.time() - t0
    out["grouped"] = {
        "wall_s": round(wall, 2),
        "useful_tok_per_s": round(useful / wall, 1),
        "decoded_steps": int(sum(budgets[g * SLOTS:(g + 1) * SLOTS]
                                 .max() for g in
                                 range(N_REQ // SLOTS))) * SLOTS,
        "mean_completion_s": round(float(np.mean(done_at)), 2),
    }
    print(f"grouped: {wall:.2f}s wall, "
          f"{useful / wall:.0f} useful tok/s", flush=True)

    # ---- continuous engine
    eng = ContinuousEngine(gen, slots=SLOTS, sampling=sampling,
                           chunk=CHUNK)
    # warm the engine's programs (prefill 1×128, decode SLOTS×CHUNK)
    wid = eng.submit(prompts[0], PROMPT, CHUNK)
    eng.run()
    eng2 = ContinuousEngine(gen, slots=SLOTS, sampling=sampling,
                            chunk=CHUNK)
    t0 = time.time()
    finish = {}
    rids = []
    for i in range(N_REQ):
        rid = eng2.submit(prompts[i], PROMPT, int(budgets[i]))
        rids.append(rid)
    while eng2._queue or eng2._active:
        before = set(eng2._active)
        eng2.step()
        now = time.time() - t0
        for rid, req in eng2._requests.items():
            if req.done and rid not in finish:
                finish[rid] = now
    wall = time.time() - t0
    results = {rid: eng2._requests[rid].tokens for rid in rids}
    got = sum(len(v) for v in results.values())
    out["continuous"] = {
        "wall_s": round(wall, 2),
        "useful_tok_per_s": round(got / wall, 1),
        "tokens_emitted": got,
        "mean_completion_s": round(float(np.mean(list(finish.values()))),
                                   2),
        "mean_occupancy": round(eng2.occupancy, 2),
    }
    print(f"continuous: {wall:.2f}s wall, {got / wall:.0f} useful "
          f"tok/s, occupancy {eng2.occupancy:.2f}", flush=True)
    out["speedup_wall"] = round(out["grouped"]["wall_s"]
                                / out["continuous"]["wall_s"], 2)
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
