"""Aggregate decode throughput of the 12B int8 decoder at pool batch
sizes — the serving ceiling the continuous engine schedules against.

Decode is weight-sweep-bound (12.4 GB int8 weights per step), so
aggregate tok/s should scale ~linearly with co-resident rows until the
KV-cache read catches up. This bench times `_decode_chunk` directly
(CHUNK steps per dispatch, the engine's inner program) at batch 1/4/8
with bf16 vs int8 K/V rows, isolating the cache-update formulation:
the one-hot einsum rewrite this replaced rebuilt the whole [B, max]
cache every scan step (O(S·max) scatter FLOPs + whole-cache HBM
read+write ×40 layers) and capped the pool at ~18 tok/s aggregate;
the dynamic_update_slice row write touches one token row per step.

Timing: each measurement is one dispatch of CHUNK scanned steps,
fetched once (np.asarray) — the ~28 ms axon-tunnel RTT amortizes over
the chunk exactly as it does in the engine.

Run on the real chip:  python benchmarks/bench_decode_throughput.py
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

import os

MAX_SEQ = int(os.environ.get("BENCH_MAX_SEQ", "1536"))
CHUNK = 16
PROMPT = 128
REPS = 4


def measure(cfg, batch, params):
    gen = TextGenerator(cfg, params=params)  # ONE 12.4 GB tree, shared
    rng = np.random.default_rng(0)
    ids = rng.integers(4, cfg.vocab_size, (batch, PROMPT)).astype(np.int32)
    lengths = np.full((batch,), PROMPT, np.int32)
    sampling = SamplingConfig(temperature=0.0, max_new_tokens=CHUNK,
                              eos_id=-1, pad_id=0)
    logits, caches = gen._prefill(batch, PROMPT)(
        params, jnp.asarray(ids), jnp.asarray(lengths))
    carry = (logits, caches, jnp.asarray(lengths),
             jnp.zeros((batch,), bool),
             jnp.zeros((batch,), jnp.uint32))
    prog = gen._decode_chunk(batch, CHUNK, sampling)
    carry, toks = prog(params, carry)     # compile + warm
    np.asarray(toks)
    t0 = time.time()
    for _ in range(REPS):
        carry, toks = prog(params, carry)
        np.asarray(toks)                  # one fetch per dispatch
    dt = (time.time() - t0) / REPS
    del gen, carry, caches, logits
    return {"batch": batch,
            "ms_per_dispatch": round(dt * 1e3, 1),
            "ms_per_step": round(dt * 1e3 / CHUNK, 2),
            "tok_per_s_aggregate": round(batch * CHUNK / dt, 1)}


def run_arm(kv: str, batch: int):
    base = DecoderConfig.mistral_nemo_12b()
    cfg = dataclasses.replace(base, quantize_weights=True,
                              tie_embeddings=True, max_seq_len=MAX_SEQ,
                              param_dtype=jnp.bfloat16,
                              quantize_kv=(kv == "int8"))
    params = TextGenerator(cfg).load()
    r = measure(cfg, batch, params)
    r["kv"] = kv
    print("ARM " + json.dumps(r), flush=True)


def main():
    # one SUBPROCESS per arm: a RESOURCE_EXHAUSTED wedges the axon
    # device for the remainder of its process (every later program
    # fails), so an OOMing arm must not poison the others
    import subprocess

    out = {"bench": "decode_throughput_12B_int8",
           "device": str(jax.devices()[0]), "max_seq": MAX_SEQ,
           "chunk": CHUNK, "arms": []}
    for kv in ("bf16", "int8"):
        for batch in (1, 4, 8):
            p = subprocess.run(
                [sys.executable, __file__, kv, str(batch)],
                capture_output=True, text=True, timeout=1200)
            arm = None
            for line in p.stdout.splitlines():
                if line.startswith("ARM "):
                    arm = json.loads(line[4:])
            if arm is None:
                err = "OOM" if "RESOURCE_EXHAUSTED" in \
                    (p.stdout + p.stderr) else f"exit {p.returncode}"
                arm = {"batch": batch, "kv": kv, "error": err}
            out["arms"].append(arm)
            print(arm, flush=True)
    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    if len(sys.argv) == 3:
        run_arm(sys.argv[1], int(sys.argv[2]))
    else:
        main()
