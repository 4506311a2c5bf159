"""Dense-arm block-size sweep at 1M rows, large batch (round 3: the 10M
tuning showed bigger slabs beat smaller ones — fewer carry merges; does
the same hold at 1M, and does the full sweep win outright?).

Sweeps block_rows ∈ {250k, 500k, 1M=full} at batch {1024, 2048},
dense arm only (int8 blockscan + bf16 refine), ITERS=40.

Run on the real chip:  python benchmarks/bench_1m_block_sweep.py
"""

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

from rag_dpo_tpu.ops.quantize import (
    approx_topk_int8_blockscan,
    quantize_rows,
)

N, D = 1_000_000, 1024
ITERS = 40
BATCHES = (1024, 2048)
BLOCKS = (250_000, 500_000, 1_000_000)


def timed(fn, args, iters=ITERS):
    def chain(*a):
        def body(c, _):
            outs = fn(c, *a[1:])
            probe = jnp.asarray(outs[0]).reshape(-1)[0]
            bump = (probe * 0).astype(a[0].dtype)
            return a[0] + bump, probe
        return jax.lax.scan(body, a[0], None, length=iters)[1]

    cj = jax.jit(chain)
    np.asarray(cj(*args))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        np.asarray(cj(*args))
        best = min(best, (time.time() - t0) / iters)
    return best


def main():
    @jax.jit
    def make_corpus(key):
        e = jax.random.normal(key, (N, D), jnp.bfloat16)
        nrm = jnp.sqrt(jnp.sum(jnp.square(e.astype(jnp.float32)),
                               axis=1, keepdims=True))
        return (e.astype(jnp.float32) / nrm).astype(jnp.bfloat16)

    embs = make_corpus(jax.random.key(0))
    embs.block_until_ready()
    e_i8, e_scale = jax.jit(quantize_rows)(embs)
    e_i8.block_until_ready()

    out = {"bench": "dense_1M_block_sweep", "iters": ITERS,
           "device": str(jax.devices()[0])}

    for q_n in BATCHES:
        @jax.jit
        def make_queries(key):
            x = jax.random.normal(key, (q_n, D), jnp.float32)
            return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1,
                                        keepdims=True))

        queries = make_queries(jax.random.key(1))
        for blk in BLOCKS:
            def dense(q, ei8, esc, eref):
                return approx_topk_int8_blockscan(
                    q, ei8, esc, 40, oversample=2, block_rows=blk,
                    e_ref=eref)

            dt = timed(dense, (queries, e_i8, e_scale, embs))
            key = f"b{q_n}_blk{blk // 1000}k"
            out[key] = {"ms": round(dt * 1e3, 2),
                        "qps": round(q_n / dt, 1)}
            print(f"{key}: {dt * 1e3:.2f} ms  {q_n / dt:.0f} qps",
                  flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
