"""Hybrid batch-scaling tuning at 1M chunks (VERDICT round-2 item 2:
make the sparse arm track the dense arm — target full hybrid within
~25% of dense-alone at every batch, ≥60k qps at b1024).

Two levers measured here, with the tunnel-floor amortized at ITERS=40
(the round-2 numbers chained only 10 iterations, so each carried ~2.8 ms
of the 28 ms tunnel RTT — bench_sparse_phases.py showed a flat ~2.9 ms
"cost" on even trivial phases):

  * postings cap (512 → 256): phase-1 candidate arrays halve
  * rescore candidates C (128 → 96/64): the dominant [Q,C,L,T] rescore
    shrinks proportionally

For each (cap, C) config and batch in {512, 1024, 2048}: full-hybrid
ms/qps, dense-arm-alone ms/qps, hybrid/dense ratio, and top-10 fused-id
overlap vs the (512, 128) baseline config.

Run on the real chip:  python benchmarks/bench_hybrid_tuned.py
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

from rag_dpo_tpu.ops import rrf_fuse
from rag_dpo_tpu.ops.postings import PostingsIndex, postings_candidates_topk
from rag_dpo_tpu.ops.quantize import (
    approx_topk_int8_blockscan,
    quantize_rows,
)

N, D, K = 1_000_000, 1024, 10
ELL_W, N_TERMS, VOCAB = 24, 16, 50_000
ITERS = 40
BLOCK = 1_000_000
BATCHES = (512, 1024, 2048)
CONFIGS = ((256, 64),)


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

    rng = np.random.default_rng(2)
    terms_h = rng.integers(0, VOCAB, (N, ELL_W)).astype(np.int32)
    impacts_h = np.abs(rng.standard_normal((N, ELL_W))).astype(np.float32)
    ell_t = jax.device_put(jnp.asarray(terms_h))
    ell_i = jax.device_put(jnp.asarray(impacts_h))
    weights = jnp.asarray([2.0, 1.5], jnp.float32)

    tables = {}
    for cap, _ in CONFIGS:
        if cap not in tables:
            pidx = PostingsIndex.build(terms_h, impacts_h,
                                       vocab_size=VOCAB, cap=cap)
            tables[cap] = pidx.device_arrays()

    out = {"bench": "hybrid_1M_tuned", "k": K, "iters": ITERS,
           "block_rows": BLOCK, "device": str(jax.devices()[0])}

    for q_n in BATCHES:
        qt = jnp.asarray(rng.integers(0, VOCAB, (q_n, N_TERMS)),
                         jnp.int32)
        qw = jnp.abs(jax.random.normal(jax.random.key(5),
                                       (q_n, N_TERMS)))

        @jax.jit
        def make_queries(key):
            x = jax.random.normal(key, (q_n, D), jnp.float32)
            return x / jnp.sqrt(jnp.sum(jnp.square(x), axis=1,
                                        keepdims=True))

        queries = make_queries(jax.random.key(1))

        def dense_only(q, ei8, esc, eref):
            return approx_topk_int8_blockscan(
                q, ei8, esc, 40, oversample=2, block_rows=BLOCK,
                e_ref=eref)

        dt = timed(dense_only, (queries, e_i8, e_scale, embs))
        dense_ms = dt * 1e3
        out[f"b{q_n}_dense"] = {"ms": round(dense_ms, 2),
                                "qps": round(q_n / dt, 1)}
        print(f"b{q_n} dense-only: {dense_ms:.2f} ms "
              f"{q_n / dt:.0f} qps", flush=True)

        base_ids = None
        for cap, C in CONFIGS:
            pd, pi = tables[cap]

            def hybrid(q, ei8, esc, eref, pd_, pi_, et, ei, qqt, qqw):
                ds, di = approx_topk_int8_blockscan(
                    q, ei8, esc, 40, oversample=2, block_rows=BLOCK,
                    e_ref=eref)
                ss, si = postings_candidates_topk(
                    pd_, pi_, et, ei, qqt, qqw, k=40, n_candidates=C)
                arms = jnp.stack([di, si], axis=0)
                return rrf_fuse(arms, weights, topk=K)

            args = (queries, e_i8, e_scale, embs, pd, pi,
                    ell_t, ell_i, qt, qw)
            fs, fr = jax.jit(hybrid)(*args)
            fr = np.asarray(fr)
            if base_ids is None:
                base_ids = fr
                overlap = 1.0
            else:
                overlap = float(np.mean([
                    len(set(fr[r]) & set(base_ids[r])) / K
                    for r in range(q_n)
                ]))
            dt = timed(hybrid, args)
            key = f"b{q_n}_cap{cap}_C{C}"
            out[key] = {
                "ms": round(dt * 1e3, 2),
                "qps": round(q_n / dt, 1),
                "vs_dense": round(dt * 1e3 / dense_ms, 3),
                "top10_overlap_vs_base": round(overlap, 4),
            }
            print(f"{key}: {dt * 1e3:.2f} ms  {q_n / dt:.0f} qps  "
                  f"(dense×{dt * 1e3 / dense_ms:.2f}, "
                  f"overlap {overlap:.4f})", flush=True)

    out["ts"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    print(json.dumps(out), flush=True)
    with open(pathlib.Path(__file__).parent / "RESULTS.jsonl", "a") as f:
        f.write(json.dumps(out) + "\n")


if __name__ == "__main__":
    main()
